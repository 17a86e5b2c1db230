package graft.tools

import org.apache.spark.sql.SparkSession
import java.lang.management.ManagementFactory
import scala.jdk.CollectionConverters._

/** Diagnostic main (NOT a spec): reproduces and localizes the within-run
  * bench degradation round 14 uncovered — the same query measured 1.45 s at
  * bench start and 8.1 s at bench end IN THE SAME JVM with nothing else
  * running, while a pure-JVM CPU loop stayed full speed. Measures a probe
  * query before and after a full-catalog sweep, tracking GC time, loaded
  * classes, metaspace, and code-cache occupancy at each checkpoint, so the
  * accumulation (codegen classes? GC pressure? listener state?) is
  * attributable instead of being mistaken for "box weather".
  *
  * Run: sbt "Test/runMain graft.tools.DegradeExp [nSweep] [probe]"
  */
object DegradeExp {
  private def gcMs: Long =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime.max(0L)).sum
  private def pool(sub: String): Long =
    ManagementFactory.getMemoryPoolMXBeans.asScala.filter(_.getName.contains(sub))
      .map(_.getUsage.getUsed / 1024 / 1024).sum
  private def classes: Int = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount

  private def stamp(tag: String): Unit =
    println(f"[exp] $tag: gcTotal=${gcMs}ms cls=$classes meta=${pool("Metaspace")}MB " +
      f"codeheap=${pool("CodeHeap")}MB heap=${(Runtime.getRuntime.totalMemory - Runtime.getRuntime.freeMemory) / 1024 / 1024}MB")

  def main(args: Array[String]): Unit = {
    val nSweep = args.headOption.map(_.toInt).getOrElse(Int.MaxValue)
    val probeName = args.drop(1).headOption.getOrElse("q116_dup_spans")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-degrade-exp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probe = graft.SparkEntry.queries(probeName)

    def measureProbe(tag: String): Unit = {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        probe(spark, sfDir).count()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[exp] probe $tag: " + times.map(t => f"$t%.2f").mkString(" ") +
        f" (median ${times.sorted.apply(2)}%.2f)")
      stamp(s"after-probe-$tag")
    }

    stamp("start")
    // warm the probe's codegen once so the before/after compare is
    // steady-state vs steady-state
    probe(spark, sfDir).count(); spark.catalog.clearCache()
    measureProbe("BEFORE")

    val sweep = graft.SparkEntry.queries.toSeq.sortBy(_._1).take(nSweep)
    var done = 0
    val g0 = gcMs
    sweep.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).count()
      catch { case e: Throwable => println(s"[exp] sweep $name FAILED: ${e.getMessage}") }
      spark.catalog.clearCache()
      val dt = (System.nanoTime() - t0) / 1e9
      done += 1
      if (done % 25 == 0) {
        stamp(f"sweep-$done (last $name ${dt}%.2fs, gcDelta=${gcMs - g0}ms)")
        measureProbe(s"AT-$done")
      }
    }
    stamp("sweep-done")
    measureProbe("AFTER")
    spark.stop()
  }
}
