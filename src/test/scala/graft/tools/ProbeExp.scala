package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main (NOT a spec): samples the two engine-regression
  * yardsticks — Bench.cpuBaseline (pure JVM) and Bench.syntheticProbe
  * (I/O-free Spark pipeline) — N times, to establish the committed
  * quiet-box baselines and the honest co-movement envelope the
  * BenchBandSpec cross-check thresholds are derived from.
  *
  * Run: sbt "Test/runMain graft.tools.ProbeExp [n]"
  */
object ProbeExp {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe-exp")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.syntheticProbeOnce(spark) // codegen warm
    (1 to n).foreach { i =>
      val cpu = graft.Bench.cpuBaseline()
      val wide = graft.Bench.cpuWide()
      val syn = graft.Bench.syntheticProbe(spark)
      println(f"[probe] $i%2d cpu=$cpu%.3f wide=$wide%.3f syn=$syn%.3f ratio=${syn / wide}%.3f")
    }
    spark.stop()
  }
}
