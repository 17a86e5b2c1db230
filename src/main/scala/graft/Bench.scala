package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query at the driver-set scale
  * factor on local[32] and prints ONE JSON line with per-query seconds.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM + Janino-codegen warmup: run every query once on the smallest
    // fixture so measured times reflect steady-state execution (generated
    // class compilation dominates first runs — 19 s vs 2.7 s observed on
    // the shingle-join query), not class loading
    SparkEntry.queries.values.foreach { fn =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
      spark.catalog.clearCache() // operator-internal caches must not pile up
    }
    // a crashed query must never be mistaken for a fast one: each entry
    // records {seconds, ok}, failures are listed by name in the JSON line
    // and echoed (with the exception) on stderr
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: ${e.getMessage}")
          false
      }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // clear operator-internal caches AFTER timing: a query pays for its
      // own caching, but 67 queries' dead cache entries must not GC-thrash
      // the queries that follow (measured: ~1.5x uniform slowdown)
      spark.catalog.clearCache()
      (name, elapsed, ok)
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val nFailed = results.count(!_._3)
    if (nFailed > 0)
      System.err.println(s"[bench] $nFailed quer${if (nFailed == 1) "y" else "ies"} FAILED")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"n_failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
    if (nFailed > 0) sys.exit(1)
  }
}
