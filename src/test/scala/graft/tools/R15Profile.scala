package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (NOT a spec): round-15 optimization profiling.
  * Decomposes the shared-line-graph family (q104/q105/q125/q173/q180/
  * q201 all derive Graph.lineGraphEdges) and the q198 radix-select
  * pipeline into stage timings via the noop sink (guide §1.4), so the
  * optimization targets are chosen from measured stage costs, not
  * guesses. Also times a 32-thread raw-JVM sha2 twin of the synthetic
  * probe's dominant kernel, to separate "this box is slow at 32-wide
  * crypto" from "the engine regressed" (the round-15 BandSpec repair).
  *
  * Run: sbt "Test/runMain graft.tools.R15Profile [sfDir]"
  */
object R15Profile {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def time(spark: SparkSession, label: String, reps: Int = 3)(f: => Unit): Unit = {
    spark.sparkContext.setJobDescription(label)
    val xs = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    println(f"[r15] $label%-42s med=${xs.sorted.apply(reps / 2)}%6.3f  runs=${xs.map(x => f"$x%.3f").mkString(",")}")
    spark.sparkContext.setJobDescription(null)
  }

  /** 32-thread raw-JVM sha2 chain twin of syntheticProbeOnce's kernel:
    * same digest count (8M rows x 3 chained sha2-256 of short hex
    * strings), no Spark. Hardware-throughput yardstick at the probe's
    * own parallelism width.
    */
  def sha2WideOnce(threads: Int = 32, rows: Long = 8000000L): Double = {
    val per = rows / threads
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (0 until threads).map { t =>
      val th = new Thread(() => {
        val md = java.security.MessageDigest.getInstance("SHA-256")
        var acc = 0L
        var i = 0L
        while (i < per) {
          var b = String.valueOf(t * per + i).getBytes("UTF-8")
          var j = 0
          while (j < 3) {
            b = md.digest(b)
            // spark's sha2 re-hexes between chains; approximate with
            // a cheap hex expansion so byte volume matches
            val hex = new Array[Byte](b.length * 2)
            var k = 0
            while (k < b.length) {
              val v = b(k) & 0xff
              hex(2 * k) = "0123456789abcdef".charAt(v >>> 4).toByte
              hex(2 * k + 1) = "0123456789abcdef".charAt(v & 0xf).toByte
              k += 1
            }
            b = hex
            j += 1
          }
          acc += b(0)
          i += 1
        }
        sink.addAndGet(acc)
      })
      th.setDaemon(true); th.start(); th
    }
    ts.foreach(_.join())
    require(sink.get != 0L || rows == 0, "sha2 blackhole")
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-r15-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.Graph
    import graft.Tables

    // ---- yardstick twin first (box state freshest)
    graft.Bench.syntheticProbeOnce(spark)
    val syn = graft.Bench.syntheticProbe(spark)
    val wide = (1 to 3).map(_ => sha2WideOnce()).min
    val cpu = graft.Bench.cpuBaseline()
    println(f"[r15] yardsticks: cpu8=$cpu%.3f sha2wide32=$wide%.3f syn=$syn%.3f")

    // ---- line-graph family decomposition
    val docs = Tables.documents(spark, dir)
    time(spark, "documents scan")(noop(docs))
    val docLines = docs
      .select(col("doc_id"),
        explode(graft.text.Chunker.wordChunks(col("text"), 5)).as("line"))
    time(spark, "docLines explode (no distinct)")(noop(docLines))
    time(spark, "docLines explode + distinct")(noop(docLines.distinct()))
    val postings = docLines.distinct()
      .groupBy("line")
      .agg(graft.functions.BoundedCollect.collect(6)(col("doc_id"), lit(0)).as("bc"))
      .filter(col("bc._2").between(2, 5))
    time(spark, "postings (BoundedCollect)")(noop(postings))
    val edges = Graph.lineGraphEdgesOf(docs)
    time(spark, "lineGraphEdges full")(noop(edges))
    time(spark, "connectedComponents(edges)")(
      noop(Graph.connectedComponents(Graph.lineGraphEdgesOf(docs))))
    time(spark, "pageRank(edges,3)")(
      noop(Graph.pageRank(Graph.lineGraphEdgesOf(docs), 3)))
    time(spark, "triangleCounts(edges)")(
      noop(Graph.triangleCounts(Graph.lineGraphEdgesOf(docs))))
    time(spark, "q104 full")(noop(Graph.q104DedupClusters(spark, dir)))
    time(spark, "q105 full")(noop(Graph.q105ClusterKeepers(spark, dir)))
    time(spark, "q125 full")(noop(Graph.q125PageRank(spark, dir)))

    // ---- q198 decomposition
    val e = Tables.events(spark, dir)
    time(spark, "events scan")(noop(e))
    time(spark, "radixSelectKth(value) x1", reps = 3)(
      noop(graft.operators.Quantiles.radixSelectKth(
        e, "event_type", floor(col("value") * 100 + 0.5), n => (n + 1) / 2)))
    time(spark, "q198 full")(
      noop(graft.operators.Quantiles.q198MadOutliers(spark, dir)))

    spark.stop()
  }
}
