package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main (NOT a spec): round-16 optimization profiling.
  * Times the ITERATIVE operator families (CC / pageRank / kCore / BPE —
  * the round-15 scaling block's worst 32c/8c rows) with a job/stage/task
  * counting listener, so the loop-stage partition sizing work has
  * per-round task-count evidence, not just wall clock. Core count comes
  * from SPARK_GRAFT_CPUS so the same profile runs at 32 and 8 cores.
  *
  * Run: sbt "Test/runMain graft.tools.R16Profile <family> [sfDir]"
  *   family ∈ graph | bpe | q70 | q38 | all
  */
object R16Profile {
  final class Counts extends SparkListener {
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    val stages = new java.util.concurrent.atomic.AtomicLong()
    val tasks = new java.util.concurrent.atomic.AtomicLong()
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
  }

  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val family = args.headOption.getOrElse("all")
    val sfDir = args.drop(1).headOption
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR")).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // conf-override experiment hooks (A/B of AQE coalescing policy):
    //   SPARK_GRAFT_PF=false  → coalescePartitions.parallelismFirst=false
    //   SPARK_GRAFT_ADVISORY=8m → adaptive.advisoryPartitionSizeInBytes
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-r16-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b1 = sys.env.get("SPARK_GRAFT_PF").fold(b0)(v =>
      b0.config("spark.sql.adaptive.coalescePartitions.parallelismFirst", v))
    val b2 = sys.env.get("SPARK_GRAFT_ADVISORY").fold(b1)(v =>
      b1.config("spark.sql.adaptive.advisoryPartitionSizeInBytes", v))
    val spark = b2.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val counts = new Counts
    spark.sparkContext.addSparkListener(counts)

    def time(label: String, reps: Int = 3)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val xs = (1 to reps).map { _ =>
        val (j0, s0, t0) = (counts.jobs.get, counts.stages.get, counts.tasks.get)
        val n0 = System.nanoTime()
        f
        val sec = (System.nanoTime() - n0) / 1e9
        spark.catalog.clearCache()
        (sec, counts.jobs.get - j0, counts.stages.get - s0, counts.tasks.get - t0)
      }
      val med = xs.map(_._1).sorted.apply(reps / 2)
      val last = xs.last
      println(f"[r16/$cpus] $label%-34s med=$med%7.3f  jobs=${last._2}%3d stages=${last._3}%4d tasks=${last._4}%6d  runs=${xs.map(x => f"${x._1}%.3f").mkString(",")}")
      spark.sparkContext.setJobDescription(null)
    }

    val docs = graft.Tables.documents(spark, sfDir)
    // JIT/codegen warm pass at the smallest fixture
    def warm(fn: (SparkSession, String) => DataFrame, names: String*): Unit =
      names.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }

    if (family == "graph" || family == "all") {
      warm(null, "q104_dedup_clusters", "q125_pagerank", "q173_triangle_count",
        "q180_kcore")
      time("edges: derive+noop") {
        noop(graft.operators.Graph.lineGraphEdgesOf(docs))
      }
      time("cc(edges)") {
        noop(graft.operators.Graph.connectedComponents(
          graft.operators.Graph.lineGraphEdgesOf(docs)))
      }
      time("pageRank(edges,3)") {
        noop(graft.operators.Graph.pageRank(
          graft.operators.Graph.lineGraphEdgesOf(docs), 3))
      }
      time("kCore(edges,3)") {
        noop(graft.operators.Graph.kCore(
          graft.operators.Graph.lineGraphEdgesOf(docs), 3, assumeSymmetric = true))
      }
      time("triangles(edges)") {
        noop(graft.operators.Graph.triangleCounts(
          graft.operators.Graph.lineGraphEdgesOf(docs), assumeSymmetric = true))
      }
      time("q104 full") { noop(graft.SparkEntry.queries("q104_dedup_clusters")(spark, sfDir)) }
      time("q125 full") { noop(graft.SparkEntry.queries("q125_pagerank")(spark, sfDir)) }
      time("q173 full") { noop(graft.SparkEntry.queries("q173_triangle_count")(spark, sfDir)) }
      time("q201 full") { noop(graft.SparkEntry.queries("q201_triangle_stratum")(spark, sfDir)) }
      time("q180 full") { noop(graft.SparkEntry.queries("q180_kcore")(spark, sfDir)) }
      time("q105 full") { noop(graft.SparkEntry.queries("q105_cluster_keepers")(spark, sfDir)) }
    }
    if (family == "bpe" || family == "all") {
      warm(null, "q112_bpe_train", "q120_bpe_encode")
      time("bpeTrain(docs,20)") {
        noop(graft.operators.TextOps.bpeTrain(docs, 20))
      }
      time("q112 full") { noop(graft.SparkEntry.queries("q112_bpe_train")(spark, sfDir)) }
      time("q120 full") { noop(graft.SparkEntry.queries("q120_bpe_encode")(spark, sfDir)) }
    }
    if (family == "q70" || family == "all") {
      warm(null, "q70_stream_asof")
      time("q70 probe (approx distinct)") {
        graft.Tables.events(spark, sfDir)
          .agg(approx_count_distinct("user_id")).head()
      }
      time("q70 full") { noop(graft.SparkEntry.queries("q70_stream_asof")(spark, sfDir)) }
    }
    if (family == "q197") {
      warm(null, "q197_cms_stream", "q186_cms_audit")
      time("q197 full", 5) { noop(graft.SparkEntry.queries("q197_cms_stream")(spark, sfDir)) }
      time("q186 batch twin") { noop(graft.SparkEntry.queries("q186_cms_audit")(spark, sfDir)) }
    }
    if (family == "tail") {
      // the round-15 scaling block's sub-0.9 32c/8c tail (sketch/text
      // aggregations) PLUS the heavy-shuffle rows that an AQE-coalescing
      // policy change could regress — both sides of the trade in one run
      val qs = Seq(
        "q163_edit_neardup", "q166_edit_neardup_dual", "q167_ngram_novelty",
        "q168_hapax_contributors", "q169_term_salience",
        "q171_shingle_df_histogram", "q186_cms_audit", "q191_semdedup",
        "q204_semdedup_stratum", "q146_semantic_dedup", "q38_retrieval",
        "q176_weighted_jaccard", "q165_containment_pairs", "q24_ngram_jaccard",
        "q74_tfidf", "q103_lm_perplexity", "q164_pmi_collocations",
        "q148_ccnet_buckets", "q117_span_removal", "q190_bloom_decontam")
      qs.foreach { n =>
        try graft.SparkEntry.queries(n)(spark, "/root/testdata/sf0.001").count()
        catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
      qs.foreach { n =>
        time(n) { noop(graft.SparkEntry.queries(n)(spark, sfDir)) }
      }
    }
    if (family == "q38" || family == "all") {
      warm(null, "q38_retrieval")
      time("q38 buildIndex") {
        noop(graft.query.Retrieval.buildIndex(spark, sfDir))
      }
      time("q38 full") { noop(graft.SparkEntry.queries("q38_retrieval")(spark, sfDir)) }
    }
    spark.stop()
  }
}
