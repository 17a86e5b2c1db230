package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic main (NOT a spec): dump `.explain("formatted")` for a
  * list of registered queries to files — the before/after plan evidence
  * for optimization rounds (plans/rNN/<query>_{before,after}.txt).
  *
  * Run: sbt "Test/runMain graft.tools.PlanDump <outDir> <suffix> q1,q2,..."
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: PlanDump <outDir> <suffix> <q1,q2,...>")
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    java.nio.file.Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-plan-dump")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    // component frames whose optimization is invisible in the final
    // registered-query plan (eagerly-executed intermediates behind
    // localCheckpoint/persist): "_edges" is the shared-line edge list
    // all six graph queries derive; "_edges_r14" reconstructs the
    // round-14 derivation VERBATIM from the still-present primitives
    // (explode → frame-level distinct → true-count BoundedCollect), so
    // the exchange-count diff is dumpable without rebuilding the old
    // tree.
    def componentFrame(name: String): Option[org.apache.spark.sql.DataFrame] = {
      val docs = graft.Tables.documents(spark, sfDir)
      name match {
        case "_edges" => Some(graft.operators.Graph.lineGraphEdgesOf(docs))
        case "_edges_r14" =>
          val maxDf = 5
          val docLines = docs
            .select(col("doc_id"),
              explode(graft.text.Chunker.wordChunks(col("text"), 5)).as("line"))
            .distinct()
          val postings = docLines
            .groupBy("line")
            .agg(graft.functions.BoundedCollect.collect(maxDf + 1)(
              col("doc_id"), lit(0)).as("bc"))
            .filter(col("bc._2").between(2, maxDf))
            .select(transform(col("bc._1"), x => x.getField("_1")).as("ids"))
          val pairs = postings
            .select(explode(expr(
              "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p.a < p.b)")).as("p"))
            .select(col("p.a").as("a"), col("p.b").as("b"))
            .distinct()
          Some(pairs.select(col("a").as("src"), col("b").as("dst"))
            .union(pairs.select(col("b").as("src"), col("a").as("dst"))))
        case _ => None
      }
    }
    names.foreach { name =>
      val df = componentFrame(name).getOrElse {
        val fn = graft.SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name"))
        fn(spark, sfDir)
      }
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote ${name}_$suffix.txt (${plan.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
