package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Write-side lake-layout PLANNING: small-file compaction grouping and
  * Z-order clustering quality, as queries over table metadata. At 100 TB
  * the scan plans are only half the story — whether those scans can skip
  * files at all is decided when the data is WRITTEN. The physical levers
  * already exist in-repo (`Ingest.compactLake` rewrites a lake;
  * `pipeline.Layout.zValue` is the Morton sort key, with PlanShapeSpec
  * proving the row-group skipping it buys on written files); these
  * operators are the planning/measurement step that DECIDES those
  * rewrites. The manifests they consume are metadata — millions of rows
  * for a 100 TB lake, never the data itself — so every plan here is
  * metadata-sized by construction.
  */
object LakeLayout {

  /** Small-file compaction plan — greedy size-ordered running-sum binning,
    * the grouping discipline behind lake OPTIMIZE/rewrite jobs: within
    * each table partition, order files largest-first and cut bins every
    * `targetBytes` of cumulative size, so every bin but the last lands
    * within one file-size target of it. Running-sum binning is the
    * standard compaction grouping (first-fit-decreasing's gain over it is
    * marginal on heavy-tailed file sizes and it needs a sequential fold;
    * the window form is one exchange + one per-partition sort, identical
    * in Spark and the oracle).
    *
    * The fixture has no physical file manifest, so one is derived
    * deterministically: documents land in 64 "files" per source by id
    * modulus (engine-independent, so the oracle reproduces the exact
    * manifest) and a file's bytes are the sum of its docs' `n_chars` —
    * the many-small-files shape a month of append micro-batches leaves
    * behind.
    */
  def compactionPlan(docs: DataFrame, targetBytes: Long = 16384L,
                     filesPerSource: Int = 64): DataFrame = {
    val manifest = docs
      .groupBy(col("source"), pmod(col("doc_id"), lit(filesPerSource)).as("file_id"))
      .agg(sum("n_chars").as("bytes"))
    val order = Window.partitionBy("source")
      .orderBy(col("bytes").desc, col("file_id").asc)
    manifest
      .withColumn("cum_before",
        coalesce(sum("bytes").over(order.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${targetBytes}L"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum("bytes").as("bin_bytes"))
      .orderBy("source", "bin")
  }

  /** Z-order layout quality vs a row-major (single-column) sort — the
    * measurement that justifies clustering a table on interleaved bits:
    * per-file min/max spans of BOTH dimensions, summed per layout.
    *
    * Events map to a 256×256 grid (user bucket × hour-of-epoch bucket);
    * the z-value interleaves the two 8-bit coordinates (an 8-term shift/
    * mask column expression — no UDF), files are `fileZ` consecutive
    * z-codes, and the row-major baseline cuts the same number of files
    * along `x*256+y` order. A file's skip range for a predicate on
    * dimension d is its [min_d, max_d]: row-major files are tight on x
    * and span ~the full y range (a y-predicate scans every file), while
    * z-order files stay narrow on BOTH axes — that per-file span sum IS
    * the expected fraction of the table a min/max-pruned point query
    * must read, which is why the measurement, not taste, picks the
    * layout. All-integer output (spans, file counts) for exact oracle
    * parity.
    */
  def zorderStats(events: DataFrame): DataFrame = {
    // layout-adaptive epoch seconds (Tables.tsEpochSeconds handles the
    // nanos-long / NTZ / timestamp physical layouts identically);
    // integer div + pmod keep every step in exact long arithmetic
    val coords = events
      .select(pmod(col("user_id"), lit(256)).cast("long").as("x"),
        Tables.tsEpochSeconds(events).as("tss"))
      .select(col("x"), expr("pmod(tss div 3600, 256)").as("y"))
      .withColumn("z", graft.pipeline.Layout.zValue(col("x"), col("y"), 8))
    // 64 files per layout: 65536 cells / 1024 cells per file
    val zFiles = coords.withColumn("file", expr("z div 1024"))
      .withColumn("layout", lit("zorder"))
    val rowMajor = coords.withColumn("file", expr("(x * 256 + y) div 1024"))
      .withColumn("layout", lit("rowmajor"))
    zFiles.unionByName(rowMajor)
      .groupBy("layout", "file")
      .agg(min("x").as("min_x"), max("x").as("max_x"),
        min("y").as("min_y"), max("y").as("max_y"))
      .groupBy("layout")
      .agg(count(lit(1)).as("n_files"),
        sum(col("max_x") - col("min_x") + 1).as("sum_x_span"),
        sum(col("max_y") - col("min_y") + 1).as("sum_y_span"))
      .orderBy("layout")
  }

  /** Registered forms. */
  def q153CompactionPlan(spark: SparkSession, dir: String): DataFrame =
    compactionPlan(Tables.documents(spark, dir))

  def q154ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    zorderStats(Tables.events(spark, dir))
}
