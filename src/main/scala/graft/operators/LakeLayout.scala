package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Zone-map (min/max statistics) pruning effectiveness under a given
    * file layout: derive a deterministic file assignment, compute each
    * file's value zone, and measure what a `value BETWEEN lo AND hi`
    * scan must actually read — files hit, rows scanned, rows matched,
    * and the scan amplification (rows scanned per row matched, ×100).
    * This is THE number that decides a clustering rewrite: parquet/
    * Iceberg/Delta skip a file iff its zone misses the predicate, so
    * prune_bp under the CURRENT layout vs a candidate clustered layout
    * is the rewrite's measured benefit, computed from one metadata-
    * sized aggregate per layout — never a dry-run scan. (Complements
    * `zorderStats`, which scores multi-column locality; this prices a
    * single-predicate scan in rows.)
    */
  def zoneMapEffect(df: DataFrame, layout: String, fileId: Column,
                    value: Column, lo: Long, hi: Long): DataFrame = {
    val perFile = df
      .select(fileId.cast("long").as("file_id"), value.cast("long").as("v"))
      .groupBy("file_id")
      .agg(count(lit(1)).as("rows"), min("v").as("min_v"), max("v").as("max_v"),
        sum(when(col("v").between(lo, hi), 1L).otherwise(0L)).as("n_match"))
      .withColumn("read", col("max_v") >= lo && col("min_v") <= hi)
    perFile.agg(
        count(lit(1)).as("n_files"),
        sum(when(col("read"), 1L).otherwise(0L)).as("files_read"),
        sum(when(col("read"), col("rows")).otherwise(0L)).as("rows_scanned"),
        sum(col("n_match")).as("rows_matched"))
      .select(lit(layout).as("layout"), col("n_files"), col("files_read"),
        col("rows_scanned"), col("rows_matched"),
        expr("(n_files - files_read) * 10000 div greatest(n_files, 1)")
          .as("prune_bp"),
        expr("rows_scanned * 100 div greatest(rows_matched, 1)")
          .as("amplification_x100"))
  }

  /** Registered form (q199): the clustering-benefit datasheet for a
    * `n_chars BETWEEN 220 AND 260` scan over documents, under (a) the
    * arrival layout — files cut by doc_id ranges, values scattered, so
    * zones are wide and nothing prunes — and (b) a value-clustered
    * layout — files cut by n_chars range (what a sorted/clustered
    * rewrite produces) with tight zones. Value-range file cuts, not
    * global-rank cuts: a clustered WRITE is a range partitioning, and
    * range cuts need no global row_number (the q140 single-reducer
    * rule).
    */
  def q199ZonemapPrune(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    zoneMapEffect(docs, "arrival", expr("doc_id div 64"),
        col("n_chars"), 220L, 260L)
      .unionByName(zoneMapEffect(docs, "clustered", expr("n_chars div 32"),
        col("n_chars"), 220L, 260L))
      .orderBy("layout")
  }

  /** Registered forms. */
  def q153CompactionPlan(spark: SparkSession, dir: String): DataFrame =
    compactionPlan(Tables.documents(spark, dir))

  def q154ZorderLayout(spark: SparkSession, dir: String): DataFrame =
    zorderStats(Tables.events(spark, dir))
}
