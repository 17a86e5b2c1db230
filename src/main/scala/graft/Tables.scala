package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated fixture tables (TESTDATA.md).
  *
  * Every table is one parquet file under `sfDir`. At 100 TB these would be
  * directory-partitioned datasets; the reader API is the same — callers never
  * hard-code paths, so swapping `sfDir` for a partitioned lake root is a
  * one-line change.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "lineitem")
  /** The events `ts` column has shipped in two physical layouts across
    * testdata generations: parquet TIMESTAMP(NANOS), which Spark reads only
    * as a nanos LONG under `spark.sql.legacy.parquet.nanosAsLong`, and plain
    * TIMESTAMP(MICROS), which reads natively as TIMESTAMP_NTZ. All event
    * readers branch on the READ schema so the library works against either
    * lake layout with no session-flag dance (the legacy conf stays harmless
    * when set — it only affects NANOS columns). Under the UTC session
    * timezone every entrypoint sets, the NTZ→TZ cast is value-preserving.
    * Integer `div` throughout: ns epochs overflow double precision.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    tsToMicros(try apply(spark, dir, "events") catch {
      // Spark's raw schema-conversion error never names the fix; keep
      // the actionable message the old fail-fast guard carried
      case e: Throwable if String.valueOf(e.getMessage).contains("TIMESTAMP(NANOS") =>
        throw new IllegalStateException(
          "events.ts is parquet TIMESTAMP(NANOS), which this session " +
            "cannot read natively — set " +
            "spark.sql.legacy.parquet.nanosAsLong=true on the " +
            "SparkSession builder (the reader then adapts automatically)", e)
    })

  /** Normalize `ts` to a µs-precision TIMESTAMP, whatever the physical
    * layout (nanos-as-long legacy read, TIMESTAMP_NTZ native read, or
    * already a TIMESTAMP).
    */
  def tsToMicros(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }

  /** Epoch seconds of `ts` as a LONG column (floor — the whole-second
    * semantics the q50/q63 twins and their DuckDB oracles use), layout-
    * adaptive like [[tsToMicros]]. FLOOR division, not SQL `div`
    * (which truncates toward zero): a pre-1970 instant like
    * 1969-12-31T23:59:59.5Z must land in second -1, exactly as
    * `unix_timestamp` (Math.floorDiv) and DuckDB's `epoch()` place it
    * — truncation would silently disagree with the batch twins on any
    * pre-epoch event.
    */
  def tsEpochSeconds(df: DataFrame): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.expr
    def floorDiv(x: String, d: Long) =
      expr(s"($x div $d) - (CASE WHEN $x % $d < 0 THEN 1 ELSE 0 END)")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => floorDiv("ts", 1000000000L)
      case _ => floorDiv("unix_micros(cast(ts as timestamp))", 1000000L)
    }
  }

  /** Normalize `ts` to a whole-second TIMESTAMP (see [[tsEpochSeconds]]). */
  def tsToSeconds(df: DataFrame): DataFrame =
    df.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_seconds(tsEpochSeconds(df)))
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Ensure a DataFrame entering CPU-heavy narrow work (per-row embedding,
    * shingling, signature UDFs) has at least the session's default
    * parallelism. The single-file fixtures arrive as ONE parquet split, so
    * without this the whole per-row pipeline runs on one core (measured:
    * 26 s → 5 s on the sign-LSH signature stage). On a real many-file
    * lake the input already has the splits and this is a no-op — the
    * repartition only fires on pathologically under-split sources.
    */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}
