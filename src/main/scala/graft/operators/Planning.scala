package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shuffle pre-flight planning — the two questions asked before any
  * 100 TB join or aggregation is launched: is the key skewed enough to
  * need salting (q47's mechanism), and how big is the join output going
  * to be. Both answers come from per-key COUNT tables — metadata-sized
  * aggregates (|distinct keys| rows), never the fact tables themselves —
  * so the planning pass costs one group-by per side, not a dry run of
  * the join.
  */
object Planning {

  /** Hot-key skew report for candidate shuffle keys: per key column,
    * the distinct-key count, row total, the hottest key's share, and
    * the max-over-mean skew ratio — all in exact integer arithmetic
    * (basis points / percent) so both engines agree to the digit. The
    * salting recommendation applies the operational rule of thumb: a
    * key whose hottest value exceeds 4× the mean partition load is the
    * straggler that AQE's skew-join cannot always split (aggregation
    * state, not join sides), so it gets a salt (cf. q47's salted
    * aggregation, which is the fix this report triggers).
    */
  def skewReport(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCols.map { k =>
      df.groupBy(col(k).cast("string").as("key"))
        .agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"))
        .select(lit(k).as("key_col"), col("n_keys"), col("n_rows"),
          col("max_cnt"),
          // greatest(..,1) guards the ANSI div against an empty input
          expr("max_cnt * 10000 div greatest(n_rows, 1)").as("top_share_bp"),
          expr("max_cnt * 100 div greatest(n_rows div greatest(n_keys, 1), 1)")
            .as("skew_x100"))
        .withColumn("salt_recommended", col("skew_x100") >= 400L)
    }.reduce(_ unionByName _).orderBy("key_col")

  /** Pre-flight equi-join cardinality: |A ⋈ B on k| = Σ_k n_A(k)·n_B(k),
    * computed EXACTLY from the two per-key count tables — the join of
    * counts is |matching keys| rows, so predicting a petabyte join's
    * output costs two scans and a key-sized join instead of the join
    * itself. (A real planner swaps the exact counts for CMS/HLL sketches
    * when even one pass is too much; the arithmetic is identical.)
    */
  def joinCardinality(a: DataFrame, aKey: String, b: DataFrame, bKey: String,
                      label: String): DataFrame = {
    val ca = a.groupBy(col(aKey).as("k")).agg(count(lit(1)).as("na"))
    val cb = b.groupBy(col(bKey).as("k")).agg(count(lit(1)).as("nb"))
    ca.join(cb, "k")
      .agg(count(lit(1)).as("n_matching_keys"),
        sum(col("na") * col("nb")).as("est_rows"))
      .select(lit(label).as("join_name"),
        coalesce(col("n_matching_keys"), lit(0L)).as("n_matching_keys"),
        coalesce(col("est_rows"), lit(0L)).as("est_rows"))
  }

  /** Registered form: skew over the events table's natural shuffle keys. */
  def q155SkewReport(spark: SparkSession, dir: String): DataFrame =
    skewReport(Tables.events(spark, dir), Seq("event_type", "user_id"))

  /** Registered form: the three joins the relational family actually
    * runs, predicted from count tables; `orderBy` for a stable contract.
    */
  def q156JoinCardinality(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    Seq(
      joinCardinality(Tables.orders(spark, dir), "o_orderkey",
        Tables.lineitem(spark, dir), "l_orderkey", "orders_lineitem"),
      joinCardinality(Tables.customer(spark, dir), "c_custkey",
        Tables.orders(spark, dir), "o_custkey", "customer_orders"),
      joinCardinality(
        e.filter(col("event_type") === "purchase"), "user_id",
        e.filter(col("event_type") === "signup"), "user_id",
        "purchases_signups"))
      .reduce(_ unionByName _).orderBy("join_name")
  }
}
