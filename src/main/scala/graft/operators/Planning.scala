package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Hash-partition imbalance histogram — the question `skewReport`'s
    * per-KEY view does not answer: after hashing, how uneven do the
    * actual SHUFFLE PARTITIONS land? A key column can be individually
    * cold yet collide into a hot bucket (or a hot key can dominate its
    * bucket outright); this measures the realized bucket loads at a
    * fixed partition count. Buckets come from the cross-engine md5
    * idiom (4 hex chars → mod P), a stand-in with the same uniformity
    * class as Spark's Murmur3 hashPartitioning — the DATASHEET is
    * engine-portable even though the exact bucket of a key is not the
    * runtime's. All arithmetic integer (basis points): imbalance_bp =
    * hottest bucket ÷ ideal uniform load (10000 = perfectly even;
    * ≥ 40000 is q155's salt threshold expressed at partition grain).
    * Scale: one (key-col, value) groupBy — map-side combined — then
    * |keys|-row re-aggregation to P·|cols| and 3·|cols| rows.
    */
  def partitionHistogram(df: DataFrame, keyed: Seq[(String, Column)],
                         parts: Int): DataFrame = {
    val kv = df.select(explode(array(keyed.map { case (name, c) =>
      struct(lit(name).as("kname"), c.cast("string").as("kval"))
    }: _*)).as("k")).select(col("k.kname").as("kname"), col("k.kval").as("kval"))
    val perKey = kv.groupBy("kname", "kval").agg(count(lit(1)).as("c"))
    val perBucket = perKey
      .withColumn("b",
        conv(substring(md5(col("kval")), 1, 4), 16, 10).cast("long") % parts)
      .groupBy("kname", "b").agg(sum("c").as("bc"))
      .groupBy("kname").agg(max("bc").as("max_bucket_rows"))
    val perCol = perKey.groupBy("kname")
      .agg(sum("c").as("n_rows"), count(lit(1)).as("n_keys"),
        max("c").as("top_key_rows"))
    perCol.join(perBucket, Seq("kname"))
      .select(col("kname").as("key_col"), col("n_rows"), col("n_keys"),
        col("top_key_rows"), col("max_bucket_rows"),
        expr(s"max_bucket_rows * $parts * 10000 div greatest(n_rows, 1)")
          .as("imbalance_bp"),
        expr("top_key_rows * 10000 div greatest(n_rows, 1)")
          .as("top_key_share_bp"))
      .orderBy("key_col")
  }

  /** Registered form: skew over the events table's natural shuffle keys. */
  def q155SkewReport(spark: SparkSession, dir: String): DataFrame =
    skewReport(Tables.events(spark, dir), Seq("event_type", "user_id"))

  /** Registered form (q192): the documents table's three candidate
    * shuffle keys at P=32 — the dedup fingerprint (near-unique →
    * expect ~uniform), source and lang (low-cardinality → a 20-value
    * key over 32 buckets is structurally imbalanced; the datasheet
    * quantifies by how much, which is exactly the number that says
    * "don't shuffle a 100 TB corpus by source").
    */
  def q192PartitionHistogram(spark: SparkSession, dir: String): DataFrame =
    partitionHistogram(Tables.widen(Tables.documents(spark, dir)), Seq(
      "fp" -> graft.dedup.Dedup.canonicalFingerprint(col("text")),
      "lang" -> col("lang"),
      "source" -> col("source")), 32)

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
