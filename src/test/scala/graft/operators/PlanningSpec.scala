package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PlanningSpec extends SparkSpec {

  test("skew report computes exact hot-key stats and trips the salting rule at 4x mean") {
    import spark.implicits._
    // key 'hot' holds 80 of 100 rows over 21 keys: mean load 4,
    // max 80 => skew 20x (2000 x100) => salt; 'even' is flat => no salt
    val df = ((1 to 80).map(_ => ("hot", 1L)) ++ (1 to 20).map(i => (s"k$i", 1L)))
      .toDF("skewed", "v")
      .withColumn("even", monotonically_increasing_id() % 10)
    val rep = Planning.skewReport(df, Seq("skewed", "even"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6))).toMap
    assert(rep("skewed") == (21L, 100L, 80L, 8000L, 2000L, true))
    assert(rep("even") == (10L, 100L, 10L, 1000L, 100L, false))
  }

  test("join cardinality prediction equals the materialized join's row count") {
    import spark.implicits._
    val a = Seq(1L, 1L, 1L, 2L, 3L).toDF("k").withColumn("pa", lit("a"))
    val b = Seq(1L, 1L, 2L, 4L).toDF("k").withColumn("pb", lit("b"))
    val pred = Planning.joinCardinality(a, "k", b, "k", "t").head()
    val actual = a.join(b, "k").count()
    assert(pred.getLong(2) == actual && actual == 7L) // 3*2 + 1*1
    assert(pred.getLong(1) == 2L)
    // disjoint keys: an honest all-zero row, not an empty frame
    val none = Planning.joinCardinality(
      a, "k", Seq(9L).toDF("k"), "k", "none").head()
    assert(none.getLong(1) == 0L && none.getLong(2) == 0L)
  }

  test("q156 predictions match the actual joins on the fixture") {
    val got = Planning.q156JoinCardinality(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val ol = graft.Tables.orders(spark, sfDir)
      .join(graft.Tables.lineitem(spark, sfDir),
        col("o_orderkey") === col("l_orderkey")).count()
    val co = graft.Tables.customer(spark, sfDir)
      .join(graft.Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey")).count()
    assert(got("orders_lineitem") == ol)
    assert(got("customer_orders") == co)
  }

  test("partitionHistogram: constant key = structural worst case") {
    import spark.implicits._
    // one key value → everything lands in one bucket: imbalance is the
    // full fan-in P×10⁴, top-key share the whole table
    val df = (1 to 96).map(i => ("only", i)).toDF("k", "x")
    val row = Planning.partitionHistogram(df, Seq("k" -> col("k")), 32).head()
    assert(row.getAs[Long]("n_rows") === 96L)
    assert(row.getAs[Long]("n_keys") === 1L)
    assert(row.getAs[Long]("max_bucket_rows") === 96L)
    assert(row.getAs[Long]("imbalance_bp") === 320000L)
    assert(row.getAs[Long]("top_key_share_bp") === 10000L)
  }

  test("partitionHistogram: near-unique key approaches uniform load") {
    import spark.implicits._
    val df = (1 to 4096).map(i => (s"id-$i", i)).toDF("k", "x")
    val row = Planning.partitionHistogram(df, Seq("k" -> col("k")), 32).head()
    assert(row.getAs[Long]("n_keys") === 4096L)
    // ideal load 128/bucket; md5 uniformity keeps the hottest bucket
    // within ~±30% of ideal at this N (binomial tail ≪ 1e-6 beyond)
    val imb = row.getAs[Long]("imbalance_bp")
    assert(imb >= 10000L && imb < 13500L, s"imbalance_bp=$imb")
  }

  test("q192 row invariants on the fixture: fp uniform, source/lang hot") {
    val rows = Planning.q192PartitionHistogram(spark, sfDir).collect()
      .map(r => r.getAs[String]("key_col") -> r).toMap
    assert(rows.keySet === Set("fp", "lang", "source"))
    // the near-unique fingerprint shuffles FAR more evenly than the
    // 5-value lang key — the exact decision the datasheet exists for
    assert(rows("fp").getAs[Long]("imbalance_bp")
      < rows("lang").getAs[Long]("imbalance_bp"))
    assert(rows("lang").getAs[Long]("n_keys") <= 8L)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("imbalance_bp") >= 10000L)
      assert(r.getAs[Long]("top_key_share_bp") <= 10000L)
    }
  }
}
