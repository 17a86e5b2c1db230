package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private lazy val out = Privacy.q101PiiMask(spark, sfDir).collect()

  test("pseudonymization: every record survives, tokens are stable and never the raw name") {
    val customers = spark.read.parquet(s"$sfDir/customer.parquet")
    assert(out.length == customers.count())
    val names = customers.select("c_custkey", "c_name").as[(Long, String)]
      .collect().toMap
    out.foreach { r =>
      val token = r.getAs[String]("name_token")
      assert(token.matches("[0-9a-f]{32}"), "token must be an md5 hex digest")
      assert(token != names(r.getAs[Long]("c_custkey")))
    }
    // stable across runs: same input → same token (join-compatible)
    val again = Privacy.q101PiiMask(spark, sfDir).collect()
      .map(r => r.getAs[Long]("c_custkey") -> r.getAs[String]("name_token")).toMap
    out.foreach(r => assert(
      again(r.getAs[Long]("c_custkey")) == r.getAs[String]("name_token")))
  }

  test("k-anonymity audit: k is the true equivalence-class size, suppress matches the threshold") {
    val classes = out.groupBy(r =>
      (r.getAs[String]("segment"), r.getAs[Long]("balance_band")))
    classes.foreach { case (_, members) =>
      val k = members.head.getAs[Long]("k_anon")
      assert(members.forall(_.getAs[Long]("k_anon") == k),
        "every member of a class must see the same k")
      assert(k == members.length.toLong, "k must be the actual class size")
      members.foreach(r =>
        assert(r.getAs[Boolean]("suppress") == (k < 10)))
    }
    assert(classes.map(_._2.length).sum == out.length)
  }

  test("generalization: balance band is the floor-1000 bucket, negatives included") {
    val byKey = out.map(r => r.getAs[Long]("c_custkey") -> r.getAs[Long]("balance_band")).toMap
    spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_acctbal").as[(Long, Double)].collect()
      .foreach { case (id, bal) =>
        assert(byKey(id) == (math.floor(bal / 1000.0) * 1000.0).toLong)
      }
  }
}
