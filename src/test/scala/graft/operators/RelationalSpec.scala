package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins for the data-contract audit (q128): the checks must actually
  * fire on violations (a green audit that can't go red is decoration),
  * and the fixture must come back clean.
  */
class RelationalSpec extends SparkSpec {

  test("contract checks fire on a corrupted fixture with exact violation counts") {
    import spark.implicits._
    val bad = Seq(
      (1L, "ok"), (1L, "dup key"),      // one duplicate id
      (2L, null.asInstanceOf[String]),  // one null text
      (3L, "   "),                      // one blank text
      (4L, "fine")
    ).toDF("doc_id", "text")
    val out = Relational.contractChecks("bad", bad,
        "unique_doc_id" -> (count(lit(1)) - countDistinct(col("doc_id"))),
        "nonempty_text" ->
          sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L)
            .otherwise(0L)))
      .collect().map(r => r.getAs[String]("check_name") -> r.getAs[Long]("n_violations"))
      .toMap
    assert(out == Map("unique_doc_id" -> 1L, "nonempty_text" -> 2L))
  }

  test("q128: one row per declared check, fixture passes every contract") {
    val rows = Relational.q128DataContract(spark, sfDir).collect()
      .map(r => (r.getAs[String]("table_name"), r.getAs[String]("check_name"),
        r.getAs[Long]("n_violations"), r.getAs[Boolean]("pass")))
    assert(rows.length == 10, "exactly the declared checks, once each")
    assert(rows.map(r => (r._1, r._2)).distinct.length == rows.length)
    rows.foreach { case (t, c, n, p) =>
      assert(p && n == 0L, s"fixture violates contract $t.$c ($n rows)")
    }
  }
}
