package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Driver-contract invariants. */
class EntrySpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("all registered queries return rows on sf0.001") {
    val empty = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      if (n == 0) Some(name) else None
    }
    assert(empty.isEmpty, s"empty results: $empty")
  }

  test("multimodal stub decode is deterministic and schema-stable") {
    val d1 = Multimodal.decode(Multimodal.mediaTable(spark, sfDir))
    val d2 = Multimodal.decode(Multimodal.mediaTable(spark, sfDir))
    assert(d1.schema == d2.schema)
    assert(d1.orderBy("doc_id").collect().toSeq == d2.orderBy("doc_id").collect().toSeq)
    val r = Multimodal.withResizePlan(d1).filter(col("media_type") === "image").head()
    assert(r.getAs[Int]("out_w") <= 256 && r.getAs[Int]("out_h") <= 256)
  }
}
