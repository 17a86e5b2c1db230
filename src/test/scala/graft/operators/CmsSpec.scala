package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Count-Min guarantees behind q186, asserted for EVERY token (the
  * oracle row only tracks the top-20): estimates never undercount, the
  * sketch built from disjoint corpus halves merges by plain addition
  * into the full-corpus sketch (the property that makes it a streaming
  * /cross-shard sketch at all), and the layout is d·w-bounded.
  */
class CmsSpec extends SparkSpec {

  private val d = 4

  private lazy val words = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"),
      explode(split(lower(trim(col("text"))), "\\s+")).as("w"))
    .filter(col("w") =!= "")

  test("CMS never undercounts: est ≥ exact for every distinct token") {
    val audit = TextOps.q186CmsAudit(spark, sfDir).collect()
    assert(audit.length === 20)
    audit.foreach { r =>
      assert(r.getAs[Long]("overcount") >= 0L,
        s"token ${r.getAs[String]("word")} undercounted")
    }
    // beyond the audited top-20: join EVERY token's exact count to its
    // min-bucket estimate
    val sketch = TextOps.countMinSketch(words.select("w"), "w", d)
    val exact = words.groupBy("w").agg(count(lit(1)).as("cnt"))
    val jb = (1 to d).map { j =>
      struct(lit(j).as("j"),
        conv(substring(md5(concat(lit(s"cms$j:"), col("w"))), 1, 2), 16, 10)
          .cast("int").as("b"))
    }
    val under = exact
      .select(col("w"), col("cnt"), explode(array(jb: _*)).as("jb"))
      .join(sketch, col("jb.j") === col("j") && col("jb.b") === col("b"))
      .groupBy("w", "cnt").agg(min("c").as("est"))
      .filter(col("est") < col("cnt"))
    assert(under.count() === 0L, "CMS undercounted at least one token")
  }

  test("sketches over disjoint halves merge by addition into the full sketch") {
    val full = TextOps.countMinSketch(words.select("w"), "w", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val even = TextOps.countMinSketch(
      words.filter(col("doc_id") % 2 === 0).select("w"), "w", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val odd = TextOps.countMinSketch(
      words.filter(col("doc_id") % 2 === 1).select("w"), "w", d)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val merged = (even.keySet ++ odd.keySet).map { k =>
      k -> (even.getOrElse(k, 0L) + odd.getOrElse(k, 0L))
    }.toMap
    assert(merged === full, "half-sketch sum diverged from the full sketch")
  }

  test("sketch size is d·w-bounded regardless of vocabulary") {
    val sketch = TextOps.countMinSketch(words.select("w"), "w", d)
    assert(sketch.count() <= d.toLong * 256L)
    val rows = sketch.select("j", "b").collect()
    rows.foreach { r =>
      assert(r.getInt(0) >= 1 && r.getInt(0) <= d)
      assert(r.getInt(1) >= 0 && r.getInt(1) < 256)
    }
  }
}
