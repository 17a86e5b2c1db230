package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Internal-consistency contracts of the τ-sweep: the curve must be
  * monotone (tighter τ ⇒ fewer pairs, fewer drops), each row must
  * agree EXACTLY with an independent single-threshold `jaccardPairs`
  * run at that τ (the sweep is an optimization, not a new semantics),
  * and drops are bounded by pairs.
  */
class YieldCurveSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val curve = Dedup.dedupYieldCurve(docs, "doc_id", "text")
    .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))

  test("pair and drop counts are monotone non-increasing in τ") {
    val byTau = curve.sortBy(_._1)
    byTau.sliding(2).foreach { case Array((t1, p1, d1), (t2, p2, d2)) =>
      assert(p2 <= p1, s"n_pairs rose from τ=$t1 ($p1) to τ=$t2 ($p2)")
      assert(d2 <= d1, s"drops rose from τ=$t1 ($d1) to τ=$t2 ($d2)")
    }
  }

  test("each sweep row equals an independent jaccardPairs run at that τ") {
    curve.foreach { case (tauBp, nPairs, nDropped) =>
      val solo = Dedup.jaccardPairs(docs, "doc_id", "text", 3, tauBp / 10000.0)
      assert(solo.count() === nPairs, s"pair count mismatch at τ_bp=$tauBp")
      assert(solo.select("doc_b").distinct().count() === nDropped,
        s"drop count mismatch at τ_bp=$tauBp")
    }
  }

  test("drops never exceed pairs; empty threshold list refused") {
    curve.foreach { case (t, p, d) =>
      assert(d <= p, s"τ_bp=$t dropped $d docs from only $p pairs")
    }
    val ex = intercept[IllegalArgumentException] {
      Dedup.dedupYieldCurve(docs, "doc_id", "text", 3, Seq.empty)
    }
    assert(ex.getMessage.contains("empty threshold list"))
  }
}
