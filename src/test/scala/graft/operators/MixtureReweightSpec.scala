package graft.operators

import graft.SparkSpec

/** Pins mixtureReweight's KL math and normalization: a source that
  * mirrors the corpus mixture has KL 0 and keeps its token share; a
  * divergent source is up-weighted at its expense; weights stay a
  * (rounded) distribution.
  */
class MixtureReweightSpec extends SparkSpec {

  private def weights(rows: Seq[(String, String)]): Map[String, (Long, Double, Long)] = {
    import spark.implicits._
    CurationOps.mixtureReweight(rows.toDF("source", "text"), "source", "text")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3))))
      .toMap
  }

  test("identical distributions → KL 0, weights = token shares") {
    val m = weights(Seq(("a", "x x y"), ("b", "x x y x x y")))
    assert(m("a")._2 === 0.0 && m("b")._2 === 0.0)
    // shares 3/9 and 6/9 → 3333 / 6667 bp
    assert(m("a")._3 === 3333L)
    assert(m("b")._3 === 6667L)
  }

  test("a divergent source is up-weighted above its token share") {
    // source c's tokens are unique to it → KL(c ‖ corpus) = ln(T/T_c) > 0
    val m = weights(Seq(("a", "x y x y"), ("b", "x y x y"), ("c", "q r q r")))
    assert(m("c")._2 > 0.0, s"disjoint source must have positive KL: ${m("c")}")
    assert(m("c")._3 > 3334L, s"divergent source must beat its 1/3 share: ${m("c")}")
    assert(m("a")._3 === m("b")._3, "symmetric sources must tie")
  }

  test("weights are a distribution (Σ ≈ 10000 bp) and KL is non-negative") {
    val m = weights(Seq(("a", "x y z w"), ("b", "x x x x y"), ("c", "z z q")))
    assert(m.values.forall(_._2 >= 0.0), s"negative KL: $m")
    val s = m.values.map(_._3).sum
    assert(math.abs(s - 10000L) <= m.size, s"weight_bp sum $s off distribution")
  }

  test("n_tokens is the per-source token count") {
    val m = weights(Seq(("a", "x y z"), ("b", "x x")))
    assert(m("a")._1 === 3L && m("b")._1 === 2L)
  }
}
