package graft.dedup

import graft.{SparkSpec, Tables}

/** The dual-pass blocked edit-distance dedup's recall contract
  * (round-9 verdict item 4): a near-dup pair whose edit sits INSIDE the
  * first `blockTokens` words is invisible to the single first-key pass
  * (the edit moves the record to a different block) but is recovered by
  * the last-tokens pass — and the dual output is a strict superset of
  * the single pass on such a fixture, never dropping a single-pass pair.
  */
class EditDualSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("dual pass recovers head-edited near-dups the single pass misses") {
    import spark.implicits._
    val tail = "shared middle body of the record ends exactly alike here"
    val docs = Seq(
      // head-edited pair: first token differs (single pass blocks them
      // apart), tails identical (last-tokens pass blocks them together),
      // levenshtein("alpha...", "alphq...") = 1 <= 20
      (1L, s"alpha beta gamma $tail"),
      (2L, s"alphq beta gamma $tail"),
      // control pair for the first pass: identical heads, small tail edit
      (3L, s"delta epsilon zeta $tail one"),
      (4L, s"delta epsilon zeta $tail two"),
      // unrelated singleton
      (5L, "completely different text with nothing in common whatsoever")
    ).toDF("doc_id", "text")

    val single = pairs(Dedup.editBlockedPairs(docs, "doc_id", "text"))
    val dual = pairs(Dedup.editBlockedPairsDual(docs, "doc_id", "text"))

    assert(single.exists(p => p._1 == 3L && p._2 == 4L),
      "control pair must be found by the first-key pass")
    assert(!single.exists(p => p._1 == 1L && p._2 == 2L),
      "head-edited pair must be OUT of the single pass's contract")
    assert(dual.exists(p => p._1 == 1L && p._2 == 2L),
      "last-tokens pass must recover the head-edited pair")
    assert(single.subsetOf(dual), "dual must be a strict superset")
    assert(dual.size > single.size)
  }

  test("q166 on the fixture is a superset of q163 with identical lev values") {
    val single = pairs(graft.operators.ScaleOps.q163EditNeardup(spark, sfDir))
    val dual = pairs(graft.operators.ScaleOps.q166EditNeardupDual(spark, sfDir))
    assert(single.subsetOf(dual),
      s"q166 must contain every q163 pair; missing: ${(single -- dual).take(5)}")
  }

  test("dual pass equals single pass when blocks agree (same-head fixture)") {
    // documents table at sf0.001: also sanity-check determinism — two
    // invocations produce identical sets (BoundedCollect cap order and
    // the distinct are deterministic)
    val docs = Tables.documents(spark, sfDir)
    val a = pairs(Dedup.editBlockedPairsDual(docs, "doc_id", "text"))
    val b = pairs(Dedup.editBlockedPairsDual(docs, "doc_id", "text"))
    assert(a == b)
  }
}
