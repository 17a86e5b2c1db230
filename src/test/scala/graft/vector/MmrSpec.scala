package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins mmrRerank's greedy semantics on hand-computed geometry plus
  * structural invariants on the fixture (first pick = pure top-1,
  * picks distinct, picks ⊆ candidate shortlist).
  */
class MmrSpec extends SparkSpec {

  private def run(queries: Seq[(Long, Seq[Double])], corpus: Seq[(Long, Seq[Double])],
                  kCand: Int, k: Int, lambda: Double) = {
    import spark.implicits._
    VectorOps.mmrRerank(queries.toDF("vec_id", "embedding"),
        corpus.toDF("vec_id", "embedding"),
        "vec_id", "vec_id", "embedding", kCand, k, lambda)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
  }

  test("diversifies: the near-duplicate of pick 1 loses to a diverse candidate") {
    // q is NOT identical to any candidate (rel and pairwise sim must
    // decouple — with q ≡ pick 1, rel(c) = sim(pick1, c) and λ=0.5 ties
    // every step-2 score at 0). corpus 10 ≈ corpus 11 (sim ≈ 1.0 ≫
    // their rels), corpus 12 diverse. λ=0.5 step 2: cand 11 scores
    // 0.5·0.9926 − 0.5·0.9999 < 0; cand 12 scores 0.5·0.7071 −
    // 0.5·0.6247 > 0 → the diverse candidate wins.
    val q = Seq((0L, Seq(1.0, 0.0, 0.0)))
    val c = Seq(
      (10L, Seq(0.9, 0.1, 0.0)),   // rel ≈ 0.9939 (top-1)
      (11L, Seq(0.9, 0.11, 0.0)),  // rel ≈ 0.9926, sim(10,11) ≈ 0.9999
      (12L, Seq(0.5, -0.5, 0.0)))  // rel ≈ 0.7071, sim(10,12) ≈ 0.6247
    val out = run(q, c, 3, 3, 0.5)
    assert(out.map(_._3).toSeq === Seq(10L, 12L, 11L),
      s"expected diversity order 10,12,11 — got ${out.toSeq}")
    val s12 = out.find(_._3 == 12L).get._4
    val s11 = out.find(_._3 == 11L).get._4
    assert(s12 > 0.0 && s11 < s12,
      s"diverse pick must outscore the duplicate ($s12 vs $s11)")
  }

  test("first pick is the pure relevance top-1 with penalty 0") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val mmr = VectorOps.mmrRerank(queries, corpus, "vec_id", "vec_id", "embedding", 20, 5, 0.7)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val top1 = VectorOps.knnBrute(queries, corpus, "vec_id", "vec_id", "embedding", 1)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3))).toSeq
    for ((qid, nid, rel) <- top1) {
      val first = mmr.find(p => p._1 == qid && p._2 == 1).get
      assert(first._3 === nid, s"q$qid first pick ${first._3} != relevance top-1 $nid")
      assert(first._4 === math.floor(0.7 * rel * 10000.0 + 0.5) / 10000.0,
        s"q$qid first score must be floor4(0.7·rel)")
    }
  }

  test("picks are distinct and drawn from the candidate shortlist") {
    val e = graft.Tables.embeddings(spark, sfDir)
    val queries = e.filter(col("vec_id") < 10)
    val corpus = e.filter(col("vec_id") >= 10)
    val mmr = VectorOps.mmrRerank(queries, corpus, "vec_id", "vec_id", "embedding", 20, 5, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val short = VectorOps.knnBrute(queries, corpus, "vec_id", "vec_id", "embedding", 20)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(mmr.length === mmr.distinct.length, "duplicate picks")
    assert(mmr.forall(short.contains), "pick outside the top-kCand shortlist")
  }
}
