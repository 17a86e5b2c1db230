package graft.operators

import graft.SparkSpec

/** Invariants of the corpus-datasheet aggregates q188/q189 that the
  * value oracles can't express as identities: the Herfindahl/TTR
  * bounds (both live in (0, 10⁴]; H ≥ ⌊10⁴/n_types⌋, the uniform
  * lower bound), and the cross-source matrix's pair-count dominance
  * (k shared fingerprints imply ≥ k doc pairs, ordered pair keys).
  */
class CorpusMatrixSpec extends SparkSpec {

  test("q188: Herfindahl and TTR respect their integer bounds per source") {
    val rows = TextOps.q188VocabConcentration(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nTokens = r.getAs[Long]("n_tokens")
      val nTypes = r.getAs[Long]("n_types")
      val h = r.getAs[Long]("herfindahl_bp")
      val ttr = r.getAs[Long]("ttr_bp")
      assert(nTypes >= 1L && nTypes <= nTokens)
      // uniform distribution floors H at 10⁴/n_types; a single-token
      // vocabulary (n_types=1) reads exactly 10⁴
      assert(h >= 10000L / nTypes - 1 && h <= 10000L,
        s"${r.getString(0)}: H=$h outside [${10000L / nTypes - 1}, 10000]")
      assert(ttr >= 0L && ttr <= 10000L)
    }
  }

  test("q189: pair counts dominate fingerprint counts, keys ordered") {
    val rows = ScaleOps.q189CrossSourceDups(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1))
      val fps = r.getAs[Long]("n_shared_fps")
      val pairs = r.getAs[Long]("n_doc_pairs")
      assert(fps >= 1L && pairs >= fps,
        s"(${r.getString(0)},${r.getString(1)}): $pairs pairs < $fps shared fps")
    }
  }
}
