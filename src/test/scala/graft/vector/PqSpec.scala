package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the PQ/ADC recall floors the Pq Scaladoc documents (round-10
  * ADVICE: the floors were claimed but unenforced), the misuse guards,
  * and the two-stage composition's recovery of exact results.
  * Recall here = |ADC top-k ∩ exact cosine top-k| / (|queries|·k),
  * measured on the sf0.001 fixture with the q172 model (m=4, ksub=8,
  * 2 Lloyd rounds) — the near-isotropic synthetic fixture is PQ's
  * WORST case (no cluster structure for 32-bit codes to exploit), so
  * these floors are the honest lower bound, not a showcase. Measured
  * here: ADC top-5 = 0.16, shortlist-50 = 0.64 (sf0.01 runs higher,
  * ≈0.22/≈0.72); floors sit one bucket below the measured point.
  */
class PqSpec extends SparkSpec {

  private lazy val e = graft.Tables.embeddings(spark, sfDir)
  private lazy val queries = e.filter(col("vec_id") < 10)
  private lazy val corpus = e.filter(col("vec_id") >= 10)
  private lazy val model = Pq.pqTrain(e, "vec_id", "embedding", 4, 8, 2)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactTop5 =
    pairs(VectorOps.knnBrute(queries, corpus, "vec_id", "vec_id", "embedding", 5))

  test("ADC top-5 point recall holds the documented floor (0.16 measured isotropic)") {
    val codes = Pq.pqEncode(corpus, "vec_id", "embedding", model)
    val adc = pairs(Pq.pqTopK(queries, codes, "vec_id", "embedding", model, 5))
    val recall = (adc & exactTop5).size.toDouble / exactTop5.size
    assert(recall >= 0.14, f"ADC top-5 recall $recall%.3f below documented floor 0.14")
  }

  test("shortlist-50 recall of the exact top-5 holds the documented floor (0.64 measured)") {
    val codes = Pq.pqEncode(corpus, "vec_id", "embedding", model)
    val short = pairs(Pq.pqTopK(queries, codes, "vec_id", "embedding", model, 50))
    val recall = (short & exactTop5).size.toDouble / exactTop5.size
    assert(recall >= 0.60, f"shortlist-50 recall $recall%.3f below documented floor 0.60")
  }

  test("two-stage (PQ shortlist → exact re-rank) recall ≥ raw ADC recall") {
    val codes = Pq.pqEncode(corpus, "vec_id", "embedding", model)
    val adc = pairs(Pq.pqTopK(queries, codes, "vec_id", "embedding", model, 5))
    val two = pairs(Pq.pqShortlistRerank(queries, corpus,
      "vec_id", "vec_id", "embedding", model, 50, 5))
    val rAdc = (adc & exactTop5).size.toDouble / exactTop5.size
    val rTwo = (two & exactTop5).size.toDouble / exactTop5.size
    assert(rTwo >= rAdc,
      f"re-rank recall $rTwo%.3f must not fall below raw ADC $rAdc%.3f")
    // every two-stage hit must come FROM the shortlist and carry the
    // exact cosine ordering semantics within it
    val short = pairs(Pq.pqTopK(queries, codes, "vec_id", "embedding", model, 50))
    assert(two.subsetOf(short), "re-ranked results must be shortlist members")
  }

  test("fused pqTrain ≡ m independent kmeansTrain runs (codebook equality)") {
    // the fused single-pass-per-iteration trainer must reproduce the
    // per-subspace Lloyd runs EXACTLY — seeds, 6-dp argmin, 9-dp
    // recenters; any drift in the fused path fails here bit-for-bit
    val dsub = model.dsub
    for (s <- 0 until model.m) {
      val sub = e.select(col("vec_id").cast("long").as("id"),
        slice(col("embedding").cast("array<double>"), s * dsub + 1, dsub).as("sub"))
      val ref = VectorOps.kmeansTrain(sub, "id", "sub", 8, 2)
      assert(model.books(s).toSeq === ref.toSeq,
        s"subspace $s codebook diverged from the literal kmeansTrain run")
    }
  }

  test("pqTopK refuses an empty codebook with a clear message") {
    val broken = Pq.PqModel(2, 32, Array(Array((0, Vector.fill(32)(0.0))), Array.empty))
    val ex = intercept[IllegalArgumentException] {
      Pq.pqTopK(queries, queries.limit(0), "vec_id", "embedding", broken, 5)
    }
    assert(ex.getMessage.contains("empty codebook"))
  }

  test("pqTrain rejects a dimension not divisible into m subspaces") {
    val ex = intercept[IllegalArgumentException] {
      Pq.pqTrain(e, "vec_id", "embedding", 7, 8, 1)
    }
    assert(ex.getMessage.contains("not divisible"))
  }
}
