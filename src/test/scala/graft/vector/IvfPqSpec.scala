package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** IVF-PQ invariants the q183 oracle can't see from the outside:
  * the residual decomposition is exact, probing is honest (results
  * only ever come from probed cells, and recall is monotone in
  * nProbe), and the index layout is deterministic across runs.
  * Floors measured on the sf0.001 fixture with the q183 config
  * (kCoarse=4×2 rounds, residual PQ m=4/ksub=8×2 rounds).
  */
class IvfPqSpec extends SparkSpec {

  private lazy val e = graft.Tables.embeddings(spark, sfDir)
  private lazy val queries = e.filter(col("vec_id") < 10)
  private lazy val corpus = e.filter(col("vec_id") >= 10)
  private lazy val model = Pq.ivfPqTrain(e, "vec_id", "embedding", 4, 2, 4, 8, 2)

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val exactTop5 =
    pairs(VectorOps.knnBrute(queries, corpus, "vec_id", "vec_id", "embedding", 5))

  test("residual decomposition is exact: coarse[cl] + rvec == vec, bit-for-bit") {
    val cent = model.coarse.toMap
    val rows = Pq.ivfPqResiduals(e, "vec_id", "embedding", model.coarse)
      .join(e.select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("orig")), "id")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cl = r.getAs[Int]("cl")
      val rv = r.getSeq[Double](r.fieldIndex("rvec"))
      val orig = r.getSeq[Double](r.fieldIndex("orig"))
      val c = cent(cl)
      // rvec(i) = orig(i) - c(i) exactly, so c(i) + rvec(i) must invert
      // to the same double via x - (x - y) stability? No — assert the
      // DEFINITION instead: rvec(i) == orig(i) - c(i) as IEEE doubles.
      rv.indices.foreach { i =>
        assert(rv(i) == orig(i) - c(i),
          s"id=${r.getAs[Long]("id")} pos=$i residual not the exact IEEE difference")
      }
    }
  }

  test("results only come from probed cells (nProbe=1 ⇒ one cell per query)") {
    val enc = Pq.ivfPqEncode(corpus, "vec_id", "embedding", model)
    val top = Pq.ivfPqTopK(queries, enc, "vec_id", "embedding", model, 1, 5)
    val cellOf = enc.select(col("id").cast("long"), col("cl"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byQ = top.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val cells = rs.map(r => cellOf(r.getLong(1))).toSet
      assert(cells.size == 1, s"query $q drew neighbors from ${cells.size} cells at nProbe=1")
    }
  }

  test("recall is monotone in nProbe and probe-all holds the measured floor") {
    val enc = Pq.ivfPqEncode(corpus, "vec_id", "embedding", model)
    val recalls = Seq(1, 2, 4).map { nProbe =>
      val got = pairs(Pq.ivfPqTopK(queries, enc, "vec_id", "embedding", model, nProbe, 5))
      nProbe -> (got & exactTop5).size.toDouble / exactTop5.size
    }
    // shortlist grows with nProbe, so ADC recall cannot DROP by more
    // than quantization tie noise; assert weak monotonicity exactly —
    // a smaller probe set is a strict subset of scored candidates
    assert(recalls(0)._2 <= recalls(2)._2 + 1e-9,
      s"probe-1 recall ${recalls(0)._2} exceeds probe-all ${recalls(2)._2}")
    assert(recalls(1)._2 <= recalls(2)._2 + 1e-9,
      s"probe-2 recall ${recalls(1)._2} exceeds probe-all ${recalls(2)._2}")
    // floor: measured probe-all (residual codebooks beat flat PQ's 0.16
    // on the same fixture because residuals concentrate near 0)
    assert(recalls(2)._2 >= 0.14,
      f"probe-all IVF-PQ recall ${recalls(2)._2}%.3f below floor 0.14")
  }

  test("index build is deterministic: two trainings produce identical codes") {
    val m2 = Pq.ivfPqTrain(e, "vec_id", "embedding", 4, 2, 4, 8, 2)
    assert(m2.coarse.toSeq.map { case (c, v) => (c, v.toSeq) } ===
      model.coarse.toSeq.map { case (c, v) => (c, v.toSeq) })
    for (s <- 0 until model.pq.m)
      assert(m2.pq.books(s).toSeq === model.pq.books(s).toSeq)
    def codesOf(m: Pq.IvfPqModel) =
      Pq.ivfPqEncode(corpus, "vec_id", "embedding", m)
        .select(col("id").cast("long"), col("cl"), col("codes"))
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2)))
    val a = codesOf(model)
    val b = codesOf(m2)
    assert(a.toSeq === b.toSeq)
  }

  test("ivfPqTopK refuses an empty residual codebook") {
    val broken = Pq.IvfPqModel(model.coarse,
      Pq.PqModel(2, 32, Array(Array((0, Vector.fill(32)(0.0))), Array.empty)))
    val ex = intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(queries, queries.limit(0), "vec_id", "embedding", broken, 1, 5)
    }
    assert(ex.getMessage.contains("empty residual codebook"))
  }
}
