package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins semDedup's SemDeDup semantics: dedup is scoped to the cluster
  * key (cross-cluster twins are NOT paired — that is the scale trade
  * the operator exists for), drops are exactly the τ-exceeding pairs
  * with an earlier same-cluster doc, and the keeper is the
  * argmax-cosine / min-id earlier doc.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // assignment frame built directly (id, vec, nv, cl) — the operator's
  // contract is over an ASSIGNED frame; ivfAssign/kmeansAssign supply it
  private def assigned(rows: Seq[(Long, Seq[Double], Int)]) =
    rows.toDF("id", "vec", "cl")
      .withColumn("nv", VectorOps.l2Norm(col("vec")))

  private def drops(rows: Seq[(Long, Seq[Double], Int)], tau: Double) =
    VectorOps.semDedup(assigned(rows), tau)
      .collect()
      .map(r => r.getAs[Long]("dropped_id") ->
        (r.getAs[Int]("cluster"), r.getAs[Long]("keeper_id"),
          r.getAs[Long]("n_dups"), r.getAs[Long]("best_cos_bp")))
      .toMap

  test("within-cluster near-dup drops the later doc with exact cos_bp") {
    val d = drops(Seq(
      (1L, Seq(1.0, 0.0, 0.0), 0),
      (2L, Seq(1.0, 0.01, 0.0), 0),  // cos(1,2) ≈ 0.99995 → 10000 bp at 4dp
      (3L, Seq(0.0, 1.0, 0.0), 0)),  // orthogonal — survives
      tau = 0.9)
    assert(d.keySet === Set(2L))
    assert(d(2L) === ((0, 1L, 1L, 10000L)))
  }

  test("identical vectors in different clusters are NOT paired") {
    val d = drops(Seq(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(1.0, 0.0), 1)), // exact twin, other cluster
      tau = 0.5)
    assert(d.isEmpty)
  }

  test("keeper is argmax cosine, ties broken by min id") {
    // doc 4 sits at cos 1.0 to docs 2 and 3 (twins) and lower to doc 1;
    // keeper must be the argmax (2 or 3), tie → min id = 2
    val d = drops(Seq(
      (1L, Seq(1.0, 0.2), 0),
      (2L, Seq(1.0, 0.0), 0),
      (3L, Seq(1.0, 0.0), 0),
      (4L, Seq(2.0, 0.0), 0)), // parallel to 2/3 → cos = 1.0
      tau = 0.9)
    assert(d(4L)._2 === 2L)     // keeper
    assert(d(4L)._4 === 10000L) // best cos
    // docs 2,3,4 all drop against earlier members; doc 1 survives
    assert(d.keySet === Set(2L, 3L, 4L))
  }

  test("n_dups counts every τ-exceeding earlier doc, not just the keeper") {
    val d = drops(Seq(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(1.0, 0.001), 0),
      (3L, Seq(1.0, 0.002), 0)),
      tau = 0.99)
    assert(d(3L)._3 === 2L) // both 1 and 2 exceed τ against 3
  }

  test("registered q191 runs green on the catalog fixture") {
    val out = graft.operators.ScaleOps.q191SemDedup(spark, sfDir)
    val rows = out.collect()
    // every reported drop respects the τ floor and keeper < dropped
    assert(rows.forall(r => r.getAs[Long]("best_cos_bp") >= 3500L))
    assert(rows.forall(r =>
      r.getAs[Long]("keeper_id") < r.getAs[Long]("dropped_id")))
  }
}
