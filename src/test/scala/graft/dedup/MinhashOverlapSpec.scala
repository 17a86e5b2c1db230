package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins groupSetMinhashOverlap: the exact-side arithmetic on hand
  * fixtures, the estimator's two fixed points (identical sets → 10000,
  * disjoint sets → 0), the full-pair-frame contract (zero-overlap pairs
  * still appear), and partition-independence of the signature (the
  * mergeable-min property).
  */
class MinhashOverlapSpec extends SparkSpec {

  import spark.implicits._

  private def run(rows: Seq[(String, String)], perms: Int = 64) =
    Dedup.groupSetMinhashOverlap(rows.toDF("grp", "item"), "grp", "item", perms)
      .collect()
      .map(r => (r.getAs[String]("group_a"), r.getAs[String]("group_b")) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_inter"),
          r.getAs[Long]("exact_j_bp"), r.getAs[Long]("est_j_bp")))
      .toMap

  test("identical sets: exact and estimate both land on 10000 bp") {
    val items = (1 to 50).map(_.toString)
    val m = run(items.map(("a", _)) ++ items.map(("b", _)))
    val (na, nb, ni, ex, est) = m(("a", "b"))
    assert((na, nb, ni, ex, est) === ((50L, 50L, 50L, 10000L, 10000L)))
  }

  test("disjoint sets: exact 0, estimate 0, pair still present") {
    val m = run((1 to 40).map(i => ("a", s"x$i")) ++
      (1 to 40).map(i => ("b", s"y$i")))
    val (na, nb, ni, ex, est) = m(("a", "b"))
    assert((na, nb, ni, ex) === ((40L, 40L, 0L, 0L)))
    assert(est === 0L) // 64 mins over disjoint 48-bit hashes — no collision
  }

  test("hand-computed exact Jaccard; duplicates collapse to the set") {
    // a = {p,q,r,s}, b = {r,s,t} (with repeats) → inter 2, union 5 → 4000 bp
    val m = run(Seq(("a", "p"), ("a", "q"), ("a", "r"), ("a", "s"), ("a", "r"),
      ("b", "r"), ("b", "s"), ("b", "t"), ("b", "t")))
    val (na, nb, ni, ex, _) = m(("a", "b"))
    assert((na, nb, ni, ex) === ((4L, 3L, 2L, 4000L)))
  }

  test("estimator tracks a half-overlap within sampling error") {
    // J = 50/150 ≈ 0.3333; stderr at 64 perms ≈ 5.9 pp → assert ±3σ
    val shared = (1 to 50).map(_.toString)
    val m = run(shared.map(("a", _)) ++ (1 to 50).map(i => ("a", s"a$i")) ++
      shared.map(("b", _)) ++ (1 to 50).map(i => ("b", s"b$i")))
    val (_, _, ni, ex, est) = m(("a", "b"))
    assert(ni === 50L && ex === 3333L)
    assert(math.abs(est - ex) <= 1800L, s"est=$est vs exact=$ex")
  }

  test("signature pass is partition-independent (min is order-free)") {
    val rows = (1 to 300).map(i => (s"g${i % 3}", s"item${i % 97}"))
    val one = Dedup.groupSetMinhashOverlap(
      rows.toDF("grp", "item").repartition(1), "grp", "item", 16).collect()
    val many = Dedup.groupSetMinhashOverlap(
      rows.toDF("grp", "item").repartition(11), "grp", "item", 16).collect()
    assert(one.map(_.toSeq).toSeq === many.map(_.toSeq).toSeq)
  }
}
