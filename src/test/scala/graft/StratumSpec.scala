package graft

/** Pins the q200–q204 stratum contract (round-12 verdict item 5): on a
  * driver fixture every id sits below `Tables.ReplicaZeroBound`, so each
  * stratum query must equal its parent ROW FOR ROW — the stratum is a
  * pure oracle-feasibility device for the ScaleUp fixtures, never a
  * semantic fork. Also pins the oracle derivation: each stratum oracle
  * is its parent's SQL with exactly the replica-0 predicate injected
  * (the no-drift argument — a parent rewrite flows into the stratum or
  * fails loudly in SparkEntry's require).
  */
class StratumSpec extends SparkSpec {

  private val pairs = Seq(
    "q200_containment_stratum" -> "q165_containment_pairs",
    "q201_triangle_stratum"    -> "q173_triangle_count",
    "q202_ivfpq_stratum"       -> "q183_ivfpq",
    "q203_yield_stratum"       -> "q185_dedup_yield_curve",
    "q204_semdedup_stratum"    -> "q191_semdedup")

  test("stratum queries equal their parents on a driver fixture") {
    pairs.foreach { case (stratum, parent) =>
      val s = SparkEntry.queries(stratum)(spark, sfDir).collect().map(_.toSeq)
      val p = SparkEntry.queries(parent)(spark, sfDir).collect().map(_.toSeq)
      assert(s.toSeq === p.toSeq, s"$stratum must equal $parent below the replica bound")
      assert(s.nonEmpty || p.isEmpty, s"$stratum collapsed to empty while $parent has rows")
    }
  }

  test("stratum oracles are the parent SQL plus the replica-0 predicate only") {
    val o = SparkEntry.oracleSql
    pairs.foreach { case (stratum, parent) =>
      val derived = o(parent)
        .replace("FROM documents)", "FROM documents WHERE doc_id < 100000000)")
        .replace("FROM embeddings)", "FROM embeddings WHERE vec_id < 100000000)")
      assert(o(stratum) === derived, s"$stratum oracle drifted from $parent's")
      assert(o(stratum) !== o(parent), s"$stratum oracle missing the stratum predicate")
    }
  }
}
