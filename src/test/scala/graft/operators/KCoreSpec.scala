package graft.operators

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    val sym = pairs.flatMap(p => Seq(p, p.swap))
    Graph.kCore(sym.toDF("src", "dst"), k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference: sequential peel on the driver. */
  private def brute(pairs: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var es = pairs.flatMap(p => Seq(p, p.swap)).toSet
    var changed = true
    while (changed) {
      val deg = es.groupBy(_._1).map { case (v, g) => v -> g.size }
      val keep = deg.filter(_._2 >= k).keySet
      val es2 = es.filter(e => keep(e._1) && keep(e._2))
      changed = es2 != es
      es = es2
    }
    es.groupBy(_._1).map { case (v, g) => v -> g.size.toLong }
  }

  test("K4 minus one edge: the 2-core keeps everything, the 3-core only the full triangle... no — peels to empty") {
    // K4 minus edge (3,4): degrees 3,3,2,2. 3-core: peel 3 and 4
    // (deg 2) → 1-2 alone (deg 1 < 3) → empty.
    val g = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
    assert(core(g, 3) === Map.empty)
    // the 2-core is the whole graph (min degree 2)
    assert(core(g, 2) === Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L))
  }

  test("pendant chain peels transitively") {
    // triangle 1-2-3 with a chain 3-4-5: the 2-core must drop 5 THEN 4
    // (4's degree only falls below 2 after 5 goes) — the iterative part
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, 2) === Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("matches the sequential peel on random graphs, k = 2..4") {
    for (seed <- 1 to 5; k <- 2 to 4) {
      val rnd = new scala.util.Random(seed)
      val n = 24
      val pairs = (for {
        a <- 1L to n; b <- (a + 1) to n
        if rnd.nextDouble() < 0.16
      } yield (a, b)).toSeq
      assert(core(pairs, k) === brute(pairs, k), s"seed=$seed k=$k")
    }
  }

  test("result is a fixpoint: every core vertex has core_deg >= k") {
    val rnd = new scala.util.Random(7)
    val pairs = (for {
      a <- 1L to 30L; b <- (a + 1) to 30L
      if rnd.nextDouble() < 0.2
    } yield (a, b)).toSeq
    val c = core(pairs, 3)
    assert(c.values.forall(_ >= 3L), s"non-fixpoint core: $c")
  }
}
