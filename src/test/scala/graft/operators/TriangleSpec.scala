package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TriangleSpec extends SparkSpec {
  import spark.implicits._

  private def counts(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val sym = pairs.flatMap(p => Seq(p, p.swap))
    Graph.triangleCounts(sym.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Exhaustive reference: every vertex triple with all three edges. */
  private def brute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = pairs.flatMap(p => Seq(p, p.swap)).toSet
    val vs = es.map(_._1).toSeq.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      a = vs(i); b = vs(j); c = vs(k)
      if es((a, b)) && es((b, c)) && es((a, c))
    } yield Seq(a, b, c)
    tris.flatten.groupBy(identity).map { case (v, g) => v -> g.size.toLong }
  }

  test("single triangle with a pendant edge") {
    // 1-2-3 triangle, 4 hangs off 3: only the triangle vertices count
    val got = counts(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4: every vertex in C(3,2)=3 triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = counts(k4)
    assert(got === (1L to 4L).map(_ -> 3L).toMap)
  }

  test("triangle-free graphs return empty") {
    // a 6-cycle and a star have no triangles
    val cycle = (1L to 6L).map(i => (i, i % 6 + 1))
    val star = (2L to 7L).map(i => (1L, i))
    assert(counts(cycle).isEmpty)
    assert(counts(star).isEmpty)
  }

  test("duplicate edge rows do not inflate counts (defensive distinct)") {
    // round-10 ADVICE: duplicated (src,dst) rows inflated degrees and
    // multiplied wedge matches before the .distinct() guard
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val dup = tri ++ tri ++ Seq((1L, 2L))
    assert(counts(dup) === counts(tri))
  }

  test("matches brute force on random graphs (degree-order orientation is lossless)") {
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val pairs = Seq.fill(60)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(p => p._1 != p._2)
        .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        .distinct
      assert(counts(pairs) === brute(pairs), s"seed $seed")
    }
  }
}
