package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins zipfFit's regression math against a driver mirror (same 6-dp
  * integer scaling, same closed form), the bounded top-R contract, and
  * the aggregator's (count desc, word asc) rank order.
  */
class ZipfFitSpec extends SparkSpec {

  // text with token "wK" repeated cK times → exact known counts
  private def corpus(counts: Map[String, Int], source: String = "s1"): Seq[(String, String)] =
    Seq((source, counts.toSeq.sortBy(_._1)
      .flatMap { case (w, c) => Seq.fill(c)(w) }.mkString(" ")))

  private def fit(rows: Seq[(String, String)], topR: Int = 200) = {
    import spark.implicits._
    CurationOps.zipfFit(rows.toDF("source", "text"), "source", "text", topR)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
  }

  private def mirror(counts: Seq[Long]): (Double, Double) = {
    // counts already in rank order; same scaled-integer least squares
    val pts = counts.zipWithIndex.map { case (c, i) =>
      (math.floor(math.log((i + 1).toDouble) * 1e6 + 0.5).toLong,
        math.floor(math.log(c.toDouble) * 1e6 + 0.5).toLong)
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum; val sxx = pts.map(p => p._1 * p._1).sum
    val slope = (n * sxy.toDouble - sx.toDouble * sy.toDouble) /
      (n * sxx.toDouble - sx.toDouble * sx.toDouble)
    val intercept = (sy.toDouble / n - slope * sx.toDouble / n) / 1e6
    (math.floor(slope * 1e6 + 0.5) / 1e6, math.floor(intercept * 1e6 + 0.5) / 1e6)
  }

  test("matches the driver mirror on an exact power law") {
    // c_r = 1024 / r for r = 1..8 → slope −1 exactly in the ln-ln plane
    // up to per-point 6-dp rounding
    val counts = (1 to 8).map(r => s"w$r" -> 1024 / r).toMap
    val Array((src, n, slope, intercept)) = fit(corpus(counts))
    assert(src === "s1" && n === 8L)
    val (ms, mi) = mirror((1 to 8).map(r => (1024 / r).toLong))
    assert(slope === ms, s"slope $slope != mirror $ms")
    assert(intercept === mi, s"intercept $intercept != mirror $mi")
    assert(math.abs(slope + 1.0) < 0.02, s"power-law slope $slope far from -1")
  }

  test("rank order is (count desc, word asc) and topR caps n_ranked") {
    // 10 distinct tokens, counts 10,9,...,1 — topR=4 keeps the top 4
    val counts = (1 to 10).map(r => s"w$r" -> (11 - r)).toMap
    val Array((_, n, slope, _)) = fit(corpus(counts), topR = 4)
    assert(n === 4L)
    val (ms, _) = mirror(Seq(10L, 9L, 8L, 7L))
    assert(slope === ms)
  }

  test("flat (template) source fits slope 0") {
    val counts = (1 to 6).map(r => s"w$r" -> 50).toMap
    val Array((_, _, slope, _)) = fit(corpus(counts))
    assert(slope === 0.0)
  }

  test("sources fit independently") {
    import spark.implicits._
    val rows = corpus((1 to 8).map(r => s"w$r" -> 1024 / r).toMap, "zipfy") ++
      corpus((1 to 6).map(r => s"w$r" -> 50).toMap, "flat")
    val out = CurationOps.zipfFit(rows.toDF("source", "text"), "source", "text", 200)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out("flat") === 0.0)
    assert(out("zipfy") < -0.9)
  }
}
