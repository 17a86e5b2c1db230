package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Normal-equation properties the q184 oracle can't isolate: exact
  * recovery on a noiseless system at λ=0, the λ→∞ shrinkage
  * direction, parallelism-independence of the fit (the BIGINT Gram
  * sums are the whole determinism argument — exercise it), and the
  * singularity guard.
  */
class RegressionSpec extends SparkSpec {

  private def synth(n: Int, parts: Int) = {
    import spark.implicits._
    // y = 7 + 3·x1 + 5·x2 exactly, integer grid, full rank
    (0 until n).map { i =>
      val x1 = (i % 17).toLong; val x2 = (i % 23).toLong
      (i.toLong, x1, x2, 7L + 3L * x1 + 5L * x2)
    }.toDF("id", "x1", "x2", "y").repartition(parts)
  }

  test("λ=0 recovers a noiseless integer system exactly") {
    val m = Regression.ridgeFit2(synth(500, 4), "x1", "x2", "y", 0.0)
    assert(m.w0 === 7.0 && m.w1 === 3.0 && m.w2 === 5.0,
      s"expected (7,3,5), got (${m.w0},${m.w1},${m.w2})")
    val scored = Regression.ridgePredict2(
      synth(500, 4), "id", "x1", "x2", "y", m)
    assert(scored.filter(col("resid") =!= 0L).count() === 0L)
  }

  test("fit is independent of partitioning (exact integer Gram sums)") {
    val a = Regression.ridgeFit2(synth(501, 1), "x1", "x2", "y", 1000.0)
    val b = Regression.ridgeFit2(synth(501, 32), "x1", "x2", "y", 1000.0)
    assert(a === b, s"partitioning changed the fit: $a vs $b")
  }

  test("ridge shrinks slopes toward zero as λ grows") {
    val small = Regression.ridgeFit2(synth(500, 4), "x1", "x2", "y", 1.0)
    val big = Regression.ridgeFit2(synth(500, 4), "x1", "x2", "y", 1e9)
    assert(math.abs(big.w1) < math.abs(small.w1))
    assert(math.abs(big.w2) < math.abs(small.w2))
  }

  test("singular system fails loudly, not with NaN weights") {
    import spark.implicits._
    // x2 = x1 ⇒ rank-deficient at λ=0
    val d = (0 until 100).map { i =>
      (i.toLong, i.toLong % 5, i.toLong % 5, i.toLong)
    }.toDF("id", "x1", "x2", "y")
    val ex = intercept[IllegalArgumentException] {
      Regression.ridgeFit2(d, "x1", "x2", "y", 0.0)
    }
    assert(ex.getMessage.contains("singular"))
    // ...and the same system fits fine once regularized
    val m = Regression.ridgeFit2(d, "x1", "x2", "y", 10.0)
    assert(!m.w1.isNaN && !m.w2.isNaN)
  }
}
