package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Spectral's determinism and math: the Gram matrix is an exact,
  * partition-count-independent integer aggregate; the fixed-point power
  * iteration recovers a known dominant eigenvector exactly; and the
  * Rayleigh estimate lands on the known eigenvalue.
  */
class SpectralSpec extends SparkSpec {

  import spark.implicits._

  test("gramMatrix is exact and symmetric on a hand fixture") {
    // quantized rows floor(x·1000+0.5): (1,2), (3,4)
    // G = [[1+9, 2+12], [2+12, 4+16]] = [[10,14],[14,20]]
    val df = Seq(Seq(0.001, 0.002), Seq(0.003, 0.004)).toDF("v")
    val g = Spectral.gramMatrix(df, "v", 2)
    assert(g(0)(0) === BigInt(10))
    assert(g(0)(1) === BigInt(14))
    assert(g(1)(0) === BigInt(14))
    assert(g(1)(1) === BigInt(20))
  }

  test("gramMatrix is partition-count independent (order-free sums)") {
    val vecs = (1 to 97).map(i => Seq(i * 0.01, -i * 0.007, (i % 5) * 0.1))
    val one = Spectral.gramMatrix(vecs.toDF("v").repartition(1), "v", 3)
    val many = Spectral.gramMatrix(vecs.toDF("v").repartition(13), "v", 3)
    assert(one.flatten.toSeq === many.flatten.toSeq)
  }

  test("power iteration recovers a diagonal matrix's dominant axis exactly") {
    val g = Array(
      Array(BigInt(500), BigInt(0), BigInt(0)),
      Array(BigInt(0), BigInt(40), BigInt(0)),
      Array(BigInt(0), BigInt(0), BigInt(3)))
    val (v, ray) = Spectral.powerIteration(g, 12)
    // v starts at (1e4,1e4,1e4); each step scales axis i by λᵢ/λ₁ —
    // after 12 steps the off-axes are truncated to 0 and v = (1e4,0,0)
    assert(v.toSeq === Seq(BigInt(10000), BigInt(0), BigInt(0)))
    assert(ray === BigInt(500))
  }

  test("negative off-diagonals converge with truncation toward zero") {
    // [[5000,-2000],[-2000,1000]]: λ₁ = 3000+2√2·1000 ≈ 5828.43,
    // v₁ ∝ (1, 1−√2) ≈ (1, −0.41421) — not orthogonal to the all-ones
    // start, so 12 steps at contraction |λ₂/λ₁| ≈ 0.03 land within one
    // fixed-point ulp of (10000, −4142)
    val g = Array(
      Array(BigInt(5000), BigInt(-2000)),
      Array(BigInt(-2000), BigInt(1000)))
    val (v, ray) = Spectral.powerIteration(g, 12)
    assert(v(0) === BigInt(10000))
    assert(v(1) <= BigInt(-4141) && v(1) >= BigInt(-4143), s"v=${v.toSeq}")
    assert(ray >= BigInt(5827) && ray <= BigInt(5829), s"ray=$ray")
  }

  test("registered q194 output is self-consistent on the fixture") {
    val rows = Spectral.q194SpectralPower(spark, sfDir).collect()
    assert(rows.length === 16)
    val loadings = rows.map(_.getAs[Long]("loading_fp"))
    // fixed-point normalization: max|loading| is exactly 10⁴
    assert(loadings.map(math.abs).max === 10000L)
    // one rayleigh value, non-negative (Gram is PSD)
    val rays = rows.map(_.getAs[Long]("rayleigh_fp")).distinct
    assert(rays.length === 1 && rays.head >= 0L)
    // diagonal energy is positive for a real embedding table
    assert(rows.forall(_.getAs[Long]("g_diag") > 0L))
  }
}
