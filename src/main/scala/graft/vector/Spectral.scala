package graft.vector

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed spectral analysis of the embedding space, deterministic to
  * the digit at any parallelism — the PCA-shaped sibling of q184's
  * normal-equation ridge: ONE corpus pass computes an exact integer Gram
  * matrix (the distributed part), then a FIXED-POINT integer power
  * iteration runs on the dim×dim driver-held matrix (the bounded-model
  * part, like kmeans centroids). The top principal direction of the
  * embedding Gram is the curation datasheet that says whether one
  * direction dominates a corpus slice (collapsed/templated embeddings →
  * high top-eigenvalue share) before any ANN index is built over it.
  *
  * Determinism argument, mirroring q184/q129: components are quantized
  * `floor(x·1000 + 0.5)` (half-up, identical in both engines), so Gram
  * entries are exact BIGINT sums — order-free at any partition count.
  * The power iteration never leaves integers: v₀ = 10000·1⃗, then
  * vₜ₊₁ = (G·vₜ)·10⁴ ÷ max|G·vₜ| with TRUNCATING division — the same
  * semantics as DuckDB's `//` (both round toward zero), so the oracle
  * replays every step bit-for-bit. Convergence quality is a property of
  * T (fixed at 12), never of correctness.
  *
  * Overflow bounds: |q| ≤ 1000·max|x|; Gram |g| ≤ N·(10³·max|x|)² fits
  * a Spark LONG to N ≈ 10¹³ docs at max|x| ≤ 1 — past that, widen the
  * Spark sum to DECIMAL(38,0) (q147's pattern). The driver/oracle
  * iteration runs in BigInt/HUGEINT, so G·v and vᵀGv never overflow.
  */
object Spectral {

  /** Exact integer Gram matrix over the first `dims` quantized embedding
    * components: one groupBy(i, j) whose output is dims² rows with full
    * map-side combine — the classic unbounded-corpus → bounded-model
    * aggregate. Returns the driver-held matrix (row-major dims×dims).
    */
  def gramMatrix(vecs: DataFrame, vecCol: String, dims: Int): Array[Array[BigInt]] = {
    val v = col(vecCol).cast("array<double>")
    val q = vecs.select(array((1 to dims).map(i =>
      floor(element_at(v, i) * 1000 + 0.5).cast("long")): _*).as("q"))
    val rows = q
      .select(posexplode(col("q")).as(Seq("i", "qi")), col("q"))
      .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
      .groupBy("i", "j").agg(sum(col("qi") * col("qj")).as("g"))
      .collect()
    val g = Array.fill(dims, dims)(BigInt(0))
    rows.foreach(r => g(r.getAs[Int]("i"))(r.getAs[Int]("j")) = BigInt(r.getAs[Long]("g")))
    g
  }

  /** Fixed-point integer power iteration: T steps of
    * v ← trunc((G·v)·10⁴ / max|G·v|), starting from 10000·1⃗.
    * Returns (v_T, rayleigh) with rayleigh = trunc(vᵀGv / vᵀv) — the
    * top-eigenvalue estimate in the Gram's own units. All divisions
    * truncate toward zero (BigInt `/` ≡ DuckDB `//`).
    */
  def powerIteration(g: Array[Array[BigInt]], iters: Int): (Array[BigInt], BigInt) = {
    val dims = g.length
    var v = Array.fill(dims)(BigInt(10000))
    for (_ <- 1 to iters) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => g(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max.max(BigInt(1))
      v = w.map(x => x * 10000 / m)
    }
    val gv = Array.tabulate(dims)(i => (0 until dims).map(j => g(i)(j) * v(j)).sum)
    val num = (0 until dims).map(i => v(i) * gv(i)).sum
    val den = (0 until dims).map(i => v(i) * v(i)).sum.max(BigInt(1))
    (v, num / den)
  }

  /** q194: the catalog face — 16 dims, 12 iterations over the embeddings
    * table. One row per dimension: the Gram diagonal (energy per raw
    * dimension — ties the output to the distributed aggregate), the
    * fixed-point loading of the top principal direction, and the
    * Rayleigh-quotient eigenvalue estimate (repeated; kept in-row so the
    * frame is self-contained).
    */
  def q194SpectralPower(spark: SparkSession, dir: String): DataFrame = {
    val dims = 16
    val g = gramMatrix(
      graft.Tables.widen(graft.Tables.embeddings(spark, dir)), "embedding", dims)
    val (v, ray) = powerIteration(g, 12)
    // fixed-point values are bounded by ±10⁴ and rayleigh by the long
    // range (documented above) — exact long conversions, loud on breach
    // (BigInt.toLong would WRAP silently)
    def asLong(x: BigInt, what: String): Long = {
      require(x.isValidLong, s"$what $x exceeds the documented long bound")
      x.toLong
    }
    import spark.implicits._
    (1 to dims).map(i =>
        (i, asLong(g(i - 1)(i - 1), "g_diag"), asLong(v(i - 1), "loading_fp"),
          asLong(ray, "rayleigh_fp")))
      .toDF("pos", "g_diag", "loading_fp", "rayleigh_fp")
      .orderBy("pos")
  }
}
