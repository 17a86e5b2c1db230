package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-filter decontamination — the constant-memory alternative to the
  * n-gram equi-join (q87/q149's decontamination shape) once the benchmark
  * suite is too large to broadcast as strings but its BITSET is not: a
  * benchmark of 10⁸ distinct n-grams fits a 2³³-bit (1 GB) filter at
  * k=3 with ~2% false positives, versus tens of GB of n-gram strings.
  * (Reference behavior anchor: the skip-if-exists / containment checks in
  * `pipelines/ingest.py` are membership tests against a known set — this
  * is that membership test at the scale where the set itself no longer
  * travels.)
  *
  * Design for 100 TB:
  *  - The filter is built by a MERGEABLE custom `Aggregator` over bit
  *    positions: each task folds its partition into a local bitset and
  *    only fixed-size bitsets cross the shuffle / merge tree (OR is
  *    associative+commutative, so the result is partitioning-independent
  *    — the same argument as MisraGries/HLL). Benchmark shards can be
  *    sketched independently and OR-merged later.
  *  - The probe is a broadcast of the bitset + one map-side UDF per
  *    corpus n-gram: ZERO shuffle on the corpus side before the per-doc
  *    aggregate (which map-side combines). No join against the benchmark.
  *  - Bit positions come from the repo's cross-engine md5 idiom
  *    (`conv(substr(md5('bl{j}:'||g),1,5),16,10)` — 20 bits/hash), so
  *    the DuckDB oracle reproduces every position exactly.
  *
  * Guarantees (BloomSpec): no false negatives ever (a true benchmark
  * n-gram always probes positive); false-positive rate ≈ (1−e^{−kn/m})^k
  * — with m=2²⁰, k=3 and the sf0.1 benchmark load (~11.5k n-grams) that
  * is ~4e-5 per n-gram; the q190 audit row carries exact-hit counts next
  * to bloom-hit counts so the realized FP rate is a tracked number, not
  * a formula in a comment.
  */
object Bloom {

  /** 2²⁰ bits = 128 KiB — sized so the FIVE-hex-char (20-bit) md5 slice
    * covers the address space exactly; a production benchmark suite
    * scales m, not the idiom (12 hex chars address up to 2⁴⁸ bits).
    */
  val DefaultMBits: Int = 1 << 20

  val DefaultK: Int = 3

  /** The j-th bit position of n-gram column `g` (j in 1..k), as a Spark
    * expression — value-identical to DuckDB's
    * `('0x'||substr(md5('bl{j}:'||g),1,w))::BIGINT % mBits` where w is
    * the hex-slice width derived below.
    *
    * The slice width is DERIVED from mBits (round-12 ADVICE): a fixed
    * 5-hex-char slice addresses only 2²⁰ bits, so any caller scaling m
    * past that (the documented production path) would silently fold the
    * whole filter into its first 2²⁰ bits, collapsing the advertised
    * false-positive rate. `hexChars` picks the smallest slice whose
    * 16^w space covers mBits (w=5 for the 2²⁰ default — bit-identical
    * to every committed oracle), capped at 12 chars (2⁴⁸ bits = 32 TiB
    * of filter, far past any driver-holdable bitset) with a loud
    * require rather than a silent wrap.
    */
  def hexChars(mBits: Int): Int = {
    require(mBits > 0, s"mBits must be positive, got $mBits")
    // integer-exact: smallest w with 16^w >= mBits (floating log would
    // round 16^5 to w=6 on a bad ulp and silently change every oracle)
    val bits = 32 - Integer.numberOfLeadingZeros(mBits - 1) // ceil(log2 mBits)
    val w = ((bits + 3) / 4).max(1)
    require(w <= 12, s"mBits=$mBits needs a >48-bit hash slice — not supported")
    w
  }

  def bloomPosition(g: Column, j: Int, mBits: Int): Column =
    conv(substring(md5(concat(lit(s"bl$j:"), g)), 1, hexChars(mBits)), 16, 10)
      .cast("long") % mBits

  /** All k positions as an array column. */
  def bloomPositions(g: Column, k: Int = DefaultK,
                     mBits: Int = DefaultMBits): Column =
    array((1 to k).map(j => bloomPosition(g, j, mBits)): _*)

  /** Mergeable bitset-OR aggregate over bit positions. The buffer is one
    * fixed Array[Long] of mBits/64 words regardless of input size — the
    * whole point: partial aggregation ships 128 KiB per task, not the
    * n-gram stream.
    */
  class BitsetAgg(mBits: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(mBits > 0 && mBits % 64 == 0, s"mBits must be a positive multiple of 64, got $mBits")

    override def zero: Array[Long] = new Array[Long](mBits / 64)

    override def reduce(buf: Array[Long], pos: Long): Array[Long] = {
      require(pos >= 0 && pos < mBits, s"bit position $pos outside [0, $mBits)")
      buf(pos.toInt >>> 6) |= 1L << (pos.toInt & 63)
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Build the filter from a frame of n-grams: explode the k positions,
    * fold them through the mergeable bitset aggregate, collect the ONE
    * fixed-size row. Driver state is mBits/8 bytes — the documented
    * bounded-model exception (centroid rule), independent of benchmark
    * row count.
    */
  def bloomBuild(ngrams: DataFrame, gCol: String, k: Int = DefaultK,
                 mBits: Int = DefaultMBits): Array[Long] = {
    val row = ngrams
      .select(explode(bloomPositions(col(gCol), k, mBits)).as("p"))
      .agg(udaf(new BitsetAgg(mBits)).apply(col("p")).as("bits"))
      .head()
    row.getAs[scala.collection.Seq[Long]]("bits").toArray
  }

  /** Membership-test UDF over a broadcast bitset: true iff EVERY position
    * in the array is set. The only per-row work on the 100 TB side.
    */
  def bloomHitUdf(spark: SparkSession, bitset: Array[Long], mBits: Int): Column => Column = {
    val bc = spark.sparkContext.broadcast(bitset)
    val f = udf { positions: Array[Long] =>
      val bits = bc.value
      var hit = true
      var i = 0
      while (hit && i < positions.length) {
        val p = positions(i).toInt
        hit = p >= 0 && p < mBits && (bits(p >>> 6) & (1L << (p & 63))) != 0L
        i += 1
      }
      hit && positions.nonEmpty
    }
    positions => f(positions)
  }

  /** Per-document contamination audit: for every corpus document, count
    * its distinct n-grams that probe positive in the benchmark bloom
    * (`n_bloom_hits`, the production signal) NEXT TO the exact-join truth
    * (`n_exact_hits`, the audit column — the estimate-vs-exact pattern of
    * q142/q182/q186). Production drops the exact join and keeps only the
    * broadcast probe; the audit keeps both so the realized FP rate is a
    * hash-checked number. Returns flagged docs only (n_bloom_hits > 0):
    * (id, n_ngrams, n_bloom_hits, n_exact_hits), plus any caller-kept
    * passthrough columns.
    */
  def bloomDecontam(corpus: DataFrame, idCol: String, textCol: String,
                    benchmark: DataFrame, benchTextCol: String,
                    n: Int = 5, k: Int = DefaultK,
                    mBits: Int = DefaultMBits,
                    keep: Seq[String] = Seq.empty): DataFrame = {
    val spark = corpus.sparkSession
    val benchNgrams = benchmark
      .select(explode(Dedup.wordShingles(col(benchTextCol), n)).as("g"))
      .distinct()
    val bits = bloomBuild(benchNgrams, "g", k, mBits)
    val hit = bloomHitUdf(spark, bits, mBits)

    val keepCols = keep.map(col)
    val exploded = corpus
      .select((Seq(col(idCol), Dedup.wordShingles(col(textCol), n).as("gs")) ++ keepCols): _*)
      .withColumn("n_ngrams", size(col("gs")).cast("long"))
      .select((Seq(col(idCol), col("n_ngrams"), explode(col("gs")).as("g")) ++ keepCols): _*)
      .withColumn("bloom_hit", hit(bloomPositions(col("g"), k, mBits)))
    // audit side: exact membership via broadcast — the join the bloom
    // REPLACES in production, kept here to make FPs visible in-row
    val probed = exploded.join(
      broadcast(benchNgrams.withColumn("ex", lit(1L))), Seq("g"), "left")
    probed
      .groupBy((Seq(col(idCol), col("n_ngrams")) ++ keepCols): _*)
      .agg(
        sum(when(col("bloom_hit"), 1L).otherwise(0L)).as("n_bloom_hits"),
        sum(coalesce(col("ex"), lit(0L))).as("n_exact_hits"))
      .filter(col("n_bloom_hits") > 0)
  }
}
