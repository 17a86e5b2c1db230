package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the Bloom decontamination contract: NO false negatives ever
  * (the property production relies on when it drops the exact join),
  * OR-mergeability of the bitset aggregate (shard-and-merge), and the
  * false-positive behavior that motivates the in-row audit column.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private val m = Bloom.DefaultMBits

  private def audit(corpus: Seq[(Long, String)], bench: Seq[String]) =
    Bloom.bloomDecontam(
      corpus.toDF("doc_id", "text"), "doc_id", "text",
      bench.toDF("text"), "text", n = 3)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Long]("n_bloom_hits"),
          r.getAs[Long]("n_exact_hits")))
      .toMap

  test("no false negatives: every exact hit is a bloom hit") {
    val bench = Seq("alpha beta gamma delta", "one two three four five")
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),        // fully contained
      (2L, "zz alpha beta gamma yy"),         // one shared 3-gram
      (3L, "totally disjoint words here now") // none
    )
    val a = audit(corpus, bench)
    // doc 1: 2 distinct 3-grams, both benchmark members
    assert(a(1L) === ((2L, 2L, 2L)))
    // doc 2: 3 distinct 3-grams, exactly one shared
    val (n2, bl2, ex2) = a(2L)
    assert(n2 === 3L && ex2 === 1L && bl2 >= ex2)
    // the invariant itself: bloom_hits >= exact_hits on every row
    assert(a.values.forall { case (_, bl, ex) => bl >= ex })
  }

  test("flagging is bloom-driven: clean docs absent at this load") {
    // benchmark load ~8 n-grams over 2^20 bits at k=3: FP ~ 1.4e-14
    // per n-gram — a disjoint doc appearing here would be astonishing
    val a = audit(
      Seq((9L, "completely different text with no overlap at all")),
      Seq("alpha beta gamma delta"))
    assert(a.isEmpty)
  }

  test("bitset aggregate is OR-mergeable: shard blooms == whole bloom") {
    val grams = (1 to 500).map(i => s"gram-$i")
    val whole = Bloom.bloomBuild(grams.toDF("g"), "g")
    val h1 = Bloom.bloomBuild(grams.take(250).toDF("g"), "g")
    val h2 = Bloom.bloomBuild(grams.drop(250).toDF("g"), "g")
    val merged = h1.zip(h2).map { case (a, b) => a | b }
    assert(whole.sameElements(merged))
    // and partitioning never changes the bitset (order-free OR)
    val wide = Bloom.bloomBuild(grams.toDF("g").repartition(7), "g")
    assert(whole.sameElements(wide))
  }

  test("positions stay inside the filter and reject out-of-range input") {
    val ps = (1 to 200).map(i => s"x-$i").toDF("g")
      .select(explode(Bloom.bloomPositions(col("g"))).as("p"))
      .agg(min("p"), max("p")).head()
    assert(ps.getLong(0) >= 0L && ps.getLong(1) < m.toLong)
    val agg = new Bloom.BitsetAgg(m)
    intercept[IllegalArgumentException] {
      agg.reduce(agg.zero, m.toLong)
    }
  }

  test("hex-slice width is derived from mBits (round-12 ADVICE)") {
    // the committed-oracle default stays EXACTLY 5 chars (20 bits)
    assert(Bloom.hexChars(Bloom.DefaultMBits) === 5)
    assert(Bloom.hexChars(1) === 1)
    assert(Bloom.hexChars(16) === 1)          // 16^1 = 16 positions, exact cover
    assert(Bloom.hexChars(17) === 2)
    assert(Bloom.hexChars(1 << 20) === 5)
    assert(Bloom.hexChars((1 << 20) + 1) === 6)
    assert(Bloom.hexChars(1 << 24) === 6)
    assert(Bloom.hexChars(1 << 28) === 7)
  }

  test("a scaled-up filter addresses its whole space, not the first 2^20 bits") {
    // pre-fix, any mBits > 2^20 silently hashed into [0, 2^20): every
    // word at index >= 2^20/64 stayed zero and the FP rate collapsed.
    val big = 1 << 22
    val grams = (1 to 2000).map(i => s"scale-$i")
    val bits = Bloom.bloomBuild(grams.toDF("g"), "g", mBits = big)
    assert(bits.length === big / 64)
    val upper = bits.drop((1 << 20) / 64)
    assert(upper.exists(_ != 0L),
      "no bit set beyond 2^20 — hash slice is not covering mBits")
    // and the no-false-negative contract holds at the scaled size: every
    // built gram probes positive through the same position derivation
    val probe = Bloom.bloomHitUdf(spark, bits, big)
    val hits = grams.toDF("g")
      .select(probe(Bloom.bloomPositions(col("g"), Bloom.DefaultK, big)).as("hit"))
      .filter(!col("hit")).count()
    assert(hits === 0L)
  }
}
