package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir)

  test("minhash-LSH output equals exact jaccard pairs on the fixture") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8).collect().toSeq
    val lsh = Dedup.minhashLshPairs(docs, "doc_id", "text").collect().toSeq
    assert(exact.nonEmpty)
    assert(lsh == exact)
  }

  test("simhash pairs cover all exact near-dup pairs (recall)") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.9)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simhashPairs(docs, "doc_id", "text")
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val covered = exact.intersect(sim)
    // simhash is an approximation; demand >=80% recall of strong near-dups
    assert(covered.size.toDouble / exact.size >= 0.8,
      s"simhash covered ${covered.size}/${exact.size}")
  }

  test("128-bit simhash banding finds exactly the brute-force hamming<=7 pairs") {
    val got = Dedup.simhash128Pairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val sigs = Dedup.simhash128Signatures(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = (for {
      (a, ha, la) <- sigs
      (b, hb, lb) <- sigs if a < b
      d = java.lang.Long.bitCount(ha ^ hb) + java.lang.Long.bitCount(la ^ lb)
      if d <= 7
    } yield (a, b, d)).toSet
    assert(brute.nonEmpty, "fixture must contain 128-bit simhash near-dups")
    // recall 1.0 by pigeonhole, precision 1.0 by the exact hamming verify
    assert(got == brute)
  }

  test("q145: simhash banded recall audit reports exactly 10000 bp (pigeonhole guarantee)") {
    // the banded+probed generator must find EVERY pair at hamming <= 7 —
    // the pigeonhole construction guarantees it, and the registered
    // audit query executes the claim: banded pairs == exact pairs,
    // recall_bp exactly 10000
    val rows = graft.operators.ScaleOps.q145SimhashRecall(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("exact_pairs") > 0, "fixture must contain simhash near-dups")
    assert(rows("banded_pairs") == rows("exact_pairs"),
      "banded output must equal the brute-force pair set")
    assert(rows("hits") == rows("exact_pairs"))
    assert(rows("recall_bp") == 10000L)
  }

  test("canonical fingerprint groups word-order permutations together") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma"), (2L, "gamma alpha beta"),
                 (3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val groups = Dedup.exactDupGroups(df, "doc_id",
      Dedup.canonicalFingerprint(col("text"))).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("n_docs") == 2)
    assert(groups(0).getAs[Long]("keeper") == 1)
  }

  test("shingles: fewer than n words yields empty, order matters") {
    import spark.implicits._
    val rows = Seq("one two", "a b c d").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3)).as[Seq[String]].collect()
    assert(rows(0).isEmpty)
    assert(rows(1) == Seq("a b c", "b c d"))
  }
}
