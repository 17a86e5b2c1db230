package graft.operators

import graft.SparkSpec

/** Semantics pins for the curation scorers (q167–q169) on hand-checked
  * fixtures, including the whitespace-edged inputs the unified
  * `\S+`-run tokenizer exists for.
  */
class CurationOpsSpec extends SparkSpec {

  test("ngramNovelty: first doc owns shared shingles; whitespace edges tokenize as \\S+ runs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),          // shingles: "a b c", "b c d" — both first here
      (2L, "a b c d"),          // exact copy: novelty 0
      (3L, "\ta b c\n"),        // tab/newline edges: tokens a,b,c — "a b c" owned by doc 1
      (4L, "x y z w"),          // all new
      (5L, "a b")               // < 3 tokens: absent
    ).toDF("doc_id", "text")
    val out = CurationOps.ngramNovelty(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == ((2L, 2L, 10000L)))
    assert(out(2L) == ((0L, 2L, 0L)))
    assert(out(3L) == ((0L, 1L, 0L))) // its only shingle "a b c" is doc 1's
    assert(out(4L) == ((2L, 2L, 10000L)))
    assert(!out.contains(5L))
  }

  test("hapaxContributors: df=1 tokens counted per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta shared"),
      (2L, "gamma shared shared"), // distinct tokens: gamma, shared
      (3L, "")                     // no tokens: absent
    ).toDF("doc_id", "text")
    val out = CurationOps.hapaxContributors(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // hapax tokens: alpha, beta, gamma (shared has df 2)
    assert(out(1L) == ((2L, 3L, 6666L)))
    assert(out(2L) == ((1L, 2L, 5000L)))
    assert(!out.contains(3L))
  }

  test("termSalience: rare high-tf terms outrank common ones; ties break on token") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rare rare common"),
      (2L, "common other"),
      (3L, "common other2")
    ).toDF("doc_id", "text")
    val rows = CurationOps.termSalience(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4), r.getLong(5)))
    // N = 3 docs. doc 1: rare tf=2 df=1 → floor(2*1e4*3/1)=60000;
    // common tf=1 df=3 → 10000. Order: rare then common.
    assert(rows.filter(_._1 == 1L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("rare", 60000L, 1L), ("common", 10000L, 2L)))
    // doc 2: other (df=1, 30000) then common (10000)
    assert(rows.filter(_._1 == 2L).map(_._2).toSeq == Seq("other", "common"))
  }

  test("vocabCoverage: thresholds partition occurrence mass correctly") {
    import spark.implicits._
    // counts: a→4, b→2, c→1 ⇒ total 7.
    val docs = Seq((1L, "a a b c"), (2L, "a a b")).toDF("doc_id", "text")
    val out = CurationOps.vocabCoverage(docs, "doc_id", "text", Seq(2L, 3L))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // t=2: vocab {a,b}, oov = c(1) → bp floor(1e4/7)=1428
    assert(out(2L) == ((2L, 1L, 7L, 1428L)))
    // t=3: vocab {a}, oov = b(2)+c(1)=3 → floor(3e4/7)=4285
    assert(out(3L) == ((1L, 3L, 7L, 4285L)))
  }

  test("shingleDfHistogram: exact power-of-two buckets") {
    import spark.implicits._
    // "s t u" appears in 3 docs (df=3 → bucket 1); each doc also has a
    // unique shingle (df=1 → bucket 0)
    val docs = Seq(
      (1L, "s t u p1 p1b"), (2L, "s t u p2 p2b"), (3L, "s t u p3 p3b")
    ).toDF("doc_id", "text")
    val out = CurationOps.shingleDfHistogram(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // per doc distinct 3-gram shingles: "s t u", "t u pX", "u pX pXb" —
    // the latter two unique per doc (df=1): 6 shingles in bucket 0;
    // "s t u" df=3 → bucket 1 (bit-length(3)-1 = 1), occurrences 3
    assert(out(0L) == ((6L, 6L)))
    assert(out(1L) == ((1L, 3L)))
  }

  test("registered queries return rows at sf0.001") {
    assert(CurationOps.q167NgramNovelty(spark, sfDir).count() > 0)
    assert(CurationOps.q168HapaxContributors(spark, sfDir).count() > 0)
    assert(CurationOps.q169TermSalience(spark, sfDir).count() > 0)
    assert(CurationOps.q170VocabCoverage(spark, sfDir).count() == 4)
    assert(CurationOps.q171ShingleDfHistogram(spark, sfDir).count() > 0)
  }
}
