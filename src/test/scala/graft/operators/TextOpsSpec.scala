package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("pmc body: body paragraphs joined with blank lines, back matter excluded") {
    val rows = TextOps.q57PmcBody(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val body = r.getAs[String]("body_text")
      assert(!body.contains("Acknowledgments"), "back matter must not leak into body")
      assert(body.split("\n\n").forall(_.trim.nonEmpty))
    }
  }

  test("pdf passages: artifacts and page furniture removed, passages overlap") {
    val out = TextOps.q58PdfPassages(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val texts = rows.map(_.getAs[String]("text"))
    assert(texts.forall(t => !t.contains("Page 3") && !t.contains("© 2020")),
      "page furniture must be stripped")
    // hyphen line-break joined: the synthetic 'hyphen-\nated' must surface joined
    assert(texts.exists(_.contains("hyphenated")), "hyphen break must be rejoined")
    // per file: passage k starts 250 chars after passage k-1 (300 size / 50 overlap)
    val ids = rows.map(r => (r.getAs[String]("file_path"), r.getAs[Int]("passage_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(ids.values.forall(s => s == (0 until s.length)))
  }

  test("train split: deterministic, stratification-free hash, roughly 80/20") {
    val rows = TextOps.q59TrainSplit(spark, sfDir).collect()
    val train = rows.count(_.getAs[String]("split") == "train")
    val frac = train.toDouble / rows.length
    assert(frac > 0.72 && frac < 0.90, s"train fraction $frac")
    // deterministic: same assignment on a second run
    val again = TextOps.q59TrainSplit(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(2))).toSeq)
  }

  test("uid map: pmcid normalized from the idtype map entry") {
    val rows = TextOps.q60UidMap(spark, sfDir).limit(5).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("pmcid") == s"PMC${id + 7}")
      assert(r.getAs[String]("doi") == s"10.1000/doc.$id")
      assert(r.getAs[String]("pubmed_uid") == id.toString)
    }
  }

  test("unicode fold: smart quotes, dashes, accents, ellipsis folded to ASCII") {
    val rows = TextOps.q61UnicodeFold(spark, sfDir).limit(3).collect()
    rows.foreach { r =>
      val folded = r.getAs[String]("folded")
      assert(folded.startsWith("\"") && folded.endsWith("\" - cafe resume..."))
      assert(folded.forall(_ < 128), s"non-ASCII survived: $folded")
    }
  }

  test("lm perplexity: deterministic transitions give ppl exactly 1") {
    import spark.implicits._
    // one doc, one chain a->b->a->...: every conditional is certain
    val out = TextOps.lmPerplexity(
        Seq((1L, "a b a b a b a b")).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_bigrams") == 7L)
    assert(out.head.getAs[Double]("avg_nll") == 0.0)
    assert(out.head.getAs[Double]("ppl") == 1.0)
  }

  test("lm perplexity: even two-way branch gives ppl 1.9999, short docs drop out") {
    import spark.implicits._
    // corpus c(a b) = c(a c) = 1 → P = 0.5 for each doc's single bigram;
    // true ppl = 2, but exp runs on the FLOOR-ROUNDED avg_nll (0.6931 <
    // ln 2) by design — deterministic and engine-identical beats exact:
    // exp(0.6931) = 1.99991 → 1.9999. One-word doc has no bigram → no row.
    val out = TextOps.lmPerplexity(
        Seq((1L, "a b"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(out == Map(1L -> 1.9999, 2L -> 1.9999))
  }

  test("lm perplexity: corpus-divergent doc scores strictly higher") {
    import spark.implicits._
    // docs 1–3 all carry a 1:1 mix of (a b, b a); doc 4's 1:1 mix of
    // (a c, c a) takes the rare a-branch: P(b|a)=0.6 vs P(c|a)=0.4
    val docs = Seq(
      (1L, "a b a"), (2L, "a b a b a"), (3L, "a b a b a b a"),
      (4L, "a c a c a")).toDF("doc_id", "text")
    val ppl = TextOps.lmPerplexity(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("ppl")).toMap
    assert(ppl(4L) > ppl(1L), "the doc using rare transitions must score higher")
    assert(ppl(1L) == ppl(2L) && ppl(2L) == ppl(3L),
      "docs made of the same transitions at the same mix score identically")
  }
}
