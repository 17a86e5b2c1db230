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
}
