package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("q43 sentence chunks: golden-pinned output (fixtures frozen at seed=42)") {
    // q43 has no SQL oracle (greedy packing is a sequential fold); this
    // digest IS its correctness gate — the exact output table at
    // sf0.001, pinned. Any change to the tokenizer, the packing logic,
    // or the fixture shows up as a digest change that must be re-pinned
    // consciously.
    val rows = TextOps.q43SentenceChunkRows(spark, sfDir).collect()
      .map(r => s"${r.getAs[Long]("doc_id")}|${r.getAs[Int]("chunk_id")}|${r.getAs[String]("chunk")}")
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(rows.mkString("\n").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.length == 828, s"rows=${rows.length}")
    assert(digest == "10576484dbebf7aeddba5dac5abcf688", s"digest=$digest")
  }

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
    val out = TextOps.q58PdfPassageRows(spark, sfDir)
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

  test("gopher rules: every boolean matches brute-force recomputation, corpus splits on pass") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val stop = Set("the", "a", "and", "of", "to", "in", "is", "that", "for", "with")
    val out = TextOps.q109GopherRules(spark, sfDir).collect()
    assert(out.length == docs.size)
    out.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val ws = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val n = ws.length.toDouble
      val chars = text.replaceAll("\\s+", "").length.toDouble
      assert(r.getAs[Boolean]("r_len") == (ws.length >= 50 && ws.length <= 100000))
      assert(r.getAs[Boolean]("r_word_len") == (chars / n >= 3.0 && chars / n <= 10.0))
      assert(r.getAs[Boolean]("r_alpha") ==
        (ws.count(_.exists(c => c >= 'a' && c <= 'z')) / n >= 0.8))
      assert(r.getAs[Boolean]("r_stopwords") == (ws.toSet.count(stop) >= 2))
      assert(r.getAs[Boolean]("r_dup_words") == (1.0 - ws.distinct.length / n <= 0.5))
      assert(r.getAs[Boolean]("r_top_word") ==
        (ws.groupBy(identity).values.map(_.length).max / n <= 0.1))
      assert(r.getAs[Boolean]("pass") ==
        Seq("r_len", "r_word_len", "r_alpha", "r_stopwords", "r_dup_words", "r_top_word")
          .forall(r.getAs[Boolean]))
    }
    val passes = out.map(_.getAs[Boolean]("pass")).toSet
    assert(passes == Set(true, false), "the ruleset must split the corpus, not rubber-stamp it")
  }

  test("corpus drift: JS divergence matches brute force and sits inside (0, ln 2)") {
    val words = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source").isin("src0", "src1"))
      .select("source", "text").collect()
      .flatMap(r => r.getAs[String]("text").trim.toLowerCase.split("\\s+")
        .filter(_.nonEmpty).map(w => r.getAs[String]("source") -> w))
    def dist(src: String): Map[String, Double] = {
      val ws = words.collect { case (s, w) if s == src => w }
      ws.groupBy(identity).view.mapValues(_.length.toDouble / ws.length).toMap
    }
    val (pa, pb) = (dist("src0"), dist("src1"))
    val expected = (pa.keySet ++ pb.keySet).toSeq.map { w =>
      val (a, b) = (pa.getOrElse(w, 0.0), pb.getOrElse(w, 0.0))
      val m = (a + b) / 2.0
      ((if (a > 0) a * math.log(a / m) else 0.0) +
       (if (b > 0) b * math.log(b / m) else 0.0)) / 2.0
    }.sum
    val out = TextOps.q110CorpusDrift(spark, sfDir).collect()
    assert(out.length == 10)
    val js = out.head.getAs[Double]("js_divergence")
    assert(out.forall(_.getAs[Double]("js_divergence") == js))
    assert(math.abs(js - expected) < 1e-5, s"js $js vs brute-force $expected")
    assert(js > 0.0 && js < math.log(2.0), "JS of distinct nonidentical slices is in (0, ln 2)")
    val diffs = out.map(_.getAs[Double]("abs_diff"))
    assert(diffs.zip(diffs.tail).forall { case (x, y) => x >= y }, "top contributors first")
  }

  test("bpe training: merge table equals an independent local reference, exactly") {
    import spark.implicits._
    // independent single-machine BPE (same determinism rules: count
    // desc, then (left, right) lexicographic; stop below pair count 2)
    def localBpe(texts: Seq[String], steps: Int): Seq[(Int, String, String, Long)] = {
      var words: Map[Vector[String], Long] = texts
        .flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, g) => w.map(_.toString).toVector -> g.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      var step = 0
      var continue = true
      while (step < steps && continue) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        words.foreach { case (syms, n) =>
          syms.sliding(2).foreach {
            case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
            case _ =>
          }
        }
        val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
        best match {
          case Some(((l, r), c)) if c >= 2 =>
            out += ((step + 1, l, r, c))
            words = words.groupMapReduce { case (syms, _) =>
              val m = scala.collection.mutable.ArrayBuffer.empty[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                  m += (l + r); i += 2
                } else { m += syms(i); i += 1 }
              }
              m.toVector
            }(_._2)(_ + _)
            step += 1
          case _ => continue = false
        }
      }
      out.toSeq
    }
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("text").as[String].collect().toSeq
    val expected = localBpe(texts, 12)
    val got = TextOps.bpeTrain(texts.zipWithIndex.map(t => (t._2.toLong, t._1))
        .toDF("doc_id", "text"), 12)
      .collect().map(r => (r.getAs[Int]("step"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[Long]("pair_count"))).toSeq
    assert(got == expected, "distributed BPE must equal the local reference merge-for-merge")
    assert(got.length == 12, "the fixture has at least 12 productive merges")
  }

  test("bpe encoding: per-doc token counts equal a local reference encode, exactly") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val merges = TextOps.bpeTrain(docs.toDF("doc_id", "text"), 12).collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"))).toSeq
    // local reference: identical sequential rank-order application
    def encode(w: String): Int = {
      var syms = w.map(_.toString).toVector
      for ((l, r) <- merges if syms.length > 1) {
        val m = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            m += (l + r); i += 2
          } else { m += syms(i); i += 1 }
        }
        syms = m.toVector
      }
      syms.length
    }
    val expected = docs.flatMap { case (id, t) =>
      val ws = Option(t).getOrElse("").trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      if (ws.isEmpty) None
      else Some((id, ws.length.toLong, ws.map(encode(_).toLong).sum))
    }.sorted
    val got = TextOps.bpeEncode(docs.toDF("doc_id", "text"), merges).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_bpe_tokens"))).toSeq.sorted
    assert(got == expected, "distributed encode must equal the local reference")
    // merges genuinely compress: strictly fewer tokens than characters
    val chars = expected.map { case (id, _, _) =>
      docs.toMap.apply(id).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .map(_.length.toLong).sum
    }.sum
    assert(got.map(_._3).sum < chars, "BPE tokens must undercut character count")
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

  test("q148 ccnet buckets: thirds partition each source and ppl bounds are ordered") {
    val docs = graft.Tables.documents(spark, sfDir)
    val nRanked = TextOps.lmPerplexity(docs).count()
    val rows = TextOps.q148CcnetBuckets(spark, sfDir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source"))
    assert(bySrc.nonEmpty)
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nRanked,
      "buckets must partition exactly the ranked (>=1-bigram) population")
    bySrc.foreach { case (src, rs) =>
      val m = rs.map(r => r.getAs[String]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("min_ppl_e4"),
          r.getAs[Long]("max_ppl_e4"))).toMap
      assert(m.keySet == Set("head", "middle", "tail"), s"$src buckets")
      val n = m.values.map(_._1).sum
      // integer thirds: head = floor(n/3), head+middle = floor(2n/3)
      assert(m("head")._1 == n / 3, s"$src head size")
      assert(m("head")._1 + m("middle")._1 == 2 * n / 3, s"$src middle size")
      // rank order by (ppl, doc_id) => bucket ppl ranges may touch but
      // never invert
      assert(m("head")._3 <= m("middle")._2 && m("middle")._3 <= m("tail")._2,
        s"$src ppl bounds ordered")
    }
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

  test("q164: lift top-k matches an independent local reimplementation bit-for-bit") {
    // recompute the whole pipeline driver-side with the SAME IEEE double
    // expression tree — counts, totals, floor(lift*1e4), (score desc,
    // bigram asc) ranking — and demand exact row equality
    val texts = graft.Tables.documents(spark, sfDir)
      .select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts) {
      val w = t.trim.split("\\s+")
      w.foreach(x => uni(x) += 1)
      for (i <- 0 until w.length - 1) bi((w(i), w(i + 1))) += 1
    }
    val uniTot = uni.values.sum.toDouble
    val biTot = bi.values.sum.toDouble
    val expected = bi.toSeq.collect { case ((w1, w2), cab) if cab >= 5 =>
      val lift = (cab.toDouble / biTot) /
        ((uni(w1).toDouble / uniTot) * (uni(w2).toDouble / uniTot))
      (s"$w1 $w2", cab, uni(w1), uni(w2), math.floor(lift * 10000.0).toLong)
    }.sortBy { case (bg, _, _, _, s) => (-s, bg) }
      .take(50).zipWithIndex
      .map { case ((bg, cab, ca, cb, s), i) => (bg, cab, ca, cb, s, i + 1L) }
    val got = TextOps.q164PmiCollocations(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(expected.nonEmpty, "fixture must produce min-count bigrams")
    assert(got == expected)
  }
}
