package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Randomized invariant pins for the dedup/packing family: 10 corpora
  * generated from a FIXED seed (deterministic — no flaky runs), tiny
  * vocabulary to force heavy line/fingerprint collisions, invariants
  * checked against brute-force Scala recomputation. Complements
  * ScaleOpsSpec's hand-built cases: these catch the conservation /
  * exactly-once properties a single fixture can't sweep.
  */
class ScaleOpsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val vocab = Array("a", "b", "c", "d", "e")

  private def corpus(seed: Int, nDocs: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    (0L until nDocs).map { id =>
      // doc length 0..39 words over a 5-word vocab: line collisions are
      // common, empty/short docs exercise the edge paths
      val n = rnd.nextInt(40)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
  }

  private def gridLines(text: String, w: Int): Seq[String] =
    text.trim.split("\\s+").filter(_.nonEmpty).grouped(w)
      .map(_.mkString(" ")).toSeq

  test("lineDedup invariants: each distinct line survives exactly once, counts conserve") {
    for (seed <- 1 to 10) {
      val docs = corpus(seed, 30)
      val out = ScaleOps.lineDedup(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      val allLines = docs.flatMap { case (_, t) => gridLines(t, 3) }
      val keptLines = out.flatMap { case (_, _, _, kt) => gridLines(kt, 3) }
      // grouped(3) re-splits kept_text exactly because every kept line is
      // 3 words except possibly a doc's LAST line — and a short line can
      // only be last in its doc, so reassembly keeps it last
      assert(keptLines.sorted.toSeq == allLines.distinct.sorted.toSeq,
        s"seed=$seed: survivors must be exactly the distinct input lines")
      assert(out.map(_._2).sum == allLines.distinct.size,
        s"seed=$seed: n_kept must total the distinct line count")
      // kept+dropped covers exactly the docs that SURVIVED (a doc whose
      // every line was seen earlier has no output row, by design)
      val outDocs = out.map(_._1).toSet
      val expectedGrid = docs.filter(d => outDocs(d._1))
        .flatMap { case (_, t) => gridLines(t, 3) }
      assert(out.map(r => r._2 + r._3).sum == expectedGrid.size,
        s"seed=$seed: kept+dropped must total the surviving docs' grid")
    }
  }

  test("packSequences invariants: token conservation, bins start at 0 and are dense") {
    for (seed <- 11 to 20) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 40L).map(i =>
        (s"s${i % 3}", i, 1L + rnd.nextInt(200)))
      val out = ScaleOps.packSequences(rows.toDF("source", "doc_id", "n_tokens"),
          "source", "doc_id", "n_tokens", 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // brute-force the whole expected output: per shard in doc order,
      // bin = first-token offset / budget (bins can SKIP indices when a
      // doc exceeds the budget — that is correct concat-and-chunk)
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (src, docs) =>
        var offset = 0L
        docs.sortBy(_._2).map { case (_, _, n) =>
          val bin = offset / 100L; offset += n; (src, bin, n)
        }.groupBy(_._2).map { case (bin, xs) =>
          (src, bin, xs.size.toLong, xs.map(_._3).sum)
        }
      }.sortBy(r => (r._1, r._2))
      assert(out.sortBy(r => (r._1, r._2)).toSeq == expected,
        s"seed=$seed: packed output must equal brute-force recomputation")
    }
  }

  test("keeperDedup invariants: keeper is the argmax-token member of its cluster") {
    for (seed <- 21 to 30) {
      val docs = corpus(seed, 30).filter(_._2.nonEmpty)
      val byFp = docs.groupBy { case (_, t) =>
        t.trim.split("\\s+").distinct.sorted.mkString(" ")
      }.filter(_._2.size > 1)
      val out = ScaleOps.keeperDedup(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => (r.getAs[Long]("keeper"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("keeper_tokens")))
      assert(out.length == byFp.size, s"seed=$seed: one row per >1 cluster")
      val expected = byFp.values.map { members =>
        val toks = members.map { case (id, t) => (id, t.trim.split("\\s+").length.toLong) }
        val best = toks.minBy { case (id, n) => (-n, id) }
        (best._1, members.size.toLong, best._2)
      }.toSeq.sortBy(_._1)
      assert(out.sortBy(_._1).toSeq == expected, s"seed=$seed: keeper must be argmax")
    }
  }

  test("unimaxAllocation invariants: conservation, caps respected, water-filling fairness") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(seed)
      val langs = (0 until 2 + rnd.nextInt(8))
        .map(i => (s"l$i", 1L + rnd.nextInt(1000).toLong))
      val cap = 1L + rnd.nextInt(3)
      val budget = rnd.nextInt(3000).toLong
      val out = ScaleOps.unimaxAllocation(langs, cap, budget)
      val totalCap = langs.map(cap * _._2).sum
      // never over-cap, never negative
      assert(out.forall { case (_, n, c, a, _, capped) =>
        c == cap * n && a >= 0L && a <= c && capped == (a == c) })
      // conservation: spend min(budget, total capacity); the only
      // shortfall is integer-division remainder, bounded by langs-1
      val spent = out.map(_._4).sum
      val target = math.min(budget, totalCap)
      assert(spent <= target && target - spent < langs.length,
        s"seed=$seed: spent $spent of $target")
      // water-filling monotonicity: caps ascend in processing order and
      // the uniform share never shrinks, so allocations are
      // non-decreasing — the greedy never gives a later (bigger)
      // language less than an earlier (smaller) one
      val allocs = out.map(_._4)
      assert(allocs.zip(allocs.drop(1)).forall { case (x, y) => x <= y },
        s"seed=$seed: allocations must be non-decreasing: $allocs")
    }
  }
}
