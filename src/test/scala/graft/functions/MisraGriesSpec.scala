package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The MG guarantee (est <= true <= est + N/(m+1)) must hold for the
  * local fold AND for every distributed merge tree — the summary content
  * may differ by partitioning, the bound may not.
  */
class MisraGriesSpec extends SparkSpec {
  import spark.implicits._

  private def stream(seed: Int, n: Int, zipfHot: Boolean): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    val vocab = (0 until 50).map(i => s"w$i")
    (0 until n).map { _ =>
      if (zipfHot && rnd.nextInt(3) == 0) "hot" // ~1/3 of the stream
      else vocab(rnd.nextInt(vocab.length))
    }
  }

  private def checkBound(items: Seq[String], sk: Map[String, Long], m: Int): Unit = {
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val slack = items.size.toLong / (m + 1)
    assert(sk.size <= m, s"summary must hold at most $m counters, got ${sk.size}")
    (truth.keySet ++ sk.keySet).foreach { w =>
      val t = truth.getOrElse(w, 0L); val e = sk.getOrElse(w, 0L)
      assert(e <= t, s"$w: estimate $e must never exceed true count $t")
      assert(t - e <= slack, s"$w: true $t - est $e must be within N/(m+1)=$slack")
    }
  }

  test("local fold: bound holds on random streams, heavy hitter guaranteed present") {
    for (seed <- 1 to 10) {
      val items = stream(seed, 3000, zipfHot = true)
      val sk = MisraGries.local(8, items)
      checkBound(items, sk, 8)
      // hot has freq ~N/3 > N/9, so MG can NOT have evicted it
      assert(sk.contains("hot"), s"seed=$seed: frequency above N/(m+1) guarantees presence")
    }
  }

  test("distributed aggregation: bound survives any partitioning") {
    val items = stream(99, 5000, zipfHot = true)
    for (parts <- Seq(1, 4, 7)) {
      val sk = items.toDF("w").repartition(parts)
        .agg(MisraGries.sketch(8)(col("w"))).as[Map[String, Long]].head()
      checkBound(items, sk, 8)
      assert(sk.contains("hot"))
    }
  }

  test("merge unit properties: identity, size cap, count conservation upper bound") {
    val mg = new MisraGries.MG(4)
    val a = Map("x" -> 5L, "y" -> 3L, "z" -> 2L, "u" -> 2L)
    assert(mg.merge(a, mg.zero) == a, "merging with zero must be identity")
    val b = Map("x" -> 1L, "v" -> 6L, "t" -> 4L, "s" -> 1L)
    val merged = mg.merge(a, b)
    assert(merged.size <= 4)
    // post-merge estimates never exceed the summed inputs
    merged.foreach { case (k, c) =>
      assert(c <= a.getOrElse(k, 0L) + b.getOrElse(k, 0L))
    }
  }

  test("q106 streaming twin: same anchors as q102, per-bucket guarantee holds after streamed folds") {
    val batch = graft.operators.TextOps.q102HeavyHitters(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("word"), r.getAs[Long]("cnt")))
    val streamed = graft.streaming.Events.q106StreamHeavyHitters(spark, sfDir).collect()
    assert(streamed.map(r => (r.getAs[Int]("rank"), r.getAs[String]("word"),
      r.getAs[Long]("cnt"))).toSeq == batch.toSeq,
      "exact anchors must be identical to the batch form")
    assert(streamed.forall(_.getAs[Boolean]("mg_ok")),
      "the per-bucket MG guarantee must hold for state built from stream arrival order")
  }

  test("q102 registration: exact anchors ranked, every guarantee boolean true") {
    val rows = graft.operators.TextOps.q102HeavyHitters(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    assert(rows.forall(_.getAs[Boolean]("mg_ok")), "MG guarantee must hold for every anchor")
  }
}
