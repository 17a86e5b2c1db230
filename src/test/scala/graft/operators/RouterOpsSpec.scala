package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RouterOpsSpec extends SparkSpec {

  test("intent router: every small-talk class routes to its canned reply, rest to rag") {
    val rows = RouterOps.q51IntentRoute(spark, sfDir).collect()
    val byRoute = rows.groupBy(_.getAs[String]("route")).view.mapValues(_.length).toMap
    assert(byRoute.keySet == Set("greet", "thank", "bye", "rag"))
    // greet wins over any other match; rag rows carry no reply
    rows.foreach { r =>
      val reply = Option(r.getAs[String]("reply"))
      if (r.getAs[String]("route") == "rag") assert(reply.isEmpty)
      else assert(reply.nonEmpty)
    }
    // the doc_id % 5 == 3 rows say "Good morning!" → greet, not rag
    assert(rows.filter(_.getAs[Long]("doc_id") % 5 == 3)
      .forall(_.getAs[String]("route") == "greet"))
  }

  test("unhelpful predicate: short, hedging, and no-evidence answers flagged") {
    val rows = RouterOps.q52Unhelpful(spark, sfDir).collect()
    rows.foreach { r =>
      val expected = (r.getAs[Long]("doc_id") % 6) < 4
      assert(r.getAs[Boolean]("unhelpful") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: ${r.getAs[String]("answer")}")
    }
  }

  test("bullet clean: markers stripped, headers/dialogue dropped, deduped, sentinel fires") {
    val rows = RouterOps.q53BulletClean(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val bullets = r.getAs[String]("bullets")
      if (id % 7 == 0) assert(bullets == "Insufficient evidence.")
      else {
        val lines = bullets.split("\n")
        assert(lines.forall(_.startsWith("• ")))
        // "Finding one"/"finding one" and the two "second point" variants
        // collapse to one each under the alpha-only key
        assert(lines.count(_.toLowerCase.contains("finding one")) == 1)
        assert(lines.count(_.toLowerCase.contains("second point")) == 1)
        assert(!bullets.toLowerCase.contains("assistant:"))
        assert(!bullets.contains("### Response"))
        assert(lines.length <= 10)
      }
    }
  }

  test("bullet verify: verbatim and <=2-missing-word bullets kept, fabricated dropped") {
    val rows = RouterOps.q54BulletVerify(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(!rows.exists(_.getAs[String]("bullet").startsWith("completely unrelated")))
    // the verbatim 50-char bullet survives for every doc (kept by the
    // substring rule even when the cut truncates its last word)
    val docsWithVerbatim = rows.filterNot(_.getAs[String]("bullet").contains("novelword"))
      .map(_.getAs[Long]("doc_id")).toSet
    assert(docsWithVerbatim.size == 500)
  }

  test("word cap: long texts capped at 60 words + ellipsis, short untouched") {
    val rows = RouterOps.q55WordCap(spark, sfDir).collect()
    rows.foreach { r =>
      val capped = r.getAs[String]("capped")
      if (r.getAs[Long]("n_words") > 60) {
        assert(capped.endsWith("…"))
        assert(capped.stripSuffix("…").split("\\s+").length == 60)
      } else assert(!capped.endsWith("…"))
    }
  }

  test("sentence dedup: looped sentences appear exactly once, order preserved") {
    val rows = RouterOps.q56SentenceDedup(spark, sfDir).collect()
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val deduped = r.getAs[String]("deduped")
      assert(deduped.contains(s"Doc $id repeats itself."))
      assert(deduped.indexOf(s"Doc $id repeats itself.") ==
        deduped.lastIndexOf(s"Doc $id repeats itself."), "exact dup must be dropped")
    }
  }
}
