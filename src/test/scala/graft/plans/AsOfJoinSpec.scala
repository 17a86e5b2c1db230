package graft.plans

import graft.SparkSpec
import graft.streaming.Events
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("custom as-of exec equals the composed range-join + window form on the fixture") {
    val composed = Events.q50AsofJoin(spark, sfDir)
      .select("purchase_id", "user_id", "p_tss", "signup_id", "s_tss").collect().toSeq
    val custom = Events.q63AsofCustom(spark, sfDir).collect().toSeq
    assert(composed.nonEmpty)
    assert(custom == composed)
  }

  test("plan shape: no window, one exchange per side, merge exec present") {
    val df = Events.q63AsofCustom(spark, sfDir)
    df.collect() // finalize any adaptive re-planning before inspecting
    val plan = df.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: AsOfJoinExec => e }.nonEmpty,
      "custom exec must be planned")
    assert(collectWithSubqueries(plan) { case w: WindowExec => w }.isEmpty,
      "the custom operator must not fall back to a window")
    // exchanges: one per join side (key) + the presentation orderBy range
    val shuffles = collectWithSubqueries(plan) { case s: ShuffleExchangeExec => s }
    assert(shuffles.length <= 3, s"expected <=3 exchanges, got ${shuffles.length}")
  }

  test("skew: hot key stays linear in the custom exec while the composed form pays the pair blow-up") {
    // one user owns ~all events: n purchases interleaved with n signups.
    // The composed range-join materializes every (purchase, signup<=) pair
    // for the hot key — ~n^2/2 rows — before its window keeps one per
    // purchase; the custom exec's per-partition merge emits exactly one
    // row per purchase with O(s + p) work and no intermediate pairs.
    val n = 500
    val purchases = ((1 to n).map(i => (1000L + i, 1L, 2L * i)) :+ (9000L, 2L, 10L))
      .toDF("purchase_id", "user_id", "p_tss")
    val signups = ((1 to n).map(i => (3000L + i, 1L, 2L * i - 1)) :+ (9100L, 2L, 5L))
      .toDF("signup_id", "s_user", "s_tss")

    val t0 = System.nanoTime()
    val nPairs = purchases.join(signups,
      col("user_id") === col("s_user") && col("s_tss") <= col("p_tss")).count()
    val composedMs = (System.nanoTime() - t0) / 1e6
    // the blow-up is real: 1+2+...+n pairs from the hot key alone
    assert(nPairs >= n.toLong * (n + 1) / 2,
      s"expected the composed form to materialize >=${n * (n + 1) / 2} pairs, got $nPairs")

    val t1 = System.nanoTime()
    val out = AsOfJoin.join(purchases, signups,
        "user_id", "s_user", "p_tss", "s_tss", Seq("signup_id"))
      .select("purchase_id", "signup_id").collect()
    val customMs = (System.nanoTime() - t1) / 1e6
    // one output row per purchase — nothing intermediate to blow up
    assert(out.length == n + 1)
    val got = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // purchase at time 2i matches the signup at 2i-1, every i; no cross-key bleed
    (1 to n).foreach { i =>
      assert(got(1000L + i) == 3000L + i, s"purchase ${1000 + i} matched ${got(1000L + i)}")
    }
    assert(got(9000L) == 9100L)
    info(f"hot-key n=$n: composed pair count $nPairs ($composedMs%.0f ms), " +
      f"custom exec ${out.length} rows ($customMs%.0f ms)")
  }

  test("edge semantics: unmatched left kept with nulls, ties break to highest id, no time travel") {
    val purchases = Seq(
      (100L, 1L, Some(50L)), // matched by the later of two signups <= 50
      (101L, 1L, Some(5L)),  // before any signup -> null
      (102L, 2L, Some(30L)), // tie on time -> highest signup_id
      (103L, 3L, Some(10L)), // user with no signups -> null
      (104L, 1L, None)       // null time -> no match, row kept
    ).toDF("purchase_id", "user_id", "p_tss")
    val signups = Seq(
      (200L, 1L, 10L), (201L, 1L, 40L), (202L, 1L, 60L),
      (210L, 2L, 30L), (211L, 2L, 30L),
      (220L, 4L, 1L)
    ).toDF("signup_id", "s_user", "s_tss")
    val out = AsOfJoin.join(purchases, signups,
        "user_id", "s_user", "p_tss", "s_tss", Seq("signup_id"))
      .select("purchase_id", "signup_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(100L -> 201L, 101L -> -1L, 102L -> 211L, 103L -> -1L,
      104L -> -1L))
  }
}
