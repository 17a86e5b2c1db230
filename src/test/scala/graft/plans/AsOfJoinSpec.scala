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
