package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ApproxDistinctSpec extends SparkSpec {

  test("count(DISTINCT) rewrites to HLL++ only under the opt-in flag") {
    ApproxDistinct.install(spark)
    val ev = graft.Tables.events(spark, sfDir)
    val exactTruth = ev.select("user_id").distinct().count()

    // flag off (default): exact plan, exact answer
    val offPlan = ev.agg(countDistinct("user_id")).queryExecution.optimizedPlan.toString
    assert(!offPlan.contains("approx_count_distinct"))
    assert(ev.agg(countDistinct("user_id")).head().getLong(0) == exactTruth)

    spark.conf.set(ApproxDistinct.Flag, "true")
    try {
      // flag on: the optimized plan carries the sketch aggregate and the
      // answer is bit-identical to the explicit approx_count_distinct
      val q = ev.agg(countDistinct("user_id"))
      assert(q.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      val viaRule = q.head().getLong(0)
      val viaExplicit = ev.agg(approx_count_distinct("user_id")).head().getLong(0)
      assert(viaRule == viaExplicit)

      // grouped aggregation rewrites too
      val grouped = ev.groupBy("event_type").agg(countDistinct("user_id").as("ndv"))
      assert(grouped.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      val g = grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val gRef = ev.groupBy("event_type").agg(approx_count_distinct("user_id").as("ndv"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(g == gRef)

      // the multi-column form has no HLL equivalent — left exact
      val multi = ev.agg(countDistinct("user_id", "event_type"))
      assert(!multi.queryExecution.optimizedPlan.toString.contains("approx_count_distinct"))
      assert(multi.head().getLong(0) ==
        ev.select("user_id", "event_type").distinct().count())

      // multiple distinct GROUPS stay exact — and the guard must hold on
      // the PRE-expansion plan shape too: via injectOptimizerRule the
      // rule runs BEFORE the core optimizer's RewriteDistinctAggregates,
      // where a multi-group aggregate is still in original form (the
      // post-hoc install path only ever sees it expanded, which hid
      // exactly this bug in an earlier version — review finding). Apply
      // the rule directly to the analyzed plan to pin that path:
      val rule = ApproxCountDistinctRule(spark)
      val multiAnalyzed = ev.agg(countDistinct("user_id"), countDistinct("event_type"))
        .queryExecution.analyzed
      assert(rule(multiAnalyzed) == multiAnalyzed,
        "a multi-distinct-group aggregate must not rewrite on any injection path")
      val oneAnalyzed = ev.agg(countDistinct("user_id")).queryExecution.analyzed
      assert(rule(oneAnalyzed).toString.contains("approx_count_distinct"),
        "the single-group shape must rewrite on the pre-expansion plan")
      // and end-to-end through the post-hoc path:
      val twoGroups = ev.agg(countDistinct("user_id"), countDistinct("event_type"))
        .head()
      assert(twoGroups.getLong(0) == exactTruth)
      assert(twoGroups.getLong(1) == ev.select("event_type").distinct().count())
    } finally spark.conf.set(ApproxDistinct.Flag, "false")

    // flag restored: exact again (the rule reads the conf per query)
    assert(ev.agg(countDistinct("user_id")).head().getLong(0) == exactTruth)
  }
}
