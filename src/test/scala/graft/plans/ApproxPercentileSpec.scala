package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

class ApproxPercentileSpec extends SparkSpec {

  test("percentile rewrites to the GK sketch only under the opt-in flag") {
    ApproxPercentile.install(spark)
    val ev = graft.Tables.events(spark, sfDir)
    ev.createOrReplaceTempView("ev_pct")

    // flag off (default): exact plan, exact (interpolated) answer
    val off = ev.agg(expr("percentile(value, 0.5)"))
    assert(!off.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
    val exactMedian = off.head().getDouble(0)

    spark.conf.set(ApproxPercentile.Flag, "true")
    try {
      // flag on: the optimized plan carries the sketch aggregate, the
      // result type is STILL double (the rewrite casts back), and the
      // answer is bit-identical to the explicit percentile_approx
      val q = ev.agg(expr("percentile(value, 0.5)"))
      assert(q.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(q.schema.head.dataType == DoubleType,
        "the rewrite must preserve the exact form's DOUBLE result type")
      val viaRule = q.head().getDouble(0)
      val viaExplicit = ev.agg(percentile_approx(col("value"), lit(0.5), lit(10000)))
        .head().getDouble(0)
      assert(viaRule == viaExplicit)
      // ... and is a faithful quantile (within interpolation distance)
      assert(math.abs(viaRule - exactMedian) <= math.abs(exactMedian) * 0.05 + 1e-6)

      // grouped + array-percentage forms rewrite too; array keeps its type
      val grouped = ev.groupBy("event_type")
        .agg(expr("percentile(value, array(0.25, 0.75))").as("iqr"))
      assert(grouped.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(grouped.schema("iqr").dataType == ArrayType(DoubleType, containsNull = false))
      assert(grouped.collect().forall(_.getSeq[Double](1).length == 2))

      // integer column: exact percentile yields DOUBLE; the rewritten
      // plan must too (percentile_approx alone would yield BIGINT)
      val intCol = ev.agg(expr("percentile(event_id, 0.5)"))
      assert(intCol.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(intCol.schema.head.dataType == DoubleType)

      // DISTINCT stays exact
      val dist = sql("SELECT percentile(DISTINCT value, 0.5) FROM ev_pct")
      assert(!dist.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

      // non-unit frequency stays exact (no weighted insert in the sketch)
      val freq = sql("SELECT percentile(value, 0.5, 2) FROM ev_pct")
      assert(!freq.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

      // a frequency that merely FOLDS to 1 rewrites (semantic boundary,
      // not syntactic — the matcher evaluates foldable expressions)
      val folded = sql("SELECT percentile(value, 0.5, 2 - 1) FROM ev_pct")
      assert(folded.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      assert(folded.head().getDouble(0) == viaExplicit)
      // ... while one that folds to a non-1 constant stays exact
      val folded2 = sql("SELECT percentile(value, 0.5, 1 + 1) FROM ev_pct")
      assert(!folded2.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

      // reverse (descending percentile_cont) stays exact
      val rev = sql(
        "SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY value DESC) FROM ev_pct")
      assert(!rev.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

      // percentile as a WINDOW function stays exact (Window node, not
      // Aggregate — the rule never touches it)
      val win = sql(
        "SELECT percentile(value, 0.5) OVER (PARTITION BY event_type) FROM ev_pct")
      assert(!win.queryExecution.optimizedPlan.toString.contains("percentile_approx"))

      // FILTER clause rides through the rewrite
      val filt = sql(
        "SELECT percentile(value, 0.5) FILTER (WHERE value > 0) FROM ev_pct")
      assert(filt.queryExecution.optimizedPlan.toString.contains("percentile_approx"))
      val filtRef = ev.filter(col("value") > 0)
        .agg(percentile_approx(col("value"), lit(0.5), lit(10000))).head().getDouble(0)
      assert(filt.head().getDouble(0) == filtRef)
    } finally spark.conf.set(ApproxPercentile.Flag, "false")

    // flag restored: exact again (the rule reads the conf per query)
    assert(ev.agg(expr("percentile(value, 0.5)")).head().getDouble(0) == exactMedian)
  }
}
