package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec

/** Plan-shape guards for the hygiene properties PLANS.md reports: filter
  * pushdown reaching the parquet scan, column pruning, dimension
  * broadcasting, and narrow text pipelines staying single-shuffle. These
  * fail the build if a refactor silently de-optimizes a plan.
  */
class PlanShapeSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def formatted(df: DataFrame): String = {
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  test("q2: filters are pushed to the parquet scan and only needed columns are read") {
    val f = formatted(graft.operators.Relational.q2FilterProj(spark, sfDir))
    assert("PushedFilters: \\[[^\\]]".r.findFirstIn(f).isDefined, "no pushed filters")
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(f).get.group(1)
    assert(read.count(_ == ':') <= 6, s"scan reads too many columns: $read")
  }

  test("q3: dimension tables join via broadcast, the fact table is never broadcast") {
    val df = graft.operators.Relational.q3JoinAgg(spark, sfDir)
    df.collect()
    val bhj = collectWithSubqueries(df.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.nonEmpty, "expected broadcast hash joins for the dimensions")
    val f = formatted(df)
    assert(!f.contains("CartesianProduct"))
  }

  test("narrow text pipeline (q13) has exactly one exchange — the presentation sort") {
    val df = graft.operators.TextOps.q13CleanText(spark, sfDir)
    df.collect()
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.length <= 1, s"text pipeline grew ${shuffles.length} shuffles")
  }

  test("vector top-k (q28) broadcasts the query side, not the corpus") {
    val f = formatted(graft.operators.ScaleOps.q28KnnBrute(spark, sfDir))
    assert(f.contains("BroadcastNestedLoopJoin"),
      "expected the broadcast-side crossJoin shape")
  }
}
