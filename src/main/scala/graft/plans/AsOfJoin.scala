package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.PlanShim

/** As-of join as a first-class Catalyst operator (custom-operator ladder
  * rung (c): LogicalPlan + SparkStrategy + SparkPlan): each left row is
  * joined to the single right row with the same key and the greatest
  * right-time ≤ left-time (left outer).
  *
  * Why a physical operator instead of the composed form
  * (`Events.q50AsofJoin`: range join + per-left-row top-1 window): the
  * composed plan materializes EVERY (left, right-with-time≤) pair before
  * the window discards all but one — a user with s signups and p
  * purchases costs O(s·p) join rows. This exec hash-partitions both
  * sides by key (one shuffle each), sorts within partitions by
  * (key, time [, tie-breaks]), and runs a LINEAR merge that carries the
  * latest matching right row — O(s + p) per key, no window, no
  * intermediate pair blow-up. That is the difference between "works on
  * the fixture" and "works when one user has a million events".
  *
  * Reference semantics anchor: the reference resolves each article to
  * the latest crawl/state at-or-before a timestamp in its incremental
  * update path; tie-breaks make the choice total (last in ascending
  * (time, tieBreaks...) order wins, matching the composed form's
  * `ORDER BY time DESC, id DESC` pick with `rk = 1`).
  */
object AsOfJoin {

  /** Left-outer as-of join builder. `rightTieBreaks` complete the right
    * ordering so equal-time matches are deterministic (last in ascending
    * order wins = highest tie-break value).
    */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTieBreaks: Seq[String] = Nil): DataFrame = {
    val spark = left.sparkSession
    // fresh exprIds on the right side: self-join inputs otherwise carry
    // identical attribute ids on both sides and the node can't resolve
    val rAliased = right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
    val lPlan = PlanShim.analyzed(left)
    val rPlan = PlanShim.analyzed(rAliased)
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${p.output.map(_.name)}"))
    ensureStrategy(spark)
    PlanShim.ofRows(spark, AsOfJoinNode(
      lPlan, rPlan,
      attr(lPlan, leftKey), attr(rPlan, rightKey),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      rightTieBreaks.map(attr(rPlan, _))))
  }

  /** Idempotently register the planner strategy on a live session (the
    * extensions path `spark.sql.extensions=graft.plans.GraftExtensions`
    * covers session build time).
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val ss = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!ss.experimental.extraStrategies.contains(AsOfJoinStrategy))
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}

/** Logical node: output = left ++ right(nullable) — left outer. */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTieBreaks: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, tb) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}

/** Physical sort-merge as-of join.
  *
  * Child requirements do the heavy lifting declaratively: clustered
  * distribution on the key (EnsureRequirements inserts ONE hash exchange
  * per side, co-partitioned) and within-partition ordering
  * (key, time [, tieBreaks]) — then `doExecute` is a straight linear
  * merge per partition pair.
  */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Attribute, rightKey: Attribute,
                        leftTime: Attribute, rightTime: Attribute,
                        rightTieBreaks: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    SortOrder(rightKey, Ascending) +: SortOrder(rightTime, Ascending) +:
      rightTieBreaks.map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override def outputPartitioning = left.outputPartitioning

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    import org.apache.spark.sql.catalyst.expressions.Expression
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTimeB = BindReferences.bindReference(leftTime: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTimeB = BindReferences.bindReference(rightTime: Expression, right.output)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rBuf = rIter.buffered
      var matchRow: InternalRow = null
      var matchKey: Any = null
      lIter.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTimeB.eval(l)
        if (matchRow != null && (lk == null || keyOrd.compare(matchKey, lk) != 0)) {
          matchRow = null; matchKey = null
        }
        if (lk != null && lt != null) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val rk = rKeyB.eval(rBuf.head)
            val rt = rTimeB.eval(rBuf.head)
            if (rk == null || rt == null) rBuf.next() // null key/time never matches
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) { rBuf.next(); matchRow = null; matchKey = null } // left keys only grow
              else if (c == 0 && timeOrd.compare(rt, lt) <= 0) {
                matchRow = rBuf.next().copy(); matchKey = rk
              } else advance = false
            }
          }
        }
        // null key or null time on the left ⇒ no match, like an equi-join
        proj(joined(l,
          if (matchRow != null && lk != null && lt != null) matchRow else nullRight))
      }
    }
  }
}
