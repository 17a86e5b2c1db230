package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, ExprId, NamedExpression, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage from the ANALYZED Catalyst plan: for each output
  * column, the set of `table.column` source columns it derives from —
  * the governance question ("where does this number come from?") every
  * data platform eventually has to answer, answered here from the same
  * plan Catalyst optimizes, so it can never drift from execution the
  * way doc-comment lineage does.
  *
  * The walk is bottom-up over attribute ids: leaves seed each scan
  * attribute with its table-qualified name; Project / Aggregate /
  * Window / Generate map their defined expressions to the union of
  * their references' lineage; Union merges positionally (column i of
  * the union derives from column i of EVERY branch); every other node
  * (Filter, Join, Sort, …) defines no columns and passes the map
  * through. Lineage here is DATA lineage of the value itself — columns
  * that only gate rows (filter/join predicates) are by design not
  * included in an output column's set.
  */
object Lineage {

  def of(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  /** The q3 join+aggregate's lineage as a table — the report a catalog
    * ingests. Registered (q134) so the driver gate pins the walk's
    * output; an empty source set (count(1)) lands as one '' row so the
    * column still appears in the report.
    */
  def q134Lineage(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Lineage.of(graft.operators.Relational.q3JoinAgg(spark, dir)).toSeq
      .flatMap { case (out, srcs) =>
        if (srcs.isEmpty) Seq((out, "")) else srcs.toSeq.sorted.map(out -> _)
      }
      .toDF("out_col", "src_col")
      .orderBy("out_col", "src_col")
  }

  private def tableName(l: LeafNode): String = l match {
    case r: LogicalRelation =>
      r.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          val p = fs.location.rootPaths.headOption.map(_.getName).getOrElse("scan")
          p.stripSuffix(".parquet")
        case _ => "scan"
      }
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  private def refs(e: Expression, m: Map[ExprId, Set[String]]): Set[String] = e match {
    // a window VALUE derives from the window function's data arguments;
    // the spec's partition/order keys gate WHICH rows feed it, same as a
    // join key — not data lineage of the value itself
    case we: WindowExpression => refs(we.windowFunction, m)
    case _ if e.children.exists(_.exists(_.isInstanceOf[WindowExpression])) =>
      e.children.flatMap(c => refs(c, m)).toSet
    case _ =>
      e.references.toSeq.flatMap(a => m.getOrElse(a.exprId, Set.empty[String])).toSet
  }

  private def define(nes: Seq[NamedExpression],
                     m: Map[ExprId, Set[String]]): Map[ExprId, Set[String]] =
    m ++ nes.map {
      case a: Alias     => a.exprId -> refs(a.child, m)
      case att: Attribute => att.exprId -> m.getOrElse(att.exprId, Set.empty[String])
      case ne           => ne.exprId -> refs(ne, m)
    }

  private def walk(p: LogicalPlan): Map[ExprId, Set[String]] = p match {
    case l: LeafNode =>
      val t = tableName(l)
      l.output.map(a => a.exprId -> Set(s"$t.${a.name}")).toMap
    case u: Union =>
      // positional: output column i derives from column i of every child.
      // Union.output REUSES the first child's exprIds, so the merged
      // positional entries must be added LAST — the other way round the
      // first child's own (single-branch) lineage clobbers them and
      // union columns report only branch-1 sources
      val childMaps = u.children.map(walk)
      val perChild = u.children.zip(childMaps)
      childMaps.fold(Map.empty[ExprId, Set[String]])(_ ++ _) ++
        u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> perChild.flatMap { case (c, m) =>
            m.getOrElse(c.output(i).exprId, Set.empty[String])
          }.toSet
        }.toMap
    case other =>
      val base = other.children.map(walk).fold(Map.empty[ExprId, Set[String]])(_ ++ _)
      other match {
        case pr: Project   => define(pr.projectList, base)
        case ag: Aggregate => define(ag.aggregateExpressions, base)
        case w: Window     => define(w.windowExpressions, base)
        case g: Generate   =>
          base ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator, base))
        case _ => base
      }
  }
}
