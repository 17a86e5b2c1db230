package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The lineage walk must answer "where does this column come from?"
  * correctly through joins, aggregates, windows, generators, and
  * unions — pinned on real registered queries, not toy frames.
  */
class LineageSpec extends SparkSpec {

  test("join + aggregate: revenue traces to lineitem price columns, key to nation") {
    val lin = Lineage.of(graft.operators.Relational.q3JoinAgg(spark, sfDir))
    assert(lin("n_name") == Set("nation.n_name"))
    assert(lin("revenue") == Set("lineitem.l_extendedprice", "lineitem.l_discount"))
    assert(lin("n_items") == Set.empty, "count(1) derives from no source column")
  }

  test("generator: exploded passages trace back to the document text") {
    val lin = Lineage.of(graft.operators.TextOps.q18Passages(spark, sfDir))
    assert(lin.contains("passage"))
    assert(lin("passage").contains("documents.text"),
      s"passage must trace to documents.text, got ${lin("passage")}")
  }

  test("window: forward-filled value traces to its data inputs, not the window keys") {
    val lin = Lineage.of(graft.streaming.Events.q114ForwardFill(spark, sfDir))
    // value and the purchase-predicate column both DETERMINE the value;
    // the partition key (user_id) and order key (ts) only gate rows
    assert(lin("last_purchase_value") == Set("events.value", "events.event_type"),
      s"got ${lin("last_purchase_value")}")
  }

  test("union: merged corpus text traces to both branches' sources") {
    val lin = Lineage.of(graft.operators.Relational.q66CorpusMerge(spark, sfDir))
    assert(lin("to_text").contains("documents.text"))
    assert(lin("doc_id").contains("documents.doc_id"))
  }
}
