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

  test("union: merged corpus text traces to EVERY branch's sources (set equality)") {
    // branch 1's to_text is text alone; branch 2's is a concat over
    // doc_id AND text — the union column must carry the union of both,
    // not just branch 1's (Union.output reuses branch 1's exprIds, the
    // clobber the merge order must survive)
    val lin = Lineage.of(graft.operators.Relational.q66CorpusMerge(spark, sfDir))
    assert(lin("to_text") == Set("documents.text", "documents.doc_id"),
      s"got ${lin("to_text")}")
    assert(lin("doc_id") == Set("documents.doc_id"))
    assert(lin("record_type") == Set.empty,
      "both branches are literals — no source columns")
  }
}
