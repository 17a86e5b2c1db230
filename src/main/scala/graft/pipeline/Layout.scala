package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout: z-order (Morton) interleaving — the
  * fifth data-layout lever next to partition pruning, bucketing, bloom
  * pruning, and single-column row-group sorting (PlanShapeSpec proves
  * each). A lake sorted on ONE column skips row groups only for
  * predicates on that column; sorting by the interleaved bits of two
  * columns gives BOTH dimensions locality, so min/max stats stay tight
  * for either predicate — what Delta/Iceberg expose as OPTIMIZE ZORDER,
  * expressed here as a plain codegen'd sort key (a static tree of
  * shift/and/or ops, no UDF).
  */
object Layout {

  /** Morton key of two non-negative ints already bucketed into
    * [0, 2^bits): a's bit i lands at position 2i, b's at 2i+1.
    * Bucketing (rank, quantile, or plain truncation) is the caller's
    * choice — layout quality degrades gracefully with bucket skew.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
}
