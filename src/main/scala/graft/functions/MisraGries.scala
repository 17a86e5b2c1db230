package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries frequent-items sketch as a mergeable custom `Aggregator` —
  * the approximate heavy-hitters profile a corpus-curation pipeline reads
  * before choosing dedup/filter thresholds (boilerplate detection: which
  * tokens/lines dominate a crawl slice).
  *
  * With `m` counters over a stream of N items the summary guarantees, for
  * EVERY item x: est(x) <= true(x) <= est(x) + N/(m+1), where est(x) = 0
  * when x was evicted — so any item with frequency above N/(m+1) is
  * guaranteed present. Merging follows Agarwal et al. (Mergeable
  * Summaries, PODS'12): add counters, then subtract the (m+1)-th largest
  * count and drop non-positive entries; the N/(m+1) bound survives any
  * merge tree, which is exactly what Spark's partial aggregation needs —
  * each task folds its partition locally and only m-entry maps cross the
  * shuffle, never the token stream itself.
  *
  * The SUMMARY CONTENT depends on partition boundaries and merge order
  * (any valid MG run does); only the guarantee above is deterministic.
  * Registered q102 therefore outputs exact anchors plus guarantee
  * booleans (the q68 sketch-profiling pattern), never raw estimates.
  */
object MisraGries {

  class MG(m: Int) extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(m >= 1, s"MisraGries needs at least one counter, got $m")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], w: String): Map[String, Long] =
      buf.get(w) match {
        case Some(c)                  => buf.updated(w, c + 1L)
        case None if buf.size < m     => buf.updated(w, 1L)
        // full and w absent: decrement every counter (w's implicit counter
        // hits 0 and is never stored), dropping exhausted entries
        case None                     =>
          buf.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap
      if (sum.size <= m) sum
      else {
        val thr = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
        sum.flatMap { case (k, c) => if (c > thr) Some(k -> (c - thr)) else None }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r

    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Column API: `sketch(m)(item)` → map<string,long> with at most m
    * entries, satisfying the MG error bound against the input stream.
    */
  def sketch(m: Int)(item: Column): Column = udaf(new MG(m)).apply(item)

  /** The local fold, for brute-force comparison in tests. */
  def local(m: Int, items: Iterable[String]): Map[String, Long] = {
    val agg = new MG(m)
    items.foldLeft(agg.zero)(agg.reduce)
  }
}
