package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded top-k as a custom `Aggregator` (SURVEY §2.12's one justified
  * custom aggregate).
  *
  * The window form (`row_number().over(partitionBy(query).orderBy(score
  * desc))`) must shuffle EVERY scored pair to the query's reducer and
  * sort there — at a billion corpus vectors that is the whole scored
  * cross product on the wire. This aggregate keeps at most k entries per
  * partition (map-side partial aggregation), so only |queries| × k rows
  * shuffle. Ordering (score desc, then id asc) matches the window form
  * exactly, so results are identical — the two share an oracle.
  */
object TopKAggregator {

  type Scored = (Double, Long) // (score, neighbor_id)

  // TOTAL order (round-11 ADVICE): java.lang.Double.compare gives NaN a
  // fixed place (greater than every other double) — the SAME total
  // order Spark's window sort uses for DOUBLE desc, so a NaN score
  // ranks first in both forms instead of making the comparator
  // non-transitive (a>b and b>a both false under IEEE > with NaN).
  // `+ 0.0` folds -0.0 into +0.0 first (NaN unaffected), matching
  // Spark's NormalizeFloatingNumbers treatment of sort keys where
  // Double.compare alone would order -0.0 below +0.0.
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a._1 + 0.0, b._1 + 0.0)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  // Bounded binary insert into an already-sorted buffer (round-11
  // ADVICE): O(log k) probes + one O(k) array copy per ACCEPTED row,
  // replacing the append + full re-sort (O(k log k) with k=800 at the
  // q32 call site). The cheap reject path (full buffer, worse than the
  // current tail) stays allocation-free.
  private def boundedInsert[T](buf: Seq[T], in: T, k: Int,
                               better: (T, T) => Boolean): Seq[T] =
    if (buf.length >= k && better(buf.last, in)) buf
    else {
      val b = scala.collection.mutable.ArrayBuffer.from(buf)
      var lo = 0
      var hi = b.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (better(b(mid), in)) lo = mid + 1 else hi = mid
      }
      b.insert(lo, in)
      if (b.length > k) b.remove(b.length - 1)
      b.toSeq
    }

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Seq.empty

    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = insert(buf, in)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[Scored], in: Scored): Seq[Scored] =
      boundedInsert(buf, in, k, better)

    override def finish(r: Seq[Scored]): Seq[Scored] = r

    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** Column API: `topK(k)(score, id)` → array<struct<score,id>> sorted
    * (score desc, id asc), length ≤ k.
    */
  def topK(k: Int)(score: Column, id: Column): Column = {
    implicit val enc: Encoder[Scored] = ExpressionEncoder()
    udaf(new TopK(k)).apply(score, id)
  }

  type Counted = (Long, String) // (count, word)

  private def betterStr(a: Counted, b: Counted): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  /** String-keyed variant for vocabulary ranks: top-k by (count desc,
    * word asc) — the bounded replacement for a rank window partitioned
    * by a grouping key whose per-key row count is the VOCABULARY (q177's
    * per-source token ranks). Same ≤ k map-side state per (partition,
    * group) bound as [[TopK]].
    */
  class TopKStr(k: Int) extends Aggregator[Counted, Seq[Counted], Seq[Counted]] {
    override def zero: Seq[Counted] = Seq.empty

    override def reduce(buf: Seq[Counted], in: Counted): Seq[Counted] = insert(buf, in)

    override def merge(a: Seq[Counted], b: Seq[Counted]): Seq[Counted] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[Counted], in: Counted): Seq[Counted] =
      boundedInsert(buf, in, k, betterStr)

    override def finish(r: Seq[Counted]): Seq[Counted] = r

    override def bufferEncoder: Encoder[Seq[Counted]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Counted]] = ExpressionEncoder()
  }

  /** Column API: `topKStr(k)(count, word)` → array<struct<count,word>>
    * sorted (count desc, word asc), length ≤ k.
    */
  def topKStr(k: Int)(count: Column, word: Column): Column = {
    implicit val enc: Encoder[Counted] = ExpressionEncoder()
    udaf(new TopKStr(k)).apply(count, word)
  }
}
