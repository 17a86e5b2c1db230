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

  private def better(a: Scored, b: Scored): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  class TopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    override def zero: Seq[Scored] = Seq.empty

    override def reduce(buf: Seq[Scored], in: Scored): Seq[Scored] = insert(buf, in)

    override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
      b.foldLeft(a)(insert)

    private def insert(buf: Seq[Scored], in: Scored): Seq[Scored] =
      if (buf.length >= k && better(buf.last, in)) buf
      else (buf :+ in).sortWith(better).take(k)

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
      if (buf.length >= k && betterStr(buf.last, in)) buf
      else (buf :+ in).sortWith(betterStr).take(k)

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
