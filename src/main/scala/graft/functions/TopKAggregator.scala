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
}
