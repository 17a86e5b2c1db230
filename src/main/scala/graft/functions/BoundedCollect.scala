package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded collect-list with an exact group count: keeps at most `cap`
  * elements per group but always counts the true group size.
  *
  * This is the single-shuffle form of the "df-capped inverted index"
  * (Dedup.jaccardPairs): a plain `collect_list` would materialize a hot
  * key's entire posting list in one aggregation buffer (OOM on the zipf
  * head of a 100 TB corpus), and the two-pass alternative (count first,
  * anti-join the hot keys, then collect) pays a second full shuffle of
  * the index. Capping the buffer makes the collect memory-safe — groups
  * whose true count exceeds the cap are identified by `n` and their
  * truncated items simply go unused.
  */
object BoundedCollect {

  type Item = (Long, Int)           // (doc id, doc's shingle-set size)
  type Buf = (Seq[Item], Long)      // (capped items, true count)

  class BC(cap: Int) extends Aggregator[Item, Buf, Buf] {
    override def zero: Buf = (Vector.empty, 0L)

    override def reduce(b: Buf, in: Item): Buf =
      (if (b._1.length < cap) b._1 :+ in else b._1, b._2 + 1)

    override def merge(a: Buf, b: Buf): Buf =
      (if (a._1.length >= cap) a._1
       else (a._1 ++ b._1).take(cap), a._2 + b._2)

    override def finish(r: Buf): Buf = r

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder()
    override def outputEncoder: Encoder[Buf] = ExpressionEncoder()
  }

  /** Column API: `collect(cap)(id, n)` →
    * struct<_1: array<struct<_1: bigint, _2: int>>, _2: bigint>.
    */
  def collect(cap: Int)(id: Column, n: Column): Column = {
    implicit val enc: Encoder[Item] = ExpressionEncoder()
    udaf(new BC(cap)).apply(id, n)
  }

  type SItem = (Long, String)       // (doc id, doc's payload string)
  type SBuf = (Seq[SItem], Long)

  /** Same bounded collect with a STRING payload — the block-build form
    * for operators whose verify needs a bounded text fragment per member
    * (e.g. Dedup.editBlockedPairs' 120-char heads) instead of a size.
    */
  class BCS(cap: Int) extends Aggregator[SItem, SBuf, SBuf] {
    override def zero: SBuf = (Vector.empty, 0L)

    override def reduce(b: SBuf, in: SItem): SBuf =
      (if (b._1.length < cap) b._1 :+ in else b._1, b._2 + 1)

    override def merge(a: SBuf, b: SBuf): SBuf =
      (if (a._1.length >= cap) a._1
       else (a._1 ++ b._1).take(cap), a._2 + b._2)

    override def finish(r: SBuf): SBuf = r

    override def bufferEncoder: Encoder[SBuf] = ExpressionEncoder()
    override def outputEncoder: Encoder[SBuf] = ExpressionEncoder()
  }

  /** Column API: `collectStr(cap)(id, s)` →
    * struct<_1: array<struct<_1: bigint, _2: string>>, _2: bigint>.
    */
  def collectStr(cap: Int)(id: Column, s: Column): Column = {
    implicit val enc: Encoder[SItem] = ExpressionEncoder()
    udaf(new BCS(cap)).apply(id, s)
  }

  /** DISTINCT-aware bounded collect (round-15): a sorted distinct id set
    * capped at `cap`, maintained inside ONE aggregation — the fused form
    * of `.distinct()` followed by a bounded collect, which paid a full
    * extra exchange of the exploded (id, key) rows just to dedup before
    * the groupBy (guide §2.4: two operations keyed compatibly should
    * share one exchange). Exactness contract: a group whose true
    * distinct count is < cap never fills the buffer, so its set (and
    * `size(...)`) are exact and arrival-order-independent (sorted
    * ascending); a group with ≥ cap distinct ids saturates at `cap`
    * members — callers use `cap = maxDf + 1` and filter
    * `size BETWEEN 2 AND maxDf`, so saturated (hot) groups are excluded
    * either way and WHICH cap members were retained is never observed.
    */
  class BCDistinct(cap: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    override def zero: Seq[Long] = Vector.empty

    private def ins(s: Seq[Long], id: Long): Seq[Long] = {
      var lo = 0; var hi = s.length
      while (lo < hi) {
        val m = (lo + hi) >>> 1
        if (s(m) < id) lo = m + 1 else hi = m
      }
      if (lo < s.length && s(lo) == id) s        // already present
      else if (s.length >= cap) s                // saturated (hot group)
      else (s.take(lo) :+ id) ++ s.drop(lo)      // sorted insert
    }

    override def reduce(b: Seq[Long], id: Long): Seq[Long] = ins(b, id)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      if (a.length >= cap) a
      else b.foldLeft(a)(ins)

    override def finish(r: Seq[Long]): Seq[Long] = r

    override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Column API: `collectDistinct(cap)(id)` → array<bigint> (sorted
    * distinct, saturating at cap; see BCDistinct for the contract).
    */
  def collectDistinct(cap: Int)(id: Column): Column =
    udaf(new BCDistinct(cap)).apply(id)
}
