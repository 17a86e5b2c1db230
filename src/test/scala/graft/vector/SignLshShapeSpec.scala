package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two verify shapes of signLshNearDup — broadcast verify over raw
  * collision rows with output-side distinct (small-corpus fast path) vs
  * candidate-distinct then shuffle-join verify (the billion-vector
  * fallback) — must produce the IDENTICAL pair set: cosinePre is
  * deterministic per pair, so verify-then-distinct ≡
  * distinct-then-verify. Pinned on the live fixture at the registered
  * operating point and at a looser threshold where the candidate set is
  * much denser.
  */
class SignLshShapeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("broadcast verify equals the shuffle-join fallback on the live fixture") {
    val emb = graft.embed.Embedder.withEmbedding(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")), "text", "vec")
    for (tau <- Seq(0.95, 0.80)) {
      val fast = rows(VectorOps.signLshNearDup(emb, "doc_id", "vec", tau))
      val fallback = rows(VectorOps.signLshNearDup(emb, "doc_id", "vec", tau,
        broadcastVerifyMaxRows = 0L))
      assert(fast == fallback, s"verify shapes diverge at tau=$tau")
      assert(fast.nonEmpty || tau > 0.95, s"suspiciously empty pair set at tau=$tau")
    }
  }
}
