package graft.vector

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the group-centroid cosine matrix (q187): every
  * unordered pair exactly once, scores bounded, and a group that IS
  * another group (same vectors under two labels) reads cosine 1.0 —
  * the mirror-feed detection the operator exists for.
  */
class CentroidSimSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("source"))
  private lazy val emb = graft.Tables.embeddings(spark, sfDir)

  test("complete unordered pair matrix, ordered, bounded scores") {
    val m = graft.operators.ScaleOps.q187SourceSimilarity(spark, sfDir).collect()
    val nGroups = docs.select("source").distinct().count().toInt
    assert(m.length === nGroups * (nGroups - 1) / 2)
    m.foreach { r =>
      val (a, b, c) = (r.getString(0), r.getString(1), r.getDouble(2))
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(c >= -1.0001 && c <= 1.0001, s"cosine $c out of range for ($a,$b)")
    }
  }

  test("a mirrored group scores cosine 1.0 against its original") {
    val base = emb.join(docs, emb("vec_id") === docs("doc_id"))
      .filter(col("source") === "src0")
      .select(col("source").as("g"), col("embedding"))
    val mirror = base.select(lit("zmirror").as("g"), col("embedding"))
    val out = VectorOps.centroidSimilarityMatrix(
      base.unionByName(mirror), "g", "embedding")
      .filter(col("group_a") === "src0" && col("group_b") === "zmirror")
      .collect()
    assert(out.length === 1)
    assert(out(0).getDouble(2) === 1.0,
      s"mirror cosine ${out(0).getDouble(2)} != 1.0")
  }
}
