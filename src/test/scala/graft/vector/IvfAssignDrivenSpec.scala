package graft.vector

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The driven IVF probe (driver-held centroids, tight-loop top-nProbe
  * UDF) must be row-for-row identical to the window form it replaces on
  * q69's warm path — same probed clusters, same tie-breaks, same
  * rounding. Checked on the live fixture through the full q69 pipeline
  * shape (learned sqrt-N kmeans centroids feeding the IVF means) and on
  * a tie-heavy synthetic set where many rounded scores collide.
  */
class IvfAssignDrivenSpec extends SparkSpec {

  private def probePairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Int)] =
    df.select(col("id").cast("long"), col("cl"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq.sorted

  test("driven probe equals window ivfAssign on the live fixture (q69 pipeline shape)") {
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = VectorOps.kmeansTrain(Tables.widen(e), "vec_id", "embedding", k, 3)
    val fitted = VectorOps.kmeansAssign(Tables.widen(e), "vec_id", "embedding", kc)
      .select(col("id").as("vec_id"), col("cl"))
    val labeled = e.join(fitted, "vec_id")
    val cent = VectorOps.ivfCentroids(labeled, "vec_id", "embedding", "cl")
    for (nProbe <- Seq(1, 2, 3)) {
      val win = probePairs(VectorOps.ivfAssign(labeled, "vec_id", "embedding", "cl", nProbe))
      val drv = probePairs(VectorOps.ivfAssignDriven(e, "vec_id", "embedding", cent, nProbe))
      assert(win == drv, s"nProbe=$nProbe probe sets diverge")
    }
  }

  test("driven probe tie-breaks like the window form when rounded scores collide") {
    import spark.implicits._
    // all centroids equal per label group → every cosine rounds identically,
    // so selection is decided purely by the (score desc, cl asc) tie-break
    val vecs = (0L until 40L)
      .map(i => (i, Array(1f, (i % 4).toFloat / 100f), (i % 5).toInt))
      .toDF("vec_id", "embedding", "cl")
    val cent = VectorOps.ivfCentroids(vecs, "vec_id", "embedding", "cl")
    for (nProbe <- Seq(2, 4)) {
      val win = probePairs(VectorOps.ivfAssign(vecs, "vec_id", "embedding", "cl", nProbe))
      val drv = probePairs(VectorOps.ivfAssignDriven(
        vecs.select(col("vec_id"), col("embedding")), "vec_id", "embedding", cent, nProbe))
      assert(win == drv, s"nProbe=$nProbe tie-break selection diverges")
    }
  }

  test("driven bucketed near-dup pairs equal the label-driven form") {
    val e = Tables.embeddings(spark, sfDir)
    val n = e.count()
    val k = math.ceil(math.sqrt(n.toDouble)).toInt
    val kc = VectorOps.kmeansTrain(Tables.widen(e), "vec_id", "embedding", k, 3)
    val fitted = VectorOps.kmeansAssign(Tables.widen(e), "vec_id", "embedding", kc)
      .select(col("id").as("vec_id"), col("cl"))
    val labeled = e.join(fitted, "vec_id")
    val cent = VectorOps.ivfCentroids(labeled, "vec_id", "embedding", "cl")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaLabels = rows(VectorOps.nearDupPairsBucketed(labeled, "vec_id", "embedding", "cl", 0.45))
    val viaCent = rows(VectorOps.nearDupPairsBucketedDriven(e, "vec_id", "embedding", cent, 0.45))
    assert(viaLabels == viaCent)
  }
}
