package graft.vector

import graft.functions.DotProduct
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity operators (SURVEY §2.6/§2.10): cosine scoring, exact
  * brute-force top-k, IVF-style cluster-pruned ANN, recall@k, threshold
  * cascades.
  *
  * Scoring uses the codegen'd `DotProduct` expression (tight primitive
  * loop; the interpreted `zip_with`+`aggregate` form was ~50× slower on
  * all-pairs joins) and every operator precomputes per-vector L2 norms
  * ONCE per side before the join — the norm is O(dim) work that must not
  * be repeated per pair. The arithmetic (sequential double fold, then
  * dot/(na·nb), then round) is kept bit-identical to the DuckDB oracle.
  *
  * Scale notes (100 TB): the brute-force path broadcasts the QUERY side
  * and streams the corpus — one narrow pass, no corpus shuffle; the window
  * top-k shuffles only (query_id, score, id) tuples, never vectors. The
  * IVF path prunes the corpus to the probed clusters before scoring —
  * the standard trade at billion-vector scale; LSH bucketing (see
  * Dedup.scala) is the alternative when no cluster structure exists.
  */
object VectorOps {

  /** dot(a, b) in double precision, sequential order (IEEE-reproducible). */
  def dot(a: Column, b: Column): Column = DotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity, rounded to 4 decimals. Thresholds are applied to
    * the ROUNDED value everywhere so Spark and the oracle agree even if
    * their float-accumulation order ever differs by an ulp.
    */
  def cosine(a: Column, b: Column): Column =
    round(dot(a, b) / (l2Norm(a) * l2Norm(b)), 4)

  private def cosinePre(a: Column, b: Column, na: Column, nb: Column): Column =
    round(dot(a, b) / (na * nb), 4)

  /** All-pairs scores above a rounded threshold (embedding near-dup). */
  def nearDupPairs(vecs: DataFrame, idCol: String, vecCol: String,
                   threshold: Double): DataFrame = {
    val a = vecs.select(col(idCol).as("id_a"), col(vecCol).as("va"))
      .withColumn("na", l2Norm(col("va")))
    val b = vecs.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosinePre(col("va"), col("vb"), col("na"), col("nb")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .orderBy("id_a", "id_b")
  }

  /** Exact brute-force top-k: broadcast queries × corpus, window top-k.
    * Ties broken by neighbor id for determinism.
    */
  def knnBrute(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
               vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("nc", l2Norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    broadcast(q).crossJoin(c)
      .withColumn("score", cosinePre(col("qv"), col("cv"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** IVF-style ANN: centroids = per-cluster mean vector; each query probes
    * the `nProbe` nearest centroids and scores only those clusters'
    * members. The labeled fixture supplies the clustering; in production
    * the labels come from k-means (MLlib) at index-build time.
    */
  def knnIvf(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
             vecCol: String, labelCol: String, k: Int, nProbe: Int = 2): DataFrame = {
    // element-wise mean per cluster: avg over exploded (label, pos, value)
    val centroids = corpus
      .select(col(labelCol).as("cl"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy("cl", "pos").agg(avg("v").as("m"))
      .groupBy("cl").agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("cl"), transform(col("pm"), x => x.getField("m")).as("centroid"))
      .withColumn("ncent", l2Norm(col("centroid")))
    val q = queries.select(col(qId).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("cl").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cscore",
        cosinePre(col("qv"), col("centroid"), col("nq"), col("ncent")))
      .withColumn("prk", row_number().over(wProbe))
      .filter(col("prk") <= nProbe)
      .select("query_id", "qv", "nq", "cl")
    val c = corpus.select(col(cId).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("cl"))
      .withColumn("nc", l2Norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    probed.join(c, "cl")
      .withColumn("score", cosinePre(col("qv"), col("cv"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "score")
  }

  /** recall@k with an expected-label membership test (mirror of the
    * reference's recall@10 gate, eval_snapshot.py:91-108).
    */
  def recallAtK(queries: DataFrame, corpus: DataFrame, qId: String, cId: String,
                vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(vecCol).as("qv"),
        col(labelCol).as("expected"))
      .withColumn("nq", l2Norm(col("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(vecCol).as("cv"),
        col(labelCol).as("nl"))
      .withColumn("nc", l2Norm(col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id").asc)
    val hits = broadcast(q).crossJoin(c)
      .withColumn("score", cosinePre(col("qv"), col("cv"), col("nq"), col("nc")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy("query_id")
      .agg(max(when(col("nl") === col("expected"), 1).otherwise(0)).as("hit"))
    hits.agg(round(avg("hit"), 4).as("recall"))
  }

  /** Widening threshold cascade (reference main.py:374-381): primary
    * threshold, and only queries with zero primary hits fall back to the
    * lower tier. Anti-join keeps the fallback scan restricted to the
    * failed queries.
    */
  def thresholdCascade(queries: DataFrame, corpus: DataFrame, qId: String,
                       cId: String, vecCol: String,
                       tHigh: Double, tLow: Double): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), col(vecCol).as("qv"))
      .withColumn("nq", l2Norm(col("qv")))
    val c = corpus.select(col(cId).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("nc", l2Norm(col("cv")))
    val scored = broadcast(q).crossJoin(c)
      .withColumn("cos", cosinePre(col("qv"), col("cv"), col("nq"), col("nc")))
    val high = scored.filter(col("cos") >= tHigh)
      .select("query_id", "neighbor_id", "cos").withColumn("tier", lit(1))
    val lowOnly = scored.filter(col("cos") >= tLow)
      .join(high.select("query_id").distinct(), Seq("query_id"), "left_anti")
      .select("query_id", "neighbor_id", "cos").withColumn("tier", lit(2))
    high.unionByName(lowOnly).orderBy("query_id", "neighbor_id")
  }
}
