package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.text.TextAnalysis

/** Closed-form distributed model fitting — the missing lens next to the
  * heuristic quality filters (q16/q109): FIT the quality scorer from
  * data instead of hand-tuning it. A 2-feature ridge regression solved
  * by the normal equations is the canonical 100 TB shape for this:
  * ONE corpus pass computes the 9-entry Gram/moment matrix as
  * map-side-combined integer aggregates (the features are integer
  * surface counts, so every sum is EXACT and order-free — no IEEE
  * nondeterminism across 1000 executors), the 3×3 solve happens on the
  * driver in O(1), and a second narrow pass scores every document with
  * the fitted weights as literal codegen'd arithmetic. No gradient
  * loop, no parameter server, no shuffle beyond one single-row
  * aggregate. (Reference context: the reference hand-tunes its
  * filters; a trainable scorer over the same surface statistics is the
  * production upgrade path — same features, weights from data.)
  *
  * Determinism contract (hash-exact vs DuckDB): the moment sums are
  * BIGINTs (exact in any accumulation order); both engines then
  * evaluate the SAME fixed-order Cramer expansion over those integers
  * cast to double — identical IEEE inputs through an identical
  * expression tree give bit-identical determinants — and the weights
  * round to 9 dp via the halfUp floor spelling before prediction, so
  * per-row predictions are integer-exact (`floor(w·x + 0.5)`).
  */
object Regression {

  /** The fitted model: intercept + 2 slopes, 9-dp rounded. */
  final case class Ridge2(w0: Double, w1: Double, w2: Double)

  private def halfUp9(x: Double): Double =
    math.floor(x * 1e9 + 0.5) / 1e9

  /** Fit y ~ w0 + w1·x1 + w2·x2 with L2 penalty `lambda` on the slopes
    * (not the intercept) by the normal equations. All three input
    * columns must be integer-valued (cast to long here); the Gram
    * sums stay exact BIGINTs, so the fit is deterministic at any
    * parallelism. One corpus pass; driver math is a 3×3 Cramer solve.
    */
  def ridgeFit2(data: DataFrame, x1Col: String, x2Col: String,
                yCol: String, lambda: Double): Ridge2 = {
    val d = data.select(col(x1Col).cast("long").as("x1"),
      col(x2Col).cast("long").as("x2"), col(yCol).cast("long").as("y"))
    val r = d.agg(
      count(lit(1)).cast("long").as("n"),
      sum("x1").as("sx1"), sum("x2").as("sx2"),
      sum(col("x1") * col("x1")).as("s11"),
      sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum("y").as("sy"),
      sum(col("x1") * col("y")).as("s1y"),
      sum(col("x2") * col("y")).as("s2y")).head()
    val n = r.getLong(0).toDouble
    val sx1 = r.getLong(1).toDouble; val sx2 = r.getLong(2).toDouble
    val s11 = r.getLong(3).toDouble; val s12 = r.getLong(4).toDouble
    val s22 = r.getLong(5).toDouble
    val sy = r.getLong(6).toDouble
    val s1y = r.getLong(7).toDouble; val s2y = r.getLong(8).toDouble
    // A = [[n, sx1, sx2], [sx1, s11+λ, s12], [sx2, s12, s22+λ]],
    // b = (sy, s1y, s2y). The expansion below is the FIXED expression
    // order the DuckDB oracle mirrors token-for-token — do not
    // reassociate (IEEE determinism depends on the shared order).
    val a22 = s11 + lambda
    val a33 = s22 + lambda
    val det = n * (a22 * a33 - s12 * s12) -
      sx1 * (sx1 * a33 - s12 * sx2) +
      sx2 * (sx1 * s12 - a22 * sx2)
    require(det != 0.0,
      "ridgeFit2: singular normal equations — constant features? raise lambda")
    val det0 = sy * (a22 * a33 - s12 * s12) -
      sx1 * (s1y * a33 - s12 * s2y) +
      sx2 * (s1y * s12 - a22 * s2y)
    val det1 = n * (s1y * a33 - s12 * s2y) -
      sy * (sx1 * a33 - s12 * sx2) +
      sx2 * (sx1 * s2y - s1y * sx2)
    val det2 = n * (a22 * s2y - s1y * s12) -
      sx1 * (sx1 * s2y - s1y * sx2) +
      sy * (sx1 * s12 - a22 * sx2)
    Ridge2(halfUp9(det0 / det), halfUp9(det1 / det), halfUp9(det2 / det))
  }

  /** Score every row with a fitted model: (id, x1, x2, y, pred, resid)
    * where pred = floor(w0 + w1·x1 + w2·x2 + 0.5) as a LONG in y's
    * units — literal weights in a codegen'd projection, one narrow
    * stateless pass, nothing collected.
    */
  def ridgePredict2(data: DataFrame, idCol: String, x1Col: String,
                    x2Col: String, yCol: String, model: Ridge2): DataFrame =
    data.select(col(idCol).as("id"),
        col(x1Col).cast("long").as("x1"),
        col(x2Col).cast("long").as("x2"),
        col(yCol).cast("long").as("y"))
      .withColumn("pred",
        floor(lit(model.w0) + lit(model.w1) * col("x1") +
          lit(model.w2) * col("x2") + lit(0.5)).cast("long"))
      .withColumn("resid", col("y") - col("pred"))

  /** q184: fit the q16 quality score (in basis points) from two of its
    * own raw surface counts — token count and punctuation count — with
    * λ=1000 ridge, then score every document. The residual column IS
    * the payload: documents whose quality diverges from what their
    * surface counts predict are exactly the rows a trained filter
    * flags for review. Scale: one Gram pass + one scoring pass.
    */
  def q184RidgeQuality(spark: SparkSession, dir: String): DataFrame = {
    val feats = Tables.documents(spark, dir).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_words"),
      regexp_count(col("text"), lit("[!?.,;:]")).cast("long").as("n_punct"),
      floor(TextAnalysis.qualityScore(col("text")) * 10000.0 + 0.5)
        .cast("long").as("quality_bp"))
    val model = ridgeFit2(feats, "n_words", "n_punct", "quality_bp", 1000.0)
    ridgePredict2(feats, "doc_id", "n_words", "n_punct", "quality_bp", model)
      .select(col("id").as("doc_id"), col("x1").as("n_words"),
        col("x2").as("n_punct"), col("y").as("quality_bp"),
        col("pred").as("pred_bp"), col("resid").as("resid_bp"))
      .orderBy("doc_id")
  }
}
