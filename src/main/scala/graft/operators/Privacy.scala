package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Privacy pass for training-data preparation: pseudonymization,
  * generalization, and a k-anonymity audit — the step a real corpus runs
  * between ingest and release (the fixture text carries no free-text PII,
  * so the structured `customer` table is the demonstration surface).
  *
  * Scale shape: pseudonymization and generalization are pure scan-stage
  * column expressions (codegen'd md5/floor — no shuffle, no UDF). The
  * k-anonymity audit aggregates group sizes over the GENERALIZED key —
  * a relation bounded by the generalization grid, not the table — and
  * broadcasts it back, so the 100 TB fact table never shuffles at all.
  */
object Privacy {

  /** Quasi-identifier generalization shared by every audit here:
    * `c_acctbal` → 1000-unit band (floor handles negative balances
    * identically in IEEE on both engines).
    */
  private def balanceBand =
    (floor(col("c_acctbal") / 1000.0) * 1000.0).cast("long")

  /** Direct identifiers → salted-hash tokens (stable across runs, so
    * joins on the token still work); quasi-identifiers generalized via
    * [[balanceBand]].
    */
  def pseudonymize(customers: DataFrame): DataFrame =
    customers.select(
      col("c_custkey"),
      md5(concat(lit("graft-pepper:"), col("c_name")).cast("binary")).as("name_token"),
      balanceBand.as("balance_band"),
      col("c_mktsegment").as("segment"))

  /** k-anonymity per record over the generalized quasi-identifier key
    * (segment, balance_band): group sizes via partial-agg group-by,
    * broadcast back — every record learns the size of its equivalence
    * class without a fact-table shuffle. The size branch does re-scan
    * the table (Spark has no automatic subtree reuse), but it reads
    * ONLY the 2-column generalized key and collapses map-side — two
    * narrow scans beat the window form's full-row exchange at 100 TB.
    * Records with k below the threshold are flagged for suppression,
    * not silently dropped (the release decision belongs to the caller).
    */
  def kAnonymity(pseudonymized: DataFrame, k: Int): DataFrame = {
    val sizes = pseudonymized.groupBy("segment", "balance_band")
      .agg(count(lit(1)).as("k_anon"))
    pseudonymized.join(broadcast(sizes), Seq("segment", "balance_band"))
      .withColumn("suppress", col("k_anon") < k)
  }

  def q101PiiMask(spark: SparkSession, dir: String): DataFrame =
    kAnonymity(pseudonymize(Tables.customer(spark, dir)), 10)
      .select(col("c_custkey"), col("name_token"), col("segment"),
        col("balance_band"), col("k_anon"), col("suppress"))
      .orderBy("c_custkey")

  /** l-diversity audit (Machanavajjhala et al. 2007, "l-Diversity:
    * Privacy Beyond k-Anonymity") — the check k-anonymity alone misses:
    * an equivalence class can be large yet expose its members because
    * every record shares one sensitive value (the homogeneity attack).
    * Per generalized quasi-identifier class (segment, balance_band):
    * size k, distinct sensitive values l (nation here), and the
    * majority sensitive share in basis points (the recoverable-
    * attribute confidence an attacker gains). Flags classes with
    * l < the threshold. Same 100 TB shape as the k-audit: everything
    * aggregates to the generalization grid × sensitive domain —
    * bounded — before any wide op; the fact table never shuffles
    * full rows.
    */
  def lDiversity(pseudonymized: DataFrame, sensitiveCol: String,
                 l: Int): DataFrame = {
    val perValue = pseudonymized
      .groupBy(col("segment"), col("balance_band"), col(sensitiveCol))
      .agg(count(lit(1)).as("c"))
    perValue.groupBy("segment", "balance_band")
      .agg(sum("c").as("k_anon"), count(lit(1)).as("l_div"),
        max("c").as("top_c"))
      .select(col("segment"), col("balance_band"),
        col("k_anon"), col("l_div"),
        expr("top_c * 10000L div k_anon").as("majority_bp"),
        (col("l_div") < l).as("flag"))
      .orderBy("segment", "balance_band")
  }

  def q150LDiversity(spark: SparkSession, dir: String): DataFrame =
    lDiversity(
      Tables.customer(spark, dir).select(
        col("c_mktsegment").as("segment"),
        balanceBand.as("balance_band"),
        col("c_nationkey")),
      "c_nationkey", 3)
}
