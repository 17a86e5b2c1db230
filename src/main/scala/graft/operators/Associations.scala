package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) facts — support /
  * confidence / lift for item pairs, the a-priori shape (reference
  * analytics surface: the events/orders analytics family next to q76's
  * funnel and q131's paths; the training-data face is "which source
  * tags / quality labels co-occur in the same document shard").
  *
  * Scale notes (100 TB): pair generation is the classic blow-up and is
  * bounded here STRUCTURALLY, not by sampling — pairs come from a
  * per-basket self-join, so work is Σ C(|basket|, 2), bounded by the
  * per-basket item count (TPC-H orders: ≤ 7 lines), never by the item
  * vocabulary; the frequent-item prune (a-priori monotonicity: no pair
  * qualifies unless both items do) runs BEFORE pair generation as a
  * broadcast semi-join, so infrequent long-tail items never reach the
  * self-join. Two fact-table shuffles total: the (basket, item)
  * distinct and the pair count group-by (both partial-aggregable).
  * The basket total is one scalar count; item counts are a bounded
  * dimension table (broadcast back for the metric columns).
  *
  * Cross-engine determinism: metrics round halfUp to 6 dp with the
  * integer-exact numerators/denominators dividing in a fixed
  * association — support = n_both/nb, confidence = n_both/n_a, lift =
  * (n_both·nb)/(n_a·n_c), every product < 2⁵³ so only the final
  * division is inexact, and it is the same IEEE division both engines.
  * The min-confidence filter compares the UNROUNDED ratio.
  */
object Associations {

  /** Rules over distinct (basket, item) pairs: both directions of every
    * frequent pair, with support/confidence/lift. Thresholds are
    * fractions of the basket count, so the operator is scale-stable.
    */
  def assocRules(facts: DataFrame, basketCol: String, itemCol: String,
                 minItemSupport: Double, minPairSupport: Double,
                 minConfidence: Double): DataFrame = {
    // eager localCheckpoint, not a CacheManager cache: bi is read by
    // the basket count, the item counts, and both pair-join sides; the
    // blocks are ContextCleaner-reclaimed when the frame goes out of
    // scope (round-9 cache-lifetime discipline)
    val bi = facts.select(col(basketCol).as("basket"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(true)
    val nb = bi.select("basket").distinct().count()
    val fi = bi.groupBy("item").agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= lit(nb * minItemSupport))
    val bif = bi.join(broadcast(fi.select("item")), Seq("item"))
    // the basket self-join is PINNED to shuffle-hash (round-11 verdict
    // item 5): both sides are the corpus-sized fact table, so the AQE
    // broadcast flip it showed at sf0.01 is a small-scale artifact; the
    // pin makes the plan identical across scales and is the only sound
    // strategy at 100 TB
    val pairs = bif.select(col("basket"), col("item").as("x"))
      .join(bif.select(col("basket"), col("item").as("y")).hint("shuffle_hash"),
        Seq("basket"))
      .filter(col("x") < col("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= lit(nb * minPairSupport))
    val both = pairs.select(col("x").as("antecedent"), col("y").as("consequent"), col("n_both"))
      .union(pairs.select(col("y").as("antecedent"), col("x").as("consequent"), col("n_both")))
    val r = both
      .join(broadcast(fi.select(col("item").as("antecedent"), col("n_item").as("n_a"))), "antecedent")
      .join(broadcast(fi.select(col("item").as("consequent"), col("n_item").as("n_c"))), "consequent")
    val out = r
      .filter(col("n_both").cast("double") / col("n_a") >= lit(minConfidence))
      .select(col("antecedent"), col("consequent"), col("n_both"),
        graft.functions.Rounding.halfUp(
          col("n_both").cast("double") / lit(nb.toDouble), 6).as("support"),
        graft.functions.Rounding.halfUp(
          col("n_both").cast("double") / col("n_a"), 6).as("confidence"),
        graft.functions.Rounding.halfUp(
          col("n_both").cast("double") * lit(nb.toDouble)
            / (col("n_a").cast("double") * col("n_c")), 6).as("lift"))
      .orderBy("antecedent", "consequent")
    out
  }

  /** q174: brand co-occurrence rules over orders — baskets = orders,
    * items = part brands (lineitem ⋈ part), thresholds 5% / 2.2% / 15.8%.
    */
  def q174AssocRules(spark: SparkSession, dir: String): DataFrame = {
    val facts = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
    assocRules(facts, "l_orderkey", "p_brand", 0.05, 0.022, 0.158)
  }
}
