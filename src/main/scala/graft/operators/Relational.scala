package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY §2.3–§2.7) over the star-schema
  * fixtures, expressed Spark-first: declarative DataFrame plans so Catalyst
  * handles pushdown / pruning / join selection, with explicit `broadcast`
  * hints for the dimension tables we know are small (nation/region/supplier
  * stay tiny at any scale factor — they are TPC-H-style fixed dimensions).
  *
  * Every query ends with a deterministic `orderBy` over its full key so the
  * output is reproducible row-for-row against the DuckDB oracle.
  */
object Relational {

  /** Pricing-summary aggregate (running pipeline stats pattern,
    * reference pipeline.py:210-213). Map-side partial aggregation is free
    * via hash aggregate; 2-column grouping key shuffles only group rows.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_revenue"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Projection + predicate (presence/threshold filters, SURVEY §2.3).
    * Filter and 4-column projection both reach the parquet scan
    * (PushedFilters + ReadSchema pruning).
    */
  def q2FilterProj(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_shipdate") < lit("1995-02-01"))
      .filter(col("l_discount") > 0.05 && col("l_quantity") < 10.0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // floor(x·100 + 0.5)/100, not round(x, 2): price × (1 − discount)
        // is an exact 4-decimal value, so the true result hits .xx5
        // boundaries where Spark's and DuckDB's round() diverge; the
        // floor form is pure IEEE arithmetic — identical in both engines
        (floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100.0 + 0.5) / 100.0)
          .as("net_price"))
      .orderBy("l_orderkey", "l_linenumber")

  /** Multi-way join + aggregate (articles⟕pdf_map / articles⟕db-row joins,
    * SURVEY §2.4, generalized). nation and region are broadcast — at 100 TB
    * the fact tables shuffle on the join key once, dims never shuffle.
    */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord  = Tables.orders(spark, dir)
    val li   = Tables.lineitem(spark, dir)
    val nat  = broadcast(Tables.nation(spark, dir))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(nat, cust("c_nationkey") === nat("n_nationkey"))
      .groupBy("n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Top-k per group via window (vector top-k / re-rank top-k shape,
    * SURVEY §2.6). row_number over (partition, order) — single shuffle on
    * the partition key; rank ties broken by key for determinism.
    */
  def q4TopkWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  /** Semi join (retrieved ⋉ expected / recall membership, SURVEY §2.4):
    * customers having at least one urgent order. left_semi never widens
    * rows, so no dedup pass is needed after the join.
    */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    cust.join(urgent, Seq("c_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  /** Anti join (skip-if-exists / quarantine pruning, SURVEY §2.7):
    * customers with no urgent orders.
    */
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("c_custkey"))
    cust.join(ord, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_nationkey")
      .orderBy("c_custkey")
  }

  /** Distinct (distinct PMCIDs, SURVEY §2.5): distinct (supplier, part)
    * pairs shipped, with partial aggregation before the shuffle.
    */
  def q7Distinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select("l_suppkey", "l_returnflag")
      .distinct()
      .orderBy("l_suppkey", "l_returnflag")

  /** Union of heterogeneous record streams (80/20 corpus merge,
    * SURVEY §2.7) — unionByName with a provenance tag.
    */
  def q8Union(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
              col("c_nationkey").as("nationkey"), lit("customer").as("kind"))
    val supp = Tables.supplier(spark, dir)
      .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
              col("s_nationkey").as("nationkey"), lit("supplier").as("kind"))
    cust.unionByName(supp)
      .groupBy("kind", "nationkey")
      .agg(count(lit(1)).as("n"), round(sum("acctbal"), 2).as("bal"))
      .orderBy("kind", "nationkey")
  }

  /** Running sum window (token-budget pack_context shape, SURVEY §2.5):
    * cumulative spend per customer in order-date order.
    */
  def q9RunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .withColumn("running_spend", round(sum("o_totalprice").over(w), 2))
      .select("o_custkey", "o_orderkey", "running_spend")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Priority coalesce cascade (body resolution FULL→ABSTRACT→NONE,
    * reference fetch_pubmed.py:275-299) as a when/otherwise column.
    */
  def q10Cascade(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("section",
        when(col("n_chars") >= 400, "FULL")
          .when(col("n_chars") >= 200, "ABSTRACT")
          .otherwise("NONE"))
      .groupBy("section")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("section")

  /** Latest-partition selection (newest index wins,
    * reference eval_snapshot.py:45-52): scalar max month then prune to it.
    * At scale the inner max is a partition-listing operation, not a scan.
    */
  def q11LatestPartition(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).withColumn("mon", date_trunc("month", col("ts")))
    // the max-month is a lazy broadcast join, not an eager .head(): the
    // returned frame re-executes correctly (and only once per action)
    // wherever it is consumed, and the one-row build side costs nothing
    val latest = ev.agg(max("mon").as("latest_mon"))
    ev.join(broadcast(latest), col("mon") === col("latest_mon"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .orderBy("event_type")
  }

  /** Grouped stats summary (section-count summary,
    * reference fetch_pubmed.py:422-426).
    */
  def q12GroupStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 4).as("avg_chars"),
           max("n_chars").as("max_chars"))
      .orderBy("lang", "source")

  /** Unpaywall DOI→PDF lookup as a dedicated query (SURVEY §2.1;
    * knowledge_model/ingestion/fetch_unpaywall.py): the resolved-article
    * side broadcast-left-joins the DOI→pdf_url map (the map is the small
    * dimension — broadcast, never shuffle the articles), open-access
    * misses keep the article with a null URL and has_pdf=false.
    */
  def q65DoiPdfLookup(spark: SparkSession, dir: String): DataFrame = {
    val articles = Tables.documents(spark, dir)
      .select(col("doc_id"),
        concat(lit("10.1000/doc."), col("doc_id")).as("doi"))
    // synthesized Unpaywall response map: ~2/3 of DOIs have an OA PDF
    val pdfMap = Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 =!= 0)
      .select(concat(lit("10.1000/doc."), col("doc_id")).as("doi"),
        concat(lit("https://oa.example.org/"), col("doc_id"), lit(".pdf")).as("pdf_url"))
    articles.join(broadcast(pdfMap), Seq("doi"), "left")
      .select(col("doc_id"), col("doi"), col("pdf_url"),
        col("pdf_url").isNotNull.as("has_pdf"))
      .orderBy("doc_id")
  }

  /** Train-file corpus merge (pipeline_runner.py:48-59 + SURVEY §2.2
    * 80/20 buckets): the deterministic train split of the raw corpus
    * (q59's md5-digit assignment) unioned by name with the instruction
    * pairs, each row projected to the unified `to_text` form the
    * fine-tune loader consumes (train_lora.py:87-111).
    */
  def q66CorpusMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rawTrain = docs
      .withColumn("bucket",
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("int"))
      .filter(col("bucket") <= 12)
      .select(col("doc_id"), lit("corpus").as("record_type"),
        col("text").as("to_text"))
    val instructions = docs
      .filter(col("doc_id") % 3 === 1)
      .select(col("doc_id"), lit("instruction").as("record_type"),
        concat(lit("### Instruction:\nsummarize doc "), col("doc_id"),
          lit("\n### Response:\n"), substring(col("text"), 1, 60)).as("to_text"))
    rawTrain.unionByName(instructions)
      .orderBy("record_type", "doc_id")
  }

  /** Data-contract audit — the dbt-tests layer a production lake runs
    * before anything downstream trusts a table: key uniqueness, null
    * rates, referential integrity, and domain sanity, emitted as one
    * row per check with a violation count and pass flag. Cost
    * discipline: all single-table checks on a table compute in ONE
    * scan as parallel aggregate expressions (not one job per check —
    * at 100 TB the scan IS the cost, so checks must share it); the two
    * FK checks are broadcast anti-join counts against the small parent
    * side. Integer counts end to end.
    */
  /** All of one table's checks in ONE scan: aggregate expressions in a
    * single agg, then unpivoted to (table, check, violations) rows.
    */
  private[graft] def contractChecks(table: String, df: DataFrame,
                                        cs: (String, Column)*): DataFrame =
    df.agg(cs.head._2.as(cs.head._1), cs.tail.map(c => c._2.as(c._1)): _*)
      .select(explode(array(cs.map(c =>
        struct(lit(table).as("table_name"), lit(c._1).as("check_name"),
          col(c._1).cast("long").as("n_violations"))): _*)).as("c"))
      .select("c.*")

  def q128DataContract(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val ord = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val docs = Tables.documents(spark, dir)
    val single = contractChecks("customer", cust,
        "unique_c_custkey" -> (count(lit(1)) - countDistinct(col("c_custkey"))),
        "nonneg_acctbal_nulls" -> sum(when(col("c_acctbal").isNull, 1L).otherwise(0L)))
      .unionByName(contractChecks("orders", ord,
        "unique_o_orderkey" -> (count(lit(1)) - countDistinct(col("o_orderkey"))),
        "positive_totalprice" -> sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))))
      .unionByName(contractChecks("lineitem", li,
        "positive_quantity" -> sum(when(col("l_quantity") <= 0.0, 1L).otherwise(0L)),
        "discount_in_unit_range" ->
          sum(when(col("l_discount") < 0.0 || col("l_discount") > 1.0, 1L).otherwise(0L))))
      .unionByName(contractChecks("documents", docs,
        "unique_doc_id" -> (count(lit(1)) - countDistinct(col("doc_id"))),
        "nonempty_text" ->
          sum(when(col("text").isNull || length(trim(col("text"))) === 0, 1L).otherwise(0L))))
    val fkOrders = ord.join(broadcast(cust),
        ord("o_custkey") === cust("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("orders").as("table_name"),
        lit("fk_o_custkey_customer").as("check_name"), col("n_violations"))
    val fkLineitem = li.select(col("l_orderkey")).join(
        ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit("lineitem").as("table_name"),
        lit("fk_l_orderkey_orders").as("check_name"), col("n_violations"))
    single.unionByName(fkOrders).unionByName(fkLineitem)
      .withColumn("pass", col("n_violations") === 0L)
      .orderBy("table_name", "check_name")
  }
}
