package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names (SURVEY §2 inventory) to DataFrame builders
  * over a scale-factor directory; `oracleSql` carries the DuckDB-equivalent
  * SQL for the driver's hash-match harness. Column names and row order are
  * kept identical on both sides.
  */
object SparkEntry {
  import graft.operators.Relational

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q3JoinAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg"              -> Relational.q1Agg _,
    "q2_filter_proj"      -> Relational.q2FilterProj _,
    "q3_join_agg"         -> Relational.q3JoinAgg _,
    "q4_topk_window"      -> Relational.q4TopkWindow _,
    "q5_semi_join"        -> Relational.q5SemiJoin _,
    "q6_anti_join"        -> Relational.q6AntiJoin _,
    "q7_distinct"         -> Relational.q7Distinct _,
    "q8_union"            -> Relational.q8Union _,
    "q9_running_sum"      -> Relational.q9RunningSum _,
    "q10_cascade"         -> Relational.q10Cascade _,
    "q11_latest_partition" -> Relational.q11LatestPartition _,
    "q12_group_stats"     -> Relational.q12GroupStats _,
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_revenue,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_proj" ->
      """SELECT l_orderkey, l_linenumber,
         round(l_extendedprice * (1.0 - l_discount), 2) AS net_price
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1995-02-01'
           AND l_discount > 0.05 AND l_quantity < 10.0
         ORDER BY l_orderkey, l_linenumber""",
    "q3_join_agg" ->
      """SELECT n_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q4_topk_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) WHERE rk <= 3
         ORDER BY o_custkey, rk""",
    "q5_semi_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q6_anti_join" ->
      """SELECT c_custkey, c_name, c_nationkey FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q7_distinct" ->
      """SELECT DISTINCT l_suppkey, l_returnflag FROM lineitem
         ORDER BY l_suppkey, l_returnflag""",
    "q8_union" ->
      """SELECT kind, nationkey, count(*) AS n, round(sum(acctbal), 2) AS bal FROM (
           SELECT c_name AS name, c_acctbal AS acctbal, c_nationkey AS nationkey,
                  'customer' AS kind FROM customer
           UNION ALL
           SELECT s_name, s_acctbal, s_nationkey, 'supplier' FROM supplier)
         GROUP BY kind, nationkey ORDER BY kind, nationkey""",
    "q9_running_sum" ->
      """SELECT o_custkey, o_orderkey,
         round(sum(o_totalprice) OVER (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q10_cascade" ->
      """SELECT CASE WHEN n_chars >= 400 THEN 'FULL'
                     WHEN n_chars >= 200 THEN 'ABSTRACT'
                     ELSE 'NONE' END AS section,
         count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM documents GROUP BY 1 ORDER BY section""",
    "q11_latest_partition" ->
      """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
         FROM events
         WHERE date_trunc('month', ts) =
               (SELECT max(date_trunc('month', ts)) FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "q12_group_stats" ->
      """SELECT lang, source, count(*) AS n_docs,
         round(avg(n_chars), 4) AS avg_chars,
         CAST(max(n_chars) AS BIGINT) AS max_chars
         FROM documents GROUP BY lang, source ORDER BY lang, source""",
  )
}
