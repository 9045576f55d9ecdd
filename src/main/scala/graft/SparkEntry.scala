package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Analytics

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every key in `queries` is an implemented operator from SURVEY.md §2 with
  * a matching DuckDB oracle in `oracleSql` (same column names, same
  * deterministic ordering) unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.topSpenders(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_top_spenders"    -> ((s, d) => Analytics.topSpenders(s, d)),
    "q_filter_project"  -> ((s, d) => Analytics.filterProject(s, d)),
    "q_agg_pricing"     -> ((s, d) => Analytics.aggPricingSummary(s, d)),
    "q_topk_per_group"  -> ((s, d) => Analytics.topOrdersPerPriority(s, d)),
    "q_recent_form"     -> ((s, d) => Analytics.recentForm(s, d)),
    "q_standings"       -> ((s, d) => Analytics.nationRevenueStandings(s, d)),
    "q_pct_rank"        -> ((s, d) => Analytics.spendPercentile(s, d)),
    "q_h2h_pairs"       -> ((s, d) => Analytics.nationPairTrade(s, d)),
    "q_anti_join"       -> ((s, d) => Analytics.customersWithoutUrgentOrders(s, d)),
    "q_semi_join"       -> ((s, d) => Analytics.customersWithUrgentOrders(s, d)),
    "q_union_distinct"  -> ((s, d) => Analytics.activeNations(s, d)),
    "q_dedup_firstwins" -> ((s, d) => Analytics.dedupLineitems(s, d)),
    "q_running_total"   -> ((s, d) => Analytics.runningSpend(s, d)),
    "q_histogram"       -> ((s, d) => Analytics.priceHistogram(s, d)),
    "q_global_stats"    -> ((s, d) => Analytics.globalStats(s, d)),
    "q_parse_ids"       -> ((s, d) => Analytics.parseCustomerIds(s, d))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_top_spenders" ->
      """SELECT c.c_custkey, c.c_name, n.n_name AS nation_name,
        |       count(*) AS order_cnt,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend,
        |       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spend
        |FROM orders o
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |GROUP BY 1, 2, 3
        |HAVING count(*) >= 5
        |ORDER BY total_spend DESC, c.c_custkey ASC
        |LIMIT 20""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
        |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       year(l_shipdate) AS ship_year,
        |       CASE WHEN l_quantity < 20 THEN 'small'
        |            WHEN l_quantity < 35 THEN 'medium'
        |            ELSE 'large' END AS size_class
        |FROM lineitem
        |WHERE l_shipdate BETWEEN TIMESTAMP '1998-01-01' AND TIMESTAMP '2000-12-31'
        |  AND l_returnflag = 'N' AND l_quantity > 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |            * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_topk_per_group" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
        |      FROM orders)
        |WHERE rk <= 3
        |ORDER BY o_orderpriority, rk""".stripMargin,

    "q_recent_form" ->
      """SELECT o_custkey,
        |       count(*) AS recent_cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS recent_spend,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS recent_avg
        |FROM (SELECT o_custkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_custkey
        |                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn <= 5
        |GROUP BY o_custkey
        |ORDER BY o_custkey""".stripMargin,

    "q_standings" ->
      """SELECT region_name, nation_name, revenue,
        |       rank() OVER (PARTITION BY region_name
        |                    ORDER BY revenue DESC, nation_name ASC) AS position
        |FROM (SELECT r.r_name AS region_name, n.n_name AS nation_name,
        |             CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |      FROM orders o
        |      JOIN customer c ON o.o_custkey = c.c_custkey
        |      JOIN nation n ON c.c_nationkey = n.n_nationkey
        |      JOIN region r ON n.n_regionkey = r.r_regionkey
        |      GROUP BY 1, 2)
        |ORDER BY region_name, position, nation_name""".stripMargin,

    "q_pct_rank" ->
      """SELECT o_custkey, total_spend,
        |       percent_rank() OVER (ORDER BY total_spend ASC, o_custkey ASC) AS spend_pct_rank
        |FROM (SELECT o_custkey,
        |             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
        |      FROM orders GROUP BY o_custkey)
        |ORDER BY o_custkey""".stripMargin,

    "q_h2h_pairs" ->
      """SELECT least(c.c_nationkey, s.s_nationkey) AS nation_lo,
        |       greatest(c.c_nationkey, s.s_nationkey) AS nation_hi,
        |       count(*) AS trade_cnt,
        |       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS trade_value
        |FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |JOIN customer c ON o.o_custkey = c.c_custkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1, 2
        |ORDER BY trade_value DESC, nation_lo ASC, nation_hi ASC
        |LIMIT 25""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q_union_distinct" ->
      """SELECT u.nationkey, n.n_name
        |FROM (SELECT c_nationkey AS nationkey FROM customer
        |      UNION
        |      SELECT s_nationkey FROM supplier) u
        |JOIN nation n ON u.nationkey = n.n_nationkey
        |ORDER BY u.nationkey""".stripMargin,

    "q_dedup_firstwins" ->
      """SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
        |FROM (SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
        |             row_number() OVER (PARTITION BY l_orderkey, l_partkey
        |                                ORDER BY l_linenumber ASC, l_quantity ASC, l_extendedprice ASC) AS rn
        |      FROM lineitem)
        |WHERE rn = 1
        |ORDER BY l_orderkey, l_partkey""".stripMargin,

    "q_running_total" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |            OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q_histogram" ->
      """SELECT CASE WHEN o_totalprice < 1000 THEN 'p0_under_1k'
        |            WHEN o_totalprice < 5000 THEN 'p1_1k_5k'
        |            WHEN o_totalprice < 20000 THEN 'p2_5k_20k'
        |            ELSE 'p3_over_20k' END AS price_bucket,
        |       count(*) AS cnt,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
        |FROM orders
        |GROUP BY 1
        |ORDER BY price_bucket""".stripMargin,

    "q_global_stats" ->
      """SELECT count(*) AS row_cnt,
        |       count(DISTINCT l_orderkey) AS order_cnt,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(count(*) AS DOUBLE) / count(DISTINCT l_orderkey) AS lines_per_order
        |FROM lineitem""".stripMargin,

    "q_parse_ids" ->
      """SELECT c_custkey,
        |       CAST(regexp_extract(c_name, '#([0-9]+)', 1) AS BIGINT) AS parsed_id,
        |       lower(c_mktsegment) AS segment_lc
        |FROM customer
        |ORDER BY c_custkey""".stripMargin
  )
}
