package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Additional TPC-H query shapes (Q10, Q14, Q15, Q18, Q22-adapted),
  * completing the canonical star-schema suite alongside q1/q3/q5/q6/
  * q7/q8/q19 elsewhere in the repo — the standard proof that the
  * relational surface handles selective fact filters, conditional
  * ratios, max-equality subqueries, HAVING-driven semi joins, and
  * anti-join aggregates with the repo's exact-decimal money policy.
  *
  * Reference behavior basis: the reference's dashboard aggregates
  * (streamlit_app/dashboard.py) are simple GROUP BYs; these are the
  * standard analytic supersets over the same star layout.
  */
object Tpch {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def rev: Column = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))

  // Q14: promo revenue share in one month — conditional exact-decimal
  // numerator over the same join, one double division; the date range
  // pushes into the fact scan.
  val q14PromoRatio: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-03-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", rev)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))

  // Q10: top-20 customers by returned-item revenue — selective flag
  // filter on the fact, star join, exact-decimal revenue ranking
  // with a key tiebreak.
  val q10ReturnedRevenue: Q = (s, dir) =>
    t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"))
      .agg(sum(rev).cast("double").as("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  // Q15: supplier(s) achieving the quarter's MAX revenue — the
  // max-equality compares EXACT decimals (never doubles), so ties
  // resolve identically in both engines.
  val q15TopSupplier: Q = (s, dir) => {
    val srev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(sum(rev).as("total_rev"))
      // supplier-bounded (≤ #suppliers rows); the checkpoint stops the
      // max-rev scalar and the filter branch from EACH re-scanning and
      // re-aggregating lineitem — one quarter-of-lineitem scan total
      .localCheckpoint(eager = false)
    srev.crossJoin(broadcast(srev.agg(max(col("total_rev")).as("max_rev"))))
      .filter(col("total_rev") === col("max_rev"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        col("total_rev").cast("double").as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  // Q18: large-volume orders — exact-decimal HAVING over the fact
  // aggregate, then the order/customer decoration joins only the
  // tiny surviving set.
  val q18LargeOrders: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
      .filter(col("sum_qty") > 300)
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        col("sum_qty").cast("double").as("sum_qty"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))

  // Q22 (adapted to this schema): per-nation count/balance of
  // above-average-balance customers with NO orders — scalar-subquery
  // threshold from exact moments, anti join, decimal rollup.
  val q22IdleCustomers: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val avgPos = c.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") /
        count(lit(1)).cast("double")).as("avg_pos"))
    c.join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
      .crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("avg_pos"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(dec(col("c_acctbal"))).cast("double").as("total_balance"))
      .orderBy(col("n_name"))
  }

  val queries: Map[String, Q] = Map(
    "q14_promo_ratio" -> q14PromoRatio,
    "q10_returned_revenue" -> q10ReturnedRevenue,
    "q15_top_supplier" -> q15TopSupplier,
    "q18_large_orders" -> q18LargeOrders,
    "q22_idle_customers" -> q22IdleCustomers)

  private val revSql =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  val oracles: Map[String, String] = Map(
    "q14_promo_ratio" ->
      s"""SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $revSql
         |                             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
         |         / CAST(SUM($revSql) AS DOUBLE) AS promo_revenue_pct,
         |       count(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
         |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin,
    "q10_returned_revenue" ->
      s"""SELECT c_custkey, c_name, n_name, c_acctbal,
         |       CAST(SUM($revSql) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |GROUP BY 1, 2, 3, 4
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q15_top_supplier" ->
      s"""WITH srev AS (
         |  SELECT l_suppkey, SUM($revSql) AS total_rev
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         |FROM srev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_rev = (SELECT max(total_rev) FROM srev)
         |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
        |       CAST(sum_qty AS DOUBLE) AS sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey""".stripMargin,
    "q22_idle_customers" ->
      """WITH avg_pos AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS avg_pos
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS n_customers,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |CROSS JOIN avg_pos
        |WHERE c_acctbal > avg_pos
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY 1 ORDER BY n_name""".stripMargin)
}
