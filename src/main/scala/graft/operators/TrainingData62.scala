package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 62: CUBE / grouping-sets aggregation — the one
  * relational surface the sql_* family (lateral, pivot, recursive,
  * subqueries) was still missing. Spark plans a cube as ONE pass
  * with an Expand node (4 grouping sets materialized map-side, then
  * a single hash aggregate with partial combine) — the shape that
  * replaces four separate scans of a 100 TB fact table.
  */
object TrainingData62 {
  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------
  // sql_cube — order count and exact-decimal revenue at every
  // (status, priority) granularity: the detail cells, each one-way
  // margin, and the grand total, disambiguated by grouping_id (bit
  // 2 = status aggregated, bit 1 = priority aggregated — the same
  // MSB-first convention DuckDB's GROUPING() uses, replayed not
  // assumed). NULL group values only appear where gid says the
  // column is rolled up. Scale shape: one scan → Expand(4 sets) →
  // one two-phase hash aggregate; output bounded by
  // (|status|+1)·(|priority|+1).
  // ---------------------------------------------------------------
  val sqlCube: Q = (s, dir) =>
    Tables.table(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).cast("long").as("n_orders"),
        expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
          .as("revenue"))
      .select(col("o_orderstatus").as("status"),
        col("o_orderpriority").as("priority"),
        col("gid"), col("n_orders"), col("revenue"))
      .orderBy(col("gid"), asc_nulls_first("status"),
        asc_nulls_first("priority"))

  val queries: Map[String, Q] = Map("sql_cube" -> sqlCube)

  val oracles: Map[String, String] = Map(
    "sql_cube" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT)
        |         AS gid,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS revenue
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, status NULLS FIRST, priority NULLS FIRST""".stripMargin)
}
