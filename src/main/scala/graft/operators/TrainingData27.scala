package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 22: incremental-view maintenance with retractions
  * (the delta-merge loop a streaming materialized view runs —
  * inserts AND deletes folded into grouped aggregate state), and the
  * running-peak maximum drawdown of cumulative revenue. Both
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData27 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_ivm_delta — incremental view maintenance with retractions
  // (Blakeley et al. 1986 / the Flink retract-stream algebra): the
  // monthly-revenue view is built from the base snapshot (80% of
  // orders by key), then a change batch lands — inserts (the other
  // 20%) and deletes (a deterministic 1/16 of the base) — and the
  // view is MAINTAINED by merging signed delta aggregates
  // (+1/−1 weighted counts and cent sums) into the old state, with
  // groups whose count reaches zero dropped. The audit recomputes
  // the view directly from (base − deletes + inserts) and pins
  // equality per month — counts and cent sums are exact integers, so
  // "maintained ≡ recomputed" is bit-exact, not a tolerance. This is
  // the operator that makes a_var_merge's merge algebra an actual
  // maintenance loop: at 100 TB the view never rescans the base —
  // work is |delta|, not |corpus|. Scale shape: three map-side-
  // combining aggregates (base, signed delta, direct audit leg) and
  // two month-keyed joins of calendar-bounded frames.
  // ---------------------------------------------------------------
  val wIvmDelta: Q = (s, dir) => {
    val o = Tables.table(s, dir, "orders")
      .select(col("o_orderkey"),
        to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val isBase = col("o_orderkey") % 10 < 8
    val isDel = isBase &&
      substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0"
    val viewOld = o.filter(isBase).groupBy(col("month"))
      .agg(count(lit(1)).as("n0"), sum(col("cents")).cast("long").as("s0"))
    // signed delta: inserts weight +1, retractions weight -1
    val delta = o.select(col("month"), col("cents"),
        when(!isBase, 1L).when(isDel, -1L).otherwise(0L).as("w"))
      .filter(col("w") =!= 0L)
      .groupBy(col("month"))
      .agg(sum(col("w")).cast("long").as("dn"),
        sum(col("w") * col("cents")).cast("long").as("ds"))
    val maintained = viewOld.join(delta, Seq("month"), "full_outer")
      .select(col("month"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("ds"), lit(0L)))
          .as("s"))
      .filter(col("n_orders") > 0L)
    val direct = o.filter((isBase && !isDel) || !isBase)
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_direct"),
        sum(col("cents")).cast("long").as("s_direct"))
    maintained.join(direct, Seq("month"), "full_outer")
      .select(col("month"), col("n_orders"),
        (expr("CAST((s * 10000) div n_orders AS BIGINT)") / lit(1000000.0))
          .as("avg_price"),
        (col("n_orders") === col("n_direct") && col("s") === col("s_direct"))
          .as("ivm_matches_direct"))
      .orderBy(col("month"))
  }

  // ---------------------------------------------------------------
  // w_max_drawdown — maximum drawdown of cumulative daily revenue:
  // the largest peak-to-trough drop of the running total, with the
  // trough day (ties → earliest). Revenue days are all positive so
  // the raw cumsum never draws down — the audited series is the
  // day's revenue MINUS the calendar-mean baseline (exact integer:
  // day_cents·n_days − total_cents, the per-day surplus scaled by
  // n_days), i.e. the cumulative deviation from trend, whose
  // drawdown marks the longest under-performing stretch. All sums,
  // running peaks, and gaps are exact integers; dollars appear only
  // in the final micro-unit division (scaled back by n_days). Scale
  // shape: corpus reduces through the day aggregate first; the
  // cumsum/peak windows run on the calendar-bounded daily frame
  // (documented bounded-window class).
  // ---------------------------------------------------------------
  val wMaxDrawdown: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long")
        .as("rev"))
    val wAll = Grain.whole
    val wCum = Grain.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dev = daily
      .withColumn("n_days", count(lit(1)).over(wAll))
      .withColumn("total", sum(col("rev")).over(wAll))
      // surplus in cents·n_days units — integer-exact deviation
      .withColumn("surplus", col("rev") * col("n_days") - col("total"))
      .withColumn("cum", sum(col("surplus")).over(wCum))
      .withColumn("peak", max(col("cum")).over(wCum))
      .withColumn("dd", col("peak") - col("cum"))
    dev
      .withColumn("rk", row_number().over(
        Grain.bounded(desc("dd"), col("day"))))
      .filter(col("rk") === 1)
      // surplus units are cents·n_days: floor back to whole cents
      // first (exact, mirrored in the oracle), then to micro-dollars
      .select(col("day").as("trough_day"), col("n_days"),
        (expr("CAST((dd div n_days) * 10000 AS BIGINT)") /
          lit(1000000.0)).as("max_drawdown"),
        // implicit 0-anchor: a peak below trend start clamps to 0,
        // keeping the integral division on non-negative operands
        // (Spark div truncates, DuckDB // floors — they agree only
        // for non-negative numerators)
        (expr("CAST((greatest(peak, 0L) div n_days) * 10000 AS BIGINT)") /
          lit(1000000.0)).as("peak_dev"))
  }

  val queries: Map[String, Q] = Map(
    "w_ivm_delta" -> wIvmDelta,
    "w_max_drawdown" -> wMaxDrawdown)

  val oracles: Map[String, String] = Map(
    "w_ivm_delta" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |         o_orderkey % 10 < 8 AS is_base,
        |         o_orderkey % 10 < 8 AND substr(md5(CAST(o_orderkey
        |           AS VARCHAR)), 1, 1) = '0' AS is_del
        |  FROM orders),
        |view_old AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(cents) AS BIGINT) AS s0
        |  FROM o WHERE is_base GROUP BY 1),
        |delta AS (
        |  SELECT month, CAST(sum(w) AS BIGINT) AS dn,
        |         CAST(sum(w * cents) AS BIGINT) AS ds
        |  FROM (SELECT month, cents,
        |          CASE WHEN NOT is_base THEN 1
        |               WHEN is_del THEN -1 ELSE 0 END AS w
        |        FROM o) t
        |  WHERE w <> 0 GROUP BY 1),
        |maintained AS (
        |  SELECT coalesce(v.month, d.month) AS month,
        |         coalesce(v.n0, 0) + coalesce(d.dn, 0) AS n_orders,
        |         coalesce(v.s0, 0) + coalesce(d.ds, 0) AS s
        |  FROM view_old v FULL OUTER JOIN delta d ON v.month = d.month),
        |kept AS (SELECT * FROM maintained WHERE n_orders > 0),
        |direct AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n_direct,
        |         CAST(sum(cents) AS BIGINT) AS s_direct
        |  FROM o WHERE (is_base AND NOT is_del) OR NOT is_base
        |  GROUP BY 1)
        |SELECT coalesce(k.month, dr.month) AS month, k.n_orders,
        |       CAST((k.s * 10000) // k.n_orders AS BIGINT) / 1000000.0
        |         AS avg_price,
        |       (k.n_orders = dr.n_direct AND k.s = dr.s_direct)
        |         AS ivm_matches_direct
        |FROM kept k FULL OUTER JOIN direct dr ON k.month = dr.month
        |ORDER BY month""".stripMargin,
    "w_max_drawdown" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |dev AS (
        |  SELECT day,
        |         CAST(count(*) OVER () AS BIGINT) AS n_days,
        |         rev * CAST(count(*) OVER () AS BIGINT)
        |           - CAST(sum(rev) OVER () AS BIGINT) AS surplus
        |  FROM daily),
        |cum AS (
        |  SELECT day, n_days,
        |         sum(surplus) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM dev),
        |pk AS (
        |  SELECT day, n_days, cum,
        |         max(cum) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        |  FROM cum)
        |SELECT day AS trough_day, n_days,
        |       CAST(((peak - cum) // n_days) * 10000 AS BIGINT)
        |         / 1000000.0 AS max_drawdown,
        |       CAST((greatest(peak, 0) // n_days) * 10000 AS BIGINT)
        |         / 1000000.0 AS peak_dev
        |FROM pk
        |QUALIFY row_number() OVER (ORDER BY peak - cum DESC, day) = 1"""
        .stripMargin)
}
