package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 44: an as-of join hit-rate audit over a staleness
  * grid (what fraction of point-in-time lookups would a feature
  * store actually serve at each freshness SLA — the capacity number
  * behind asOfJoinTolerance), Neyman optimal stratified-sample
  * allocation (n_h ∝ N_h·σ_h — the sampling design that beats
  * proportional when strata variances differ), and a storage-age
  * tiering audit (hot/warm/cold row mass by date — the lifecycle
  * policy input). All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData49 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // j_asof_hit_rate — for each view event, the time since the same
  // user's most recent PRIOR purchase (one backward carry — the
  // AsOf union+carry shape, one shuffle), then the hit rate at
  // tolerance 60 s / 1 h / 1 d: the fraction of lookups a feature
  // with that freshness SLA would serve non-null. ONE carry pass
  // prices the whole grid (each tolerance is a predicate over the
  // same gap), vs one join per SLA. Scale shape: one per-user
  // ordered window, then a 3-row constant fan-out aggregate.
  // ---------------------------------------------------------------
  private val HitTolerances = Seq(60L, 3600L, 86400L)

  val jAsofHitRate: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .filter(col("event_type").isin("view", "purchase"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val gaps = ev
      .withColumn("last_purchase",
        last(when(col("event_type") === "purchase", col("us")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "view")
      .select(((col("us") - col("last_purchase")) / 1000000L).as("gap_s"))
    gaps
      .select(explode(array(HitTolerances.map(lit): _*)).as("tolerance_sec"),
        col("gap_s"))
      .groupBy(col("tolerance_sec"))
      .agg(count(lit(1)).cast("long").as("n_views"),
        sum(when(col("gap_s").isNotNull &&
            col("gap_s") <= d(col("tolerance_sec")), 1L).otherwise(0L))
          .cast("long").as("n_hits"))
      .withColumn("hit_rate",
        round(d(col("n_hits")) / d(col("n_views")), 6))
      .orderBy(col("tolerance_sec"))
  }

  // ---------------------------------------------------------------
  // t_neyman_allocation — optimal stratified sampling over language
  // strata: n_h = B · N_h σ_h / Σ N σ (Neyman 1934), σ from the
  // exact micro-unit quality moments, the fixed budget B = 1000
  // split by largest remainder (the o_quota_allocation rule — seats
  // sum to B by construction). Proportional allocation oversamples
  // big uniform strata; Neyman spends budget where the variance is.
  // Scale shape: one scan to 5-key exact moments; σ/weights are
  // bounded-frame arithmetic (sorted fold for the Σ over ≤5 langs);
  // the remainder rank is a 5-row window.
  // ---------------------------------------------------------------
  private val NeymanBudget = 1000L

  val tNeymanAllocation: Q = (s, dir) => {
    val m = Tables.table(s, dir, "documents")
      .select(col("lang"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).as("q"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("q")).cast("long").as("sq"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"))
      .withColumn("sd",
        sqrt((d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) /
          (d(col("n")) - lit(1.0))) / lit(1000000.0))
      .withColumn("wgt", d(col("n")) * col("sd"))
      .localCheckpoint(eager = false) // Σw fold AND the allocation pass
    val tot = m.agg(expr("aggregate(sort_array(collect_list(struct(lang, wgt)))," +
      " 0D, (a, x) -> a + x.wgt)").as("sw"))
    val shares = m.crossJoin(broadcast(tot))
      .withColumn("share", col("wgt") / col("sw"))
      .withColumn("exact", d(lit(NeymanBudget)) * col("share"))
      .withColumn("base", floor(col("exact")).cast("long"))
      .withColumn("rem", col("exact") - d(col("base")))
      .localCheckpoint(eager = false) // leftover count AND the remainder rank
    val leftover = shares.agg(
      (lit(NeymanBudget) - sum(col("base"))).cast("long").as("k"))
    shares.crossJoin(broadcast(leftover))
      .withColumn("rrk", row_number().over(
        Grain.bounded(desc("rem"), col("lang"))).cast("long"))
      .withColumn("n_alloc",
        (col("base") + when(col("rrk") <= col("k"), 1L).otherwise(0L))
          .cast("long"))
      .select(col("lang"), col("n").as("n_docs"), round(col("sd"), 6).as("sd"),
        round(col("share"), 6).as("share"), col("n_alloc"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // o_storage_tiers — lifecycle tiering audit: order rows binned by
  // age relative to the newest order date (hot < 365 days, warm
  // < 1095, cold otherwise) with row and revenue mass per tier —
  // the numbers a storage-policy decision (compaction cadence,
  // compression level, archival) reads. Scale shape: ONE scan with
  // the broadcast max-date scalar; integer counts and exact DECIMAL
  // revenue; a 3-row result.
  // ---------------------------------------------------------------
  val oStorageTiers: Q = (s, dir) => {
    val maxd = Tables.table(s, dir, "orders").agg(max(col("o_orderdate")).as("mx"))
    val tiered = Tables.table(s, dir, "orders").crossJoin(broadcast(maxd))
      .withColumn("age_days", datediff(col("mx"), col("o_orderdate")))
      .withColumn("tier",
        when(col("age_days") < 365, "hot")
          .when(col("age_days") < 1095, "warm")
          .otherwise(lit("cold")))
    val tot = Tables.table(s, dir, "orders")
      .agg(count(lit(1)).cast("long").as("n_total"))
    tiered.groupBy(col("tier"))
      .agg(count(lit(1)).cast("long").as("n_orders"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("revenue_cents"),
        min(col("age_days")).cast("long").as("min_age_days"),
        max(col("age_days")).cast("long").as("max_age_days"))
      .crossJoin(broadcast(tot))
      .select(col("tier"), col("n_orders"),
        round(d(col("n_orders")) / d(col("n_total")), 6).as("row_share"),
        (d(col("revenue_cents")) / 100.0).as("revenue"),
        col("min_age_days"), col("max_age_days"))
      .orderBy(col("min_age_days"))
  }

  val queries: Map[String, Q] = Map(
    "j_asof_hit_rate" -> jAsofHitRate,
    "t_neyman_allocation" -> tNeymanAllocation,
    "o_storage_tiers" -> oStorageTiers)

  val oracles: Map[String, String] = Map(
    "j_asof_hit_rate" ->
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
         |  FROM events WHERE event_type IN ('view', 'purchase')),
         |gaps AS (
         |  SELECT (us - last_purchase) / 1000000 AS gap_s
         |  FROM (
         |    SELECT event_type, us,
         |           last_value(CASE WHEN event_type = 'purchase' THEN us END
         |               IGNORE NULLS)
         |             OVER (PARTITION BY user_id ORDER BY us, event_id
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |             AS last_purchase
         |    FROM ev)
         |  WHERE event_type = 'view'),
         |grid AS (
         |  SELECT unnest([${HitTolerances.mkString(", ")}]) AS tolerance_sec)
         |SELECT CAST(tolerance_sec AS BIGINT) AS tolerance_sec,
         |       CAST(count(*) AS BIGINT) AS n_views,
         |       CAST(sum(CASE WHEN gap_s IS NOT NULL
         |             AND gap_s <= tolerance_sec::DOUBLE THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       round(CAST(sum(CASE WHEN gap_s IS NOT NULL
         |               AND gap_s <= tolerance_sec::DOUBLE THEN 1 ELSE 0 END)
         |           AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE, 6)
         |         AS hit_rate
         |FROM gaps CROSS JOIN grid
         |GROUP BY tolerance_sec ORDER BY tolerance_sec""".stripMargin,
    "t_neyman_allocation" ->
      s"""WITH m AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(q) AS BIGINT) AS sq,
         |         sum(CAST(q AS DECIMAL(38,0)) * q) AS sqq
         |  FROM (SELECT lang,
         |               CAST(floor(
         |                 (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         |                   * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
         |                           / CAST(n_tokens AS DOUBLE), 10.0) / 10.0
         |                 * 1000000.0) AS BIGINT) AS q
         |        FROM (SELECT lang, text,
         |                     len(string_split(text, ' ')) AS n_tokens,
         |                     len(list_filter(string_split(text, ' '),
         |                         t -> t IN ('the','a','of','and','to'))) AS n_stops
         |              FROM documents))
         |  GROUP BY lang),
         |sdv AS (
         |  SELECT lang, n,
         |         sqrt((sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE / n::DOUBLE)
         |           / (n::DOUBLE - 1.0)) / 1000000.0 AS sd
         |  FROM m),
         |wg AS (SELECT lang, n, sd, n::DOUBLE * sd AS wgt FROM sdv),
         |tot AS (SELECT list_sum(list(wgt ORDER BY lang)) AS sw FROM wg),
         |sh AS (
         |  SELECT lang, n, sd, wgt / sw AS share,
         |         $NeymanBudget.0 * (wgt / sw) AS exact,
         |         CAST(floor($NeymanBudget.0 * (wgt / sw)) AS BIGINT) AS base,
         |         $NeymanBudget.0 * (wgt / sw)
         |           - floor($NeymanBudget.0 * (wgt / sw)) AS rem
         |  FROM wg CROSS JOIN tot),
         |lo AS (SELECT $NeymanBudget - CAST(sum(base) AS BIGINT) AS k FROM sh),
         |rk AS (
         |  SELECT lang, n, sd, share, base, k,
         |         CAST(row_number() OVER (ORDER BY rem DESC, lang) AS BIGINT)
         |           AS rrk
         |  FROM sh CROSS JOIN lo)
         |SELECT lang, n AS n_docs, round(sd, 6) AS sd,
         |       round(share, 6) AS share,
         |       CAST(base + CASE WHEN rrk <= k THEN 1 ELSE 0 END AS BIGINT)
         |         AS n_alloc
         |FROM rk ORDER BY lang""".stripMargin,
    "o_storage_tiers" ->
      """WITH maxd AS (SELECT max(o_orderdate) AS mx FROM orders),
        |tiered AS (
        |  SELECT datediff('day', o_orderdate, mx) AS age_days,
        |         CASE WHEN datediff('day', o_orderdate, mx) < 365 THEN 'hot'
        |              WHEN datediff('day', o_orderdate, mx) < 1095 THEN 'warm'
        |              ELSE 'cold' END AS tier,
        |         o_totalprice
        |  FROM orders CROSS JOIN maxd),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM orders)
        |SELECT tier, CAST(count(*) AS BIGINT) AS n_orders,
        |       round(CAST(count(*) AS BIGINT)::DOUBLE / n_total::DOUBLE, 6)
        |         AS row_share,
        |       CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |         AS BIGINT)) AS BIGINT)::DOUBLE / 100.0 AS revenue,
        |       CAST(min(age_days) AS BIGINT) AS min_age_days,
        |       CAST(max(age_days) AS BIGINT) AS max_age_days
        |FROM tiered CROSS JOIN tot
        |GROUP BY tier, n_total ORDER BY min_age_days""".stripMargin)
}
