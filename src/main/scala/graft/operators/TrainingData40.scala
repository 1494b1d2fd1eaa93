package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 35: growth accounting (the new/retained/resurrected/
  * churned daily ledger — the canonical product-growth decomposition,
  * e.g. the "growth accounting equation" of Social Capital's
  * framework), weekly DAU/WAU stickiness, and a per-user bot-rate
  * audit (rate + interarrival-regularity heuristics — the traffic
  * screen crawl pipelines run before counting a "user"). All
  * integer-exact with full-replay DuckDB oracles.
  */
object TrainingData40 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  /** Distinct (user, day) activity — the growth-accounting input. */
  private def activity(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()

  // ---------------------------------------------------------------
  // ev_growth_accounting — per day: users NEW (first-ever activity),
  // RETAINED (also active the previous day), RESURRECTED (returning
  // after a gap), CHURNED (active the previous day, absent today).
  // Identities pinned in the spec: new+retained+resurrected =
  // active(d); retained(d) = active(d−1) − churned(d). Churn beyond
  // the observation window (day > max) is not reported — there is
  // no day to attribute it to. Scale shape: activity dedups to one
  // row per (user, day); ONE per-user lag/lead window classifies
  // everything (partition-parallel across users — billions of
  // independent partitions at 100 TB); day totals are bounded
  // calendar aggregates.
  // ---------------------------------------------------------------
  val evGrowthAccounting: Q = (s, dir) => {
    val act = activity(s, dir).localCheckpoint(eager = false) // window scan + max-day
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    val cls = act
      .withColumn("prev", lag(col("day"), 1).over(w))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .localCheckpoint(eager = false) // consumed by the day rollup AND the churn leg
    val daily = cls.groupBy(col("day"))
      .agg(sum(when(col("prev").isNull, 1L).otherwise(0L))
          .cast("long").as("n_new"),
        sum(when(col("prev").isNotNull &&
            datediff(col("day"), col("prev")) === 1, 1L).otherwise(0L))
          .cast("long").as("n_retained"),
        sum(when(col("prev").isNotNull &&
            datediff(col("day"), col("prev")) > 1, 1L).otherwise(0L))
          .cast("long").as("n_resurrected"))
    val maxd = act.agg(max(col("day")).as("maxd"))
    val churn = cls
      .filter(col("nxt").isNull || datediff(col("nxt"), col("day")) > 1)
      .select(date_add(col("day"), 1).as("day"))
      .crossJoin(broadcast(maxd))
      .filter(col("day") <= col("maxd"))
      .groupBy(col("day")).agg(count(lit(1)).cast("long").as("n_churned"))
    daily.join(churn, Seq("day"), "full_outer")
      .na.fill(0L, Seq("n_new", "n_retained", "n_resurrected", "n_churned"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // ev_stickiness — weekly DAU/WAU engagement ratio: for each ISO
  // week, the mean daily-active count over the week's observed days
  // divided by the week's distinct actives. avg_dau/wau = 1 means
  // everyone who shows up shows up every day. Scale shape: DAU is a
  // per-day count over the deduped activity, WAU one distinct-count
  // per week; both bounded by the calendar after the per-(user,day)
  // dedup; the ratio is exact ints through two fixed divisions.
  // ---------------------------------------------------------------
  val evStickiness: Q = (s, dir) => {
    val act = activity(s, dir).localCheckpoint(eager = false) // DAU leg + WAU leg
    val dau = act.groupBy(col("day")).agg(count(lit(1)).cast("long").as("dau"))
      .withColumn("week", date_trunc("week", col("day")).cast("date"))
      .groupBy(col("week"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(col("dau")).cast("long").as("sum_dau"))
    val wau = act
      .withColumn("week", date_trunc("week", col("day")).cast("date"))
      .groupBy(col("week"))
      .agg(countDistinct(col("user_id")).cast("long").as("wau"))
    dau.join(wau, Seq("week"))
      .select(col("week"), col("n_days"), col("wau"),
        round(d(col("sum_dau")) / d(col("n_days")), 6).as("avg_dau"),
        round(d(col("sum_dau")) / d(col("n_days")) / d(col("wau")), 6)
          .as("stickiness"))
      .orderBy(col("week"))
  }

  // ---------------------------------------------------------------
  // ev_bot_flag — per-user traffic screen: event rate over the
  // active span plus the interarrival coefficient of variation
  // (whole-second gaps, the ev_interarrival quantization: n, Σg,
  // Σg² stay exact longs; CV = √(n·Σg² − (Σg)²)/Σg touches libm
  // only at the final sqrt). Flag = rate > 5/min (hammering) OR
  // (≥ 20 gaps AND CV < 0.1) (metronomic scheduling — humans are
  // bursty). Scale shape: one per-user lag window (billions of
  // independent partitions), then a per-user aggregate; no join
  // anywhere.
  // ---------------------------------------------------------------
  val evBotFlag: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val gaps = ev.withColumn("gap_s",
      expr("CAST((us - lag(us, 1) OVER (PARTITION BY user_id" +
        " ORDER BY us, event_id)) div 1000000 AS BIGINT)"))
    gaps.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        (max(col("us")) - min(col("us"))).cast("long").as("span_us"),
        sum(when(col("gap_s").isNotNull, 1L).otherwise(0L))
          .cast("long").as("n_gaps"),
        sum(col("gap_s")).cast("long").as("sg"),
        sum(col("gap_s") * col("gap_s")).cast("long").as("sgg"))
      .withColumn("rate_per_min",
        when(col("span_us") > 0,
          round(d(col("n_events")) * lit(60000000.0) / d(col("span_us")), 6)))
      .withColumn("cv",
        when(col("n_gaps") >= 2 && col("sg") > 0,
          round(sqrt(d(col("n_gaps") * col("sgg") - col("sg") * col("sg"))) /
            d(col("sg")), 6)))
      .withColumn("is_bot",
        coalesce(col("rate_per_min") > 5.0, lit(false)) ||
          (col("n_gaps") >= 20 && coalesce(col("cv") < 0.1, lit(false))))
      .select(col("user_id"), col("n_events"), col("n_gaps"),
        col("rate_per_min"), col("cv"), col("is_bot"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "ev_growth_accounting" -> evGrowthAccounting,
    "ev_stickiness" -> evStickiness,
    "ev_bot_flag" -> evBotFlag)

  val oracles: Map[String, String] = Map(
    "ev_growth_accounting" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |cls AS (
        |  SELECT user_id, day,
        |         lag(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev,
        |         lead(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS nxt
        |  FROM act),
        |daily AS (
        |  SELECT day,
        |         CAST(sum(CASE WHEN prev IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_new,
        |         CAST(sum(CASE WHEN prev IS NOT NULL
        |               AND datediff('day', prev, day) = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_retained,
        |         CAST(sum(CASE WHEN prev IS NOT NULL
        |               AND datediff('day', prev, day) > 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_resurrected
        |  FROM cls GROUP BY 1),
        |maxd AS (SELECT max(day) AS maxd FROM act),
        |churn AS (
        |  SELECT day, CAST(count(*) AS BIGINT) AS n_churned FROM (
        |    SELECT day + 1 AS day FROM cls CROSS JOIN maxd
        |    WHERE (nxt IS NULL OR datediff('day', day, nxt) > 1)
        |      AND day + 1 <= maxd)
        |  GROUP BY 1)
        |SELECT coalesce(d.day, c.day) AS day,
        |       coalesce(n_new, 0) AS n_new,
        |       coalesce(n_retained, 0) AS n_retained,
        |       coalesce(n_resurrected, 0) AS n_resurrected,
        |       coalesce(n_churned, 0) AS n_churned
        |FROM daily d FULL OUTER JOIN churn c ON d.day = c.day
        |ORDER BY day""".stripMargin,
    "ev_stickiness" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |dau AS (
        |  SELECT CAST(date_trunc('week', day) AS DATE) AS week,
        |         CAST(count(*) AS BIGINT) AS n_days_inner,
        |         CAST(sum(dau) AS BIGINT) AS sum_dau
        |  FROM (SELECT day, CAST(count(*) AS BIGINT) AS dau
        |        FROM act GROUP BY 1)
        |  GROUP BY 1),
        |wau AS (
        |  SELECT CAST(date_trunc('week', day) AS DATE) AS week,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        |  FROM act GROUP BY 1)
        |SELECT d.week, d.n_days_inner AS n_days, w.wau,
        |       round(d.sum_dau::DOUBLE / d.n_days_inner::DOUBLE, 6) AS avg_dau,
        |       round(d.sum_dau::DOUBLE / d.n_days_inner::DOUBLE
        |         / w.wau::DOUBLE, 6) AS stickiness
        |FROM dau d JOIN wau w USING (week)
        |ORDER BY d.week""".stripMargin,
    "ev_bot_flag" ->
      """WITH gaps AS (
        |  SELECT user_id, epoch_us(ts) AS us,
        |         (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |            PARTITION BY user_id ORDER BY ts, event_id))
        |           // 1000000 AS gap_s
        |  FROM events),
        |agg AS (
        |  SELECT user_id,
        |         CAST(count(*) AS BIGINT) AS n_events,
        |         CAST(max(us) - min(us) AS BIGINT) AS span_us,
        |         CAST(sum(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_gaps,
        |         CAST(sum(gap_s) AS BIGINT) AS sg,
        |         CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
        |  FROM gaps GROUP BY 1),
        |m AS (
        |  SELECT user_id, n_events, n_gaps,
        |         CASE WHEN span_us > 0 THEN
        |           round(n_events::DOUBLE * 60000000.0 / span_us::DOUBLE, 6)
        |         END AS rate_per_min,
        |         CASE WHEN n_gaps >= 2 AND sg > 0 THEN
        |           round(sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE))
        |             / sg::DOUBLE, 6)
        |         END AS cv
        |  FROM agg)
        |SELECT user_id, n_events, n_gaps, rate_per_min, cv,
        |       coalesce(rate_per_min > 5.0, FALSE)
        |         OR (n_gaps >= 20 AND coalesce(cv < 0.1, FALSE)) AS is_bot
        |FROM m ORDER BY user_id""".stripMargin)
}
