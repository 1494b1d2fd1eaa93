package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 60: DAU/MAU stickiness (the product-analytics
  * engagement ratio, computed with a bounded contribute-to-window
  * expansion instead of a sliding distinct-count), and the Hill
  * tail-index of per-user activity (Hill 1975 — the heavy-tail
  * exponent that decides whether "average events per user" is even
  * meaningful, and the behavioral twin of the token-side Zipf fit).
  * Full-replay DuckDB oracles for both.
  */
object TrainingData60 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // ev_dau_mau — per day: DAU, trailing-28-day MAU, and the DAU/MAU
  // stickiness ratio (the daily companion of ev_stickiness's weekly
  // DAU/WAU view). A sliding COUNT DISTINCT is the naive
  // plan (re-scans 28 days per day); instead each (user, activity
  // day) pair CONTRIBUTES itself to the ≤28 future windows it keeps
  // alive — a bounded 28× fan-out of the deduplicated user-day set,
  // then MAU is a plain per-day distinct count and the whole thing
  // is two hash aggregates around one bounded explode. Days with no
  // trailing window yet (the first 27) still report their partial
  // window, as product dashboards do. Only days with DAU > 0 emit
  // (the synthetic corpus has no gap days; a calendar spine would
  // left-join them as zero).
  // ---------------------------------------------------------------
  private val MauWindowDays = 28

  val evStickiness: Q = (s, dir) => {
    val userDays = Tables.table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint(eager = false) // DAU side and the MAU fan-out share it
    val maxd = userDays.agg(max(col("day")).as("maxd"))
    val dau = userDays.groupBy(col("day"))
      .agg(countDistinct(col("user_id")).cast("long").as("dau"))
    val mau = userDays.crossJoin(broadcast(maxd))
      .select(col("user_id"),
        explode(sequence(lit(0), lit(MauWindowDays - 1))).as("k"),
        col("day"), col("maxd"))
      .select(col("user_id"),
        expr("date_add(day, k)").as("day"), col("maxd"))
      .filter(col("day") <= col("maxd"))
      .groupBy(col("day"))
      .agg(countDistinct(col("user_id")).cast("long").as("mau"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        round(d(col("dau")) / d(col("mau")), 6).as("stickiness"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // ev_hill_tail — Hill estimator of the per-user activity tail
  // index over the top k order statistics: α̂ = k / Σ_{i≤k}
  // ln(x_(i) / x_(k+1)) with the standard x_(k+1) threshold and the
  // usual data-adaptive k = clamp(n_users/4, 2, 50). α ≤ 2 means
  // infinite variance — per-user averages are unstable and sampling
  // must stratify; the behavioral twin of the token Zipf fit. Scale
  // shape: per-user counts are one aggregate; the order statistics
  // rank through Ranking.withGlobalRank (two-phase — the user list
  // is corpus-sized, never a single-partition sort); the ln fold
  // runs in sorted (count, user) order — bit-stable; one row out.
  // ---------------------------------------------------------------
  val evHillTail: Q = (s, dir) => {
    val per = Tables.table(s, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(eager = false) // rank pass + the k scalar share it
    val kf = per.agg(count(lit(1)).as("nu"))
      .select(least(lit(50L), greatest(lit(2L), expr("nu div 4")))
        .cast("long").as("kk"))
    val ranked = Ranking.withGlobalRank(per, "rk", desc("c"), col("user_id"))
    val thr = ranked.crossJoin(broadcast(kf))
      .filter(col("rk") === col("kk") + 1)
      .select(col("c").as("x_k1"), col("kk"))
    ranked.crossJoin(broadcast(thr))
      .filter(col("rk") <= col("kk"))
      .agg(count(lit(1)).cast("long").as("k"),
        min(col("x_k1")).cast("long").as("x_threshold"),
        expr("aggregate(sort_array(collect_list(named_struct(" +
          "'c', c, 'user_id', user_id," +
          " 'v', ln(CAST(c AS DOUBLE) / CAST(x_k1 AS DOUBLE))))), 0D," +
          " (a, q) -> a + q.v)").as("lnsum"))
      .select(col("k"), col("x_threshold"),
        round(col("lnsum"), 6).as("ln_sum"),
        round(d(col("k")) / col("lnsum"), 6).as("hill_alpha"),
        (d(col("k")) / col("lnsum") <= 2.0).as("infinite_variance"))
  }

  val queries: Map[String, Q] = Map(
    "ev_dau_mau" -> evStickiness,
    "ev_hill_tail" -> evHillTail)

  val oracles: Map[String, String] = Map(
    "ev_dau_mau" ->
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         |maxd AS (SELECT max(day) AS maxd FROM ud),
         |dau AS (
         |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
         |  FROM ud GROUP BY 1),
         |mau AS (
         |  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
         |  FROM (
         |    SELECT ud.user_id, ud.day + CAST(kk.k AS INTEGER) AS day
         |    FROM ud
         |    CROSS JOIN (SELECT unnest(range(0, $MauWindowDays)) AS k) kk
         |    CROSS JOIN maxd
         |    WHERE ud.day + CAST(kk.k AS INTEGER) <= maxd)
         |  GROUP BY 1)
         |SELECT dau.day, dau.dau, mau.mau,
         |       round(dau.dau::DOUBLE / mau.mau::DOUBLE, 6) AS stickiness
         |FROM dau JOIN mau USING (day)
         |ORDER BY dau.day""".stripMargin,
    "ev_hill_tail" ->
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1),
        |kf AS (
        |  SELECT CAST(least(50, greatest(2, count(*) // 4)) AS BIGINT) AS kk
        |  FROM per),
        |top AS (
        |  SELECT user_id, c,
        |         row_number() OVER (ORDER BY c DESC, user_id) AS rk
        |  FROM per),
        |thr AS (
        |  SELECT c AS x_k1, kk FROM top CROSS JOIN kf WHERE rk = kk + 1),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS k,
        |         CAST(min(x_k1) AS BIGINT) AS x_threshold,
        |         list_sum(list(ln(c::DOUBLE / x_k1::DOUBLE)
        |           ORDER BY c, user_id)) AS lnsum
        |  FROM top CROSS JOIN thr WHERE rk <= kk)
        |SELECT k, x_threshold,
        |       round(lnsum, 6) AS ln_sum,
        |       round(k::DOUBLE / lnsum, 6) AS hill_alpha,
        |       k::DOUBLE / lnsum <= 2.0 AS infinite_variance
        |FROM agg""".stripMargin)
}
