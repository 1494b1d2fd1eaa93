package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 4: inference and weighting extensions — Welch's
  * unequal-variance t-test (Welch 1947), the Kaplan–Meier survival
  * estimator with right-censoring (Kaplan & Meier 1958), iterative
  * proportional fitting / raking of the (lang, source) grid to
  * uniform marginals (Deming & Stephan 1940 — the dataset-balancing
  * weighting classic), and per-dimension embedding standardization
  * stats — public algorithms re-expressed Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData8 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // a_welch_ttest — Welch's unequal-variance t-test comparing mean
  // purchase vs view event value (the A/B-readout staple; Welch
  // 1947 with the Welch–Satterthwaite dof). Sums are EXACT: values
  // are 2-dp money, so centi-units m = 100·value are integers;
  // Σm rides a long, Σm² a DECIMAL(38,0) (m² ≤ 2.4·10⁹ keeps the
  // decimal sum exact past 10¹² rows). Mean/variance/t/dof are a
  // fixed double DAG over those exact sums — one shuffle on the
  // 2-key group, broadcast-scalar tail. Significance is called on
  // the raw t against 1.96 (identical doubles both engines).
  // ---------------------------------------------------------------
  val aWelchTtest: Q = (s, dir) => {
    val g = Tables.table(s, dir, "events")
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("m"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("m")).cast("long").as("s1"),
        sum((col("m") * col("m")).cast("decimal(38,0)")).as("s2"))
      .withColumn("mean_c", d(col("s1")) / d(col("n")))
      .withColumn("var_c",
        (d(col("s2")) - d(col("s1")) * d(col("s1")) / d(col("n")))
          / d(col("n") - 1))
    val x = g.filter(col("event_type") === "purchase")
      .select(col("n").as("n_x"), col("mean_c").as("mx"), col("var_c").as("vx"))
    val y = g.filter(col("event_type") === "view")
      .select(col("n").as("n_y"), col("mean_c").as("my"), col("var_c").as("vy"))
    val se2 = col("vx") / d(col("n_x")) + col("vy") / d(col("n_y"))
    val t = (col("mx") - col("my")) / sqrt(se2)
    val dof = (se2 * se2) /
      ((col("vx") / d(col("n_x"))) * (col("vx") / d(col("n_x"))) /
        d(col("n_x") - 1) +
        (col("vy") / d(col("n_y"))) * (col("vy") / d(col("n_y"))) /
          d(col("n_y") - 1))
    x.crossJoin(broadcast(y))
      .select(col("n_x"), col("n_y"),
        round(col("mx") / lit(100.0), 6).as("mean_x"),
        round(col("my") / lit(100.0), 6).as("mean_y"),
        round(t, 6).as("t_stat"), round(dof, 6).as("dof"),
        (abs(t) > 1.96).as("significant"))
  }

  // ---------------------------------------------------------------
  // ev_survival_km — Kaplan–Meier survival curve for the
  // signup→purchase delay with right-censoring (Kaplan & Meier
  // 1958): per signed-up user, duration = days to the first
  // purchase AT/AFTER signup, censored at the stream horizon when
  // none. Ŝ(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ) over event times; censor-
  // only times shrink the risk set without a factor. Scale shape:
  // the row stream reduces through per-user min aggregates, then
  // through the per-day (dᵢ, cᵢ) aggregate; the product fold runs
  // over DISTINCT DURations (horizon-bounded days), never users —
  // the w_holt_winters convention, replayed as a recursive CTE
  // (multi-field state). Durations are exact integer-µs floor-div
  // days; each factor is one division of exact longs.
  // ---------------------------------------------------------------
  val evSurvivalKm: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events").localCheckpoint(eager = false)
    val hz = ev.agg(max(col("ts")).as("hzts"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s0"))
      .localCheckpoint(eager = false) // consumed by the purchase filter + durations
    val p0 = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("s0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p0"))
    val durs = su.join(p0, Seq("user_id"), "left")
      .crossJoin(broadcast(hz))
      .select(col("user_id"),
        when(col("p0").isNotNull, 1L).otherwise(0L).as("ev"),
        expr("(unix_micros(coalesce(p0, hzts)) - unix_micros(s0))" +
          " div 86400000000").as("t_days"))
      .localCheckpoint(eager = false) // consumed by the N count + the time table
    val n = durs.agg(count(lit(1)).as("n_users"))
    val byT = durs.groupBy(col("t_days"))
      .agg(sum(col("ev")).cast("long").as("dd"), count(lit(1)).as("cc"))
    val fold =
      """aggregate(
        |  ts,
        |  named_struct(
        |    'at', CAST(n_users AS BIGINT), 'p', CAST(1.0 AS DOUBLE),
        |    'out', CAST(array() AS ARRAY<STRUCT<
        |      t: BIGINT, at: BIGINT, d: BIGINT, s: DOUBLE>>)),
        |  (st, x) -> named_struct(
        |    'at', st.at - x.cc,
        |    'p', CASE WHEN x.dd > 0 THEN st.p * (1.0 -
        |        CAST(x.dd AS DOUBLE) / CAST(st.at AS DOUBLE))
        |      ELSE st.p END,
        |    'out', CASE WHEN x.dd > 0 THEN concat(st.out, array(named_struct(
        |        't', x.t_days, 'at', st.at, 'd', x.dd,
        |        's', st.p * (1.0 - CAST(x.dd AS DOUBLE)
        |          / CAST(st.at AS DOUBLE)))))
        |      ELSE st.out END))""".stripMargin
    byT.agg(sort_array(collect_list(struct(col("t_days"), col("dd"),
        col("cc")))).as("ts"))
      .crossJoin(broadcast(n))
      .select(explode(expr(s"($fold).out")).as("o"))
      .select(col("o.t").as("t_days"), col("o.at").as("n_risk"),
        col("o.d").as("n_events"), round(col("o.s"), 6).as("s_km"))
      .orderBy(col("t_days"))
  }

  // ---------------------------------------------------------------
  // a_ipf_raking — iterative proportional fitting of the (lang,
  // source) cell counts to UNIFORM row/column marginals (Deming &
  // Stephan 1940; the raking every survey-weighting and
  // dataset-balancing stack ships): 8 full IPF rounds = 16
  // alternating half-steps, row-scale w ← w·(N/L)/Σ_row w then
  // column-scale against N/S. The fold runs over the COMPLETE
  // L×S grid (missing cells enter at 0 and stay 0) — ≤ 100 doubles,
  // alphabet-bounded, never rows; each half-step binds its marginal
  // sums once via the singleton-fold trick (the e_pca_power
  // collapse tombstone applies). Output: observed count, raked
  // weight, multiplier per populated cell. Scale shape: corpus →
  // cell counts is the only data-sized stage.
  // ---------------------------------------------------------------
  val aIpfRaking: Q = (s, dir) => {
    val counts = docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // consumed by both dims and the grid
    val langs = counts.select(col("lang")).distinct()
    val sources = counts.select(col("source")).distinct()
    val grid = langs.crossJoin(broadcast(sources))
      .join(counts, Seq("lang", "source"), "left")
      .select(col("lang"), col("source"), coalesce(col("c"), lit(0L)).as("c"))
    val one = grid
      .agg(sort_array(collect_list(struct(col("lang"), col("source"),
        col("c")))).as("cells"),
        countDistinct(col("lang")).cast("int").as("l_n"),
        countDistinct(col("source")).cast("int").as("s_n"),
        sum(col("c")).cast("long").as("n_tot"))
    val rowsums =
      "transform(sequence(1, l_n), l -> aggregate(sequence(1, s_n)," +
        " CAST(0.0 AS DOUBLE), (a, t) -> a + element_at(w, (l - 1) * s_n + t)))"
    val colsums =
      "transform(sequence(1, s_n), t -> aggregate(sequence(1, l_n)," +
        " CAST(0.0 AS DOUBLE), (a, l) -> a + element_at(w, (l - 1) * s_n + t)))"
    val fold =
      s"""aggregate(
         |  sequence(1, 16),
         |  transform(cells, x -> CAST(x.c AS DOUBLE)),
         |  (w, r) -> CASE WHEN r % 2 = 1
         |    THEN aggregate(array(0), $rowsums, (rs, z) ->
         |      transform(w, (x, i0) -> x * ((CAST(n_tot AS DOUBLE)
         |        / CAST(l_n AS DOUBLE))
         |        / element_at(rs, CAST((i0 div s_n) + 1 AS INT)))))
         |    ELSE aggregate(array(0), $colsums, (cs, z) ->
         |      transform(w, (x, i0) -> x * ((CAST(n_tot AS DOUBLE)
         |        / CAST(s_n AS DOUBLE))
         |        / element_at(cs, (i0 % s_n) + 1))))
         |    END)""".stripMargin
    one
      .withColumn("wf", expr(fold))
      .select(explode(expr(
        """transform(sequence(1, l_n * s_n), k -> named_struct(
          |  'lang', element_at(cells, k).lang,
          |  'source', element_at(cells, k).source,
          |  'n', element_at(cells, k).c,
          |  'w', element_at(wf, k)))""".stripMargin)).as("o"))
      .filter(col("o.n") > 0)
      .select(col("o.lang").as("lang"), col("o.source").as("source"),
        col("o.n").as("n_docs"), round(col("o.w"), 6).as("raked_weight"),
        round(col("o.w") / d(col("o.n")), 6).as("multiplier"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // e_standardize — per-dimension embedding standardization stats
  // (the z-score table a feature-normalization pass consumes, and
  // the marginal-variance companion to e_pca_power's spectral
  // view): per dim, mean, population std, and the dimension's share
  // of total variance. The sums are exact on the 2⁻²⁰ grid (Σq a
  // long, Σq² a DECIMAL(38,0) — same overflow policy as
  // a_welch_ttest); the variance-share denominator folds
  // dim-ascending over 64 values. One posexplode + one 64-group
  // shuffle; everything after is a one-row broadcast.
  // ---------------------------------------------------------------
  val eStandardize: Q = (s, dir) => {
    val q = Tables.table(s, dir, "embeddings")
      .select(posexplode(expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)" +
          " * 1048576.0) AS BIGINT))")).as(Seq("d0", "qx")))
    val per = q.groupBy((col("d0") + 1).cast("int").as("dim"))
      .agg(count(lit(1)).as("n"), sum(col("qx")).cast("long").as("s1"),
        sum((col("qx") * col("qx")).cast("decimal(38,0)")).as("s2"))
      .withColumn("mean_q", d(col("s1")) / d(col("n")))
      .withColumn("var_q",
        (d(col("s2")) - d(col("s1")) * d(col("s1")) / d(col("n")))
          / d(col("n")))
      .localCheckpoint(eager = false) // consumed by the share denominator + output
    val tot = per.agg(expr(
      "aggregate(sort_array(collect_list(struct(dim, var_q))), 0D," +
        " (a, x) -> a + x.var_q)").as("tv"))
    per.crossJoin(broadcast(tot))
      .select(col("dim"),
        round(col("mean_q") / lit(1048576.0), 6).as("mean"),
        round(sqrt(col("var_q")) / lit(1048576.0), 6).as("std"),
        round(col("var_q") / col("tv"), 6).as("var_share"))
      .orderBy(col("dim"))
  }

  val queries: Map[String, Q] = Map(
    "a_welch_ttest" -> aWelchTtest,
    "ev_survival_km" -> evSurvivalKm,
    "a_ipf_raking" -> aIpfRaking,
    "e_standardize" -> eStandardize)

  val oracles: Map[String, String] = Map(
    "a_welch_ttest" ->
      """WITH g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(m) AS BIGINT) AS s1,
        |         sum(CAST(m * m AS DECIMAL(38,0))) AS s2
        |  FROM (SELECT event_type,
        |          CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS m
        |        FROM events WHERE event_type IN ('purchase', 'view'))
        |  GROUP BY 1),
        |st AS (
        |  SELECT event_type, n, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |           AS mean_c,
        |         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |             / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var_c
        |  FROM g),
        |x AS (SELECT n AS n_x, mean_c AS mx, var_c AS vx FROM st
        |      WHERE event_type = 'purchase'),
        |y AS (SELECT n AS n_y, mean_c AS my, var_c AS vy FROM st
        |      WHERE event_type = 'view'),
        |w AS (
        |  SELECT n_x, n_y, mx, my,
        |         (mx - my) / sqrt(vx / CAST(n_x AS DOUBLE)
        |           + vy / CAST(n_y AS DOUBLE)) AS t,
        |         ((vx / CAST(n_x AS DOUBLE) + vy / CAST(n_y AS DOUBLE))
        |            * (vx / CAST(n_x AS DOUBLE) + vy / CAST(n_y AS DOUBLE)))
        |           / ((vx / CAST(n_x AS DOUBLE)) * (vx / CAST(n_x AS DOUBLE))
        |                / CAST(n_x - 1 AS DOUBLE)
        |              + (vy / CAST(n_y AS DOUBLE)) * (vy / CAST(n_y AS DOUBLE))
        |                / CAST(n_y - 1 AS DOUBLE)) AS dof
        |  FROM x CROSS JOIN y)
        |SELECT n_x, n_y, round(mx / 100.0, 6) AS mean_x,
        |       round(my / 100.0, 6) AS mean_y, round(t, 6) AS t_stat,
        |       round(dof, 6) AS dof, abs(t) > 1.96 AS significant
        |FROM w""".stripMargin,
    "ev_survival_km" ->
      """WITH RECURSIVE hz AS (SELECT max(ts) AS hzts FROM events),
        |su AS (SELECT user_id, min(ts) AS s0 FROM events
        |       WHERE event_type = 'signup' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id, min(e.ts) AS p0 FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s0 GROUP BY 1),
        |durs AS (
        |  SELECT su.user_id,
        |         CASE WHEN p0.p0 IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         (epoch_us(coalesce(p0.p0, hz.hzts)) - epoch_us(su.s0))
        |           // 86400000000 AS t_days
        |  FROM su LEFT JOIN p0 ON su.user_id = p0.user_id CROSS JOIN hz),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM durs),
        |byt AS (
        |  SELECT t_days, CAST(sum(ev) AS BIGINT) AS dd,
        |         CAST(count(*) AS BIGINT) AS cc,
        |         CAST(row_number() OVER (ORDER BY t_days) AS INTEGER) AS rk
        |  FROM durs GROUP BY 1),
        |km(rk, t_days, at_before, dd, p_after, at_after) AS (
        |  SELECT 0, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |         CAST(NULL AS BIGINT), CAST(1.0 AS DOUBLE), nn.n_users
        |  FROM nn
        |  UNION ALL
        |  SELECT b.rk, b.t_days, km.at_after, b.dd,
        |         CASE WHEN b.dd > 0 THEN km.p_after * (1.0 -
        |             CAST(b.dd AS DOUBLE) / CAST(km.at_after AS DOUBLE))
        |           ELSE km.p_after END,
        |         km.at_after - b.cc
        |  FROM km JOIN byt b ON b.rk = km.rk + 1)
        |SELECT t_days, at_before AS n_risk, dd AS n_events,
        |       round(p_after, 6) AS s_km
        |FROM km WHERE rk >= 1 AND dd > 0
        |ORDER BY t_days""".stripMargin,
    "a_ipf_raking" ->
      """WITH RECURSIVE counts AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |ls AS (SELECT DISTINCT lang FROM counts),
        |ss AS (SELECT DISTINCT source FROM counts),
        |grid AS (
        |  SELECT ls.lang, ss.source, coalesce(c.c, 0) AS c,
        |         CAST(row_number() OVER (ORDER BY ls.lang, ss.source)
        |           AS INTEGER) AS k
        |  FROM ls CROSS JOIN ss
        |  LEFT JOIN counts c ON c.lang = ls.lang AND c.source = ss.source),
        |dims AS (
        |  SELECT CAST(count(DISTINCT lang) AS INTEGER) AS l_n,
        |         CAST(count(DISTINCT source) AS INTEGER) AS s_n,
        |         CAST(sum(c) AS BIGINT) AS n_tot
        |  FROM grid),
        |wc AS (SELECT list(CAST(c AS DOUBLE) ORDER BY k) AS w0 FROM grid),
        |ipf(r, w) AS (
        |  SELECT 0, w0 FROM wc
        |  UNION ALL
        |  SELECT r + 1,
        |         CASE WHEN (r + 1) % 2 = 1
        |           THEN list_transform(w, (x, i) -> x *
        |             ((CAST(n_tot AS DOUBLE) / CAST(l_n AS DOUBLE))
        |               / rs[((i - 1) // s_n) + 1]))
        |           ELSE list_transform(w, (x, i) -> x *
        |             ((CAST(n_tot AS DOUBLE) / CAST(s_n AS DOUBLE))
        |               / cs[((i - 1) % s_n) + 1]))
        |         END
        |  FROM (
        |    SELECT r, w, l_n, s_n, n_tot,
        |           list_transform(range(1, l_n + 1),
        |             l -> list_sum(list_transform(range(1, s_n + 1),
        |               t -> w[(l - 1) * s_n + t]))) AS rs,
        |           list_transform(range(1, s_n + 1),
        |             t -> list_sum(list_transform(range(1, l_n + 1),
        |               l -> w[(l - 1) * s_n + t]))) AS cs
        |    FROM ipf, dims WHERE r < 16)),
        |wf AS (SELECT w FROM ipf WHERE r = 16)
        |SELECT g.lang, g.source, g.c AS n_docs,
        |       round(wf.w[g.k], 6) AS raked_weight,
        |       round(wf.w[g.k] / CAST(g.c AS DOUBLE), 6) AS multiplier
        |FROM grid g CROSS JOIN wf
        |WHERE g.c > 0
        |ORDER BY g.lang, g.source""".stripMargin,
    "e_standardize" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
        |           AS qv
        |  FROM embeddings),
        |per AS (
        |  SELECT CAST(t.i AS INTEGER) AS dim,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(qv[t.i]) AS BIGINT) AS s1,
        |         sum(CAST(qv[t.i] * qv[t.i] AS DECIMAL(38,0))) AS s2
        |  FROM q, range(1, 65) t(i) GROUP BY 1),
        |vv AS (
        |  SELECT dim, CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_q,
        |         (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
        |             / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_q
        |  FROM per),
        |tv AS (SELECT list_sum(list(var_q ORDER BY dim)) AS tv FROM vv)
        |SELECT dim, round(mean_q / 1048576.0, 6) AS mean,
        |       round(sqrt(var_q) / 1048576.0, 6) AS std,
        |       round(var_q / tv.tv, 6) AS var_share
        |FROM vv CROSS JOIN tv ORDER BY dim""".stripMargin)
}
