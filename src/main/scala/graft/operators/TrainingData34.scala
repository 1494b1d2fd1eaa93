package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 29: a GARCH(1,1) volatility filter over daily
  * revenue returns (Bollerslev 1986), a negative-binomial
  * overdispersion fit of per-user event counts (method of moments),
  * and one DoReMi-style exponentiated-gradient domain-reweighting
  * step (Xie et al. 2023). All Spark-first with full-replay DuckDB
  * oracles.
  */
object TrainingData34 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_garch_filter — GARCH(1,1) conditional-variance filter
  // (Bollerslev 1986) on daily revenue simple returns, per year
  // (the w_holt_winters restart convention): ω = 0.000005,
  // α = 0.1, β = 0.85,
  //   r_t  = (x_t − x_{t−1}) / x_{t−1}
  //   σ²_t = ω + α r²_{t−1} + β σ²_{t−1},  σ²_init = 0.04
  // plus the standardized residual r_t/√σ²_t — the volatility-
  // clustering screen behind anomaly thresholds that adapt to
  // regime. Pure arithmetic + sqrt (correctly-rounded IEEE — no
  // libm divergence), so the (σ², r) recursion runs as ONE Spark
  // HOF fold and a DuckDB RECURSIVE CTE with the identical double
  // DAG; raw doubles hash-match un-rounded. Scale shape: the order
  // stream reduces through the exact-decimal daily aggregate; the
  // fold runs over ≤366 days per year partition.
  // ---------------------------------------------------------------
  val wGarchFilter: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))" +
        " AS DOUBLE) / 1000000.0 AS DOUBLE)").as("x"))
      .withColumn("yr", year(col("day")))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("yr")).orderBy(col("day"))).cast("int"))
      .localCheckpoint(eager = false) // consumed by the fold input and the join back
    val perYear = daily.groupBy(col("yr"))
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("days"))
    // r uses the PREVIOUS x carried in state; σ² uses the previous
    // r and σ² — textual duplication is pure arithmetic
    val R = "((x.x - st.xprev) / st.xprev)"
    val S2 = "(0.000005 + 0.1 * (st.r * st.r) + 0.85 * st.s2)"
    val fold =
      s"""aggregate(
         |  days,
         |  named_struct(
         |    'xprev', CAST(0.0 AS DOUBLE), 'r', CAST(0.0 AS DOUBLE),
         |    's2', CAST(0.0 AS DOUBLE), 't', 0,
         |    'out', CAST(array() AS
         |      ARRAY<STRUCT<t: INT, r: DOUBLE, s2: DOUBLE, z: DOUBLE>>)),
         |  (st, x) -> CASE
         |    WHEN st.t = 0 THEN named_struct(
         |      'xprev', x.x, 'r', CAST(0.0 AS DOUBLE),
         |      's2', CAST(0.04 AS DOUBLE), 't', 1,
         |      'out', st.out)
         |    ELSE named_struct(
         |      'xprev', x.x, 'r', $R, 's2', $S2, 't', st.t + 1,
         |      'out', concat(st.out, array(named_struct(
         |        't', x.t, 'r', $R, 's2', $S2,
         |        'z', $R / sqrt($S2))))) END)""".stripMargin
    perYear.select(col("yr").as("oyr"), explode(expr(s"($fold).out")).as("o"))
      .join(daily, col("oyr") === col("yr") && col("o.t") === col("t"))
      .select(col("day"), col("x").as("revenue_m"), col("o.r").as("ret"),
        col("o.s2").as("sigma2"), col("o.z").as("std_resid"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // a_negbin_fit — negative-binomial overdispersion fit of per-user
  // event counts per event_type, by method of moments (the standard
  // "is Poisson enough?" screen for count features): with zeros
  // INCLUDED (a user who never fires the type counts 0 — folded in
  // exactly via the global user count, never materialized),
  //   m = Σc/N,  v = (Σc² − (Σc)²/N)/(N−1)
  //   p̂ = m/v,  r̂ = m²/(v−m),  dispersion = v/m
  // (r̂ only meaningful when v > m — flagged). Scale shape: ONE
  // (type, user) aggregate reduces the stream; per-type moments are
  // exact (long Σc, DECIMAL(38,0) Σc²) off those rows; the global
  // user count broadcasts. No per-user float ever exists.
  // ---------------------------------------------------------------
  val aNegbinFit: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
    val perUser = ev.groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val nUsers = ev.agg(countDistinct(col("user_id")).as("nu"))
    perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_active"),
        sum(col("c")).cast("long").as("s1"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("s2"))
      .crossJoin(broadcast(nUsers))
      .withColumn("m", d(col("s1")) / d(col("nu")))
      .withColumn("v", (d(col("s2")) -
        d(col("s1")) * d(col("s1")) / d(col("nu"))) / (d(col("nu")) - 1.0))
      .select(col("event_type"), col("n_active"), col("nu").as("n_users"),
        round(col("m"), 6).as("mean"),
        round(col("v"), 6).as("variance"),
        round(col("v") / col("m"), 6).as("dispersion"),
        (col("v") > col("m")).as("overdispersed"),
        round(when(col("v") > col("m"),
          col("m") * col("m") / (col("v") - col("m"))).otherwise(0.0), 6)
          .as("nb_r"),
        round(when(col("v") > col("m"), col("m") / col("v")).otherwise(1.0), 6)
          .as("nb_p"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------
  // t_doremi_mixture — one DoReMi-style exponentiated-gradient step
  // on per-source mixture weights (Xie et al. 2023): each domain's
  // excess loss (mean token NLL under the corpus unigram LM minus
  // the corpus mean) multiplies its token-share baseline weight by
  // exp(η·excess), η = 0.5, then renormalizes — upweighting domains
  // the reference model finds hard. NLL is quantized to exact
  // micro-nat longs BEFORE any sum (the t_dataset_card floor
  // policy): lp(tok) = floor(−ln(c_tok/T)·10⁶), so per-domain
  // Σ c_{d,tok}·lp rides DECIMAL(38,0) exactly and only the final
  // mean/exp/normalize are doubles (the ≤|sources| normalizer folds
  // in sorted source order). Scale shape: two token-keyed
  // aggregates (corpus counts, domain counts) + one hash join on
  // tok — linear in the corpus; domains are a tiny final frame.
  // ---------------------------------------------------------------
  val tDoremiMixture: Q = (s, dir) => {
    val tok = Tables.table(s, dir, "documents")
      .select(col("source"), explode(TF.tokens(col("text"))).as("tok"))
    val byDom = tok.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cdt"))
      .localCheckpoint(eager = false) // feeds corpus counts AND the lp join
    val corpus = byDom.groupBy(col("tok"))
      .agg(sum(col("cdt")).cast("long").as("ct"))
    val total = corpus.agg(sum(col("ct")).cast("long").as("tt"))
    val lp = corpus.crossJoin(broadcast(total))
      .select(col("tok"),
        floor(-log(d(col("ct")) / d(col("tt"))) * 1000000.0)
          .cast("long").as("lp_u"))
    val dom = byDom.join(lp, "tok")
      .groupBy(col("source"))
      .agg(sum(col("cdt")).cast("long").as("n_tok"),
        sum((col("cdt") * col("lp_u")).cast("decimal(38,0)")).as("nll_u"))
      .crossJoin(broadcast(total))
      .withColumn("mean_nll", d(col("nll_u")) / d(col("n_tok")) / 1000000.0)
      .withColumn("w0", d(col("n_tok")) / d(col("tt")))
      .localCheckpoint(eager = false) // consumed by the corpus mean AND the output
    val overall = dom.agg(
      (d(sum(col("nll_u"))) / d(sum(col("n_tok"))) / 1000000.0).as("nll_bar"))
    val scored = dom.crossJoin(broadcast(overall))
      .withColumn("raw", col("w0") *
        exp(lit(0.5) * (col("mean_nll") - col("nll_bar"))))
    val z = scored.agg(
      expr("aggregate(sort_array(collect_list(struct(source, raw)))," +
        " 0D, (a, x) -> a + x.raw)").as("z"))
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_tok").as("n_tokens"),
        round(col("mean_nll"), 6).as("mean_nll"),
        round(col("w0"), 6).as("weight_before"),
        round(col("raw") / col("z"), 6).as("weight_after"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "w_garch_filter" -> wGarchFilter,
    "a_negbin_fit" -> aNegbinFit,
    "t_doremi_mixture" -> tDoremiMixture)

  val oracles: Map[String, String] = Map(
    "w_garch_filter" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / 1000000.0 AS DOUBLE) AS x
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT day, x, year(day) AS yr,
        |         CAST(row_number() OVER (PARTITION BY year(day) ORDER BY day)
        |           AS INTEGER) AS t
        |  FROM daily),
        |gf(yr, t, xprev, r, s2) AS (
        |  SELECT yr, t, x AS xprev, CAST(0.0 AS DOUBLE) AS r,
        |         CAST(0.04 AS DOUBLE) AS s2
        |  FROM d2 WHERE t = 1
        |  UNION ALL
        |  SELECT yr, t, x AS xprev,
        |         (x - xprev) / xprev AS r,
        |         0.000005 + 0.1 * (rprev * rprev) + 0.85 * s2prev AS s2
        |  FROM (SELECT d.yr, d.t, d.x, gf.xprev, gf.r AS rprev,
        |               gf.s2 AS s2prev
        |        FROM gf JOIN d2 d ON d.yr = gf.yr AND d.t = gf.t + 1))
        |SELECT d2.day, d2.x AS revenue_m, gf.r AS ret, gf.s2 AS sigma2,
        |       gf.r / sqrt(gf.s2) AS std_resid
        |FROM gf JOIN d2 ON gf.yr = d2.yr AND gf.t = d2.t
        |WHERE gf.t > 1
        |ORDER BY d2.day""".stripMargin,
    "a_negbin_fit" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS nu
        |       FROM events),
        |g AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_active,
        |         CAST(sum(c) AS BIGINT) AS s1,
        |         sum(CAST(c AS DECIMAL(38,0)) * c) AS s2
        |  FROM pu GROUP BY 1),
        |mv AS (
        |  SELECT event_type, n_active, nu,
        |         s1::DOUBLE / nu::DOUBLE AS m,
        |         (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / nu::DOUBLE)
        |           / (nu::DOUBLE - 1.0) AS v
        |  FROM g CROSS JOIN nu)
        |SELECT event_type, n_active, nu AS n_users,
        |       round(m, 6) AS mean, round(v, 6) AS variance,
        |       round(v / m, 6) AS dispersion,
        |       v > m AS overdispersed,
        |       round(CASE WHEN v > m THEN m * m / (v - m) ELSE 0.0 END, 6)
        |         AS nb_r,
        |       round(CASE WHEN v > m THEN m / v ELSE 1.0 END, 6) AS nb_p
        |FROM mv ORDER BY event_type""".stripMargin,
    "t_doremi_mixture" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |bydom AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS cdt
        |  FROM tok GROUP BY 1, 2),
        |corpus AS (
        |  SELECT tok, CAST(sum(cdt) AS BIGINT) AS ct FROM bydom GROUP BY 1),
        |total AS (SELECT CAST(sum(ct) AS BIGINT) AS tt FROM corpus),
        |lp AS (
        |  SELECT tok, CAST(floor(-ln(ct::DOUBLE / tt::DOUBLE) * 1000000.0)
        |    AS BIGINT) AS lp_u
        |  FROM corpus CROSS JOIN total),
        |dom AS (
        |  SELECT b.source, CAST(sum(b.cdt) AS BIGINT) AS n_tok,
        |         sum(CAST(b.cdt AS DECIMAL(38,0)) * lp.lp_u) AS nll_u
        |  FROM bydom b JOIN lp ON lp.tok = b.tok GROUP BY 1),
        |d2 AS (
        |  SELECT source, n_tok,
        |         nll_u::DOUBLE / n_tok::DOUBLE / 1000000.0 AS mean_nll,
        |         n_tok::DOUBLE / tt::DOUBLE AS w0
        |  FROM dom CROSS JOIN total),
        |ov AS (
        |  SELECT sum(nll_u)::DOUBLE / sum(n_tok)::DOUBLE / 1000000.0
        |           AS nll_bar
        |  FROM dom),
        |scored AS (
        |  SELECT d2.source, d2.n_tok, d2.mean_nll, d2.w0,
        |         d2.w0 * exp(0.5 * (d2.mean_nll - ov.nll_bar)) AS raw
        |  FROM d2 CROSS JOIN ov),
        |z AS (SELECT list_sum(list(raw ORDER BY source)) AS z FROM scored)
        |SELECT source, n_tok AS n_tokens,
        |       round(mean_nll, 6) AS mean_nll,
        |       round(w0, 6) AS weight_before,
        |       round(raw / z.z, 6) AS weight_after
        |FROM scored CROSS JOIN z ORDER BY source""".stripMargin)
}
