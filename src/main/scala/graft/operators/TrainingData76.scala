package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 76: classical hypothesis tests the DQ/monitoring
  * surface was still missing — group-mean and group-variance
  * contrasts, a normality gate, and a residual-autocorrelation
  * check on the registered trend fit.
  *
  *  - a_anova_f — one-way ANOVA: does mean order value differ
  *    across the five order priorities? F, effect sizes (η², ω²),
  *    large-sample χ² p-approximation.
  *  - a_levene_bf — Brown–Forsythe (median-centered Levene): do the
  *    priorities differ in SPREAD, not just mean — the
  *    variance-homogeneity precondition the ANOVA above assumes.
  *  - a_jarque_bera — skewness/kurtosis normality test on daily
  *    revenue; the χ²(2) p-value is closed-form (exp(−JB/2)).
  *  - w_durbin_watson — Durbin–Watson on the residuals of the daily
  *    revenue OLS time trend: leftover lag-1 autocorrelation the
  *    trend line does not explain.
  *
  * Float policy (the a_corr_regr / a_cramers_v discipline): all
  * counts/sums are exact longs/decimal(38,0); every float reduction
  * folds in a pinned sort order (group name / calendar day); the
  * libm-touched outputs are round-6.
  */
object TrainingData76 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // Shared one-way ANOVA over exact per-group moments. Input frame:
  // (g: string, n: long, s: decimal38 Σx, ss: decimal38 Σx²). The
  // between/within split works on Σ_g s_g²/n_g, folded g-ascending
  // (≤ groups rows — bounded by the categorical's cardinality at
  // any corpus size; the corpus itself reduces in ONE map-side
  // two-phase aggregate). F, η², ω² are scale-invariant, so cents
  // in = the same statistics out. The χ² large-sample p
  // (df1·F ~ χ²_df1 as df2→∞) has the closed survival
  // exp(−x/2)·Σ_{j<df1/2}(x/2)^j/j! for EVEN df1; emitted for
  // df1 = 4 (five groups), NULL otherwise — never an approximation
  // the replay can't reproduce bit-for-bit.
  // ---------------------------------------------------------------
  private def anovaFromMoments(groups: DataFrame,
      verdictYes: String, verdictNo: String): DataFrame = {
    val tot = groups.agg(
      sum(col("n")).cast("long").as("nn"),
      count(lit(1)).cast("long").as("k"),
      sum(col("s")).cast("decimal(38,0)").as("st"),
      sum(col("ss")).cast("decimal(38,0)").as("sst"))
    val bsum = groups
      .select(col("g"), (d(col("s")) * d(col("s")) / d(col("n"))).as("b"))
      .agg(expr("aggregate(sort_array(collect_list(struct(g, b))), 0D," +
        " (a, q) -> a + q.b)").as("sb"))
    val m = bsum.crossJoin(broadcast(tot))
      .withColumn("ssb", col("sb") - d(col("st")) * d(col("st")) / d(col("nn")))
      .withColumn("ssw", d(col("sst")) - col("sb"))
      .withColumn("df1", (col("k") - 1L).cast("long"))
      .withColumn("df2", (col("nn") - col("k")).cast("long"))
      .withColumn("msw", col("ssw") / d(col("df2")))
      .withColumn("f", (col("ssb") / d(col("df1"))) / col("msw"))
      // hashed-output discipline (PLANS.md, the granger lesson): the
      // χ²(df1·F) survival goes through exp(), whose libm ulps differ
      // across engines — p ships as a BUCKET from fixed χ²(4)
      // critical values via integer compares on floor(df1·F·10⁶)
      // (F is a pure rational of exact moments: deterministic), and
      // the verdict derives from the same integer compare. Emitted
      // only for df1 = 4 (the closed form's domain), like the old p.
      .withColumn("xm", when(col("df1") === 4L,
        floor(d(col("df1")) * col("f") * lit(1.0e6)).cast("long"))
        .otherwise(lit(null).cast("long")))
    m.select(col("nn").as("n_rows"), col("k").as("n_groups"),
      col("df1"), col("df2"),
      round(col("f"), 6).as("f_stat"),
      round(col("ssb") / (col("ssb") + col("ssw")), 6).as("eta2"),
      round((col("ssb") - d(col("df1")) * col("msw")) /
        (col("ssb") + col("ssw") + col("msw")), 6).as("omega2"),
      when(col("xm") >= 18466826L, "p<0.001")
        .when(col("xm") >= 13276704L, "p<0.01")
        .when(col("xm") >= 9487729L, "p<0.05")
        .when(col("xm") >= 7779440L, "p<0.10")
        .when(col("xm").isNotNull, "p>=0.10")
        .otherwise(lit(null).cast("string")).as("p_bucket"),
      when(col("xm") >= 9487729L, verdictYes).otherwise(lit(verdictNo))
        .as("verdict"))
  }

  /** Per-group exact cents moments of order value by priority. */
  private def priorityMoments(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("x"))
      .groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("ss"))

  val aAnovaF: Q = (s, dir) =>
    anovaFromMoments(priorityMoments(s, dir), "means_differ", "no_evidence")

  // ---------------------------------------------------------------
  // a_levene_bf — Brown–Forsythe: ANOVA on |x − median_g|. Group
  // medians are EXACT order statistics off value-level counts
  // (group by (g, cents), cumulative count per group over the
  // value axis — the a_mann_whitney value-level discipline: the
  // window walks distinct prices per group, never rows). Both
  // central order stats v⌈(n+1)/2⌉, v⌈(n+2)/2⌉ are taken, so the
  // even-n median is exact in HALF-cents (dev = |2x − (v1+v2)|,
  // all longs). The deviations then reuse the exact-moment ANOVA.
  // ---------------------------------------------------------------
  val aLeveneBf: Q = (s, dir) => {
    val xs = Tables.table(s, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("x"))
      .localCheckpoint(eager = false) // feeds the median pass AND the deviation pass
    val vals = xs.groupBy(col("g"), col("x"))
      .agg(count(lit(1)).cast("long").as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("x"))
    val cum = vals
      .withColumn("cum", sum(col("c")).over(w).cast("long"))
      .withColumn("ng", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("g")))
        .cast("long"))
    def orderStat(kExpr: Column, name: String): DataFrame =
      cum.filter(col("cum") >= kExpr)
        .groupBy(col("g")).agg(min(col("x")).as(name))
    // integral rank positions (Spark `/` on columns is DOUBLE division)
    val v1 = orderStat(expr("(ng + 1) div 2"), "v1")
    val v2 = orderStat(expr("(ng + 2) div 2"), "v2")
    val med = v1.join(v2, "g")
      .select(col("g"), (col("v1") + col("v2")).cast("long").as("med2"))
    val dev = xs.join(broadcast(med), "g")
      .select(col("g"), abs(col("x") * 2L - col("med2")).cast("long").as("x"))
    val moments = dev.groupBy(col("g"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("decimal(38,0)").as("s"),
        sum((col("x") * col("x")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("ss"))
    anovaFromMoments(moments, "spreads_differ", "homoscedastic")
  }

  // ---------------------------------------------------------------
  // a_jarque_bera — daily revenue (cents, exact longs; skewness and
  // kurtosis are scale-invariant so the unit never matters). Mean
  // is the exact micro-cent integral division; the three central
  // power sums fold day-ascending over the calendar-bounded series
  // (days, not rows — at 100 TB the corpus still reduces to one
  // two-phase daily aggregate). χ²(2) survival is exactly
  // exp(−JB/2), so the p-value is closed-form — no approximation
  // gap between engine and oracle.
  // ---------------------------------------------------------------
  val aJarqueBera: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
    val st = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"))
      .withColumn("mean",
        expr("CAST((sx * 1000000) div n AS BIGINT)") / lit(1000000.0))
    val folds = daily.crossJoin(broadcast(st))
      .select(col("n"), col("day"), (d(col("x")) - col("mean")).as("dev"))
      .select(col("n"), col("day"), col("dev"),
        (col("dev") * col("dev")).as("d2"))
      .select(col("n"), col("day"), col("d2"),
        (col("d2") * col("dev")).as("d3"),
        (col("d2") * col("d2")).as("d4"))
      .groupBy(col("n"))
      .agg(
        expr("aggregate(sort_array(collect_list(struct(day, d2))), 0D," +
          " (a, q) -> a + q.d2)").as("s2"),
        expr("aggregate(sort_array(collect_list(struct(day, d3))), 0D," +
          " (a, q) -> a + q.d3)").as("s3"),
        expr("aggregate(sort_array(collect_list(struct(day, d4))), 0D," +
          " (a, q) -> a + q.d4)").as("s4"))
    val m2 = col("s2") / d(col("n"))
    // m2^1.5 as m2·sqrt(m2): pow() is a libm transcendental (NOT
    // correctly rounded, engine-divergent ulps) while sqrt is
    // IEEE-correctly-rounded — skew stays deterministic
    val skew = (col("s3") / d(col("n"))) / (m2 * sqrt(m2))
    val kurt = (col("s4") / d(col("n"))) / (m2 * m2)
    folds
      .withColumn("jb", d(col("n")) / 6.0 *
        (skew * skew + (kurt - 3.0) * (kurt - 3.0) / 4.0))
      // hashed-output discipline: p = exp(−jb/2) goes through libm —
      // ship a bucket from fixed χ²(2) critical values via integer
      // compares on floor(jb·10⁶) (jb is rational+sqrt of exact
      // moments: deterministic), verdict from the same compare
      .withColumn("jbm", floor(col("jb") * lit(1.0e6)).cast("long"))
      .select(col("n").as("n_days"),
        round(skew, 6).as("skewness"),
        round(kurt, 6).as("kurtosis"),
        round(col("jb"), 6).as("jb_stat"),
        when(col("jbm") >= 13815510L, "p<0.001")
          .when(col("jbm") >= 9210340L, "p<0.01")
          .when(col("jbm") >= 5991464L, "p<0.05")
          .when(col("jbm") >= 4605170L, "p<0.10")
          .otherwise(lit("p>=0.10")).as("p_bucket"),
        when(col("jbm") >= 5991464L, "non_normal")
          .otherwise(lit("normal")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // w_durbin_watson — residual lag-1 autocorrelation of the daily
  // revenue OLS time trend. The regressor is the day's rank in the
  // calendar (gap-robust), the fit comes from exact decimal
  // moments (the a_corr_regr recipe), and DW folds the
  // calendar-bounded residual series day-ascending: numerator
  // Σ(e_t − e_{t−1})² via ONE lag window on the daily frame
  // (documented low-cardinality single-partition family — one row
  // per day at any fact scale). ρ̂ ≈ 1 − DW/2.
  // ---------------------------------------------------------------
  val wDurbinWatson: Q = (s, dir) => {
    val w = Grain.bounded(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("y"))
      .withColumn("t", row_number().over(w).cast("long"))
      .localCheckpoint(eager = false) // frozen (day, t, y) grid feeds fit + residuals
    val m = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("t")).cast("decimal(38,0)").as("st"),
      sum((col("t") * col("t")).cast("decimal(38,0)")).as("stt"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum((col("t") * col("y")).cast("decimal(38,0)")).as("sty"))
      .withColumn("slope",
        (d(col("n")) * d(col("sty")) - d(col("st")) * d(col("sy"))) /
          (d(col("n")) * d(col("stt")) - d(col("st")) * d(col("st"))))
      .withColumn("icept",
        (d(col("sy")) - col("slope") * d(col("st"))) / d(col("n")))
    val resid = daily.crossJoin(broadcast(m))
      .select(col("n"), col("day"), col("slope"), col("icept"),
        (d(col("y")) - col("icept") - col("slope") * d(col("t"))).as("e"))
      .withColumn("e_prev", lag(col("e"), 1).over(w))
      .withColumn("dnum",
        when(col("e_prev").isNotNull,
          (col("e") - col("e_prev")) * (col("e") - col("e_prev")))
          .otherwise(lit(0.0)))
      .withColumn("e2", col("e") * col("e"))
    resid.groupBy(col("n"), col("slope"))
      .agg(
        expr("aggregate(sort_array(collect_list(struct(day, dnum))), 0D," +
          " (a, q) -> a + q.dnum)").as("num"),
        expr("aggregate(sort_array(collect_list(struct(day, e2))), 0D," +
          " (a, q) -> a + q.e2)").as("den"))
      .select(col("n").as("n_days"),
        round(col("slope"), 6).as("trend_slope_cents_per_day"),
        round(col("num") / col("den"), 6).as("dw_stat"),
        round(lit(1.0) - col("num") / col("den") / 2.0, 6).as("rho_approx"),
        when(col("num") / col("den") < 1.5, "positive_autocorr")
          .when(col("num") / col("den") > 2.5, "negative_autocorr")
          .otherwise(lit("none")).as("verdict"))
  }

  val queries: Map[String, Q] = Map(
    "a_anova_f" -> aAnovaF,
    "a_levene_bf" -> aLeveneBf,
    "a_jarque_bera" -> aJarqueBera,
    "w_durbin_watson" -> wDurbinWatson)

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Shared oracle tail: ANOVA formulas from per-group (g,n,s,ss). */
  private def anovaOracleTail(verdictYes: String, verdictNo: String): String =
    s"""tot AS (
       |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS k,
       |         CAST(sum(s) AS DECIMAL(38,0)) AS st,
       |         CAST(sum(ss) AS DECIMAL(38,0)) AS sst
       |  FROM grp),
       |bs AS (
       |  SELECT list_sum(list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
       |           / CAST(n AS DOUBLE) ORDER BY g)) AS sb
       |  FROM grp),
       |m AS (
       |  SELECT t.nn, t.k, t.k - 1 AS df1, t.nn - t.k AS df2,
       |         b.sb - CAST(t.st AS DOUBLE) * CAST(t.st AS DOUBLE)
       |           / CAST(t.nn AS DOUBLE) AS ssb,
       |         CAST(t.sst AS DOUBLE) - b.sb AS ssw
       |  FROM bs b CROSS JOIN tot t),
       |f AS (
       |  SELECT nn, k, df1, df2, ssb, ssw, ssw / CAST(df2 AS DOUBLE) AS msw,
       |         (ssb / CAST(df1 AS DOUBLE)) / (ssw / CAST(df2 AS DOUBLE))
       |           AS fv
       |  FROM m),
       |x AS (
       |  SELECT *, CASE WHEN df1 = 4 THEN
       |    CAST(floor(CAST(df1 AS DOUBLE) * fv * 1.0e6) AS BIGINT)
       |    ELSE NULL END AS xm
       |  FROM f)
       |SELECT CAST(nn AS BIGINT) AS n_rows, CAST(k AS BIGINT) AS n_groups,
       |       CAST(df1 AS BIGINT) AS df1, CAST(df2 AS BIGINT) AS df2,
       |       round(fv, 6) AS f_stat,
       |       round(ssb / (ssb + ssw), 6) AS eta2,
       |       round((ssb - CAST(df1 AS DOUBLE) * msw)
       |         / (ssb + ssw + msw), 6) AS omega2,
       |       CASE WHEN xm >= 18466826 THEN 'p<0.001'
       |            WHEN xm >= 13276704 THEN 'p<0.01'
       |            WHEN xm >= 9487729 THEN 'p<0.05'
       |            WHEN xm >= 7779440 THEN 'p<0.10'
       |            WHEN xm IS NOT NULL THEN 'p>=0.10'
       |            ELSE NULL END AS p_bucket,
       |       CASE WHEN xm >= 9487729
       |         THEN '$verdictYes' ELSE '$verdictNo' END AS verdict
       |FROM x""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_anova_f" ->
      s"""WITH grp AS (
         |  SELECT o_orderpriority AS g, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum($centsX) AS DECIMAL(38,0)) AS s,
         |         CAST(sum(CAST($centsX * $centsX AS DECIMAL(38,0)))
         |           AS DECIMAL(38,0)) AS ss
         |  FROM orders GROUP BY 1),
         |${anovaOracleTail("means_differ", "no_evidence")}""".stripMargin,
    "a_levene_bf" ->
      s"""WITH xs AS (
         |  SELECT o_orderpriority AS g, $centsX AS x FROM orders),
         |vals AS (
         |  SELECT g, x, CAST(count(*) AS BIGINT) AS c
         |  FROM xs GROUP BY 1, 2),
         |cum AS (
         |  SELECT g, x, c,
         |         CAST(sum(c) OVER (PARTITION BY g ORDER BY x) AS BIGINT)
         |           AS cum,
         |         CAST(sum(c) OVER (PARTITION BY g) AS BIGINT) AS ng
         |  FROM vals),
         |v1 AS (
         |  SELECT g, min(x) AS v1 FROM cum
         |  WHERE cum >= (ng + 1) // 2 GROUP BY g),
         |v2 AS (
         |  SELECT g, min(x) AS v2 FROM cum
         |  WHERE cum >= (ng + 2) // 2 GROUP BY g),
         |med AS (
         |  SELECT v1.g, CAST(v1.v1 + v2.v2 AS BIGINT) AS med2
         |  FROM v1 JOIN v2 ON v1.g = v2.g),
         |dev AS (
         |  SELECT xs.g, CAST(abs(xs.x * 2 - med.med2) AS BIGINT) AS x
         |  FROM xs JOIN med ON xs.g = med.g),
         |grp AS (
         |  SELECT g, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS DECIMAL(38,0)) AS s,
         |         CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |           AS ss
         |  FROM dev GROUP BY 1),
         |${anovaOracleTail("spreads_differ", "homoscedastic")}""".stripMargin,
    "a_jarque_bera" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |st AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(CAST(sum(x) AS DECIMAL(38,0)) * 1000000 AS DECIMAL(38,0))
         |           // n AS meanq
         |  FROM daily),
         |folds AS (
         |  SELECT st.n,
         |         list_sum(list(
         |           (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |           * (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |           ORDER BY d.day)) AS s2,
         |         list_sum(list(
         |           (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |           * (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |           * (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |           ORDER BY d.day)) AS s3,
         |         list_sum(list(
         |           ((CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |            * (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0))
         |           * ((CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0)
         |              * (CAST(d.x AS DOUBLE) - CAST(st.meanq AS BIGINT) / 1000000.0))
         |           ORDER BY d.day)) AS s4
         |  FROM daily d CROSS JOIN st GROUP BY st.n),
         |jb AS (
         |  SELECT n,
         |         (s3 / CAST(n AS DOUBLE))
         |           / ((s2 / CAST(n AS DOUBLE))
         |              * sqrt(s2 / CAST(n AS DOUBLE))) AS skew,
         |         (s4 / CAST(n AS DOUBLE))
         |           / ((s2 / CAST(n AS DOUBLE)) * (s2 / CAST(n AS DOUBLE)))
         |           AS kurt
         |  FROM folds),
         |jb2 AS (
         |  SELECT n, skew, kurt,
         |         CAST(n AS DOUBLE) / 6.0 * (skew * skew
         |           + (kurt - 3.0) * (kurt - 3.0) / 4.0) AS jbv
         |  FROM jb),
         |jb3 AS (
         |  SELECT *, CAST(floor(jbv * 1.0e6) AS BIGINT) AS jbm FROM jb2)
         |SELECT n AS n_days, round(skew, 6) AS skewness,
         |       round(kurt, 6) AS kurtosis, round(jbv, 6) AS jb_stat,
         |       CASE WHEN jbm >= 13815510 THEN 'p<0.001'
         |            WHEN jbm >= 9210340 THEN 'p<0.01'
         |            WHEN jbm >= 5991464 THEN 'p<0.05'
         |            WHEN jbm >= 4605170 THEN 'p<0.10'
         |            ELSE 'p>=0.10' END AS p_bucket,
         |       CASE WHEN jbm >= 5991464 THEN 'non_normal'
         |            ELSE 'normal' END AS verdict
         |FROM jb3""".stripMargin,
    "w_durbin_watson" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS y,
         |         CAST(row_number() OVER (ORDER BY o_orderdate) AS BIGINT)
         |           AS t
         |  FROM orders GROUP BY 1),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(t) AS DECIMAL(38,0)) AS st,
         |         CAST(sum(CAST(t * t AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |           AS stt,
         |         CAST(sum(y) AS DECIMAL(38,0)) AS sy,
         |         CAST(sum(CAST(t * y AS DECIMAL(38,0))) AS DECIMAL(38,0))
         |           AS sty
         |  FROM daily),
         |fit AS (
         |  SELECT n,
         |         (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
         |           - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         |         / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
         |           - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope,
         |         (CAST(sy AS DOUBLE)
         |           - (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
         |              - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
         |             / (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
         |               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
         |             * CAST(st AS DOUBLE)) / CAST(n AS DOUBLE) AS icept
         |  FROM m),
         |resid AS (
         |  SELECT f.n, f.slope, d.day,
         |         CAST(d.y AS DOUBLE) - f.icept
         |           - f.slope * CAST(d.t AS DOUBLE) AS e
         |  FROM daily d CROSS JOIN fit f),
         |lagd AS (
         |  SELECT n, slope, day, e,
         |         lag(e) OVER (ORDER BY day) AS e_prev
         |  FROM resid),
         |folds AS (
         |  SELECT n, slope,
         |         list_sum(list(CASE WHEN e_prev IS NOT NULL
         |           THEN (e - e_prev) * (e - e_prev) ELSE 0.0 END
         |           ORDER BY day)) AS num,
         |         list_sum(list(e * e ORDER BY day)) AS den
         |  FROM lagd GROUP BY n, slope)
         |SELECT n AS n_days,
         |       round(slope, 6) AS trend_slope_cents_per_day,
         |       round(num / den, 6) AS dw_stat,
         |       round(1.0 - num / den / 2.0, 6) AS rho_approx,
         |       CASE WHEN num / den < 1.5 THEN 'positive_autocorr'
         |            WHEN num / den > 2.5 THEN 'negative_autocorr'
         |            ELSE 'none' END AS verdict
         |FROM folds""".stripMargin)
}
