package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 32: exact-permutation inference (Fisher 1935
  * randomization test on the weekend-revenue lift), the
  * Hodges–Lehmann robust location estimator (Hodges & Lehmann 1963
  * — the median of pairwise Walsh averages), and the Theil-T
  * inequality index with its exact between/within decomposition
  * (Theil 1967) over per-customer revenue. All Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData37 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  private def dailyCents(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))

  // ---------------------------------------------------------------
  // a_permutation_test — randomization test for the weekend effect
  // on daily revenue: T = mean(weekend) − mean(weekday), null
  // distribution from 64 deterministic label permutations (each rep
  // md5-shuffles the day sequence and relabels the first n_weekend
  // days — a TRUE permutation: group sizes are preserved exactly).
  // p = (1 + #{|T_r| ≥ |T_obs|}) / 65, the add-one Monte-Carlo form
  // (Davison & Hinkley 1997 eq. 4.61). Scale shape: the corpus
  // reduces to the calendar-bounded daily series first; the rep
  // grid is days×64 (bounded at any corpus size), each rep's means
  // come from EXACT integer cent sums over fixed-size groups, so
  // every T is one subtraction of two exact divisions — bit-stable
  // with no fold machinery; the ≥ comparisons are therefore exact.
  // ---------------------------------------------------------------
  private val PermReps = 64

  val aPermutationTest: Q = (s, dir) => {
    val daily = dailyCents(s, dir)
      .withColumn("we", dayofweek(col("day")).isin(1, 7))
      .withColumn("t", row_number().over(Grain.bounded(col("day"))).cast("long"))
      .localCheckpoint(eager = false) // consumed by the observed agg AND the rep grid
    val obs = daily.agg(count(lit(1)).cast("long").as("n_days"),
      sum(when(col("we"), 1L).otherwise(0L)).cast("long").as("n_we"),
      sum(when(col("we"), col("m")).otherwise(0L)).cast("long").as("s_we"),
      sum(when(!col("we"), col("m")).otherwise(0L)).cast("long").as("s_wd"))
      .withColumn("t_obs", d(col("s_we")) / d(col("n_we"))
        - d(col("s_wd")) / d(col("n_days") - col("n_we")))
    val reps = daily.crossJoin(broadcast(obs.select(col("n_we"))))
      .select(col("m"), col("t"), col("n_we"),
        explode(sequence(lit(0L), lit(PermReps - 1L))).as("rep"))
      .withColumn("key",
        md5(concat(col("t").cast("string"), lit(":"), col("rep").cast("string"))))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("rep")).orderBy(col("key"), col("t"))).cast("long"))
      .groupBy(col("rep"))
      .agg(count(lit(1)).cast("long").as("n"),
        max(col("n_we")).as("nw"),
        sum(when(col("rn") <= col("n_we"), col("m")).otherwise(0L))
          .cast("long").as("s1"),
        sum(when(col("rn") > col("n_we"), col("m")).otherwise(0L))
          .cast("long").as("s0"))
      .withColumn("t_r", d(col("s1")) / d(col("nw"))
        - d(col("s0")) / d(col("n") - col("nw")))
    val extreme = reps.crossJoin(broadcast(obs.select(col("t_obs"))))
      .agg(sum(when(abs(col("t_r")) >= abs(col("t_obs")), 1L).otherwise(0L))
        .cast("long").as("n_extreme"))
    obs.crossJoin(broadcast(extreme))
      .select(col("n_days"), col("n_we").as("n_weekend"),
        round(col("t_obs") / 100.0, 6).as("t_obs"),
        col("n_extreme"),
        round((d(col("n_extreme")) + 1.0) / lit(PermReps + 1.0), 6).as("p_value"))
  }

  // ---------------------------------------------------------------
  // a_hodges_lehmann — the Hodges–Lehmann location estimate of daily
  // revenue: the median of all n(n+1)/2 pairwise Walsh averages
  // (xᵢ+xⱼ)/2, i ≤ j — the estimator behind the Wilcoxon signed-rank
  // interval, robust to the heavy order-date tails a plain mean
  // chases. Pair work is calendar²-bounded (the a_mann_kendall
  // contract: 2.4k days → 2.9M pairs at EVERY corpus scale — never
  // rows²), and the median rank runs through the two-phase global
  // rank (range partition + P carry rows), never a single-partition
  // sort of the pair stream. Walsh sums stay EXACT longs (the /2
  // happens once at the edge), so the median selection is integer
  // arithmetic end to end.
  // ---------------------------------------------------------------
  val aHodgesLehmann: Q = (s, dir) => {
    val daily = dailyCents(s, dir).localCheckpoint(eager = false) // both pair sides
    val pairs = daily.alias("a")
      .join(daily.alias("b"), col("a.day") <= col("b.day")) // calendar²-bounded
      .select((col("a.m") + col("b.m")).as("w"))
    // median via exact selection, not a full two-phase rank: the
    // Walsh-pair frame only ever surrenders its two middle VALUES,
    // and w is an exact long, so histogram narrowing (map-side count
    // passes, shuffle ≤ B rows) finds them without the former range
    // exchange + checkpoint + P-way sort of the 2.9M-pair frame (the
    // w_theil_sen probe: ~3.9 s of machinery for 2 rows). The pair
    // count is analytic — n(n+1)/2 — so the ranks are driver-side.
    val nD = daily.count()
    val nP = nD * (nD + 1) / 2
    val ks = Seq((nP + 1) / 2, (nP + 2) / 2).distinct
    Selection.valuesAtRanks(pairs, col("w"), ks)
      .agg(sum(col("__v")).cast("long").as("sw"),
        count(lit(1)).cast("long").as("c"))
      .select(lit(nD).cast("long").as("n_days"),
        lit(nP).cast("long").as("n_pairs"),
        (d(col("sw")) / d(col("c")) / 2.0 / 100.0).as("hl_estimate"))
  }

  // ---------------------------------------------------------------
  // a_theil_index — Theil-T inequality of per-customer revenue with
  // the exact between/within-nation decomposition:
  //   T = (1/n) Σ (xᵢ/μ)ln(xᵢ/μ)
  //     = Σ_g s_g ln(x̄_g/μ)  +  Σ_g s_g T_g      (between + within)
  // — the audit that says whether revenue concentration lives across
  // markets or inside them (the same decomposition data-curation
  // uses for token-share inequality across sources). Scale shape:
  // the order stream reduces to one exact-cent sum per customer
  // (map-combinable), nation margins are a 25-key aggregate, and μ /
  // totals are ONE-ROW broadcasts. Float policy: ln() is libm, so
  // every Σ over ln-terms folds in pinned key order (customer key,
  // then nation key — the g_pagerank sorted-fold rule) and outputs
  // round to 6 dp; at real corpus scale the fold is a plain sum
  // whose last-ulp nondeterminism no consumer observes (the
  // sim_kmeans documented-deviation class).
  // ---------------------------------------------------------------
  val aTheilIndex: Q = (s, dir) => {
    val cust = Tables.table(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .join(Tables.table(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_nationkey")),
        Seq("o_custkey"))
      .localCheckpoint(eager = false) // consumed by totals, the total fold, the nation folds
    val tot = cust.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("long").as("sx"))
      .withColumn("mu", d(col("sx")) / d(col("n")))
    val tTotal = cust.crossJoin(broadcast(tot))
      .select(col("o_custkey"),
        (d(col("x")) / col("mu") * log(d(col("x")) / col("mu"))).as("term"),
        col("n"))
      .groupBy(col("n"))
      .agg(expr("aggregate(sort_array(collect_list(struct(o_custkey, term)))," +
        " 0D, (a, x) -> a + x.term)").as("f"))
      .select((col("f") / d(col("n"))).as("t_total"))
    val gs = cust.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).cast("long").as("ng"),
        sum(col("x")).cast("long").as("sg"))
      .crossJoin(broadcast(tot))
      .withColumn("share", d(col("sg")) / d(col("sx")))
      .withColumn("xbar", d(col("sg")) / d(col("ng")))
      .localCheckpoint(eager = false) // consumed by the between fold AND the within join
    val tBetween = gs
      .select(col("c_nationkey"),
        (col("share") * log(col("xbar") / col("mu"))).as("term"))
      .agg(expr("aggregate(sort_array(collect_list(struct(c_nationkey, term)))," +
        " 0D, (a, x) -> a + x.term)").as("t_between"))
    val tg = cust.join(gs.select(col("c_nationkey"), col("ng"), col("xbar"),
        col("share")), Seq("c_nationkey"))
      .select(col("c_nationkey"), col("ng"), col("share"), col("o_custkey"),
        (d(col("x")) / col("xbar") * log(d(col("x")) / col("xbar"))).as("term"))
      .groupBy(col("c_nationkey"), col("ng"), col("share"))
      .agg(expr("aggregate(sort_array(collect_list(struct(o_custkey, term)))," +
        " 0D, (a, x) -> a + x.term)").as("fg"))
      .select(col("c_nationkey"),
        (col("share") * (col("fg") / d(col("ng")))).as("term"))
      .agg(expr("aggregate(sort_array(collect_list(struct(c_nationkey, term)))," +
        " 0D, (a, x) -> a + x.term)").as("t_within"))
    tot.crossJoin(broadcast(tTotal)).crossJoin(broadcast(tBetween))
      .crossJoin(broadcast(tg))
      .select(col("n").as("n_customers"),
        round(col("mu") / 100.0, 6).as("mean_revenue"),
        round(col("t_total"), 6).as("t_total"),
        round(col("t_between"), 6).as("t_between"),
        round(col("t_within"), 6).as("t_within"))
  }

  val queries: Map[String, Q] = Map(
    "a_permutation_test" -> aPermutationTest,
    "a_hodges_lehmann" -> aHodgesLehmann,
    "a_theil_index" -> aTheilIndex)

  private val dailySql =
    """daily AS (
      |  SELECT o_orderdate AS day,
      |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |           AS BIGINT)) AS BIGINT) AS m
      |  FROM orders GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_permutation_test" ->
      s"""WITH $dailySql,
         |dly AS (
         |  SELECT m, dayofweek(day) + 1 IN (1, 7) AS we,
         |         CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t
         |  FROM daily),
         |obs AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_days,
         |         CAST(sum(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS n_we,
         |         CAST(sum(CASE WHEN we THEN m ELSE 0 END) AS BIGINT) AS s_we,
         |         CAST(sum(CASE WHEN NOT we THEN m ELSE 0 END) AS BIGINT) AS s_wd
         |  FROM dly),
         |obst AS (
         |  SELECT n_days, n_we,
         |         s_we::DOUBLE / n_we::DOUBLE
         |           - s_wd::DOUBLE / CAST(n_days - n_we AS DOUBLE) AS t_obs
         |  FROM obs),
         |grid AS (
         |  SELECT d.m, d.t, o.n_we, r.rep,
         |         md5(CAST(d.t AS VARCHAR) || ':' || CAST(r.rep AS VARCHAR)) AS key
         |  FROM dly d
         |  CROSS JOIN obs o
         |  CROSS JOIN (SELECT unnest(generate_series(0, ${PermReps - 1})) AS rep) r),
         |perm AS (
         |  SELECT rep,
         |         CAST(count(*) AS BIGINT) AS n,
         |         max(n_we) AS nw,
         |         CAST(sum(CASE WHEN rn <= n_we THEN m ELSE 0 END) AS BIGINT) AS s1,
         |         CAST(sum(CASE WHEN rn > n_we THEN m ELSE 0 END) AS BIGINT) AS s0
         |  FROM (SELECT m, n_we, rep,
         |               CAST(row_number() OVER (PARTITION BY rep
         |                 ORDER BY key, t) AS BIGINT) AS rn
         |        FROM grid)
         |  GROUP BY rep),
         |ext AS (
         |  SELECT CAST(sum(CASE WHEN abs(
         |           s1::DOUBLE / nw::DOUBLE - s0::DOUBLE / CAST(n - nw AS DOUBLE))
         |           >= abs(o.t_obs) THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
         |  FROM perm CROSS JOIN obst o)
         |SELECT o.n_days, o.n_we AS n_weekend,
         |       round(o.t_obs / 100.0, 6) AS t_obs,
         |       e.n_extreme,
         |       round((e.n_extreme::DOUBLE + 1.0) / ${PermReps + 1}.0, 6) AS p_value
         |FROM obst o CROSS JOIN ext e""".stripMargin,
    "a_hodges_lehmann" ->
      s"""WITH $dailySql,
         |pairs AS (
         |  SELECT a.m + b.m AS w
         |  FROM daily a JOIN daily b ON a.day <= b.day),
         |rk AS (
         |  SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS rk
         |  FROM pairs),
         |n AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_days,
         |         CAST(count(*) AS BIGINT) * (CAST(count(*) AS BIGINT) + 1) // 2 AS np
         |  FROM daily)
         |SELECT n.n_days, n.np AS n_pairs,
         |       CAST(sum(w) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         |         / 2.0 / 100.0 AS hl_estimate
         |FROM rk CROSS JOIN n
         |WHERE rk.rk >= (n.np + 1) // 2 AND rk.rk <= (n.np + 2) // 2
         |GROUP BY n.n_days, n.np""".stripMargin,
    "a_theil_index" ->
      """WITH cust AS (
        |  SELECT o.o_custkey, c.c_nationkey,
        |         CAST(sum(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS x
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x) AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE AS mu
        |  FROM cust),
        |tt AS (
        |  SELECT list_sum(list(x::DOUBLE / t.mu * ln(x::DOUBLE / t.mu)
        |           ORDER BY o_custkey)) / t.n::DOUBLE AS t_total
        |  FROM cust CROSS JOIN tot t GROUP BY t.n),
        |gs AS (
        |  SELECT c_nationkey, CAST(count(*) AS BIGINT) AS ng,
        |         CAST(sum(x) AS BIGINT) AS sg,
        |         CAST(sum(x) AS BIGINT)::DOUBLE / t.sx::DOUBLE AS share,
        |         CAST(sum(x) AS BIGINT)::DOUBLE / CAST(count(*) AS BIGINT)::DOUBLE AS xbar,
        |         t.mu AS mu
        |  FROM cust CROSS JOIN tot t
        |  GROUP BY c_nationkey, t.sx, t.mu),
        |tb AS (
        |  SELECT list_sum(list(share * ln(xbar / mu) ORDER BY c_nationkey))
        |    AS t_between
        |  FROM gs),
        |tgg AS (
        |  SELECT g.c_nationkey, g.share,
        |         list_sum(list(c.x::DOUBLE / g.xbar * ln(c.x::DOUBLE / g.xbar)
        |           ORDER BY c.o_custkey)) / g.ng::DOUBLE AS tg
        |  FROM cust c JOIN gs g ON g.c_nationkey = c.c_nationkey
        |  GROUP BY g.c_nationkey, g.share, g.ng),
        |tw AS (
        |  SELECT list_sum(list(share * tg ORDER BY c_nationkey)) AS t_within
        |  FROM tgg)
        |SELECT t.n AS n_customers, round(t.mu / 100.0, 6) AS mean_revenue,
        |       round(tt.t_total, 6) AS t_total,
        |       round(tb.t_between, 6) AS t_between,
        |       round(tw.t_within, 6) AS t_within
        |FROM tot t CROSS JOIN tt CROSS JOIN tb CROSS JOIN tw""".stripMargin)
}
