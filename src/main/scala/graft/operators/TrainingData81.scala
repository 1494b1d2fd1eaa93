package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 81: Markov mixing diagnostics, the nonparametric
  * repeated-measures companion of the ANOVA family, and a
  * Simpson's-paradox slope audit.
  *
  *  - ev_markov_mixing — total-variation convergence of the
  *    event-type chain from a point mass toward its stationary
  *    distribution: TV(v·Pᵏ, π) per step k = 1..16. The readout
  *    behind "how long until the chain forgets where a session
  *    started" — the mixing companion of ev_markov_stationary
  *    (shared transition machinery).
  *  - a_friedman_test — Friedman rank test: do the five order
  *    priorities rank consistently WITHIN days? Blocks = complete
  *    days, exact half-unit midranks, χ²_F with the closed even-df
  *    χ²(4) survival.
  *  - a_simpsons_slopes — pooled vs per-group OLS slope directions
  *    (extended price on quantity by return flag): the aggregation-
  *    reversal audit a metrics review runs before trusting a pooled
  *    trend.
  */
object TrainingData81 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // ev_markov_mixing — π from the registered 20-step uniform
  // iteration, then v₀ = point mass at the FIRST (alphabetical)
  // state; per step: v ← v·P and TV = ½·Σ|v_i − π_i| (i-ascending
  // folds — the ev_markov_stationary float policy). Everything is
  // bounded by the type alphabet (≤ 5 states here): the corpus
  // reduces through one ≤25-cell aggregate, the iteration is a
  // ≤16×25 fold. Output: one row per step with the TV and whether
  // the chain has mixed at τ = 0.05.
  // ---------------------------------------------------------------
  private val MixSteps = 16

  val evMarkovMixing: Q = (s, dir) => {
    val tr = TrainingData7.markovTransitions(s, dir)
    val base = TrainingData7.markovPm(tr)
      .withColumn("pi", expr(
        """aggregate(
          |  sequence(1, 20),
          |  array_repeat(CAST(1.0 AS DOUBLE) / CAST(s_n AS DOUBLE), s_n),
          |  (v, it) -> transform(sequence(1, s_n),
          |    j -> aggregate(sequence(1, s_n), CAST(0.0 AS DOUBLE),
          |      (a, i) -> a + element_at(v, i)
          |        * element_at(pm, (i - 1) * s_n + j))))""".stripMargin))
    val stepExpr =
      """transform(sequence(1, s_n),
        |  j -> aggregate(sequence(1, s_n), CAST(0.0 AS DOUBLE),
        |    (a, i) -> a + element_at(st.v, i)
        |      * element_at(pm, (i - 1) * s_n + j)))""".stripMargin
        .replaceAll("\n", " ")
    val tvOf = (vexpr: String) =>
      s"""aggregate(sequence(1, s_n), CAST(0.0 AS DOUBLE),
         |  (a, i) -> a + abs(element_at($vexpr, i) - element_at(pi, i)))
         | / 2.0""".stripMargin.replaceAll("\n", " ")
    base
      .withColumn("walk", expr(
        s"""aggregate(
           |  sequence(1, $MixSteps),
           |  named_struct(
           |    'v', transform(sequence(1, s_n),
           |           j -> IF(j = 1, CAST(1.0 AS DOUBLE),
           |                   CAST(0.0 AS DOUBLE))),
           |    'out', CAST(array() AS ARRAY<STRUCT<k: INT, tv: DOUBLE>>)),
           |  (st, it) -> named_struct(
           |    'v', $stepExpr,
           |    'out', concat(st.out, array(named_struct(
           |      'k', it, 'tv', ${tvOf(s"($stepExpr)")})))),
           |  st -> st.out)""".stripMargin.replaceAll("\n", " ")))
      .select(element_at(col("states"), 1).as("start_state"),
        col("s_n").cast("long").as("n_states"),
        explode(col("walk")).as("o"))
      .select(col("start_state"), col("n_states"),
        col("o.k").cast("long").as("step"),
        round(col("o.tv"), 6).as("tv_distance"),
        (col("o.tv") < 0.05).as("mixed"))
      .orderBy(col("step"))
  }

  // ---------------------------------------------------------------
  // a_friedman_test — blocks are MONTHS where ALL k priorities
  // transacted (complete blocks, the Friedman requirement; months
  // keep the block census dense at every SF); the within-block
  // midranks come from an exact month-keyed 5×5 self-join:
  // rank2 = 2·#{less} + #{equal} + 1 (double the midrank — exact
  // longs; ties on exact cent totals are possible and handled).
  // χ²_F = 3·ΣR2_j²/(n·k·(k+1)) − 3·n·(k+1); p is the closed
  // χ²(k−1) survival for k = 5. Per-treatment mean ranks ship with
  // the verdict row. Scale shape: the corpus reduces to the
  // (day, priority) aggregate; blocks join 5×5 within day.
  // ---------------------------------------------------------------
  val aFriedmanTest: Q = (s, dir) => {
    val cell = Tables.table(s, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("day"),
        col("o_orderpriority").as("trt"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("v"))
      .localCheckpoint(eager = false) // completeness filter + both join sides
    val kAll = cell.agg(countDistinct(col("trt")).cast("long").as("k"))
    val complete = cell.groupBy(col("day"))
      .agg(count(lit(1)).cast("long").as("nt"))
      .crossJoin(broadcast(kAll))
      .filter(col("nt") === col("k"))
      .select(col("day"))
    val blocks = cell.join(complete, "day")
    val a = blocks.alias("a"); val b = blocks.alias("b")
    val ranked = a.join(b, col("a.day") === col("b.day"))
      .groupBy(col("a.day").as("day"), col("a.trt").as("trt"))
      .agg((lit(1L) + sum(when(col("b.v") < col("a.v"), 2L)
        .when(col("b.v") === col("a.v"), 1L).otherwise(0L)).cast("long"))
        .as("rank2"))
    val rsum = ranked.groupBy(col("trt"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(col("rank2")).cast("long").as("r2"))
      .localCheckpoint(eager = false) // the χ² fold + the per-treatment rows
    val chi = rsum.crossJoin(broadcast(kAll))
      .select(col("trt"), col("n_blocks"), col("k"), col("r2"))
      .groupBy(col("n_blocks"), col("k"))
      .agg(expr("aggregate(sort_array(collect_list(struct(trt," +
        " CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE) AS q))), 0D," +
        " (a, x) -> a + x.q)").as("sr2"))
      .withColumn("chi2",
        lit(3.0) * col("sr2") /
          (d(col("n_blocks")) * d(col("k")) * d(col("k") + 1L)) -
          lit(3.0) * d(col("n_blocks")) * d(col("k") + 1L))
      // hashed-output discipline (PLANS.md): the χ²(4) survival
      // exp(−x/2)·(1+x/2) goes through libm exp — p ships as a
      // BUCKET from fixed χ²(4) critical values via integer compares
      // on floor(chi2·10⁶) (chi2 is rational of exact longs:
      // deterministic). Emitted only for k = 5 (df = 4), NULL
      // otherwise — like the old closed-form p.
      .withColumn("xm", when(col("k") === 5L,
        floor(col("chi2") * lit(1.0e6)).cast("long"))
        .otherwise(lit(null).cast("long")))
    rsum.crossJoin(broadcast(chi.select(col("chi2"), col("xm"))))
      .select(col("trt").as("priority"), col("n_blocks"),
        round(d(col("r2")) / 2.0 / d(col("n_blocks")), 6).as("mean_rank"),
        round(col("chi2"), 6).as("chi2_friedman"),
        when(col("xm") >= 18466826L, "p<0.001")
          .when(col("xm") >= 13276704L, "p<0.01")
          .when(col("xm") >= 9487729L, "p<0.05")
          .when(col("xm") >= 7779440L, "p<0.10")
          .when(col("xm").isNotNull, "p>=0.10")
          .otherwise(lit(null).cast("string")).as("p_bucket"),
        when(col("xm") >= 9487729L, "ranks_differ")
          .otherwise(lit("consistent")).as("verdict"))
      .orderBy(col("priority"))
  }

  // ---------------------------------------------------------------
  // a_simpsons_slopes — OLS slope of extended price (cents) on
  // quantity, pooled and per return flag, from exact decimal
  // moments (the ÷10⁶ quantization rule on the >2^53 products).
  // A group whose slope sign disagrees with the pooled sign is a
  // Simpson reversal. One row per group plus the pooled row.
  // ---------------------------------------------------------------
  val aSimpsonsSlopes: Q = (s, dir) => {
    val rows = Tables.table(s, dir, "lineitem")
      .select(col("l_returnflag").as("g"),
        col("l_quantity").cast("long").as("x"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("y"))
    def moments(df: DataFrame, label: Column): DataFrame =
      df.groupBy(label.as("grp"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).cast("decimal(38,0)").as("sx"),
          sum(col("y")).cast("decimal(38,0)").as("sy"),
          sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
          sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
        .select(col("grp"), col("n"),
          ((d(col("n")) *
            (d(expr("CAST(sxy div 1000000 AS BIGINT)")) * lit(1.0e6)) -
            d(col("sx")) * d(col("sy"))) /
            (d(col("n")) *
              (d(expr("CAST(sxx div 1000000 AS BIGINT)")) * lit(1.0e6)) -
              d(col("sx")) * d(col("sx")))).as("slope"))
    val pooled = moments(rows, lit("ALL"))
      .select(col("n").as("n_pooled"), col("slope").as("pooled_slope"))
    moments(rows, col("g"))
      .crossJoin(broadcast(pooled))
      .select(col("grp").as("group_flag"), col("n").as("n_rows"),
        round(col("slope"), 6).as("slope_cents_per_unit"),
        round(col("pooled_slope"), 6).as("pooled_slope"),
        (signum(col("slope")) =!= signum(col("pooled_slope")))
          .as("simpson_reversal"))
      .orderBy(col("group_flag"))
  }

  val queries: Map[String, Q] = Map(
    "ev_markov_mixing" -> evMarkovMixing,
    "a_friedman_test" -> aFriedmanTest,
    "a_simpsons_slopes" -> aSimpsonsSlopes)

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "ev_markov_mixing" ->
      s"""WITH RECURSIVE ${TrainingData7.markovCtes},
         |pit(stp, v) AS (
         |  SELECT 0, list_transform(range(1, rn.n + 1),
         |           x -> CAST(1.0 AS DOUBLE) / CAST(rn.n AS DOUBLE))
         |  FROM rn
         |  UNION ALL
         |  SELECT stp + 1,
         |         list_transform(range(1, rn.n + 1),
         |           j -> list_sum(list_transform(range(1, rn.n + 1),
         |             i -> v[i] * pm[(i - 1) * rn.n + j])))
         |  FROM pit, pmt, rn WHERE stp < 20),
         |pif AS (SELECT v AS pi FROM pit WHERE stp = 20),
         |mix(stp, v) AS (
         |  SELECT 0, list_transform(range(1, rn.n + 1),
         |           x -> CASE WHEN x = 1 THEN CAST(1.0 AS DOUBLE)
         |                     ELSE CAST(0.0 AS DOUBLE) END)
         |  FROM rn
         |  UNION ALL
         |  SELECT stp + 1,
         |         list_transform(range(1, rn.n + 1),
         |           j -> list_sum(list_transform(range(1, rn.n + 1),
         |             i -> v[i] * pm[(i - 1) * rn.n + j])))
         |  FROM mix, pmt, rn WHERE stp < $MixSteps)
         |SELECT st.states[1] AS start_state,
         |       CAST(rn.n AS BIGINT) AS n_states,
         |       CAST(m.stp AS BIGINT) AS step,
         |       round(list_sum(list_transform(range(1, rn.n + 1),
         |         i -> abs(m.v[i] - p.pi[i]))) / 2.0, 6) AS tv_distance,
         |       list_sum(list_transform(range(1, rn.n + 1),
         |         i -> abs(m.v[i] - p.pi[i]))) / 2.0 < 0.05 AS mixed
         |FROM mix m CROSS JOIN pif p CROSS JOIN rn CROSS JOIN st
         |WHERE m.stp >= 1
         |ORDER BY step""".stripMargin,
    "a_friedman_test" ->
      s"""WITH cell AS (
         |  SELECT date_trunc('month', o_orderdate) AS day,
         |         o_orderpriority AS trt,
         |         CAST(sum($centsX) AS BIGINT) AS v
         |  FROM orders GROUP BY 1, 2),
         |ka AS (SELECT CAST(count(DISTINCT trt) AS BIGINT) AS k FROM cell),
         |complete AS (
         |  SELECT day FROM cell CROSS JOIN ka
         |  GROUP BY day, ka.k HAVING count(*) = ka.k),
         |blocks AS (
         |  SELECT c.day, c.trt, c.v FROM cell c
         |  JOIN complete ON c.day = complete.day),
         |ranked AS (
         |  SELECT a.day, a.trt,
         |         CAST(1 + sum(CASE WHEN b.v < a.v THEN 2
         |                           WHEN b.v = a.v THEN 1
         |                           ELSE 0 END) AS BIGINT) AS rank2
         |  FROM blocks a JOIN blocks b ON a.day = b.day
         |  GROUP BY a.day, a.trt),
         |rsum AS (
         |  SELECT trt, CAST(count(*) AS BIGINT) AS n_blocks,
         |         CAST(sum(rank2) AS BIGINT) AS r2
         |  FROM ranked GROUP BY 1),
         |chi AS (
         |  SELECT n_blocks, k,
         |         3.0 * sr2 / (CAST(n_blocks AS DOUBLE)
         |           * CAST(k AS DOUBLE) * CAST(k + 1 AS DOUBLE))
         |           - 3.0 * CAST(n_blocks AS DOUBLE)
         |             * CAST(k + 1 AS DOUBLE) AS chi2
         |  FROM (
         |    SELECT n_blocks, ka.k,
         |           list_sum(list(CAST(r2 AS DOUBLE) * CAST(r2 AS DOUBLE)
         |             ORDER BY trt)) AS sr2
         |    FROM rsum CROSS JOIN ka
         |    GROUP BY n_blocks, ka.k)),
         |pv AS (
         |  SELECT chi2,
         |         CASE WHEN k = 5 THEN
         |           CAST(floor(chi2 * 1.0e6) AS BIGINT)
         |         ELSE NULL END AS xm
         |  FROM chi)
         |SELECT r.trt AS priority, r.n_blocks,
         |       round(CAST(r.r2 AS DOUBLE) / 2.0
         |         / CAST(r.n_blocks AS DOUBLE), 6) AS mean_rank,
         |       round(p.chi2, 6) AS chi2_friedman,
         |       CASE WHEN p.xm >= 18466826 THEN 'p<0.001'
         |            WHEN p.xm >= 13276704 THEN 'p<0.01'
         |            WHEN p.xm >= 9487729 THEN 'p<0.05'
         |            WHEN p.xm >= 7779440 THEN 'p<0.10'
         |            WHEN p.xm IS NOT NULL THEN 'p>=0.10'
         |            ELSE NULL END AS p_bucket,
         |       CASE WHEN p.xm >= 9487729 THEN 'ranks_differ'
         |            ELSE 'consistent' END AS verdict
         |FROM rsum r CROSS JOIN pv p
         |ORDER BY priority""".stripMargin,
    "a_simpsons_slopes" ->
      """WITH rows_ AS (
        |  SELECT l_returnflag AS g, CAST(l_quantity AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT) AS y
        |  FROM lineitem),
        |mo AS (
        |  SELECT g AS grp, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
        |         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
        |           // 1000000 AS BIGINT) * 1.0e6 AS sxy,
        |         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
        |           // 1000000 AS BIGINT) * 1.0e6 AS sxx
        |  FROM rows_ GROUP BY 1
        |  UNION ALL
        |  SELECT 'ALL', CAST(count(*) AS BIGINT),
        |         CAST(sum(CAST(x AS HUGEINT)) AS DOUBLE),
        |         CAST(sum(CAST(y AS HUGEINT)) AS DOUBLE),
        |         CAST(sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT))
        |           // 1000000 AS BIGINT) * 1.0e6,
        |         CAST(sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
        |           // 1000000 AS BIGINT) * 1.0e6
        |  FROM rows_),
        |sl AS (
        |  SELECT grp, n,
        |         (CAST(n AS DOUBLE) * sxy - sx * sy)
        |           / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope
        |  FROM mo)
        |SELECT g.grp AS group_flag, g.n AS n_rows,
        |       round(g.slope, 6) AS slope_cents_per_unit,
        |       round(p.slope, 6) AS pooled_slope,
        |       sign(g.slope) <> sign(p.slope) AS simpson_reversal
        |FROM sl g CROSS JOIN (SELECT * FROM sl WHERE grp = 'ALL') p
        |WHERE g.grp <> 'ALL'
        |ORDER BY group_flag""".stripMargin)
}
