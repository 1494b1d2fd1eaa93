package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 6: robust regression and optimizer-stats extensions
  * — the Theil–Sen estimator (Theil 1950; Sen 1968 — the robust
  * slope companion of a_mann_kendall, which uses the same pairwise
  * structure as its significance test), and an equi-height histogram
  * (the CBO statistics object ANALYZE builds for selectivity
  * estimation). Both re-expressed Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData10 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_theil_sen — Theil–Sen robust trend line over daily revenue:
  // slope = MEDIAN of all pairwise slopes (rev_j − rev_i)/(day_j −
  // day_i), intercept = median of per-day residual intercepts — the
  // outlier-proof fit a monitoring stack pairs with the
  // Mann–Kendall test (same calendar²-bounded pair set). Medians
  // are EXACT order statistics: the pair-slope median rides the
  // two-phase global rank (range partition + carries — no
  // single-partition sort anywhere on the 2.9M-pair frame); the
  // (k1, k2) selection means even counts average the two middles
  // and odd counts reduce to sum/1 — branch-free on both engines.
  // The day-level intercept median folds over the CALENDAR-bounded
  // daily array. Slopes divide exact decimal diffs by exact day
  // gaps — the only floats before the /2.
  // ---------------------------------------------------------------
  val wTheilSen: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
      .withColumn("dayn", datediff(col("day"), lit("1970-01-01").cast("date"))
        .cast("long"))
      .localCheckpoint(eager = false) // consumed by both pair sides + intercepts
    val slopes = daily.alias("a")
      .join(daily.alias("b"), col("a.day") < col("b.day")) // calendar²-bounded
      // nullif guard: Selection's narrowing filters reference the
      // slope, and the optimizer pushes them INTO the join condition,
      // where ANSI evaluates them on a=b self-pairs (Δdayn = 0)
      // before the day< conjunct prunes them. Real pairs always have
      // Δdayn ≥ 1, so every emitted slope value is unchanged.
      .select(((d(col("b.rev")) - d(col("a.rev"))) /
        d(nullif(col("b.dayn") - col("a.dayn"), lit(0L)))).as("slope"),
        col("a.dayn").as("da"), col("b.dayn").as("db"))
      // materialize once: the slope distribution peaks hard at 0, so
      // selection runs 2 histogram passes + stats + final — 4 scans;
      // one ~23 MB checkpoint beats 4 BNLJ+division re-evaluations
      // (and is a second pushdown barrier above the nullif guard)
      .localCheckpoint(eager = false)
    // the pair count is analytic — every ordered day pair contributes
    // exactly one slope — and the median needs only the VALUES at
    // ranks k1/k2, so selection (histogram narrowing, map-side count
    // passes over the recomputable pair stream) replaces the former
    // full two-phase rank: the round-13 probe measured that rank's
    // range exchange + checkpoint + P-way sort of the 2.9M-pair frame
    // at ~3.9 s of the query's 4.6 s, all to keep 2 rows. Selected
    // values are exact multiset order statistics — equal-slope ties
    // permute only among themselves, so the k-th slope VALUE (the
    // only thing consumed) is unchanged from the ranked form.
    val nD = daily.count()
    val nP = nD * (nD - 1) / 2
    val k1 = (nP + 1) / 2; val k2 = (nP + 2) / 2
    val med = Selection
      .valuesAtRanks(slopes, col("slope"), Seq(k1, k2).distinct)
      .agg((sum(col("__v")) / count(lit(1))).as("med_slope"))
    val kd1 = ((nD + 1) / 2).toInt; val kd2 = ((nD + 2) / 2).toInt
    daily
      .crossJoin(broadcast(med))
      .select(col("med_slope"),
        (d(col("rev")) - col("med_slope") * d(col("dayn"))).as("ic"),
        col("day"))
      .groupBy(col("med_slope"))
      .agg(count(lit(1)).as("n_days"),
        sort_array(collect_list(struct(col("ic"), col("day")))).as("ics"))
      .select(col("n_days"), lit(nP).as("n_pairs"),
        round(col("med_slope"), 6).as("slope_per_day"),
        round((element_at(col("ics"), kd1).getField("ic") +
          element_at(col("ics"), kd2).getField("ic")) / 2.0, 6)
          .as("intercept"))
  }

  // ---------------------------------------------------------------
  // o_histogram_equiheight — the equi-height histogram of
  // l_extendedprice (the ANALYZE-style statistics object a
  // cost-based optimizer reads for selectivity): rows rank globally
  // by (value, orderkey, linenumber) through the TWO-PHASE rank
  // (range partition + carries — the a_gini/a_ks shape, never a
  // single-partition sort), then bucket = ⌊(rk−1)·10/n⌋ + 1 — pure
  // integer arithmetic, so bucket populations differ by at most
  // one row. Per bucket: row count, exact NDV, exact decimal
  // lo/hi bounds cast double at the edge. One range exchange + one
  // 10-group aggregate.
  // ---------------------------------------------------------------
  val oHistogramEquiheight: Q = (s, dir) => {
    val rows = Tables.table(s, dir, "lineitem")
      .select(col("l_extendedprice").cast("decimal(18,2)").as("v"),
        col("l_orderkey"), col("l_linenumber"))
      .localCheckpoint(eager = false) // consumed by the count + the rank pass
    val n = rows.count()
    Ranking
      .withGlobalRank(rows, "rk", col("v"), col("l_orderkey"),
        col("l_linenumber"))
      // `div`, not `/`: the Column `/` is double division, and the
      // bucket rule must stay integer-exact
      .withColumn("bucket", expr(s"CAST(((rk - 1) * 10) div $n + 1 AS INT)"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("v")).as("ndv"),
        min(col("v")).cast("double").as("lo"),
        max(col("v")).cast("double").as("hi"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------
  // a_fleiss_kappa — inter-rater agreement (Fleiss 1971) between
  // THREE deterministic quality "raters" on every document: the
  // heuristic score rule (≥ 0.42), the logistic classifier
  // (t_calibration_ece's fixed-weight model, ≥ 0.5) and a length
  // rule (≥ 40 tokens) — the "do our quality filters even agree"
  // audit a curation stack runs before trusting any one of them.
  // With m = 3 raters and 2 categories, per-doc agreement is
  // Pᵢ = (x(x−1) + (3−x)(2−x))/6 for x = good-votes; P̄, Pₑ and κ
  // are fixed divisions of EXACT integer sums (Σx, Σ numerators).
  // One scan, one one-row aggregate — no shuffle beyond it.
  // ---------------------------------------------------------------
  val aFleissKappa: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val logit = lit(-0.7) +
      lit(0.8) * (size(toks).cast("double") / lit(100.0)) +
      lit(2.0) * TF.stopwordRatio(col("text")) +
      lit(-1.2) * (TF.avgWordLen(col("text")) / lit(10.0)) +
      lit(1.5) * (size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
    val votes = Tables.table(s, dir, "documents").select(
      ((when(TF.qualityScore(col("text")) >= 0.42, 1).otherwise(0)) +
        (when(lit(1.0) / (lit(1.0) + exp(-logit)) >= 0.5, 1).otherwise(0)) +
        (when(TF.tokenCount(col("text")) >= 40, 1).otherwise(0))).as("x"))
    votes
      .agg(count(lit(1)).as("n_docs"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("x") * (col("x") - 1) +
          (lit(3) - col("x")) * (lit(2) - col("x"))).cast("long").as("sp"))
      .withColumn("p_good", d(col("sx")) / (lit(3.0) * d(col("n_docs"))))
      .withColumn("p_bar", d(col("sp")) / (lit(6.0) * d(col("n_docs"))))
      .withColumn("p_e", col("p_good") * col("p_good") +
        (lit(1.0) - col("p_good")) * (lit(1.0) - col("p_good")))
      .select(col("n_docs"), round(col("p_good"), 6).as("p_good"),
        round(col("p_bar"), 6).as("p_bar"), round(col("p_e"), 6).as("p_e"),
        round((col("p_bar") - col("p_e")) / (lit(1.0) - col("p_e")), 6)
          .as("kappa"))
  }

  // ---------------------------------------------------------------
  // set_ops_all_multiset — multiset set-operations (INTERSECT ALL /
  // EXCEPT ALL, the bag semantics SQL:1999 adds over the distinct
  // forms set_ops_customer_orders covers): part keys shipped by
  // even suppliers vs part keys on high-quantity lines, with
  // per-key multiplicities after each bag operation. Spark's
  // intersectAll/exceptAll plan as hash aggregates + joins (no
  // sort); per-key output counts are exact and hash-stable. Top-50
  // by (count desc, key) bounds the output.
  // ---------------------------------------------------------------
  val setOpsAllMultiset: Q = (s, dir) => {
    val li = Tables.table(s, dir, "lineitem").localCheckpoint(eager = false)
    val a = li.filter(col("l_suppkey") % 2 === 0).select(col("l_partkey"))
    val b = li.filter(col("l_quantity") > 25).select(col("l_partkey"))
    val ia = a.intersectAll(b).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_intersect_all"))
    val ea = a.exceptAll(b).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_except_all"))
    ia.join(ea, Seq("l_partkey"), "full_outer")
      .select(col("l_partkey"),
        coalesce(col("n_intersect_all"), lit(0L)).as("n_intersect_all"),
        coalesce(col("n_except_all"), lit(0L)).as("n_except_all"))
      .orderBy(desc("n_intersect_all"), desc("n_except_all"), col("l_partkey"))
      .limit(50)
  }

  val queries: Map[String, Q] = Map(
    "a_fleiss_kappa" -> aFleissKappa,
    "set_ops_all_multiset" -> setOpsAllMultiset,
    "w_theil_sen" -> wTheilSen,
    "o_histogram_equiheight" -> oHistogramEquiheight)

  val oracles: Map[String, String] = Map(
    "a_fleiss_kappa" ->
      """WITH f AS (
        |  SELECT ((CASE WHEN (1.0 - CAST(n_stops AS DOUBLE)
        |             / CAST(len(toks) AS DOUBLE))
        |             * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE), 10.0) / 10.0 >= 0.42
        |           THEN 1 ELSE 0 END)
        |        + (CASE WHEN 1.0 / (1.0 + exp(-(-0.7
        |             + 0.8 * (CAST(len(toks) AS DOUBLE) / 100.0)
        |             + 2.0 * (CAST(n_stops AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE))
        |             + (-1.2) * ((CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE)) / 10.0)
        |             + 1.5 * (CAST(len(list_distinct(toks)) AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE))))) >= 0.5
        |           THEN 1 ELSE 0 END)
        |        + (CASE WHEN len(toks) >= 40 THEN 1 ELSE 0 END)) AS x
        |  FROM (SELECT text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(x) AS BIGINT) AS sx,
        |         CAST(sum(x * (x - 1) + (3 - x) * (2 - x)) AS BIGINT) AS sp
        |  FROM f),
        |k AS (
        |  SELECT n_docs,
        |         CAST(sx AS DOUBLE) / (3.0 * CAST(n_docs AS DOUBLE)) AS p_good,
        |         CAST(sp AS DOUBLE) / (6.0 * CAST(n_docs AS DOUBLE)) AS p_bar
        |  FROM agg),
        |e AS (
        |  SELECT *, p_good * p_good + (1.0 - p_good) * (1.0 - p_good) AS p_e
        |  FROM k)
        |SELECT n_docs, round(p_good, 6) AS p_good, round(p_bar, 6) AS p_bar,
        |       round(p_e, 6) AS p_e,
        |       round((p_bar - p_e) / (1.0 - p_e), 6) AS kappa
        |FROM e""".stripMargin,
    "set_ops_all_multiset" ->
      """WITH a AS (SELECT l_partkey FROM lineitem WHERE l_suppkey % 2 = 0),
        |b AS (SELECT l_partkey FROM lineitem WHERE l_quantity > 25),
        |ia AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_intersect_all
        |  FROM (SELECT l_partkey FROM a INTERSECT ALL
        |        SELECT l_partkey FROM b)
        |  GROUP BY 1),
        |ea AS (
        |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_except_all
        |  FROM (SELECT l_partkey FROM a EXCEPT ALL SELECT l_partkey FROM b)
        |  GROUP BY 1)
        |SELECT coalesce(ia.l_partkey, ea.l_partkey) AS l_partkey,
        |       coalesce(ia.n_intersect_all, 0) AS n_intersect_all,
        |       coalesce(ea.n_except_all, 0) AS n_except_all
        |FROM ia FULL OUTER JOIN ea ON ia.l_partkey = ea.l_partkey
        |ORDER BY n_intersect_all DESC, n_except_all DESC, l_partkey
        |LIMIT 50""".stripMargin,
    "w_theil_sen" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |         date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) AS dayn
        |  FROM orders GROUP BY 1),
        |sl AS (
        |  SELECT (CAST(b.rev AS DOUBLE) - CAST(a.rev AS DOUBLE))
        |           / CAST(b.dayn - a.dayn AS DOUBLE) AS slope,
        |         a.dayn AS da, b.dayn AS db
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sl),
        |rk AS (
        |  SELECT slope,
        |         row_number() OVER (ORDER BY slope, da, db) AS rk
        |  FROM sl),
        |med AS (
        |  SELECT sum(slope) / count(*) AS med_slope
        |  FROM rk CROSS JOIN np
        |  WHERE rk = (np.n + 1) // 2 OR rk = (np.n + 2) // 2),
        |ic AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |         list(CAST(rev AS DOUBLE) - med.med_slope
        |           * CAST(dayn AS DOUBLE) ORDER BY
        |             CAST(rev AS DOUBLE) - med.med_slope
        |               * CAST(dayn AS DOUBLE), day) AS ics,
        |         any_value(med.med_slope) AS med_slope
        |  FROM daily CROSS JOIN med)
        |SELECT n_days, np.n AS n_pairs, round(med_slope, 6) AS slope_per_day,
        |       round((ics[CAST((n_days + 1) // 2 AS INTEGER)]
        |         + ics[CAST((n_days + 2) // 2 AS INTEGER)]) / 2.0, 6)
        |         AS intercept
        |FROM ic CROSS JOIN np""".stripMargin,
    "o_histogram_equiheight" ->
      """WITH r AS (
        |  SELECT CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
        |         row_number() OVER (ORDER BY
        |           CAST(l_extendedprice AS DECIMAL(18,2)), l_orderkey,
        |           l_linenumber) AS rk
        |  FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM r)
        |SELECT CAST((rk - 1) * 10 // n.n + 1 AS INTEGER) AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(count(DISTINCT v) AS BIGINT) AS ndv,
        |       CAST(min(v) AS DOUBLE) AS lo, CAST(max(v) AS DOUBLE) AS hi
        |FROM r CROSS JOIN n
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
