package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 28: a generalized-ESD outlier sweep over the daily
  * revenue series (Rosner 1983, fixed-threshold variant), James–
  * Stein / empirical-Bayes shrinkage of per-source means (James &
  * Stein 1961), and an integer-exact unnormalized Haar wavelet
  * pyramid (Haar 1910 — the multi-resolution energy screen). All
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData33 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_anomaly_esd — generalized ESD outlier sweep (Rosner 1983) on
  // daily order revenue, k = 5 rounds: each round computes the
  // mean/std of the REMAINING series, flags the day with the
  // largest studentized deviation R = |x−x̄|/s, removes it, and
  // repeats — the masking-proof alternative to one-shot z-scores
  // (one big outlier inflates s and hides the rest; re-estimating
  // after each removal unmasks them). Fixed threshold R > 3
  // (documented simplification of the t-based λᵢ — no t-quantiles
  // in either engine). Scale shape: the order stream reduces
  // through ONE exact-decimal daily aggregate; each round is one
  // tiny moment scan + TakeOrdered(1) over the bounded day series
  // (≤ years×366), and the removal set (≤ 5 days) broadcasts.
  // Moments are exact: centi-unit longs for Σx, DECIMAL(38,0) for
  // Σx²; R is a fixed double DAG over them.
  // ---------------------------------------------------------------
  val wAnomalyEsd: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
      .localCheckpoint(eager = false) // scanned once per round (5 rounds)
    var remaining = daily
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (i <- 1 to 5) {
      val mom = remaining.agg(count(lit(1)).as("n"),
        sum(col("m")).cast("long").as("s1"),
        sum((col("m") * col("m")).cast("decimal(38,0)")).as("s2"))
      val scored = remaining.crossJoin(broadcast(mom))
        .withColumn("mean", d(col("s1")) / d(col("n")))
        .withColumn("sd", sqrt((d(col("s2")) -
          d(col("s1")) * d(col("s1")) / d(col("n"))) / (d(col("n")) - 1.0)))
        .withColumn("r", abs(d(col("m")) - col("mean")) / col("sd"))
      val worst = scored.orderBy(desc("r"), col("day")).limit(1)
        .select(lit(i.toLong).as("iteration"), col("day"),
          (d(col("m")) / 100.0).as("revenue"),
          round(col("r"), 6).as("r_stat"), (col("r") > 3.0).as("flagged"))
        .localCheckpoint(eager = false) // consumed by output AND the anti join
      rounds += worst
      remaining = remaining.join(broadcast(worst.select(col("day"))),
        Seq("day"), "left_anti").localCheckpoint(eager = false)
    }
    rounds.reduce(_ unionAll _).orderBy(col("iteration"))
  }

  // ---------------------------------------------------------------
  // a_james_stein — James–Stein / empirical-Bayes shrinkage of
  // per-source mean document length (James & Stein 1961; Efron &
  // Morris 1975): ȳ_g shrinks toward the grand mean of group means
  // with factor c = max(0, 1 − (G−3)·v̄ / S), v̄ the mean of the
  // per-group variances-of-the-mean s²/n_g (pooled within-group s²)
  // and S = Σ_g (ȳ_g − ȳ̄)² — the classic "regress small-sample
  // group means to the prior" stage of per-domain quality scoring.
  // Scale shape: ONE aggregate reduces the corpus to G group rows
  // (n, Σy, Σy² — exact long / DECIMAL(38,0) on integer n_chars);
  // every cross-group float sum (S, v̄) folds in sorted source
  // order over those G rows (the repo float policy), so the whole
  // estimator is bit-stable at any corpus size.
  // ---------------------------------------------------------------
  val aJamesStein: Q = (s, dir) => {
    val g = Tables.table(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).cast("long").as("s1"),
        sum((col("n_chars") * col("n_chars")).cast("decimal(38,0)")).as("s2"))
      .withColumn("mean_g", d(col("s1")) / d(col("n")))
      .withColumn("ss_within", d(col("s2")) -
        d(col("s1")) * d(col("s1")) / d(col("n")))
      .localCheckpoint(eager = false) // consumed by the pooled scalars AND output
    // grand mean of GROUP MEANS and the cross-group sums, folded in
    // sorted source order (G rows)
    val pooled = g.agg(
      count(lit(1)).as("gn"),
      sum(col("n")).cast("long").as("ntot"),
      expr("aggregate(sort_array(collect_list(struct(source, mean_g)))," +
        " 0D, (a, x) -> a + x.mean_g)").as("sum_means"),
      expr("aggregate(sort_array(collect_list(struct(source, ss_within)))," +
        " 0D, (a, x) -> a + x.ss_within)").as("ss_w"),
      expr("aggregate(sort_array(collect_list(struct(source," +
        " CAST(1.0 AS DOUBLE) / CAST(n AS DOUBLE) AS inv_n))), 0D," +
        " (a, x) -> a + x.inv_n)").as("sum_inv_n"))
      .withColumn("grand", col("sum_means") / d(col("gn")))
      .withColumn("s2_pool", col("ss_w") / (d(col("ntot")) - d(col("gn"))))
      .withColumn("vbar", col("s2_pool") * col("sum_inv_n") / d(col("gn")))
    val withS = g.crossJoin(broadcast(pooled))
      .withColumn("dev2",
        (col("mean_g") - col("grand")) * (col("mean_g") - col("grand")))
    val sTot = withS.agg(
      expr("aggregate(sort_array(collect_list(struct(source, dev2)))," +
        " 0D, (a, x) -> a + x.dev2)").as("s_between"))
    withS.crossJoin(broadcast(sTot))
      .withColumn("c", greatest(lit(0.0), lit(1.0) -
        (d(col("gn")) - 3.0) * col("vbar") / col("s_between")))
      .select(col("source"), col("n").as("n_docs"),
        round(col("mean_g"), 6).as("mean_raw"),
        round(col("grand"), 6).as("grand_mean"),
        round(col("c"), 6).as("shrink_factor"),
        round(col("grand") + col("c") * (col("mean_g") - col("grand")), 6)
          .as("mean_shrunk"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // w_haar_decompose — 3-level UNNORMALIZED Haar wavelet pyramid of
  // the daily revenue series (Haar 1910; the multi-resolution
  // energy screen behind change detection and compression): level ℓ
  // pairs consecutive coefficients, s = a + b (approximation),
  // d = a − b (detail); an odd tail coefficient passes through to
  // the next level with no detail (documented). Unnormalized, so
  // every coefficient is an EXACT centi-unit long — no float
  // anywhere; per-level detail energy Σd² rides DECIMAL(38,0).
  // Output: every detail coefficient of levels 1–3 plus the final
  // level-3 approximations, (level, idx)-keyed. Scale shape: the
  // order stream reduces through one exact daily aggregate; the
  // 3 pairing rounds are groupBy((idx−1) div 2) over the bounded
  // day series — the index is a per-level dense row_number over a
  // pre-aggregate (the documented low-cardinality window family).
  // ---------------------------------------------------------------
  val wHaarDecompose: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("v"))
      .withColumn("idx", row_number().over(Grain.bounded(col("day")))
        .cast("long"))
      .select(col("idx"), col("v"))
      .localCheckpoint(eager = false)
    var approx = daily
    val out = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for (lvl <- 1 to 3) {
      val paired = approx
        .withColumn("j", ((col("idx") - 1) / 2).cast("long") + 1)
        .groupBy(col("j"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("v")).cast("long").as("ssum"),
          sum(when(col("idx") % 2 === 1, col("v")).otherwise(-col("v")))
            .cast("long").as("sdiff"))
        .localCheckpoint(eager = false) // consumed by detail output AND next level
      out += paired.filter(col("cnt") === 2)
        .select(lit(lvl.toLong).as("level"), lit("d").as("coef"),
          col("j").as("idx"), col("sdiff").as("value"))
      approx = paired.select(col("j").as("idx"), col("ssum").as("v"))
    }
    out += approx.select(lit(3L).as("level"), lit("s").as("coef"),
      col("idx"), col("v").as("value"))
    out.reduce(_ unionAll _).orderBy(col("level"), col("coef"), col("idx"))
  }

  val queries: Map[String, Q] = Map(
    "w_anomaly_esd" -> wAnomalyEsd,
    "a_james_stein" -> aJamesStein,
    "w_haar_decompose" -> wHaarDecompose)

  /** One unrolled ESD round: moments of the remaining set, worst
    * day, and the shrunken remainder. */
  private def esdRounds(n: Int): String =
    (1 to n).map { i =>
      s"""mo$i AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS s1,
         |         sum(CAST(m AS DECIMAL(38,0)) * m) AS s2
         |  FROM rem${i - 1}),
         |w$i AS MATERIALIZED (
         |  SELECT $i AS iteration, day, m::DOUBLE / 100.0 AS revenue,
         |         round(r, 6) AS r_stat, r > 3.0 AS flagged FROM (
         |    SELECT r.day, r.m,
         |           abs(r.m::DOUBLE - mo.s1::DOUBLE / mo.n::DOUBLE)
         |             / sqrt((mo.s2::DOUBLE - mo.s1::DOUBLE * mo.s1::DOUBLE
         |               / mo.n::DOUBLE) / (mo.n::DOUBLE - 1.0)) AS r
         |    FROM rem${i - 1} r CROSS JOIN mo$i mo)
         |  ORDER BY r DESC, day LIMIT 1),
         |rem$i AS MATERIALIZED (
         |  SELECT day, m FROM rem${i - 1}
         |  WHERE day NOT IN (SELECT day FROM w$i))"""
        .stripMargin
    }.mkString(",\n")

  /** One unrolled Haar pairing level. */
  private def haarLevels(n: Int): String =
    (1 to n).map { l =>
      s"""p$l AS MATERIALIZED (
         |  SELECT ((idx - 1) // 2) + 1 AS j, CAST(count(*) AS BIGINT) AS cnt,
         |         CAST(sum(v) AS BIGINT) AS ssum,
         |         CAST(sum(CASE WHEN idx % 2 = 1 THEN v ELSE -v END)
         |           AS BIGINT) AS sdiff
         |  FROM a${l - 1} GROUP BY 1),
         |a$l AS (SELECT j AS idx, ssum AS v FROM p$l)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "w_anomaly_esd" ->
      s"""WITH rem0 AS MATERIALIZED (
         |  SELECT o_orderdate AS day,
         |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |           AS BIGINT)) AS BIGINT) AS m
         |  FROM orders GROUP BY 1),
         |${esdRounds(5)}
         |SELECT CAST(iteration AS BIGINT) AS iteration, day, revenue,
         |       r_stat, flagged
         |FROM (SELECT * FROM w1 UNION ALL SELECT * FROM w2
         |      UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4
         |      UNION ALL SELECT * FROM w5)
         |ORDER BY iteration""".stripMargin,
    "a_james_stein" ->
      """WITH g AS MATERIALIZED (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(n_chars) AS BIGINT) AS s1,
        |         sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars) AS s2,
        |         CAST(sum(n_chars) AS BIGINT)::DOUBLE / count(*) AS mean_g,
        |         sum(CAST(n_chars AS DECIMAL(38,0)) * n_chars)::DOUBLE
        |           - CAST(sum(n_chars) AS BIGINT)::DOUBLE
        |             * CAST(sum(n_chars) AS BIGINT)::DOUBLE / count(*)
        |           AS ss_within
        |  FROM documents GROUP BY 1),
        |pooled AS (
        |  SELECT CAST(count(*) AS BIGINT) AS gn,
        |         CAST(sum(n) AS BIGINT) AS ntot,
        |         list_sum(list(mean_g ORDER BY source)) AS sum_means,
        |         list_sum(list(ss_within ORDER BY source)) AS ss_w,
        |         list_sum(list(1.0::DOUBLE / n::DOUBLE ORDER BY source))
        |           AS sum_inv_n
        |  FROM g),
        |p2 AS (
        |  SELECT gn, sum_means / gn::DOUBLE AS grand,
        |         (ss_w / (ntot::DOUBLE - gn::DOUBLE)) * sum_inv_n
        |           / gn::DOUBLE AS vbar
        |  FROM pooled),
        |dev AS (
        |  SELECT g.source, g.n, g.mean_g, p2.gn, p2.grand, p2.vbar,
        |         (g.mean_g - p2.grand) * (g.mean_g - p2.grand) AS dev2
        |  FROM g CROSS JOIN p2),
        |stot AS (
        |  SELECT list_sum(list(dev2 ORDER BY source)) AS s_between FROM dev)
        |SELECT source, n AS n_docs,
        |       round(mean_g, 6) AS mean_raw,
        |       round(grand, 6) AS grand_mean,
        |       round(greatest(0.0, 1.0 - (gn::DOUBLE - 3.0) * vbar
        |         / s_between), 6) AS shrink_factor,
        |       round(grand + greatest(0.0, 1.0 - (gn::DOUBLE - 3.0) * vbar
        |         / s_between) * (mean_g - grand), 6) AS mean_shrunk
        |FROM dev CROSS JOIN stot ORDER BY source""".stripMargin,
    "w_haar_decompose" ->
      s"""WITH a0 AS MATERIALIZED (
         |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS idx, v
         |  FROM (SELECT o_orderdate AS day,
         |               CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2))
         |                 * 100 AS BIGINT)) AS BIGINT) AS v
         |        FROM orders GROUP BY 1)),
         |${haarLevels(3)}
         |SELECT level, coef, idx, value FROM (
         |  SELECT CAST(1 AS BIGINT) AS level, 'd' AS coef, j AS idx,
         |         sdiff AS value FROM p1 WHERE cnt = 2
         |  UNION ALL
         |  SELECT CAST(2 AS BIGINT), 'd', j, sdiff FROM p2 WHERE cnt = 2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), 'd', j, sdiff FROM p3 WHERE cnt = 2
         |  UNION ALL
         |  SELECT CAST(3 AS BIGINT), 's', idx, v FROM a3)
         |ORDER BY level, coef, idx""".stripMargin)
}
