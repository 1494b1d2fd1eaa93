package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 13: decision-grade monitoring — isotonic
  * calibration of the quality classifier via the closed-form
  * max-min formula (the PAVA result without iteration), and Wald's
  * sequential probability ratio test as a daily conversion monitor.
  * Both Spark-first with full-replay DuckDB oracles.
  */
object TrainingData16 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // t_isotonic_calibration — isotonic (monotone) calibration of the
  // linear quality classifier over its 10 reliability bins
  // (Zadrozny & Elkan 2002; the step after t_calibration_ece
  // MEASURES miscalibration, this one FIXES it): the isotonic fit
  // is computed by the closed-form minimax identity
  //   iso(i) = max_{j ≤ i} min_{k ≥ i} (S_k − S_{j−1})/(W_k − W_{j−1})
  // — the exact PAVA solution without any iterative pooling, which
  // keeps the whole operator three tiny joins over the ≤10-bin
  // frame (interval sums are EXACT integers off one prefix
  // self-join; every interval rate is ONE double division computed
  // identically on both engines, so the min/max lattice matches
  // bit-for-bit). Scale shape: the corpus reduces through the
  // 10-bin aggregate first; everything after is constant-size
  // (bins² intervals × bins targets ≤ 1000 rows) with the ≤10-row
  // side broadcast.
  // ---------------------------------------------------------------
  val tIsotonicCalibration: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val logit = lit(-0.7) +
      lit(0.8) * (size(toks).cast("double") / lit(100.0)) +
      lit(2.0) * TF.stopwordRatio(col("text")) +
      lit(-1.2) * (TF.avgWordLen(col("text")) / lit(10.0)) +
      lit(1.5) * (size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
    val bins = docs(s, dir)
      .select(least(lit(9L), floor((lit(1.0) / (lit(1.0) + exp(-logit))) *
        10).cast("long")).as("bin"),
        when(TF.qualityScore(col("text")) >= 0.42, 1L).otherwise(0L)
          .as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("w"), sum(col("pos")).cast("long").as("s"))
      .localCheckpoint(eager = false) // prefix self-join (both sides) + final join
    // exact prefix sums over observed bins via a bounded self-join
    // (≤10×10 pairs — no window, no exchange worth naming)
    val pref = bins.alias("a")
      .join(broadcast(bins.select(col("bin").as("b2"), col("w").as("w2"),
        col("s").as("s2"))), col("b2") <= col("a.bin"))
      .groupBy(col("a.bin"))
      .agg(sum(col("w2")).cast("long").as("cw"),
        sum(col("s2")).cast("long").as("cs"))
      .select(col("bin").as("i"), col("cw"), col("cs"))
      .union(s.range(1).select(lit(-1L).as("i"), lit(0L).as("cw"),
        lit(0L).as("cs")))
      .localCheckpoint(eager = false) // both interval endpoints read it
    // intervals (j..k] in prefix space: j−1 = pj.i < pk.i = k
    val intervals = pref.alias("pk")
      .join(broadcast(pref.select(col("i").as("j0"), col("cw").as("w0"),
        col("cs").as("s0"))), col("j0") < col("pk.i"))
      .select((col("j0") + 1).as("j"), col("pk.i").as("k"),
        ((d(col("pk.cs")) - d(col("s0"))) /
          (d(col("pk.cw")) - d(col("w0")))).as("rate"))
    // iso(i) = max_{j<=i} min_{k>=i} rate(j,k) over the bin targets
    val iso = intervals
      .join(broadcast(bins.select(col("bin").as("i"))),
        col("j") <= col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("j")).agg(min(col("rate")).as("mn"))
      .groupBy(col("i")).agg(max(col("mn")).as("iso"))
    bins.join(iso, col("bin") === col("i"))
      .select(col("bin"), col("w").as("n_docs"), col("s").as("n_pos"),
        round(d(col("s")) / d(col("w")), 6).as("raw_rate"),
        round(col("iso"), 6).as("iso_rate"))
      .orderBy(col("bin"))
  }

  // ---------------------------------------------------------------
  // a_sprt_monitor — Wald's sequential probability ratio test
  // (Wald 1945) on the daily purchase share of events: H₀ p=0.18
  // vs H₁ p=0.22 with α = β = 0.05 — the always-valid sequential
  // monitor an experimentation stack runs instead of peeking at a
  // fixed-horizon test. Per day the cumulative log-likelihood
  // ratio is LLR_t = conv_t·ln(p₁/p₀) + (n_t−conv_t)·ln(q₁/q₀),
  // compared against the Wald bounds ±ln(0.95/0.05). The decision
  // grid is the 6-dp ROUNDED llr against the 6-dp bound literal
  // ±2.944439 (the repo's libm policy: ln sits on the 1-ulp floor,
  // so decisions are defined ON the rounded grid, identically on
  // both engines). Cumulative counts ride the two-phase global
  // cumsum over the calendar-bounded day series — no
  // single-partition window. One scan → day aggregate → cumsum.
  // ---------------------------------------------------------------
  val aSprtMonitor: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("conv"))
    val cum = Ranking.withGlobalCumSums(daily,
      Seq("n" -> "cum_n", "conv" -> "cum_conv"), col("day"))
    val llr = round(
      d(col("cum_conv")) * log(lit(0.22) / lit(0.18)) +
        (d(col("cum_n")) - d(col("cum_conv"))) *
          log(lit(0.78) / lit(0.82)), 6)
    cum.select(col("day"), col("n").cast("long").as("n_events"),
        col("conv").cast("long").as("n_purchases"),
        col("cum_n").cast("long").as("cum_n"),
        col("cum_conv").cast("long").as("cum_conv"), llr.as("llr"))
      .withColumn("decision",
        when(col("llr") >= 2.944439, "accept_h1")
          .when(col("llr") <= -2.944439, "accept_h0")
          .otherwise("continue"))
      .orderBy(col("day"))
  }

  val queries: Map[String, Q] = Map(
    "t_isotonic_calibration" -> tIsotonicCalibration,
    "a_sprt_monitor" -> aSprtMonitor)

  val oracles: Map[String, String] = Map(
    "t_isotonic_calibration" ->
      """WITH f AS (
        |  SELECT least(9, CAST(floor(1.0 / (1.0 + exp(-(-0.7
        |             + 0.8 * (CAST(len(toks) AS DOUBLE) / 100.0)
        |             + 2.0 * (CAST(n_stops AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE))
        |             + (-1.2) * ((CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE)) / 10.0)
        |             + 1.5 * (CAST(len(list_distinct(toks)) AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE))))) * 10) AS BIGINT))
        |           AS bin,
        |         CASE WHEN (1.0 - CAST(n_stops AS DOUBLE)
        |             / CAST(len(toks) AS DOUBLE))
        |             * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE), 10.0) / 10.0 >= 0.42
        |          THEN 1 ELSE 0 END AS pos
        |  FROM (SELECT text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |bins AS (
        |  SELECT bin, CAST(count(*) AS BIGINT) AS w,
        |         CAST(sum(pos) AS BIGINT) AS s
        |  FROM f GROUP BY 1),
        |pref AS (
        |  SELECT a.bin AS i, CAST(sum(b.w) AS BIGINT) AS cw,
        |         CAST(sum(b.s) AS BIGINT) AS cs
        |  FROM bins a JOIN bins b ON b.bin <= a.bin
        |  GROUP BY 1
        |  UNION ALL SELECT -1, 0, 0),
        |iv AS (
        |  SELECT p0.i + 1 AS j, pk.i AS k,
        |         (CAST(pk.cs AS DOUBLE) - CAST(p0.cs AS DOUBLE))
        |           / (CAST(pk.cw AS DOUBLE) - CAST(p0.cw AS DOUBLE)) AS rate
        |  FROM pref pk JOIN pref p0 ON p0.i < pk.i),
        |iso AS (
        |  SELECT i, max(mn) AS iso FROM (
        |    SELECT t.bin AS i, iv.j, min(iv.rate) AS mn
        |    FROM iv JOIN bins t ON iv.j <= t.bin AND iv.k >= t.bin
        |    GROUP BY 1, 2)
        |  GROUP BY 1)
        |SELECT bins.bin, bins.w AS n_docs, bins.s AS n_pos,
        |       round(CAST(bins.s AS DOUBLE) / CAST(bins.w AS DOUBLE), 6)
        |         AS raw_rate,
        |       round(iso.iso, 6) AS iso_rate
        |FROM bins JOIN iso ON iso.i = bins.bin
        |ORDER BY bins.bin""".stripMargin,
    "a_sprt_monitor" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
        |           END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |cum AS (
        |  SELECT day, n, conv,
        |         CAST(sum(n) OVER (ORDER BY day) AS BIGINT) AS cum_n,
        |         CAST(sum(conv) OVER (ORDER BY day) AS BIGINT) AS cum_conv
        |  FROM daily),
        |l AS (
        |  SELECT *, round(CAST(cum_conv AS DOUBLE) * ln(0.22 / 0.18)
        |           + (CAST(cum_n AS DOUBLE) - CAST(cum_conv AS DOUBLE))
        |             * ln(0.78 / 0.82), 6) AS llr
        |  FROM cum)
        |SELECT day, n AS n_events, conv AS n_purchases, cum_n, cum_conv, llr,
        |       CASE WHEN llr >= 2.944439 THEN 'accept_h1'
        |            WHEN llr <= -2.944439 THEN 'accept_h0'
        |            ELSE 'continue' END AS decision
        |FROM l ORDER BY day""".stripMargin)
}
