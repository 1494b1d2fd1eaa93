package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 19: complex-event-processing and multiple-testing
  * audits — a MATCH_RECOGNIZE-lite regex motif counter over per-user
  * event sequences, and a Benjamini–Hochberg FDR sweep over
  * per-shard rate deviations with a deterministic polynomial normal
  * CDF. Both Spark-first with full-replay DuckDB oracles.
  */
object TrainingData24 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // ev_pattern_regex — complex-event-processing lite: each user's
  // event history collapses to an initials string in (ts, event_id)
  // order (c/e/p/s/v), and declarative regex motifs run over it —
  // the SQL:2016 MATCH_RECOGNIZE shape (pattern over ordered rows
  // within a partition) expressed with engine primitives. Motifs:
  // the conversion funnel `vc*p` (view, any clicks, purchase), the
  // onboarding hop `sv`, and the longest error streak `e+`. The
  // patterns are anchored, star-height-1 regular expressions, where
  // Java regex and RE2 agree on leftmost non-overlapping matching —
  // and the cross-engine oracle hash IS the check of that agreement
  // at every gate scale. Scale shape: one shuffle to the per-user
  // sorted collect (the sessionize partition — per-user state never
  // leaves its executor), then pure map-side regex; output is one
  // row per user. Integer counts — exact.
  // ---------------------------------------------------------------
  val evPatternRegex: Q = (s, dir) => {
    val seq = Tables.table(s, dir, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        array_join(expr(
          """transform(
            |  sort_array(collect_list(struct(ts, event_id,
            |    substring(event_type, 1, 1) AS i))),
            |  x -> x.i)""".stripMargin), "").as("trace"))
    seq.select(col("user_id"), col("n_events"),
        size(expr("regexp_extract_all(trace, 'vc*p', 0)")).cast("long")
          .as("n_conversion_motifs"),
        size(expr("regexp_extract_all(trace, 'sv', 0)")).cast("long")
          .as("n_signup_view"),
        coalesce(array_max(expr(
          "transform(regexp_extract_all(trace, 'e+', 0), x -> length(x))")),
          lit(0)).cast("long").as("max_error_streak"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------
  // a_bh_fdr — Benjamini–Hochberg FDR control (1995) over the
  // per-(lang, source) long-document rate: each shard's rate is
  // z-tested against the corpus rate (one-sample two-sided normal
  // approximation), p-values come from the Abramowitz–Stegun 7.1.26
  // erf polynomial — pure +,×,÷,exp arithmetic with shared literal
  // constants, so both engines produce bit-identical doubles where
  // a native erf would diverge by libm — and the BH step-up rule
  // (reject p₍ₖ₎ ≤ α·k/m up to the largest such k) runs over the
  // p-ranked shard frame. The comparison happens on UNROUNDED
  // p-values (identical in both engines); only the published z and
  // p round to 6 dp (the bm25 libm rule — exp is the one libm call,
  // 1-ulp class). Scale shape: one map-side-combining shard
  // aggregate, one broadcast global-rate scalar, then rank + step-up
  // on the ≤|lang×source|-row frame (documented bounded-window
  // class). Counts and rates stay in exact integer space through
  // the micro-unit division.
  // ---------------------------------------------------------------
  val aBhFdr: Q = (s, dir) => {
    val alpha = 0.1
    val cells = Tables.table(s, dir, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_chars") >= 300L, 1L).otherwise(0L)).cast("long")
          .as("n_long"))
    val glob = Tables.table(s, dir, "documents")
      .agg(count(lit(1)).as("n_g"),
        sum(when(col("n_chars") >= 300L, 1L).otherwise(0L)).cast("long")
          .as("n_long_g"))
    // erf(x) ~ 1 - (a1 t + ... + a5 t^5) exp(-x^2), t = 1/(1 + p x),
    // x >= 0 (A&S 7.1.26, |error| < 1.5e-7 — far inside the z grid)
    def erfAS(x: Column): Column = {
      val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
      val poly = t * (lit(0.254829592) +
        t * (lit(-0.284496736) +
          t * (lit(1.421413741) +
            t * (lit(-1.453152027) + t * lit(1.061405429)))))
      lit(1.0) - poly * exp(-(x * x))
    }
    val scored = cells.crossJoin(broadcast(glob))
      .withColumn("rate_micro",
        expr("CAST((n_long * 1000000) div n_docs AS BIGINT)"))
      .withColumn("p_g", d(col("n_long_g")) / d(col("n_g")))
      .withColumn("se",
        sqrt(col("p_g") * (lit(1.0) - col("p_g")) / d(col("n_docs"))))
      .withColumn("z",
        (d(col("n_long")) / d(col("n_docs")) - col("p_g")) / col("se"))
      .withColumn("p_raw",
        lit(1.0) - erfAS(abs(col("z")) / sqrt(lit(2.0))))
    val m = Grain.whole
    val ranked = scored
      .withColumn("rank", row_number().over(
        Grain.bounded(col("p_raw"), col("lang"), col("source"))).cast("long"))
      .withColumn("m", count(lit(1)).over(m))
      .withColumn("pass_k",
        when(col("p_raw") <= lit(alpha) * d(col("rank")) / d(col("m")),
          col("rank")))
      .withColumn("k_star", coalesce(max(col("pass_k")).over(m), lit(0L)))
    ranked.select(col("lang"), col("source"), col("n_docs"),
        (col("rate_micro") / lit(1000000.0)).as("long_rate"),
        round(col("z"), 6).as("z"),
        round(col("p_raw"), 6).as("p_value"),
        col("rank"), (col("rank") <= col("k_star")).as("significant"),
        lit(alpha).as("alpha"))
      .orderBy(col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "ev_pattern_regex" -> evPatternRegex,
    "a_bh_fdr" -> aBhFdr)

  val oracles: Map[String, String] = Map(
    "ev_pattern_regex" ->
      """WITH traces AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         string_agg(substr(event_type, 1, 1), ''
        |           ORDER BY ts, event_id) AS trace
        |  FROM events GROUP BY 1)
        |SELECT user_id, n_events,
        |       CAST(len(regexp_extract_all(trace, 'vc*p')) AS BIGINT)
        |         AS n_conversion_motifs,
        |       CAST(len(regexp_extract_all(trace, 'sv')) AS BIGINT)
        |         AS n_signup_view,
        |       CAST(coalesce(list_max(list_transform(
        |           regexp_extract_all(trace, 'e+'), x -> length(x))), 0)
        |         AS BIGINT) AS max_error_streak
        |FROM traces ORDER BY user_id""".stripMargin,
    "a_bh_fdr" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_long
        |  FROM documents GROUP BY 1, 2),
        |gstats AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_g,
        |         CAST(sum(CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_long_g
        |  FROM documents),
        |scored AS (
        |  SELECT lang, source, n_docs,
        |         CAST((n_long * 1000000) // n_docs AS BIGINT) AS rate_micro,
        |         (CAST(n_long AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |           - CAST(n_long_g AS DOUBLE) / CAST(n_g AS DOUBLE))
        |         / sqrt(CAST(n_long_g AS DOUBLE) / CAST(n_g AS DOUBLE)
        |             * (1.0 - CAST(n_long_g AS DOUBLE) / CAST(n_g AS DOUBLE))
        |             / CAST(n_docs AS DOUBLE)) AS z
        |  FROM cells CROSS JOIN gstats),
        |pvals AS (
        |  SELECT *,
        |         1.0 - (1.0 - (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |           * (0.254829592
        |             + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |             * (-0.284496736
        |               + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |               * (1.421413741
        |                 + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |                 * (-1.453152027
        |                   + (1.0 / (1.0 + 0.3275911 * (abs(z) / sqrt(2.0))))
        |                   * 1.061405429))))
        |           * exp(-((abs(z) / sqrt(2.0)) * (abs(z) / sqrt(2.0)))))
        |           AS p_raw
        |  FROM scored),
        |ranked AS (
        |  SELECT *,
        |         CAST(row_number() OVER (ORDER BY p_raw, lang, source)
        |           AS BIGINT) AS rank,
        |         CAST(count(*) OVER () AS BIGINT) AS m
        |  FROM pvals),
        |kstar AS (
        |  SELECT *, coalesce(max(CASE WHEN p_raw <= 0.1
        |           * CAST(rank AS DOUBLE) / CAST(m AS DOUBLE)
        |         THEN rank END) OVER (), 0) AS k_star
        |  FROM ranked)
        |SELECT lang, source, n_docs, rate_micro / 1000000.0 AS long_rate,
        |       round(z, 6) AS z, round(p_raw, 6) AS p_value, rank,
        |       rank <= k_star AS significant, 0.1 AS alpha
        |FROM kstar ORDER BY rank""".stripMargin)
}
