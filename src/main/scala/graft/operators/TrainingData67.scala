package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-11 batch 67: trainer-facing planning audits — packing
  * efficiency (how much of the token budget the greedy
  * never-split-a-doc packer actually fills, per shard), a
  * differentially-private corpus statistic with DETERMINISTIC
  * Laplace replay (the publishable-number path next to the existing
  * DP top-k), and quality-curriculum phase planning (the
  * easy-to-hard schedule over per-language quality quantiles).
  * Full-replay DuckDB oracles.
  */
object TrainingData67 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // t_pack_efficiency — the waste audit for t_pack_sequences' greedy
  // packer: documents never split across bins, so a bin can overflow
  // its 2048-token target and the bin COUNT can exceed the ideal
  // ⌈tokens/target⌉ lower bound. Per shard: actual bins vs ideal
  // bins, fill ratio, and the largest single bin (the batch-shape
  // outlier a trainer's OOM risk rides on). Same per-shard window
  // cumsum as the packer — 16 parallel sorts, never global.
  // ---------------------------------------------------------------
  private val PackTarget = 2048L

  val tPackEfficiency: Q = (s, dir) => {
    val keyed = docs(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_tok"),
      md5(col("doc_id").cast("string")).as("key"))
      .withColumn("shard", substring(col("key"), 1, 1))
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bins = keyed
      .withColumn("bin",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / PackTarget))
      .groupBy(col("shard"), col("bin"))
      .agg(sum(col("n_tok")).as("bin_tokens"))
    bins.groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_bins"),
        sum(col("bin_tokens")).cast("long").as("total_tokens"),
        max(col("bin_tokens")).cast("long").as("max_bin_tokens"))
      .select(col("shard"), col("n_bins"), col("total_tokens"),
        ceil(d(col("total_tokens")) / lit(PackTarget.toDouble)).cast("long")
          .as("ideal_bins"),
        col("max_bin_tokens"),
        round(d(col("total_tokens")) /
          (d(col("n_bins")) * lit(PackTarget.toDouble)), 6).as("fill_ratio"))
      .orderBy(col("shard"))
  }

  // ---------------------------------------------------------------
  // a_dp_mean — ε-differentially-private per-language mean document
  // length (clamp-to-[0,B] bounded mean, Laplace noise with
  // sensitivity B/(n·ε)): the publishable corpus statistic. The
  // Laplace draw is DETERMINISTIC — u = md5-uniform of the language
  // key (the dataset-release convention every dp_* op here uses:
  // reproducible releases, and the oracle replays noise exactly) via
  // inverse CDF −(B/nε)·sign(u−½)·ln(1−2|u−½|). One tiny aggregate
  // per language; the clamp and sums are exact integers until the
  // final division.
  // ---------------------------------------------------------------
  private val DpClampB = 1000L
  private val DpEpsilon = 1.0

  val aDpMean: Q = (s, dir) => {
    val scale = lit(DpClampB.toDouble) / (lit(DpEpsilon))
    val agg = docs(s, dir)
      .select(col("lang"), least(col("n_chars"), lit(DpClampB)).as("v"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("v")).cast("long").as("clamped_sum"))
    agg
      .withColumn("u",
        (conv(substring(md5(concat(lit("dpmean:"), col("lang"))), 1, 13),
          16, 10).cast("double") + 1) / lit(4503599627370496.0))
      .withColumn("noise",
        -(scale / d(col("n_docs"))) * signum(col("u") - 0.5) *
          log(lit(1.0) - lit(2.0) * abs(col("u") - 0.5)))
      .select(col("lang"), col("n_docs"),
        round(d(col("clamped_sum")) / d(col("n_docs")), 6)
          .as("clamped_mean"),
        round(d(col("clamped_sum")) / d(col("n_docs")) + col("noise"), 6)
          .as("dp_mean"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // t_curriculum_phases — easy-to-hard curriculum planning: per
  // language, quality-score quartiles (ntile over the unique
  // (quality, doc_id) order) become training phases; the plan rows
  // are each phase's doc/token budget and its quality range. The
  // window partitions per LANGUAGE (the t_length_deciles shape) —
  // parallel over languages, never a global sort. min/max are
  // order-free exact; token sums integer.
  // ---------------------------------------------------------------
  val tCurriculumPhases: Q = (s, dir) => {
    val scored = docs(s, dir).select(col("lang"), col("doc_id"),
      TF.tokenCount(col("text")).as("n_tok"),
      TF.qualityScore(col("text")).as("q"))
    val w = Window.partitionBy(col("lang")).orderBy(col("q"), col("doc_id"))
    scored
      .withColumn("phase", ntile(4).over(w).cast("long"))
      .groupBy(col("lang"), col("phase"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        round(min(col("q")), 6).as("min_quality"),
        round(max(col("q")), 6).as("max_quality"))
      .orderBy(col("lang"), col("phase"))
  }

  val queries: Map[String, Q] = Map(
    "t_pack_efficiency" -> tPackEfficiency,
    "a_dp_mean" -> aDpMean,
    "t_curriculum_phases" -> tCurriculumPhases)

  val oracles: Map[String, String] = Map(
    "t_pack_efficiency" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
         |         md5(CAST(doc_id AS VARCHAR)) AS key,
         |         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
         |  FROM documents),
         |binned AS (
         |  SELECT shard,
         |         CAST(floor((SUM(n_tok) OVER (PARTITION BY shard
         |             ORDER BY key, doc_id
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             - n_tok) / $PackTarget.0) AS BIGINT) AS bin,
         |         n_tok
         |  FROM keyed),
         |bins AS (
         |  SELECT shard, bin, SUM(n_tok) AS bin_tokens
         |  FROM binned GROUP BY 1, 2)
         |SELECT shard, CAST(count(*) AS BIGINT) AS n_bins,
         |       CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
         |       CAST(ceil(SUM(bin_tokens)::DOUBLE / $PackTarget.0) AS BIGINT)
         |         AS ideal_bins,
         |       CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
         |       round(SUM(bin_tokens)::DOUBLE
         |         / (count(*)::DOUBLE * $PackTarget.0), 6) AS fill_ratio
         |FROM bins GROUP BY shard ORDER BY shard""".stripMargin,
    "a_dp_mean" ->
      s"""WITH agg AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(least(n_chars, $DpClampB)) AS BIGINT)
         |           AS clamped_sum
         |  FROM documents GROUP BY lang),
         |noised AS (
         |  SELECT lang, n_docs, clamped_sum,
         |         (CAST(list_reduce(list_transform(
         |              string_split(substr(md5('dpmean:' || lang), 1, 13), ''),
         |              c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
         |            (a, b) -> a * 16 + b) + 1 AS DOUBLE)
         |           / 4503599627370496.0) AS u
         |  FROM agg)
         |SELECT lang, n_docs,
         |       round(clamped_sum::DOUBLE / n_docs::DOUBLE, 6)
         |         AS clamped_mean,
         |       round(clamped_sum::DOUBLE / n_docs::DOUBLE
         |         + (-($DpClampB.0 / $DpEpsilon / n_docs::DOUBLE)
         |            * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5))), 6)
         |         AS dp_mean
         |FROM noised ORDER BY lang""".stripMargin,
    "t_curriculum_phases" ->
      """WITH scored AS (
        |  SELECT lang, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |           * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
        |                   / CAST(n_tokens AS DOUBLE), 10.0) / 10.0 AS q
        |  FROM (SELECT lang, doc_id, text,
        |               len(string_split(text, ' ')) AS n_tokens,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |phased AS (
        |  SELECT lang, n_tok, q,
        |         CAST(ntile(4) OVER (PARTITION BY lang
        |           ORDER BY q, doc_id) AS BIGINT) AS phase
        |  FROM scored)
        |SELECT lang, phase, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       round(min(q), 6) AS min_quality,
        |       round(max(q), 6) AS max_quality
        |FROM phased GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
