package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 41: a McNemar paired comparison of two document
  * filters (do the C4 rules and the linear classifier disagree more
  * than chance? — the right test when both run on the SAME corpus),
  * lead–lag cross-correlation between order volume and revenue (does
  * volume lead revenue? — the bivariate extension of a_autocorr),
  * and a multimodal shard-balance audit (is each packed training
  * shard modality-mixed or accidentally single-modality?). All
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData46 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_mcnemar_filters — McNemar's test on the kept/dropped decisions
  // of two registered filters over the same documents: only the
  // DISCORDANT cells carry information, χ² = (|b−c|−1)²/(b+c) with
  // the continuity correction (McNemar 1947). Both filter rules are
  // the exact expressions of t_c4_filters and t_classifier_infer —
  // testing what actually ships, not a re-derivation. Scale shape:
  // one scan computes both decisions in codegen, one 4-cell
  // aggregate; all integers into one fixed double DAG.
  // ---------------------------------------------------------------
  val aMcnemarFilters: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val base = Tables.table(s, dir, "documents").select(col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      TF.avgWordLen(col("text")).as("awl"),
      size(filter(toks, t => t.isin(TF.stopwords: _*))).cast("long").as("n_stop"),
      array_max(transform(toks, t => length(t))).as("max_wl"),
      col("text").rlike("[{}\\[\\]<>]").as("sym"),
      (size(toks).cast("double") / lit(100.0)).as("x_len"),
      TF.stopwordRatio(col("text")).as("x_stop"),
      (TF.avgWordLen(col("text")) / lit(10.0)).as("x_wlen"),
      (size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .as("x_distinct"))
    val keepA = !(col("n_tokens") < 20) && !(col("n_tokens") > 90) &&
      col("awl") >= 3.0 && col("awl") <= 10.0 && col("n_stop") > 0 &&
      !col("sym") && !(col("max_wl") > 20)
    val keepB = (lit(-0.7) + lit(0.8) * col("x_len") + lit(2.0) * col("x_stop") +
      lit(-1.2) * col("x_wlen") + lit(1.5) * col("x_distinct")) >= 0.0
    val cells = base.agg(
      sum(when(keepA && keepB, 1L).otherwise(0L)).cast("long").as("n_both"),
      sum(when(keepA && !keepB, 1L).otherwise(0L)).cast("long").as("n_a_only"),
      sum(when(!keepA && keepB, 1L).otherwise(0L)).cast("long").as("n_b_only"),
      sum(when(!keepA && !keepB, 1L).otherwise(0L)).cast("long").as("n_neither"))
    val b = d(col("n_a_only")); val c = d(col("n_b_only"))
    val chi2 = (abs(b - c) - lit(1.0)) * (abs(b - c) - lit(1.0)) / (b + c)
    cells.select(col("n_both"), col("n_a_only"), col("n_b_only"),
      col("n_neither"),
      when(col("n_a_only") + col("n_b_only") === 0, lit(null).cast("double"))
        .otherwise(round(chi2, 6)).as("chi2"),
      when(col("n_a_only") + col("n_b_only") === 0, lit("no_discordance"))
        .when(chi2 > 3.841, "filters_differ").otherwise(lit("consistent"))
        .as("verdict"))
  }

  // ---------------------------------------------------------------
  // w_cross_correlation — Pearson correlation between daily order
  // COUNT and daily revenue k days LATER, k = −7..7: a peak at
  // k > 0 means volume leads revenue (pipeline latency); k = 0 is
  // the contemporaneous check. Per lag, the a_corr_regr recipe:
  // exact integer/decimal moments over the aligned pairs into one
  // fixed double formula, round-6 (the >2^53 decimal double-rounding
  // note on a_autocorr applies). Scale shape: the corpus reduces to
  // the calendar-bounded daily series; ±7 shifted copies come from
  // one lag/lead window pass (documented low-cardinality family);
  // the 15-lag explode is constant fan-out.
  // ---------------------------------------------------------------
  private val XcorrMaxLag = 7

  val wCrossCorrelation: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).cast("long").as("x"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("rev"))
    val w = Grain.bounded(col("day"))
    val shifted = (-XcorrMaxLag to XcorrMaxLag).foldLeft(daily) { (df, k) =>
      if (k == 0) df.withColumn("y_0", col("rev"))
      else if (k > 0) df.withColumn(s"y_$k", lead(col("rev"), k).over(w))
      else df.withColumn(s"y_m${-k}", lag(col("rev"), -k).over(w))
    }
    val pairs = shifted.select(col("x"),
      explode(array((-XcorrMaxLag to XcorrMaxLag).map { k =>
        val cn = if (k >= 0) s"y_$k" else s"y_m${-k}"
        struct(lit(k).cast("int").as("k"), col(cn).as("y"))
      }: _*)).as("p"))
      .select(col("x"), col("p.k").as("k"), col("p.y").as("y"))
      .filter(col("y").isNotNull)
    val m = pairs.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("syy"))
    m.select(col("k").as("lag"), col("n").as("n_pairs"),
        round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
          (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
            sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))), 6)
          .as("xcorr"))
      .orderBy(col("lag"))
  }

  // ---------------------------------------------------------------
  // mm_shard_balance — modality mix per packed training shard: the
  // mm_shard_manifest layout (md5-ordered docs, 16384-byte budget,
  // two-phase global cumsum) crossed with the mm_modality_route rule
  // (n_bytes mod 3), reporting per-shard modality counts and the
  // normalized mix entropy H/ln(3). A shard at 0 is single-modality
  // — the interleave a multimodal trainer assumes is gone. Scale
  // shape: inherits the manifest's two-phase cumsum (P carries, no
  // global window); the entropy is a ≤3-term sorted fold per shard.
  // ---------------------------------------------------------------
  val mmShardBalance: Q = (s, dir) => {
    val budget = 16384L
    val m = Tables.table(s, dir, "documents").select(col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("bytes"),
      md5(col("doc_id").cast("string")).as("key"))
    val sharded = Ranking.withGlobalCumSums(m, Seq("bytes" -> "cum"),
        col("key"), col("doc_id"))
      .withColumn("shard", floor((col("cum") - col("bytes")) / lit(budget)))
      .withColumn("modality",
        when(col("bytes") % 3 === 0, "image")
          .when(col("bytes") % 3 === 1, "audio")
          .otherwise("video"))
    val cnt = sharded.groupBy(col("shard"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("modality") === "image", 1L).otherwise(0L))
          .cast("long").as("n_image"),
        sum(when(col("modality") === "audio", 1L).otherwise(0L))
          .cast("long").as("n_audio"),
        sum(when(col("modality") === "video", 1L).otherwise(0L))
          .cast("long").as("n_video"))
    val ent = Seq("n_image", "n_audio", "n_video").map { c =>
      when(col(c) > 0,
        -(d(col(c)) / d(col("n_docs"))) * log(d(col(c)) / d(col("n_docs"))))
        .otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    cnt.select(col("shard"), col("n_docs"), col("n_image"), col("n_audio"),
        col("n_video"),
        round(ent / log(lit(3.0)), 6).as("balance"))
      .orderBy(col("shard"))
  }

  val queries: Map[String, Q] = Map(
    "a_mcnemar_filters" -> aMcnemarFilters,
    "w_cross_correlation" -> wCrossCorrelation,
    "mm_shard_balance" -> mmShardBalance)

  val oracles: Map[String, String] = Map(
    "a_mcnemar_filters" ->
      """WITH f AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
        |s AS (
        |  SELECT doc_id, text,
        |         CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS awl,
        |         len(list_filter(toks, t -> t IN ('the','a','of','and','to')))
        |           AS n_stop,
        |         list_max(list_transform(toks, t -> length(t))) AS max_wl,
        |         regexp_matches(text, '[{}\[\]<>]') AS sym,
        |         CAST(len(toks) AS DOUBLE) / 100.0 AS x_len,
        |         CAST(len(list_filter(toks, t -> t IN ('the','a','of','and','to')))
        |           AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS x_stop,
        |         (CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE)) / 10.0 AS x_wlen,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS x_distinct
        |  FROM f),
        |dec AS (
        |  SELECT NOT (n_tokens < 20) AND NOT (n_tokens > 90)
        |           AND awl >= 3.0 AND awl <= 10.0 AND n_stop > 0
        |           AND NOT sym AND NOT (max_wl > 20) AS keep_a,
        |         -0.7 + 0.8 * x_len + 2.0 * x_stop + (-1.2) * x_wlen
        |           + 1.5 * x_distinct >= 0.0 AS keep_b
        |  FROM s),
        |cells AS (
        |  SELECT CAST(sum(CASE WHEN keep_a AND keep_b THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_both,
        |         CAST(sum(CASE WHEN keep_a AND NOT keep_b THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_a_only,
        |         CAST(sum(CASE WHEN NOT keep_a AND keep_b THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_b_only,
        |         CAST(sum(CASE WHEN NOT keep_a AND NOT keep_b THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_neither
        |  FROM dec)
        |SELECT n_both, n_a_only, n_b_only, n_neither,
        |       CASE WHEN n_a_only + n_b_only = 0 THEN NULL
        |            ELSE round((abs(n_a_only::DOUBLE - n_b_only::DOUBLE) - 1.0)
        |                   * (abs(n_a_only::DOUBLE - n_b_only::DOUBLE) - 1.0)
        |                   / (n_a_only::DOUBLE + n_b_only::DOUBLE), 6)
        |       END AS chi2,
        |       CASE WHEN n_a_only + n_b_only = 0 THEN 'no_discordance'
        |            WHEN (abs(n_a_only::DOUBLE - n_b_only::DOUBLE) - 1.0)
        |                   * (abs(n_a_only::DOUBLE - n_b_only::DOUBLE) - 1.0)
        |                   / (n_a_only::DOUBLE + n_b_only::DOUBLE) > 3.841
        |            THEN 'filters_differ' ELSE 'consistent' END AS verdict
        |FROM cells""".stripMargin,
    "w_cross_correlation" -> {
      val shifts = (-XcorrMaxLag to XcorrMaxLag).map { k =>
        val y =
          if (k == 0) "rev"
          else if (k > 0) s"lead(rev, $k) OVER (ORDER BY day)"
          else s"lag(rev, ${-k}) OVER (ORDER BY day)"
        s"SELECT x, CAST($k AS INTEGER) AS k, $y AS y FROM daily"
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS x,
         |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |           AS BIGINT)) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |pairs AS (
         |  SELECT x, k, y FROM (
         |  $shifts)
         |  WHERE y IS NOT NULL),
         |m AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(y) AS BIGINT) AS sy,
         |         sum(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
         |         sum(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
         |         sum(CAST(y AS DECIMAL(38,0)) * y) AS syy
         |  FROM pairs GROUP BY 1)
         |SELECT k AS lag, n AS n_pairs,
         |       round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
         |         / (sqrt(n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |            * sqrt(n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)),
         |         6) AS xcorr
         |FROM m ORDER BY lag""".stripMargin
    },
    "mm_shard_balance" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS bytes,
        |         md5(CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bytes,
        |         CAST(sum(bytes) OVER (ORDER BY key, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum
        |  FROM m),
        |sharded AS (
        |  SELECT CAST(floor((cum - bytes) / 16384) AS BIGINT) AS shard,
        |         CASE WHEN bytes % 3 = 0 THEN 'image'
        |              WHEN bytes % 3 = 1 THEN 'audio'
        |              ELSE 'video' END AS modality
        |  FROM c),
        |cnt AS (
        |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_image,
        |         CAST(sum(CASE WHEN modality = 'audio' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_audio,
        |         CAST(sum(CASE WHEN modality = 'video' THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_video
        |  FROM sharded GROUP BY 1)
        |SELECT shard, n_docs, n_image, n_audio, n_video,
        |       round((
        |         (CASE WHEN n_image > 0 THEN
        |            -(n_image::DOUBLE / n_docs::DOUBLE)
        |              * ln(n_image::DOUBLE / n_docs::DOUBLE) ELSE 0.0 END)
        |         + (CASE WHEN n_audio > 0 THEN
        |             -(n_audio::DOUBLE / n_docs::DOUBLE)
        |               * ln(n_audio::DOUBLE / n_docs::DOUBLE) ELSE 0.0 END)
        |         + (CASE WHEN n_video > 0 THEN
        |             -(n_video::DOUBLE / n_docs::DOUBLE)
        |               * ln(n_video::DOUBLE / n_docs::DOUBLE) ELSE 0.0 END)
        |       ) / ln(3.0), 6) AS balance
        |FROM cnt ORDER BY shard""".stripMargin)
}
