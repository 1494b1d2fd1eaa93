package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-10 batch 55: the span SCRUB that operationalizes
  * dedup_exact_substring (keep-first removal of verbatim spans from
  * later documents — the Lee et al. 2022 memorization scrub's edit
  * step, expressed as per-doc interval-union over the island
  * surface), and MRR@10 / MAP@10 label-relevance retrieval eval (the
  * two standard IR metrics the sim_* family was still missing next
  * to NDCG). Full-replay DuckDB oracles for both.
  */
object TrainingData55 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_substring_scrub — per-document removal ledger under the
  // keep-first policy: every island (maximal shared run from
  // TrainingData54.substringIslands) projects an interval
  // [pb_start, pb_start + run + L − 2] into its LATER doc (db — the
  // earlier doc keeps its text); per doc the intervals from ALL
  // earlier partners merge by the classic sweep (running max of
  // interval end over start order → break where a start clears it →
  // island sum), giving exact tokens_removed / n_intervals per doc.
  // Scale shape: island generation is the df-capped anchor pipeline
  // (linear-ish, see dedup_exact_substring); the merge windows
  // partition per doc — frames bounded by a doc's interval count,
  // parallel over the corpus. Integer token arithmetic throughout.
  // ---------------------------------------------------------------
  /** Pair-tier removal intervals under keep-first: every island
    * projects [s, e] token intervals into its LATER doc. */
  private[operators] def pairTierIntervals(docs: DataFrame, l: Int,
      maxDf: Int): DataFrame =
    TrainingData54.substringIslands(docs, l, maxDf)
      .select(col("db").as("doc_id"),
        (col("pa_start") + col("diag")).as("s"),
        (col("pa_start") + col("diag") + col("run") + lit(l - 2)).as("e"))
      .distinct() // the same span shared with several earlier docs

  /** Interval-union sweep → per-doc removal ledger. `iv` carries
    * (doc_id, s, e) token intervals (inclusive); overlapping or
    * touching intervals merge per doc (running max of e over start
    * order), then the ledger joins token counts. The window frames
    * are bounded by a single doc's interval count — parallel over
    * the corpus, never a corpus-wide frame. */
  private[operators] def mergeScrubLedger(docs: DataFrame,
      iv: DataFrame): DataFrame = {
    val byStart = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
    val merged = iv
      .withColumn("prev_max",
        max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("brk", when(col("prev_max").isNull ||
        col("s") > col("prev_max"), 1L).otherwise(0L))
      .withColumn("grp", sum(col("brk")).over(
        byStart.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
    val perDoc = merged.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_intervals"),
        sum(col("e") - col("s") + 1).cast("long").as("tokens_removed"))
    perDoc
      .join(docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens")), "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("tokens_removed"),
        col("n_intervals"),
        round(d(col("tokens_removed")) / d(col("n_tokens")), 6)
          .as("removed_ratio"))
      .orderBy(col("doc_id"))
  }

  /** DataFrame-level entry (any (doc_id, text) input) — the spec
    * surface for the interval-merge fixtures. Pair tier only: spans
    * whose grams exceed maxDf are handled by the high-df tier
    * ([[TrainingData63.fullSubstringScrubOf]]). */
  def substringScrubOf(docsDf: DataFrame, l: Int, maxDf: Int): DataFrame = {
    val docs = docsDf.select(col("doc_id"), col("text"))
    mergeScrubLedger(docs, pairTierIntervals(docs, l, maxDf))
  }

  val dedupSubstringScrub: Q = (s, dir) =>
    substringScrubOf(
      Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
      TrainingData54.SubstrL, TrainingData54.SubstrMaxDf)

  // ---------------------------------------------------------------
  // sim_mrr_map — MRR@10 and MAP@10 of the exact cosine retrieval
  // under label relevance (a neighbor is relevant iff it carries the
  // query's label — the standard proxy eval when no judgments
  // exist). Per query: reciprocal rank of the first relevant hit,
  // average precision = mean of precision@k over the relevant ranks
  // (0 when none); corpus MRR/MAP = the per-query means, folded in
  // query_id order (sorted fold — bit-stable under any partitioning,
  // the round-6 discipline). Scale shape: broadcast queries against
  // one corpus scan, per-query top-10 window, then a ≤10-row frame
  // per query; the mean folds a 10-element list on the driver-free
  // single row. Integer hit counts; divisions at the end.
  // ---------------------------------------------------------------
  private val MrrK = 10

  val simMrrMap: Q = (s, dir) => {
    val base = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Similarity.toDoubleArr(col("embedding")).as("e"))
    val q = broadcast(base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"),
        col("e").as("qe")))
    val ranked = q.join(base.select(col("vec_id").as("neighbor_id"),
          col("label"), col("e")),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("qlabel"), col("neighbor_id"),
        col("label"), Similarity.cosine(col("qe"), col("e")).as("cos"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
        .orderBy(desc("cos"), col("neighbor_id"))))
      .filter(col("rk") <= MrrK)
      .withColumn("rel", when(col("label") === col("qlabel"), 1L).otherwise(0L))
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("rk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perQuery = ranked
      .withColumn("cum_rel", sum(col("rel")).over(wCum))
      .groupBy(col("query_id"))
      .agg(sum(col("rel")).cast("long").as("n_relevant_at_10"),
        min(when(col("rel") === 1L, col("rk"))).as("first_rel_rk"),
        // Σ over relevant ranks of precision@k, folded in rank order
        expr("aggregate(sort_array(collect_list(named_struct(" +
          "'rk', rk, 'pk', CASE WHEN rel = 1 THEN CAST(cum_rel AS DOUBLE)" +
          " / CAST(rk AS DOUBLE) ELSE 0D END))), 0D," +
          " (a, q) -> a + q.pk)").as("ap_sum"))
      .select(col("query_id"), col("n_relevant_at_10"),
        coalesce(lit(1.0) / d(col("first_rel_rk")), lit(0.0)).as("rr"),
        when(col("n_relevant_at_10") > 0,
          col("ap_sum") / d(col("n_relevant_at_10"))).otherwise(lit(0.0))
          .as("ap"))
      .localCheckpoint(eager = false) // output rows AND the corpus-mean fold
    def fold(v: String): Column =
      expr(s"aggregate(sort_array(collect_list(struct(query_id, $v))), 0D," +
        s" (a, q) -> a + q.$v)")
    val summary = perQuery.agg(
      (fold("rr") / d(count(lit(1)))).as("mrr_at_10"),
      (fold("ap") / d(count(lit(1)))).as("map_at_10"))
    perQuery.crossJoin(broadcast(summary))
      .select(col("query_id"), col("n_relevant_at_10"),
        round(col("rr"), 6).as("reciprocal_rank"),
        round(col("ap"), 6).as("avg_precision"),
        round(col("mrr_at_10"), 6).as("mrr_at_10"),
        round(col("map_at_10"), 6).as("map_at_10"))
      .orderBy(col("query_id"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_substring_scrub" -> dedupSubstringScrub,
    "sim_mrr_map" -> simMrrMap)

  private val SubL = TrainingData54.SubstrL
  private val SubDf = TrainingData54.SubstrMaxDf

  val oracles: Map[String, String] = Map(
    "dedup_substring_scrub" ->
      s"""WITH dcs AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |  WHERE len(string_split(text, ' ')) >= $SubL),
         |g AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $SubL + 2)) AS pos, ts
         |  FROM dcs),
         |g2 AS (
         |  SELECT doc_id, pos,
         |         array_to_string(ts[pos:pos + ${SubL - 1}], ' ') AS gram
         |  FROM g),
         |dfreq AS (
         |  SELECT gram FROM (
         |    SELECT gram, count(DISTINCT doc_id) AS df FROM g2 GROUP BY 1)
         |  WHERE df BETWEEN 2 AND $SubDf),
         |kept AS (SELECT g2.* FROM g2 JOIN dfreq USING (gram)),
         |m AS (
         |  SELECT a.doc_id AS da, b.doc_id AS db, a.pos AS pa,
         |         b.pos - a.pos AS diag
         |  FROM kept a JOIN kept b
         |    ON a.gram = b.gram AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT da, db, diag, pa,
         |         pa - row_number() OVER (PARTITION BY da, db, diag
         |           ORDER BY pa) AS isl
         |  FROM m),
         |runs AS (
         |  SELECT da, db, diag, isl, count(*) AS run, min(pa) AS pa_start
         |  FROM r GROUP BY 1, 2, 3, 4),
         |iv AS (
         |  SELECT DISTINCT db AS doc_id, pa_start + diag AS s,
         |         pa_start + diag + run + ${SubL - 2} AS e
         |  FROM runs),
         |m1 AS (
         |  SELECT doc_id, s, e,
         |         max(e) OVER (PARTITION BY doc_id ORDER BY s, e
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |           AS prev_max
         |  FROM iv),
         |m2 AS (
         |  SELECT doc_id, s, e,
         |         sum(CASE WHEN prev_max IS NULL OR s > prev_max
         |           THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id
         |           ORDER BY s, e
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
         |  FROM m1),
         |mg AS (
         |  SELECT doc_id, grp, min(s) AS s, max(e) AS e
         |  FROM m2 GROUP BY 1, 2),
         |per_doc AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_intervals,
         |         CAST(sum(e - s + 1) AS BIGINT) AS tokens_removed
         |  FROM mg GROUP BY 1),
         |toks AS (
         |  SELECT doc_id,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |SELECT p.doc_id, t.n_tokens, p.tokens_removed, p.n_intervals,
         |       round(p.tokens_removed::DOUBLE / t.n_tokens::DOUBLE, 6)
         |         AS removed_ratio
         |FROM per_doc p JOIN toks t USING (doc_id)
         |ORDER BY p.doc_id""".stripMargin,
    "sim_mrr_map" ->
      s"""WITH e0 AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |ranked AS (
         |  SELECT query_id, qlabel, neighbor_id, label, rk FROM (
         |    SELECT q.vec_id AS query_id, q.label AS qlabel,
         |           n.vec_id AS neighbor_id, n.label AS label,
         |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |             list_sum(list_transform(range(1, len(q.e) + 1),
         |                 i -> q.e[i] * n.e[i]))
         |               / (sqrt(list_sum(list_transform(range(1, len(q.e) + 1),
         |                    i -> q.e[i] * q.e[i])))
         |                  * sqrt(list_sum(list_transform(range(1, len(n.e) + 1),
         |                      i -> n.e[i] * n.e[i]))))
         |             DESC, n.vec_id) AS rk
         |    FROM e0 q CROSS JOIN e0 n
         |    WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id)
         |  WHERE rk <= $MrrK),
         |rel AS (
         |  SELECT query_id, rk,
         |         CASE WHEN label = qlabel THEN 1 ELSE 0 END AS rel,
         |         sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY query_id ORDER BY rk
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS cum_rel
         |  FROM ranked),
         |per_q AS (
         |  SELECT query_id,
         |         CAST(sum(rel) AS BIGINT) AS n_relevant_at_10,
         |         coalesce(1.0 / CAST(min(CASE WHEN rel = 1 THEN rk END)
         |           AS DOUBLE), 0.0) AS rr,
         |         CASE WHEN sum(rel) > 0 THEN
         |           list_sum(list(CASE WHEN rel = 1
         |             THEN cum_rel::DOUBLE / rk::DOUBLE ELSE 0.0 END
         |             ORDER BY rk)) / CAST(sum(rel) AS DOUBLE)
         |         ELSE 0.0 END AS ap
         |  FROM rel GROUP BY 1),
         |summary AS (
         |  SELECT list_sum(list(rr ORDER BY query_id))
         |           / CAST(count(*) AS DOUBLE) AS mrr_at_10,
         |         list_sum(list(ap ORDER BY query_id))
         |           / CAST(count(*) AS DOUBLE) AS map_at_10
         |  FROM per_q)
         |SELECT query_id, n_relevant_at_10,
         |       round(rr, 6) AS reciprocal_rank,
         |       round(ap, 6) AS avg_precision,
         |       round(mrr_at_10, 6) AS mrr_at_10,
         |       round(map_at_10, 6) AS map_at_10
         |FROM per_q CROSS JOIN summary
         |ORDER BY query_id""".stripMargin)
}
