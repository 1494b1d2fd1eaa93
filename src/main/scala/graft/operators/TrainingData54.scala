package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-10 batch 54: exact-substring dedup (the train-set
  * memorization scrub — long verbatim token spans shared across
  * documents, the capability class of Lee et al. 2022's
  * "Deduplicating Training Data Makes Language Models Better",
  * re-expressed as anchor shingles + diagonal run-merging instead of
  * a suffix array), and a rerank-agreement audit (Kendall τ between
  * a truncated-embedding retrieval order and its full-embedding
  * rerank — the bi-encoder-vs-reranker consistency measurement that
  * decides whether the cheap first stage can be trusted). Both carry
  * full-replay DuckDB oracles.
  *
  * Reference behavior basis: the reference pipeline's dedup surface
  * is key-level (SURVEY §2.8); these extend the engine's corpus
  * toolkit with public algorithms, Spark-first.
  */
object TrainingData54 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_exact_substring — pairs of documents sharing a verbatim
  // token span of ≥ L tokens, with the EXACT maximal shared span
  // length per pair. Formulation: every L-token shingle is an
  // anchor; two docs share a span of length S ≥ L iff all S−L+1 of
  // its anchors match at consecutive positions on one (pos_b −
  // pos_a) diagonal, so max span = L − 1 + longest consecutive
  // anchor run per (pair, diagonal) — the gaps-and-islands trick
  // (pos − row_number), never a suffix array and never a quadratic
  // string compare. Scale shape: anchors are df-capped BEFORE the
  // postings self-join (grams in more than MaxDf docs are dropped —
  // boilerplate by definition, same discipline as
  // t_split_contamination's ContaminationMaxDf), so per-gram pair
  // work is ≤ MaxDf²/2; the run windows partition by (pair,
  // diagonal) — parallel over pairs, frame bounded by doc length.
  // Everything downstream of the cap is exact integer arithmetic.
  // ---------------------------------------------------------------
  private[graft] val SubstrL = 10
  private[graft] val SubstrMaxDf = 64

  /** Island-level surface: one row per maximal consecutive anchor
    * run — (da, db, diag, pa_start, run), where the shared span in
    * doc a starts at token pa_start (1-based) with length l−1+run
    * (and at pa_start+diag in doc b). [[exactSubstringOf]] aggregates
    * these per pair; the scrub operator (TrainingData55) turns the
    * doc-b projections into removal intervals. */
  def substringIslands(docsDf: DataFrame, l: Int, maxDf: Int): DataFrame = {
    require(l >= 2, "anchor length must be at least 2 tokens")
    require(maxDf >= 2, "df cap below 2 drops every pair-producing gram")
    islandsFromGrams(
      gramPostings(docsDf, l).localCheckpoint(eager = false), // df count + join sides
      maxDf)
  }

  /** Token-position postings — one row per (doc, pos, gram). Shared
    * by the pair tier and the high-df tier (TrainingData63), which
    * MUST agree on the gram universe or spans could fall between the
    * tiers; the composed full scrub checkpoints this once and feeds
    * both. One shingle string per position; docs shorter than L
    * produce no anchors (sequence(1, size-L+1) would run DESCENDING
    * when size < L — the filter is load-bearing, not cosmetic). */
  private[operators] def gramPostings(docsDf: DataFrame, l: Int): DataFrame =
    docsDf
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .filter(size(col("ts")) >= l)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(1, size(ts) - $l + 1)," +
          s" i -> array_join(slice(ts, i, $l), ' '))")))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("gram"))

  private[operators] def islandsFromGrams(grams: DataFrame,
      maxDf: Int): DataFrame = {
    // df-cap before the self-join: a gram in > maxDf docs is
    // boilerplate (and its pair fan-out quadratic); df >= 2 is pure
    // pruning — a single-doc gram can't anchor a pair
    val dfreq = grams.groupBy(col("gram"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("gram"))
    val kept = grams.join(dfreq, Seq("gram"))
    val m = kept.alias("a").join(kept.alias("b"),
        col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.pos").as("pa"), (col("b.pos") - col("a.pos")).as("diag"))
    // islands: consecutive anchor positions on one diagonal share
    // pa − row_number; run r ⇒ shared span of exactly L − 1 + r
    val w = Window.partitionBy(col("da"), col("db"), col("diag"))
      .orderBy(col("pa"))
    m.withColumn("isl", col("pa") - row_number().over(w))
      .groupBy(col("da"), col("db"), col("diag"), col("isl"))
      .agg(count(lit(1)).as("run"), min(col("pa")).as("pa_start"))
      .select(col("da"), col("db"), col("diag"), col("pa_start"), col("run"))
  }

  /** DataFrame-level entry (any (doc_id, text) input) — the spec
    * surface for the planted-span fixture. */
  def exactSubstringOf(docsDf: DataFrame, l: Int, maxDf: Int): DataFrame =
    substringIslands(docsDf, l, maxDf)
      .groupBy(col("da"), col("db"))
      .agg((max(col("run")) + lit(l - 1)).cast("long").as("span_tokens"),
        sum(col("run")).cast("long").as("n_anchors"),
        countDistinct(col("diag")).cast("long").as("n_diagonals"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("span_tokens"), col("n_anchors"), col("n_diagonals"))
      .orderBy(col("doc_a"), col("doc_b"))

  val dedupExactSubstring: Q = (s, dir) =>
    exactSubstringOf(
      Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
      SubstrL, SubstrMaxDf)

  // ---------------------------------------------------------------
  // r_rerank_agreement — first-stage-vs-reranker consistency audit:
  // retrieve top-10 per query by PREFIX-16 cosine (the cheap
  // bi-encoder / Matryoshka-truncated first stage, cf.
  // sim_matryoshka_recall), rerank those 10 by FULL 64-dim cosine
  // (the expensive second stage), and report Kendall τ between the
  // two orders per query — τ ≈ 1 means the cheap stage already
  // orders like the reranker (rerank depth can shrink); low τ means
  // the first stage only gates, never orders. No ties by
  // construction (row_number with a vec_id tiebreak on both sides),
  // so τ = (C − D) / (k(k−1)/2) over the 45 candidate pairs —
  // bounded per query. Scale shape: queries broadcast against the
  // corpus scan (the registered brute-force baseline); the pair fold
  // is top-k² per query, constant; integer concordance counts + one
  // division.
  // ---------------------------------------------------------------
  private val RerankK = 10
  private val RerankPrefixDim = 16

  val rRerankAgreement: Q = (s, dir) => {
    val base = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
    val q = broadcast(base.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("e").as("qe")))
    val scored = q.join(base.select(col("vec_id").as("neighbor_id"), col("e")),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosine(slice(col("qe"), 1, RerankPrefixDim),
          slice(col("e"), 1, RerankPrefixDim)).as("cos_bi"),
        Similarity.cosine(col("qe"), col("e")).as("cos_full"))
    val cand = scored
      .withColumn("bi_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("cos_bi"), col("neighbor_id"))))
      .filter(col("bi_rank") <= RerankK)
      .withColumn("full_rank", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("cos_full"), col("neighbor_id"))))
      .localCheckpoint(eager = false) // both pair-join sides + the top-1 probe
    val pairs = cand.alias("a").join(cand.alias("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.neighbor_id") < col("b.neighbor_id"))
      .select(col("a.query_id").as("query_id"),
        ((col("a.bi_rank") - col("b.bi_rank")) *
          (col("a.full_rank") - col("b.full_rank"))).as("prod"))
    val agg = pairs.groupBy(col("query_id"))
      .agg(sum(when(col("prod") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_concordant"),
        sum(when(col("prod") < 0, 1L).otherwise(0L)).cast("long")
          .as("n_discordant"))
    val top1 = cand.filter(col("full_rank") === 1)
      .select(col("query_id"), col("bi_rank").cast("long")
        .as("rerank_top1_bi_rank"))
    agg.join(top1, Seq("query_id"))
      .select(col("query_id"), col("n_concordant"), col("n_discordant"),
        round((d(col("n_concordant")) - d(col("n_discordant"))) /
          (d(col("n_concordant")) + d(col("n_discordant"))), 6)
          .as("kendall_tau"),
        col("rerank_top1_bi_rank"))
      .orderBy(col("query_id"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_exact_substring" -> dedupExactSubstring,
    "r_rerank_agreement" -> rRerankAgreement)

  val oracles: Map[String, String] = Map(
    "dedup_exact_substring" ->
      s"""WITH dcs AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |  WHERE len(string_split(text, ' ')) >= $SubstrL),
         |g AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $SubstrL + 2)) AS pos, ts
         |  FROM dcs),
         |g2 AS (
         |  SELECT doc_id, pos,
         |         array_to_string(ts[pos:pos + ${SubstrL - 1}], ' ') AS gram
         |  FROM g),
         |dfreq AS (
         |  SELECT gram FROM (
         |    SELECT gram, count(DISTINCT doc_id) AS df FROM g2 GROUP BY 1)
         |  WHERE df BETWEEN 2 AND $SubstrMaxDf),
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
         |  SELECT da, db, diag, isl, count(*) AS run
         |  FROM r GROUP BY 1, 2, 3, 4)
         |SELECT da AS doc_a, db AS doc_b,
         |       CAST(max(run) + ${SubstrL - 1} AS BIGINT) AS span_tokens,
         |       CAST(sum(run) AS BIGINT) AS n_anchors,
         |       CAST(count(DISTINCT diag) AS BIGINT) AS n_diagonals
         |FROM runs GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r_rerank_agreement" ->
      s"""WITH e0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
         |         list_sum(list_transform(range(1, $RerankPrefixDim + 1),
         |             i -> q.e[i] * n.e[i]))
         |           / (sqrt(list_sum(list_transform(range(1, $RerankPrefixDim + 1),
         |                i -> q.e[i] * q.e[i])))
         |              * sqrt(list_sum(list_transform(range(1, $RerankPrefixDim + 1),
         |                  i -> n.e[i] * n.e[i])))) AS cos_bi,
         |         list_sum(list_transform(range(1, len(q.e) + 1),
         |             i -> q.e[i] * n.e[i]))
         |           / (sqrt(list_sum(list_transform(range(1, len(q.e) + 1),
         |                i -> q.e[i] * q.e[i])))
         |              * sqrt(list_sum(list_transform(range(1, len(n.e) + 1),
         |                  i -> n.e[i] * n.e[i])))) AS cos_full
         |  FROM e0 q CROSS JOIN e0 n
         |  WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id),
         |cand AS (
         |  SELECT query_id, neighbor_id, bi_rank,
         |         row_number() OVER (PARTITION BY query_id
         |           ORDER BY cos_full DESC, neighbor_id) AS full_rank
         |  FROM (
         |    SELECT query_id, neighbor_id, cos_full,
         |           row_number() OVER (PARTITION BY query_id
         |             ORDER BY cos_bi DESC, neighbor_id) AS bi_rank
         |    FROM scored)
         |  WHERE bi_rank <= $RerankK),
         |agg AS (
         |  SELECT a.query_id,
         |         CAST(sum(CASE WHEN (a.bi_rank - b.bi_rank)
         |             * (a.full_rank - b.full_rank) > 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_concordant,
         |         CAST(sum(CASE WHEN (a.bi_rank - b.bi_rank)
         |             * (a.full_rank - b.full_rank) < 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_discordant
         |  FROM cand a JOIN cand b
         |    ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
         |  GROUP BY 1),
         |top1 AS (
         |  SELECT query_id, CAST(bi_rank AS BIGINT) AS rerank_top1_bi_rank
         |  FROM cand WHERE full_rank = 1)
         |SELECT agg.query_id, n_concordant, n_discordant,
         |       round((n_concordant::DOUBLE - n_discordant::DOUBLE)
         |         / (n_concordant::DOUBLE + n_discordant::DOUBLE), 6)
         |         AS kendall_tau,
         |       rerank_top1_bi_rank
         |FROM agg JOIN top1 USING (query_id)
         |ORDER BY query_id""".stripMargin)
}
