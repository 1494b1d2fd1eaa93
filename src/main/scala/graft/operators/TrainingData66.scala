package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-11 batch 66: observability for the round's two new knobs —
  * the df-tier census that tells an operator WHERE to set the
  * substring cap (pair-work vs postings mass per band, the number
  * the two-tier design trades on), and PQ recall against exact
  * ground truth (the quantization-loss go/no-go before serving codes
  * instead of vectors, completing the eval pair next to
  * sim_ann_recall_eval's raw-IVF recall). Full-replay DuckDB oracles.
  */
object TrainingData66 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_tier_census — per df-band anchor-gram census for the
  // two-tier substring family: n_grams, posting mass (linear-tier
  // cost), and pair work Σ df·(df−1)/2 (pair-tier cost) per band.
  // The cap decision IS this table: move the boundary until the
  // pair-tier band's pair_work stays within budget while the
  // high-df band's postings stay linear. One groupBy(gram) census +
  // one 3-row aggregate — no joins, linear at any corpus size.
  // Bands use the registered demo cap (2) so the table describes
  // the shipped dedup_substring_* split on this corpus.
  // ---------------------------------------------------------------
  val dedupTierCensus: Q = (s, dir) =>
    tierCensusOf(
      Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
      TrainingData54.SubstrL, TrainingData63.HighDfDemoCap)

  /** DataFrame-level entry (any (doc_id, text) input) — the spec
    * surface for the known-df fixture. */
  def tierCensusOf(docsDf: DataFrame, l: Int, cap: Int): DataFrame = {
    val census = TrainingData54.gramPostings(docsDf, l)
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_post"), countDistinct(col("doc_id")).as("df"))
    census
      .withColumn("tier",
        when(col("df") === 1, "1_unique")
          .when(col("df") <= cap, "2_pair_tier")
          .otherwise("3_highdf_tier"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(col("n_post")).cast("long").as("n_postings"),
        max(col("df")).cast("long").as("max_df"),
        // Σ df·(df−1) is even; halve after the sum so every
        // intermediate stays integer-exact
        (sum(col("df") * (col("df") - 1)) / 2).cast("long").as("pair_work"))
      .orderBy(col("tier"))
  }

  // ---------------------------------------------------------------
  // sim_pq_recall_eval — recall@5 of the IVF-PQ ADC search against
  // the exact brute-force ground truth, per query: the quantization
  // loss measurement (how much the 8×16-code compression costs in
  // answer quality) next to sim_ann_recall_eval's raw-vector IVF
  // recall (which isolates the PROBE loss). Both sides registered
  // operators; integer hits + one division; oracle composes both
  // replay SQLs.
  // ---------------------------------------------------------------
  val simPqRecallEval: Q = (s, dir) => {
    val pq = TrainingData4.queries("sim_ivf_pq_search")(s, dir)
      .select(col("query_id"), col("neighbor_id"))
    val bf = Similarity.bruteForceTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    pq.join(bf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).cast("long").as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hits"))
      .select(col("query_id"), col("n_returned"), col("n_hits"),
        (d(col("n_hits")) / lit(5.0)).as("recall_at_5"))
      .orderBy(col("query_id"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_tier_census" -> dedupTierCensus,
    "sim_pq_recall_eval" -> simPqRecallEval)

  private val L = TrainingData54.SubstrL
  private val Cap = TrainingData63.HighDfDemoCap

  val oracles: Map[String, String] = Map(
    "dedup_tier_census" ->
      s"""WITH dcs AS (
         |  SELECT doc_id, string_split(text, ' ') AS ts FROM documents
         |  WHERE len(string_split(text, ' ')) >= $L),
         |g AS (
         |  SELECT doc_id, unnest(range(1, len(ts) - $L + 2)) AS pos, ts
         |  FROM dcs),
         |g2 AS (
         |  SELECT doc_id, pos,
         |         array_to_string(ts[pos:pos + ${L - 1}], ' ') AS gram
         |  FROM g),
         |census AS (
         |  SELECT gram, count(*) AS n_post,
         |         count(DISTINCT doc_id) AS df
         |  FROM g2 GROUP BY 1)
         |SELECT CASE WHEN df = 1 THEN '1_unique'
         |            WHEN df <= $Cap THEN '2_pair_tier'
         |            ELSE '3_highdf_tier' END AS tier,
         |       CAST(count(*) AS BIGINT) AS n_grams,
         |       CAST(sum(n_post) AS BIGINT) AS n_postings,
         |       CAST(max(df) AS BIGINT) AS max_df,
         |       CAST(sum(df * (df - 1)) / 2 AS BIGINT) AS pair_work
         |FROM census GROUP BY 1 ORDER BY tier""".stripMargin,
    "sim_pq_recall_eval" ->
      s"""WITH pq AS (SELECT * FROM (
         |${TrainingData4.oracles("sim_ivf_pq_search")}
         |)),
         |bf AS (SELECT * FROM (
         |${TrainingData.oracles("sim_cosine_topk")}
         |))
         |SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_returned,
         |       CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS DOUBLE) / 5.0 AS recall_at_5
         |FROM pq p LEFT JOIN bf b
         |  ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
         |GROUP BY p.query_id ORDER BY p.query_id""".stripMargin)
}
