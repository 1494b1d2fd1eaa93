package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-11 batch 75: detector-agreement auditing and the
  * SQL-standard hypothetical-set functions.
  *
  *  - dedup_method_agreement — the confusion table between the
  *    lexical near-dup detector (MinHash-LSH, exact-Jaccard ≥ 0.7)
  *    and the embedding near-dup detector (label-blocked cosine
  *    ≥ 0.4, the dedup_embedding_cosine contract) over the shared
  *    id space: how much would SemDeDup remove that MinHash
  *    wouldn't, and vice versa — the first question a curation
  *    review asks before stacking both tiers (cf. dedup_funnel's
  *    marginal-catch ledger, which stacks; this op CONTRASTS).
  *  - a_hypothetical_rank — RANK / PERCENT_RANK / CUME_DIST of
  *    hypothetical order values (the SQL:2008 hypothetical-set
  *    family) from exact value-level counts, no per-row ranks.
  */
object TrainingData75 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_method_agreement — full-outer join of the two registered
  // pair sets (both already canonicalized d1 < d2 over doc ids;
  // embeddings.vec_id is id-aligned with documents.doc_id in the
  // testdata contract). Per agreement category: pair count, distinct
  // docs touched, share of the union. Scale shape: both pair sets
  // are banded/blocked constructions with their own bounds; the
  // audit adds one pair-keyed join plus a ≤3-row aggregate.
  // ---------------------------------------------------------------
  val dedupMethodAgreement: Q = (s, dir) => {
    val lex = Dedup.minhashLshPairs(s, dir, portableHashes = true)
      .select(col("d1"), col("d2"), lit(true).as("in_lex"))
    val sem = Similarity.cosineNearDupPairs(s, dir, 0.4)
      .select(col("v1").as("d1"), col("v2").as("d2"), lit(true).as("in_sem"))
    val j = lex.join(sem, Seq("d1", "d2"), "full_outer")
      .select(col("d1"), col("d2"),
        when(col("in_lex").isNotNull && col("in_sem").isNotNull, "both")
          .when(col("in_lex").isNotNull, "lexical_only")
          .otherwise("semantic_only").as("category"))
      .localCheckpoint(eager = false) // the category agg + the union total
    val tot = j.agg(count(lit(1)).cast("long").as("n_union"))
    j.groupBy(col("category"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        countDistinct(col("d1")).cast("long").as("n_left_docs"))
      .crossJoin(broadcast(tot))
      .join(j.select(col("category"),
          explode(array(col("d1"), col("d2"))).as("doc"))
          .groupBy(col("category"))
          .agg(countDistinct(col("doc")).cast("long").as("n_docs")),
        "category")
      .select(col("category"), col("n_pairs"), col("n_docs"),
        round(d(col("n_pairs")) / d(col("n_union")), 6).as("share"))
      .orderBy(col("category"))
  }

  // ---------------------------------------------------------------
  // a_hypothetical_rank — "where would a $500 / $5,000 / $50,000
  // order land?": RANK = 1 + #{v < x}, PERCENT_RANK = (RANK−1)/n,
  // CUME_DIST = #{v ≤ x}/n — all from ONE map-side value aggregate
  // and a 3-value broadcast grid, never a per-row window. The
  // SQL-standard hypothetical-set semantics (ties of x do not count
  // toward RANK, do count toward CUME_DIST).
  // ---------------------------------------------------------------
  private val HypoValues = Seq(500.0, 5000.0, 50000.0)

  val aHypotheticalRank: Q = (s, dir) => {
    val cents = Tables.table(s, dir, "orders")
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v"))
    val grid = array(HypoValues.map(v => lit((v * 100).toLong)): _*)
    cents.select(col("v"), explode(grid).as("x"))
      .groupBy(col("x"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("v") < col("x"), 1L).otherwise(0L)).cast("long")
          .as("n_below"),
        sum(when(col("v") <= col("x"), 1L).otherwise(0L)).cast("long")
          .as("n_at_or_below"))
      .select((d(col("x")) / 100.0).as("hypothetical_usd"),
        col("n").as("n_orders"),
        (col("n_below") + 1L).as("rank"),
        round(d(col("n_below")) / d(col("n")), 6).as("percent_rank"),
        round(d(col("n_at_or_below")) / d(col("n")), 6).as("cume_dist"))
      .orderBy(col("hypothetical_usd"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_method_agreement" -> dedupMethodAgreement,
    "a_hypothetical_rank" -> aHypotheticalRank)

  val oracles: Map[String, String] = Map(
    "dedup_method_agreement" ->
      s"""WITH ${TrainingData.minhashCtes},
         |emb0 AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |sempairs AS (
         |  SELECT v1, v2 FROM (
         |    SELECT a.vec_id AS v1, b.vec_id AS v2,
         |           list_sum(list_transform(range(1, len(a.emb) + 1),
         |             i -> a.emb[i] * b.emb[i]))
         |             / (sqrt(list_sum(list_transform(
         |                  range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
         |                * sqrt(list_sum(list_transform(
         |                  range(1, len(b.emb) + 1), i -> b.emb[i] * b.emb[i]))))
         |             AS cos
         |    FROM emb0 a JOIN emb0 b
         |      ON a.label = b.label AND a.vec_id < b.vec_id)
         |  WHERE cos >= 0.4),
         |uni AS (
         |  SELECT coalesce(l.d1, s.v1) AS d1, coalesce(l.d2, s.v2) AS d2,
         |         CASE WHEN l.d1 IS NOT NULL AND s.v1 IS NOT NULL
         |              THEN 'both'
         |              WHEN l.d1 IS NOT NULL THEN 'lexical_only'
         |              ELSE 'semantic_only' END AS category
         |  FROM lshp l FULL OUTER JOIN sempairs s
         |    ON l.d1 = s.v1 AND l.d2 = s.v2),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_union FROM uni),
         |docs_ AS (
         |  SELECT category, CAST(count(DISTINCT doc) AS BIGINT) AS n_docs
         |  FROM (SELECT category, unnest([d1, d2]) AS doc FROM uni)
         |  GROUP BY 1)
         |SELECT u.category, CAST(count(*) AS BIGINT) AS n_pairs,
         |       dd.n_docs,
         |       round(CAST(count(*) AS DOUBLE)
         |         / CAST(t.n_union AS DOUBLE), 6) AS share
         |FROM uni u CROSS JOIN tot t JOIN docs_ dd ON u.category = dd.category
         |GROUP BY u.category, dd.n_docs, t.n_union
         |ORDER BY u.category""".stripMargin,
    "a_hypothetical_rank" -> {
      val grid = HypoValues.map(v => (v * 100).toLong).mkString(", ")
      s"""WITH cents AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
         |    AS v
         |  FROM orders),
         |g AS (SELECT unnest([$grid]) AS x)
         |SELECT CAST(g.x AS DOUBLE) / 100.0 AS hypothetical_usd,
         |       CAST(count(*) AS BIGINT) AS n_orders,
         |       CAST(sum(CASE WHEN v < g.x THEN 1 ELSE 0 END) + 1 AS BIGINT)
         |         AS rank,
         |       round(CAST(sum(CASE WHEN v < g.x THEN 1 ELSE 0 END)
         |           AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |         AS percent_rank,
         |       round(CAST(sum(CASE WHEN v <= g.x THEN 1 ELSE 0 END)
         |           AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS cume_dist
         |FROM cents CROSS JOIN g
         |GROUP BY g.x ORDER BY hypothetical_usd""".stripMargin
    })
}
