package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 65: the HIGH-DF TIER for decontamination — the
  * same silent-recall hole the substring family had (round-10
  * verdict), one module over: t_split_contamination drops 13-grams
  * with df > ContaminationMaxDf as boilerplate before its postings
  * self-join, which is the right work bound but loses exactly the
  * WORST leakage shape — an eval passage mass-duplicated across the
  * train split (df in the hundreds at Common-Crawl duplication
  * rates). Same cure as TrainingData63: grams above the cap route
  * through a LINEAR tier (per-gram split-presence sets exploded into
  * ordered cross-split evidence — never a postings self-join, so a
  * gram's cost is its posting count, not its posting count squared),
  * and the cap becomes a pure work-partitioning knob.
  *
  * The oracle is the strongest form possible: because leak EVIDENCE
  * — (split_from, split_to, leaked doc, gram) — is tier-invariant
  * (a gram contributes a row iff it spans the two splits, whichever
  * tier it routes through), the DuckDB oracle replays the UNCAPPED
  * pure cross-split join. The tiered implementation must equal the
  * semantically-ideal quadratic join it exists to avoid.
  */
object TrainingData65 {
  private type Q = (SparkSession, String) => DataFrame

  /** Demo cap for the REGISTERED query: the gate corpus's max
    * 13-gram df is 4, so cap 2 routes df ∈ {3, 4} grams through the
    * high-df tier — both tiers carry real rows. Production uses
    * TrainingData4.ContaminationMaxDf; the recall contract is
    * cap-invariant (pinned in TrainingData65Spec). */
  private[operators] val ContamDemoCap = 2

  /** Leak-evidence stream, both tiers: one row per (split_from,
    * split_to, doc_to, sh) meaning "doc_to in split_to shares gram
    * sh with at least one doc of split_from". Pair tier (df ≤ cap):
    * the postings self-join, ≤ cap² pair rows per gram. High-df tier
    * (df > cap): per-gram split-presence sets, then each posting
    * explodes into its ≤ 2 foreign from-splits — linear in postings
    * at ANY duplication level. */
  private[operators] def contaminationEvidence(grams: DataFrame,
      maxDf: Int): DataFrame = {
    require(maxDf >= 2, "cap below 2 would route unpaired grams")
    val dfreq = grams.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val lo = grams.join(
      dfreq.filter(col("df") >= 2 && col("df") <= maxDf).select(col("sh")),
      "sh")
    val evLo = lo.alias("a")
      .join(lo.alias("b"),
        col("a.sh") === col("b.sh") && col("a.split") =!= col("b.split"))
      .select(col("a.split").as("split_from"), col("b.split").as("split_to"),
        col("b.doc_id").as("doc_to"), col("a.sh").as("sh"))
    val hiPost = grams.join(
      dfreq.filter(col("df") > maxDf).select(col("sh")), "sh")
    val evHi = hiPost
      .join(hiPost.groupBy(col("sh"))
        .agg(collect_set(col("split")).as("from_splits")), "sh")
      .select(col("sh"), col("split").as("split_to"),
        col("doc_id").as("doc_to"),
        explode(col("from_splits")).as("split_from"))
      .filter(col("split_from") =!= col("split_to"))
      .select(col("split_from"), col("split_to"), col("doc_to"), col("sh"))
    evLo.unionByName(evHi)
  }

  /** DataFrame-level entry — the spec surface for the planted
    * mass-duplicated leak and the cap-invariance pin. */
  def contaminationFullOf(docsDf: DataFrame, maxDf: Int): DataFrame =
    contaminationEvidence(
      TrainingData4.contaminationGrams(docsDf).localCheckpoint(eager = false), maxDf)
      .groupBy(col("split_from"), col("split_to"))
      .agg(countDistinct(col("doc_to")).cast("long").as("n_leaky_docs"),
        countDistinct(col("sh")).cast("long").as("n_shared_grams"))
      .orderBy(col("split_from"), col("split_to"))

  val tContaminationFull: Q = (s, dir) =>
    contaminationFullOf(
      Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
      ContamDemoCap)

  val queries: Map[String, Q] = Map(
    "t_contamination_full" -> tContaminationFull)

  val oracles: Map[String, String] = Map(
    // the UNCAPPED ideal join — tier routing must be invisible
    "t_contamination_full" ->
      """WITH g AS (
        |  SELECT doc_id,
        |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |                IN ('c', 'd') THEN 'val'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)
        |                IN ('e', 'f') THEN 'test'
        |              ELSE 'train' END AS split,
        |         unnest(list_distinct(shingles)) AS sh
        |  FROM (SELECT doc_id, text,
        |               CASE WHEN len(toks) < 13 THEN [text]
        |                    ELSE list_transform(range(1, len(toks) - 11),
        |                           i -> array_to_string(toks[i:i+12], ' '))
        |               END AS shingles
        |        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |              FROM documents)))
        |SELECT a.split AS split_from, b.split AS split_to,
        |       CAST(count(DISTINCT b.doc_id) AS BIGINT) AS n_leaky_docs,
        |       CAST(count(DISTINCT a.sh) AS BIGINT) AS n_shared_grams
        |FROM g a JOIN g b ON a.sh = b.sh AND a.split <> b.split
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
