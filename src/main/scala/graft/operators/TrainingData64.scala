package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-11 batch 64: the composed END-TO-END corpus build — the
  * thing a real user actually runs. Every stage was individually
  * green since earlier rounds (t_corpus_clean, t_source_epochs,
  * t_pack_sequences, mm_shard_manifest); this registers the CHAIN as
  * one dataflow with a single oracle on the final shard manifest, so
  * a regression anywhere in clean → plan → pack → manifest surfaces
  * as one red row. Stage boundaries hand off through localCheckpoint
  * exactly where a frame has two consumers, so no stage recomputes an
  * earlier stage's work (the 100 TB equivalent is a persisted silver
  * table between jobs).
  */
object TrainingData64 {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // pipeline_corpus_build — ingest → exact dedup (md5 fingerprint,
  // keep-min-id) → near-dup scrub (MinHash-LSH groups, drop
  // non-canonical members) → per-source epoch planning (weighted
  // token budgets; fractional epochs met by md5-uniform upsampling)
  // → (doc, epoch) instance explosion → deterministic packing into
  // 2048-token bins inside md5-hash shards → per-shard manifest.
  // Scale shape, stage by stage: dedup is the banded funnel (never
  // all-pairs); the epoch plan is a per-source aggregate crossed
  // with a ONE-ROW totals broadcast then broadcast-joined back (no
  // sort/window); packing cumsums WITHIN hash shards (16 parallel
  // sorts, never a global order); the manifest is one small groupBy.
  // The membership checksum (Σ doc_id·epoch per shard) makes the
  // oracle verify WHICH instances landed where, not just counts.
  // ---------------------------------------------------------------
  private val PackTarget = 2048L

  val pipelineCorpusBuild: Q = (s, dir) => {
    val d = docs(s, dir)
    // stage 1: clean — exact-unique survivors minus non-canonical
    // near-dup group members (the dedup funnel's linear output)
    val exactSurvivors = d
      .withColumn("fp", TF.fingerprint(col("text")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("source"),
        TF.tokenCount(col("text")).as("n_tok"),
        ((conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double") + 1) / lit(4503599627370496.0)).as("u"))
    val dropNearDup = Dedup.dupGroups(
        Dedup.minhashLshPairsRaw(s, dir, portableHashes = true))
      .select(col("canonical_id"), explode(col("members")).as("doc_id"))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    // stage barrier: `clean` feeds BOTH the per-source stats and the
    // plan join-back — checkpoint so the dedup funnel runs once
    val clean = exactSurvivors
      .join(dropNearDup, Seq("doc_id"), "left_anti")
      .localCheckpoint(eager = false)
    // stage 2: epoch plan (t_source_epochs' recipe over the CLEANED
    // corpus): budget_r = tot·w / (Σw · src_tokens); every doc gets
    // floor(r) epochs, +1 where its md5-uniform u < frac(r)
    val stats = clean.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("src_tokens"))
      .withColumn("w", lit(1) + substring(col("source"), 4, 10).cast("int") % 4)
    val totals = stats.agg(sum(col("src_tokens")).as("tot"),
      sum(col("w").cast("long")).as("wsum"))
    val plan = stats.crossJoin(broadcast(totals))
      .withColumn("r", col("tot") * col("w") / col("wsum") / col("src_tokens"))
      .select(col("source"), floor(col("r")).as("base_epochs"),
        (col("r") - floor(col("r"))).as("frac"))
    val planned = clean.join(broadcast(plan), "source")
      .select(col("doc_id"), col("n_tok"),
        (col("base_epochs") +
          when(col("u") < col("frac"), 1L).otherwise(0L)).as("epochs"))
      .filter(col("epochs") > 0)
    // stage 3: instance explosion + packing — (doc, epoch) instances
    // route to a hash shard by md5(doc:epoch) and bin by the
    // exclusive prefix token sum inside the shard (per-shard window,
    // 16 parallel sorts; a doc never splits across bins)
    val inst = planned
      .select(col("doc_id"), col("n_tok"),
        explode(expr("sequence(1L, epochs)")).as("epoch"))
      .withColumn("key", md5(concat_ws(":", col("doc_id"), col("epoch"))))
      .withColumn("shard", substring(col("key"), 1, 1))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("key"), col("doc_id"), col("epoch"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val binned = inst.withColumn("bin",
      floor((sum(col("n_tok")).over(w) - col("n_tok")) / PackTarget))
    // stage 4: the manifest — one row per shard with a membership
    // checksum, the artifact a trainer's data loader consumes
    binned.groupBy(col("shard"))
      .agg(countDistinct(col("bin")).cast("long").as("n_bins"),
        count(lit(1)).cast("long").as("n_items"),
        sum(col("n_tok")).cast("long").as("total_tokens"),
        sum(col("doc_id") * col("epoch")).cast("long").as("member_checksum"))
      .orderBy(col("shard"))
  }

  // ---------------------------------------------------------------
  // sim_ivf_persisted / sim_ivf_pq_persisted — the SERVING path:
  // search a PERSISTED ANN index (sources.AnnIndex; built once per
  // corpus per JVM, parquet round-trip, assignments/codes partitioned
  // by cell) instead of rebuilding codebooks in-query. The oracles
  // are the SAME SQL as the in-query variants (sim_cosine_ivf /
  // sim_ivf_pq_search): the persistence round-trip must be invisible
  // to the result. Bench reps therefore time search-over-artifact —
  // the deployment cost — not repeated builds.
  // ---------------------------------------------------------------
  private def embQueries(s: SparkSession, dir: String, n: Int) =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Similarity.toDoubleArr(col("embedding")).as("e"))
      .filter(col("vec_id") < n)

  val simIvfPersisted: Q = (s, dir) =>
    graft.sources.AnnIndex.searchIvf(s,
      graft.sources.AnnIndex.ivfIndexFor(s, dir),
      embQueries(s, dir, 10), k = 5, nProbe = 4)

  val simIvfPqPersisted: Q = (s, dir) =>
    graft.sources.AnnIndex.searchIvfPq(s,
      graft.sources.AnnIndex.ivfPqIndexFor(s, dir),
      embQueries(s, dir, 10), m8 = 8, nProbe = 2, k = 5)

  // ---------------------------------------------------------------
  // sim_ivf_incremental / sim_ivf_append_balance — INDEX MAINTENANCE,
  // the other half of the serving story: the corpus accretes daily
  // batches, centroids retrain on a much slower cadence. Build the
  // coarse quantizer from the BASE corpus only (vec_id % 4 ≠ 3),
  // assign the new batch against those FROZEN centroids, union the
  // assignment tables, search. Because assignment is a per-vector
  // argmax against the same centroid set, the incrementally
  // maintained index answers EXACTLY like a from-scratch assignment
  // with those centroids — the oracle pins that equality (it replays
  // base-restricted centroid selection + full-corpus assignment).
  // The balance audit reports per-cell base/new counts — the drift
  // number an operator watches to decide when centroids must
  // retrain (a cell ballooning under append = rising probe cost).
  // ---------------------------------------------------------------
  private def embAll(s: SparkSession, dir: String) =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Similarity.toDoubleArr(col("embedding")).as("e"))

  private def incrementalIndex(s: SparkSession, dir: String) = {
    val emb = embAll(s, dir).localCheckpoint(eager = false) // base, batch, queries
    val (cents, baseAssigned) = graft.functions.Similarity
      .ivfSampleBuild(emb.filter(col("vec_id") % 4 =!= 3), 16)
    val newAssigned = graft.functions.Similarity
      .ivfAssign(cents, emb.filter(col("vec_id") % 4 === 3))
    (emb, cents, baseAssigned, newAssigned)
  }

  val simIvfIncremental: Q = (s, dir) => {
    val (emb, cents, baseAssigned, newAssigned) = incrementalIndex(s, dir)
    graft.functions.Similarity.ivfProbeSearch(cents,
      baseAssigned.unionAll(newAssigned),
      emb.filter(col("vec_id") < 10), k = 5, nProbe = 4)
  }

  val simIvfAppendBalance: Q = (s, dir) => {
    val (_, _, baseAssigned, newAssigned) = incrementalIndex(s, dir)
    baseAssigned.groupBy(col("cell"))
      .agg(count(lit(1)).cast("long").as("n_base"))
      .join(newAssigned.groupBy(col("cell"))
        .agg(count(lit(1)).cast("long").as("n_new")), Seq("cell"), "left")
      .select(col("cell"), col("n_base"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        round(coalesce(col("n_new"), lit(0L)).cast("double") /
          col("n_base").cast("double"), 6).as("growth_ratio"))
      .orderBy(col("cell"))
  }

  // ---------------------------------------------------------------
  // dedup_incremental_persisted — the dedup twin of the persisted
  // ANN serving path: the corpus band index + hash sets live as a
  // parquet artifact (DedupStream.writeIndex — band-partitioned),
  // and each new batch is flagged by reading THAT, never re-signing
  // the corpus. Same oracle SQL as dedup_incremental: the artifact
  // round-trip must be hash-invisible. This makes the "materialized
  // band index" of the 100 TB daily shape literal rather than
  // simulated in-query.
  // ---------------------------------------------------------------
  val dedupIncrementalPersisted: Q = (s, dir) => {
    val all = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text"))
    val idx = graft.streaming.DedupStream.indexFor(s, dir,
      all.filter(col("doc_id") % 10 =!= 0))
    graft.streaming.DedupStream.flagBatch(
        all.filter(col("doc_id") % 10 === 0),
        graft.streaming.DedupStream.readIndex(s, idx))
      .orderBy(col("new_doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "pipeline_corpus_build" -> pipelineCorpusBuild,
    "sim_ivf_persisted" -> simIvfPersisted,
    "sim_ivf_pq_persisted" -> simIvfPqPersisted,
    "sim_ivf_incremental" -> simIvfIncremental,
    "sim_ivf_append_balance" -> simIvfAppendBalance,
    "dedup_incremental_persisted" -> dedupIncrementalPersisted)

  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))" +
      s" / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])))" +
      s" * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]))))"

  /** Shared replay prelude for the incremental-index oracles:
    * centroids from the BASE corpus only, assignment over ALL
    * vectors against them (≡ base-assign ∪ frozen-centroid append). */
  private val IncrementalCtes =
    s"""e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, emb AS ce
       |  FROM (SELECT vec_id, emb,
       |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |        FROM e WHERE vec_id % 4 <> 3)
       |  WHERE rn <= 16),
       |scoredc AS (
       |  SELECT e.vec_id, e.emb, c.cid, ${cosSql("e.emb", "c.ce")} AS csim
       |  FROM e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, emb, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
       |        FROM scoredc)
       |  WHERE crk = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical SQL to the in-query variants by construction — the
    // parquet round-trip must not change a single hash
    "sim_ivf_persisted" -> TrainingData.oracles("sim_cosine_ivf"),
    "sim_ivf_pq_persisted" -> TrainingData4.oracles("sim_ivf_pq_search"),
    "dedup_incremental_persisted" -> TrainingData.oracles("dedup_incremental"),
    "sim_ivf_incremental" ->
      s"""WITH $IncrementalCtes,
         |qprobe AS (
         |  SELECT vec_id AS query_id, emb AS qe, cid AS cell
         |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
         |        FROM scoredc WHERE vec_id < 10)
         |  WHERE crk <= 4),
         |cand AS (
         |  SELECT q.query_id, q.qe, a.vec_id AS neighbor_id, a.emb AS ne
         |  FROM qprobe q JOIN assigned a USING (cell)
         |  WHERE a.vec_id <> q.query_id),
         |scored AS (
         |  SELECT query_id, neighbor_id, ${cosSql("qe", "ne")} AS cos FROM cand),
         |ranked AS (
         |  SELECT query_id, neighbor_id, cos,
         |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
         |  FROM scored)
         |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rk AS INTEGER) AS rk
         |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "sim_ivf_append_balance" ->
      s"""WITH $IncrementalCtes,
         |base AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_base
         |  FROM assigned WHERE vec_id % 4 <> 3 GROUP BY 1),
         |newb AS (
         |  SELECT cell, CAST(count(*) AS BIGINT) AS n_new
         |  FROM assigned WHERE vec_id % 4 = 3 GROUP BY 1)
         |SELECT cell, n_base,
         |       CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
         |       round(CAST(coalesce(n_new, 0) AS DOUBLE)
         |         / CAST(n_base AS DOUBLE), 6) AS growth_ratio
         |FROM base LEFT JOIN newb USING (cell)
         |ORDER BY cell""".stripMargin,
    "pipeline_corpus_build" ->
      s"""WITH RECURSIVE ${TrainingData.minhashCtes},
         |nodes AS (SELECT DISTINCT d1 AS id FROM lshp UNION SELECT DISTINCT d2 FROM lshp),
         |edges AS (SELECT d1 AS a, d2 AS b FROM lshp UNION SELECT d2, d1 FROM lshp),
         |reach(id, rep) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.rep FROM edges e JOIN reach r ON e.b = r.id),
         |dropn AS (
         |  SELECT id FROM (SELECT id, min(rep) AS rep FROM reach GROUP BY 1)
         |  WHERE rep <> id),
         |exact AS (
         |  SELECT doc_id, source, n_tok, u FROM (
         |    SELECT doc_id, source,
         |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         |           (CAST(list_reduce(list_transform(
         |                string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), ''),
         |                c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
         |              (a, b) -> a * 16 + b) + 1 AS DOUBLE)
         |             / 4503599627370496.0) AS u,
         |           row_number() OVER (PARTITION BY md5(text)
         |             ORDER BY doc_id) AS rk
         |    FROM documents)
         |  WHERE rk = 1),
         |clean AS (
         |  SELECT * FROM exact WHERE doc_id NOT IN (SELECT id FROM dropn)),
         |s AS (
         |  SELECT source, CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
         |         CAST(1 + (CAST(substr(source, 4) AS INT) % 4) AS INT) AS w
         |  FROM clean GROUP BY source),
         |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS tot,
         |             CAST(SUM(w) AS BIGINT) AS wsum FROM s),
         |p AS (
         |  SELECT source, CAST(floor(r) AS BIGINT) AS base_epochs,
         |         r - floor(r) AS frac
         |  FROM (SELECT s.*, tot * w / wsum / src_tokens AS r FROM s, t)),
         |planned AS (
         |  SELECT c.doc_id, c.n_tok,
         |         p.base_epochs + CASE WHEN c.u < p.frac THEN 1 ELSE 0 END
         |           AS epochs
         |  FROM clean c JOIN p USING (source)),
         |inst AS (
         |  SELECT doc_id, n_tok, unnest(range(1, epochs + 1)) AS epoch
         |  FROM planned WHERE epochs > 0),
         |keyed AS (
         |  SELECT doc_id, n_tok, epoch,
         |         md5(CAST(doc_id AS VARCHAR) || ':'
         |             || CAST(epoch AS VARCHAR)) AS key
         |  FROM inst),
         |binned AS (
         |  SELECT doc_id, n_tok, epoch, substr(key, 1, 1) AS shard,
         |         CAST(floor((SUM(n_tok) OVER (PARTITION BY substr(key, 1, 1)
         |             ORDER BY key, doc_id, epoch
         |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |             - n_tok) / $PackTarget.0) AS BIGINT) AS bin
         |  FROM keyed)
         |SELECT shard, CAST(count(DISTINCT bin) AS BIGINT) AS n_bins,
         |       CAST(count(*) AS BIGINT) AS n_items,
         |       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
         |       CAST(SUM(doc_id * epoch) AS BIGINT) AS member_checksum
         |FROM binned GROUP BY 1 ORDER BY shard""".stripMargin)
}
