package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 15: storage-grade dedup and robust statistics —
  * content-defined chunking (the rsync/LBFS/restic primitive, here
  * on token streams) with a corpus chunk-level dedup audit, and the
  * 5% winsorized mean of order values (exact order statistics
  * through the two-phase rank). All Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData18 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  /** Shared CDC chunk frame: tokens posexplode, a token is a chunk
    * BOUNDARY when the last hex digit of its md5 is '0' (p = 1/16 ⇒
    * mean chunk ≈ 16 tokens — the content-defined rule that keeps
    * chunk edges stable under insertions, unlike fixed-width
    * splitting); chunk id = exclusive running boundary count within
    * the doc (per-doc window — partition-parallel). One chunk row
    * per (doc, chunk): pos-ordered text, md5 hash, token length. */
  private def chunks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(s, dir)
      .select(col("doc_id"), posexplode(TF.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .withColumn("b", when(substring(md5(col("tok")), 32, 1) === "0", 1L)
        .otherwise(0L))
      .withColumn("cid", sum(col("b")).over(w) - col("b"))
      .groupBy(col("doc_id"), col("cid"))
      .agg(count(lit(1)).as("n_toks"),
        md5(concat_ws(" ", expr(
          "transform(sort_array(collect_list(struct(pos, tok)))," +
            " x -> x.tok)"))).as("chunk_hash"))
  }

  // ---------------------------------------------------------------
  // t_cdc_chunking — per-document content-defined chunking stats:
  // chunk count, mean chunk length (one division of exact
  // integers), the longest chunk, and how many of the doc's chunks
  // are internally repeated (distinct-hash accounting). The
  // per-doc window never leaves the doc's partition; everything
  // else is two stacked aggregates.
  // ---------------------------------------------------------------
  val tCdcChunking: Q = (s, dir) => {
    chunks(s, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("n_toks")).cast("long").as("n_tokens"),
        max(col("n_toks")).cast("long").as("max_chunk_toks"),
        countDistinct(col("chunk_hash")).as("n_distinct_chunks"))
      .select(col("doc_id"), col("n_chunks"), col("n_tokens"),
        round(d(col("n_tokens")) / d(col("n_chunks")), 6)
          .as("mean_chunk_toks"),
        col("max_chunk_toks"), col("n_distinct_chunks"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // dedup_cdc_chunks — corpus chunk-store dedup audit: how much
  // would a content-addressed chunk store save on this corpus?
  // Total vs distinct chunk/token mass, the dedup ratio, and the
  // most-shared chunk (two-phase max(struct) argmax — no window).
  // The chunk frame shuffles once on chunk_hash; at 100 TB this is
  // exactly the restic/borg index build.
  // ---------------------------------------------------------------
  val dedupCdcChunks: Q = (s, dir) => {
    val byHash = chunks(s, dir)
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("copies"), sum(col("n_toks")).as("toks"),
        min(col("n_toks")).as("one_copy_toks"))
    byHash.agg(
        sum(col("copies")).cast("long").as("total_chunks"),
        count(lit(1)).as("distinct_chunks"),
        sum(col("toks")).cast("long").as("total_tokens"),
        sum(col("one_copy_toks")).cast("long").as("stored_tokens"),
        max(struct(col("copies").as("c"), col("chunk_hash").as("h")))
          .as("top"))
      .select(col("total_chunks"), col("distinct_chunks"),
        round(d(col("distinct_chunks")) / d(col("total_chunks")), 6)
          .as("unique_ratio"),
        col("total_tokens"), col("stored_tokens"),
        round(lit(1.0) - d(col("stored_tokens")) / d(col("total_tokens")), 6)
          .as("savings_ratio"),
        col("top.c").cast("long").as("top_copies"),
        col("top.h").as("top_chunk_hash"))
  }

  // ---------------------------------------------------------------
  // a_winsorized_mean — 5% winsorized and trimmed means of order
  // value (the robust-location estimates a KPI pipeline reports
  // next to the raw mean when whales distort it): ranks come from
  // the two-phase global rank (value, orderkey tiebreak); the
  // boundary order statistics at k_lo = ⌈0.05n⌉ and
  // k_hi = ⌊0.95n⌋ + 1 clamp the tails (winsorize) or drop them
  // (trim). Sums of clamped DECIMAL(18,2) values are EXACT; each
  // mean is one double division. Scale shape: one range exchange
  // (the rank) + one one-row conditional aggregate.
  // ---------------------------------------------------------------
  val aWinsorizedMean: Q = (s, dir) => {
    val o = Tables.table(s, dir, "orders")
      .select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("v"))
      .localCheckpoint(eager = false) // count + rank pass
    val n = o.count()
    val kLo = math.ceil(0.05 * n).toLong
    val kHi = n - kLo // symmetric 5% tails
    val ranked = Ranking.withGlobalRank(o, "rk", col("v"), col("o_orderkey"))
      .localCheckpoint(eager = false) // boundary probe + the clamped aggregate
    val bounds = ranked
      .agg(min(when(col("rk") === kLo + 1, col("v"))).as("lo"),
        min(when(col("rk") === kHi, col("v"))).as("hi")).head()
    val lo = bounds.getDecimal(0); val hi = bounds.getDecimal(1)
    val clamped = when(col("rk") <= kLo, lit(lo.toString).cast("decimal(18,2)"))
      .when(col("rk") > kHi, lit(hi.toString).cast("decimal(18,2)"))
      .otherwise(col("v"))
    ranked.agg(
        count(lit(1)).as("n_orders"),
        expr("CAST(SUM(v) AS DOUBLE)").as("sraw"),
        sum(clamped).cast("double").as("swin"),
        sum(when(col("rk") > kLo && col("rk") <= kHi, col("v"))
          .otherwise(lit(0).cast("decimal(18,2)"))).cast("double").as("strim"),
        sum(when(col("rk") > kLo && col("rk") <= kHi, 1L).otherwise(0L))
          .as("n_kept"))
      .select(col("n_orders").cast("long").as("n_orders"),
        round(col("sraw") / d(col("n_orders")), 6).as("raw_mean"),
        round(col("swin") / d(col("n_orders")), 6).as("winsorized_mean"),
        round(col("strim") / d(col("n_kept")), 6).as("trimmed_mean"),
        lit(lo.toPlainString.toDouble).as("lo_clamp"),
        lit(hi.toPlainString.toDouble).as("hi_clamp"))
  }

  val queries: Map[String, Q] = Map(
    "t_cdc_chunking" -> tCdcChunking,
    "dedup_cdc_chunks" -> dedupCdcChunks,
    "a_winsorized_mean" -> aWinsorizedMean)

  private val chunkCtes =
    """tok AS (
      |  SELECT doc_id, tok, pos,
      |         CASE WHEN substr(md5(tok), 32, 1) = '0' THEN 1 ELSE 0 END AS b
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
      |               unnest(range(0, len(string_split(text, ' ')))) AS pos
      |        FROM documents)),
      |cid AS (
      |  SELECT doc_id, tok, pos,
      |         CAST(sum(b) OVER (PARTITION BY doc_id ORDER BY pos) - b
      |           AS BIGINT) AS cid
      |  FROM tok),
      |chunks AS (
      |  SELECT doc_id, cid, CAST(count(*) AS BIGINT) AS n_toks,
      |         md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_hash
      |  FROM cid GROUP BY 1, 2)""".stripMargin

  val oracles: Map[String, String] = Map(
    "t_cdc_chunking" ->
      s"""WITH $chunkCtes
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(sum(n_toks) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(n_toks) AS DOUBLE) / CAST(count(*) AS DOUBLE),
        |         6) AS mean_chunk_toks,
        |       CAST(max(n_toks) AS BIGINT) AS max_chunk_toks,
        |       CAST(count(DISTINCT chunk_hash) AS BIGINT)
        |         AS n_distinct_chunks
        |FROM chunks GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_cdc_chunks" ->
      s"""WITH $chunkCtes,
        |byhash AS (
        |  SELECT chunk_hash, CAST(count(*) AS BIGINT) AS copies,
        |         CAST(sum(n_toks) AS BIGINT) AS toks,
        |         CAST(min(n_toks) AS BIGINT) AS one_copy_toks
        |  FROM chunks GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(copies) AS BIGINT) AS total_chunks,
        |         CAST(count(*) AS BIGINT) AS distinct_chunks,
        |         CAST(sum(toks) AS BIGINT) AS total_tokens,
        |         CAST(sum(one_copy_toks) AS BIGINT) AS stored_tokens,
        |         max(struct_pack(c := copies, h := chunk_hash)) AS top
        |  FROM byhash)
        |SELECT total_chunks, distinct_chunks,
        |       round(CAST(distinct_chunks AS DOUBLE)
        |         / CAST(total_chunks AS DOUBLE), 6) AS unique_ratio,
        |       total_tokens, stored_tokens,
        |       round(1.0 - CAST(stored_tokens AS DOUBLE)
        |         / CAST(total_tokens AS DOUBLE), 6) AS savings_ratio,
        |       CAST(top.c AS BIGINT) AS top_copies,
        |       top.h AS top_chunk_hash
        |FROM agg""".stripMargin,
    "a_winsorized_mean" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |             CAST(ceil(0.05 * count(*)) AS BIGINT) AS klo
        |      FROM o),
        |r AS (
        |  SELECT v, row_number() OVER (ORDER BY v, o_orderkey) AS rk FROM o),
        |b AS (
        |  SELECT min(CASE WHEN rk = n.klo + 1 THEN v END) AS lo,
        |         min(CASE WHEN rk = n.n - n.klo THEN v END) AS hi
        |  FROM r CROSS JOIN n),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(v) AS DOUBLE) AS sraw,
        |         CAST(SUM(CASE WHEN rk <= n.klo THEN b.lo
        |                       WHEN rk > n.n - n.klo THEN b.hi
        |                       ELSE v END) AS DOUBLE) AS swin,
        |         CAST(SUM(CASE WHEN rk > n.klo AND rk <= n.n - n.klo THEN v
        |                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |           AS strim,
        |         CAST(sum(CASE WHEN rk > n.klo AND rk <= n.n - n.klo
        |                  THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |         CAST(any_value(b.lo) AS DOUBLE) AS lo_clamp,
        |         CAST(any_value(b.hi) AS DOUBLE) AS hi_clamp
        |  FROM r CROSS JOIN n CROSS JOIN b)
        |SELECT n_orders,
        |       round(sraw / CAST(n_orders AS DOUBLE), 6) AS raw_mean,
        |       round(swin / CAST(n_orders AS DOUBLE), 6) AS winsorized_mean,
        |       round(strim / CAST(n_kept AS DOUBLE), 6) AS trimmed_mean,
        |       lo_clamp, hi_clamp
        |FROM agg""".stripMargin)
}
