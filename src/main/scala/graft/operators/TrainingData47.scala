package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 42: CCNet-style perplexity bucketing (head/middle/
  * tail thirds by unigram cross-entropy — the split CCNet uses to
  * grade crawl quality before training), Lorenz concentration points
  * (the decile curve behind a_gini_revenue's single number), and a
  * dedup funnel report (byte-exact → normalized → MinHash near-dup:
  * each tier's MARGINAL catch — the table every curation writeup
  * publishes). All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData47 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_perplexity_buckets — per-doc unigram cross-entropy
  // H(doc) = −(1/n) Σ_t ln p(w_t), p from corpus counts, then
  // head/middle/tail thirds by the 6-dp-rounded H (doc_id tiebreak —
  // the rounded-rank rule) via the TWO-PHASE global rank. CCNet
  // keeps the head, audits the tail. Scale shape: the LM is one
  // token aggregate broadcast back onto the token stream; the
  // per-doc fold runs in token-position order (libm ln → pinned
  // fold); ranking is range-partition + P carries, never a global
  // sort; bucket stats are exact micro-unit sums.
  // ---------------------------------------------------------------
  val tPerplexityBuckets: Q = (s, dir) => {
    val toks = Tables.table(s, dir, "documents")
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "w")))
      .localCheckpoint(eager = false) // LM counts AND the scoring pass
    val lm = toks.groupBy(col("w")).agg(count(lit(1)).cast("long").as("c"))
    val tot = toks.agg(count(lit(1)).cast("long").as("t"))
    val nll = toks.join(lm, Seq("w")).crossJoin(broadcast(tot))
      .select(col("doc_id"), col("pos"),
        (-log(d(col("c")) / d(col("t")))).as("term"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tok"),
        expr("aggregate(sort_array(collect_list(struct(pos, term))), 0D," +
          " (a, x) -> a + x.term)").as("sum_nll"))
      .withColumn("h", round(col("sum_nll") / d(col("n_tok")), 6))
    val ranked = Ranking.withGlobalRank(nll, "rk", col("h"), col("doc_id"))
    val n = nll.agg(count(lit(1)).cast("long").as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        when(col("rk") * 3 <= col("n"), "head")
          .when(col("rk") * 3 <= col("n") * 2, "middle")
          .otherwise(lit("tail")))
      .withColumn("h_micro", floor(col("h") * lit(1000000.0)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_tok")).cast("long").as("n_tokens"),
        (sum(col("h_micro")).cast("double") / lit(1000000.0) /
          count(lit(1)).cast("double")).as("mean_h"),
        (min(col("h_micro")).cast("double") / lit(1000000.0)).as("min_h"),
        (max(col("h_micro")).cast("double") / lit(1000000.0)).as("max_h"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------
  // a_lorenz_points — the Lorenz curve of per-customer revenue at
  // decile resolution: cumulative revenue share of the poorest 10%,
  // 20%, …, 100% — the curve whose area deficit is a_gini_revenue's
  // number; the same audit shape reports token-share concentration
  // across sources at corpus scale. Scale shape: per-customer sums
  // are map-combinable; rank and running revenue both come from ONE
  // two-phase pass (range partition + P carries); the decile cut
  // reads 10 rows. All integer cents until the final share division.
  // ---------------------------------------------------------------
  val aLorenzPoints: Q = (s, dir) => {
    val cust = Tables.table(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
    val ranked = Ranking.withGlobalCumSums(
      Ranking.withGlobalRank(cust, "rk", col("x"), col("o_custkey")),
      Seq("x" -> "cumx"), col("x"), col("o_custkey"))
    val tot = cust.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("long").as("sx"))
    // the decile boundary ranks ⌈d·n/10⌉, d = 1..10, joined back as a
    // broadcast 10-row frame (two deciles can share a boundary row
    // when n < 10 — each still reports its own point)
    val dec = tot
      .select(explode(sequence(lit(1), lit(10))).as("decile"),
        col("n"), col("sx"))
      .withColumn("rkb",
        ceil(d(col("n")) * d(col("decile")) / lit(10.0)).cast("long"))
    ranked.join(broadcast(dec), col("rk") === col("rkb"))
      .select(col("decile").cast("int").as("decile"),
        col("rk").as("n_customers"),
        round(d(col("cumx")) / d(col("sx")), 6).as("cum_revenue_share"))
      .orderBy(col("decile"))
  }

  // ---------------------------------------------------------------
  // dedup_funnel — the three-tier dedup funnel with marginal catch:
  // byte-exact (md5 of raw text), +normalized (casefold/punct
  // canonicalization — dedup_normalized's key), +near-dup (the
  // MinHash-LSH pair membership). Each tier reports docs flagged and
  // docs NEW vs all previous tiers — the marginal-value column that
  // justifies (or kills) each stage's cost. Scale shape: the two
  // hash tiers are scan + hash-aggregate; the LSH tier is the
  // registered banding machinery (linear); the set subtractions are
  // anti joins on doc_id.
  // ---------------------------------------------------------------
  val dedupFunnel: Q = (s, dir) => {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(eager = false)
    def dupDocsByKey(key: Column): DataFrame =
      docs.select(col("doc_id"), key.as("k"))
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))))
        .filter(col("n") > 1).select(col("doc_id"))
    val exact = dupDocsByKey(md5(col("text"))).localCheckpoint(eager = false)
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), " +", " "))
    val norm = dupDocsByKey(md5(canon)).localCheckpoint(eager = false)
    val near = Dedup.minhashLshPairs(s, dir, portableHashes = true)
      .select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct().localCheckpoint(eager = false)
    val t1 = exact.agg(count(lit(1)).cast("long").as("n_flagged"))
      .select(lit(1).as("tier"), lit("exact").as("method"), col("n_flagged"),
        col("n_flagged").as("n_new"))
    val normNew = norm.join(exact, Seq("doc_id"), "left_anti")
    val t2 = norm.agg(count(lit(1)).cast("long").as("n_flagged"))
      .crossJoin(broadcast(
        normNew.agg(count(lit(1)).cast("long").as("n_new"))))
      .select(lit(2).as("tier"), lit("normalized").as("method"),
        col("n_flagged"), col("n_new"))
    val prev = exact.unionAll(norm).distinct()
    val nearNew = near.join(prev, Seq("doc_id"), "left_anti")
    val t3 = near.agg(count(lit(1)).cast("long").as("n_flagged"))
      .crossJoin(broadcast(
        nearNew.agg(count(lit(1)).cast("long").as("n_new"))))
      .select(lit(3).as("tier"), lit("minhash_lsh").as("method"),
        col("n_flagged"), col("n_new"))
    t1.unionAll(t2).unionAll(t3).orderBy(col("tier"))
  }

  val queries: Map[String, Q] = Map(
    "t_perplexity_buckets" -> tPerplexityBuckets,
    "a_lorenz_points" -> aLorenzPoints,
    "dedup_funnel" -> dedupFunnel)

  val oracles: Map[String, String] = Map(
    "t_perplexity_buckets" ->
      """WITH toks AS (
        |  SELECT doc_id, toks[i] AS w, CAST(i AS BIGINT) AS pos
        |  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |  CROSS JOIN unnest(range(1, len(toks) + 1)) AS r(i)),
        |lm AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM toks),
        |nll AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |         round(list_sum(list(-ln(c::DOUBLE / t::DOUBLE)
        |           ORDER BY pos)) / CAST(count(*) AS DOUBLE), 6) AS h
        |  FROM toks JOIN lm USING (w) CROSS JOIN tot
        |  GROUP BY doc_id),
        |ranked AS (
        |  SELECT doc_id, n_tok, h,
        |         CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS rk,
        |         CAST(count(*) OVER () AS BIGINT) AS n,
        |         CAST(floor(h * 1000000.0) AS BIGINT) AS h_micro
        |  FROM nll)
        |SELECT CASE WHEN rk * 3 <= n THEN 'head'
        |            WHEN rk * 3 <= n * 2 THEN 'middle'
        |            ELSE 'tail' END AS bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |       CAST(sum(h_micro) AS DOUBLE) / 1000000.0
        |         / CAST(count(*) AS DOUBLE) AS mean_h,
        |       CAST(min(h_micro) AS DOUBLE) / 1000000.0 AS min_h,
        |       CAST(max(h_micro) AS DOUBLE) / 1000000.0 AS max_h
        |FROM ranked GROUP BY 1 ORDER BY bucket""".stripMargin,
    "a_lorenz_points" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |ranked AS (
        |  SELECT x,
        |         CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT)
        |           AS rk,
        |         CAST(sum(x) OVER (ORDER BY x, o_custkey
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cumx
        |  FROM cust),
        |tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx
        |  FROM cust),
        |dec AS (
        |  SELECT decile, n, sx,
        |         CAST(ceil(n::DOUBLE * decile::DOUBLE / 10.0) AS BIGINT) AS rkb
        |  FROM (SELECT unnest(range(1, 11)) AS decile FROM (SELECT 1))
        |  CROSS JOIN tot)
        |SELECT CAST(decile AS INTEGER) AS decile,
        |       rk AS n_customers,
        |       round(cumx::DOUBLE / sx::DOUBLE, 6) AS cum_revenue_share
        |FROM ranked JOIN dec ON ranked.rk = dec.rkb
        |ORDER BY decile""".stripMargin,
    "dedup_funnel" -> {
      s"""WITH ${TrainingData.minhashCtes},
         |exact AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, count(*) OVER (PARTITION BY md5(text)) AS n
         |    FROM documents) WHERE n > 1),
         |norm AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, count(*) OVER (PARTITION BY
         |      md5(trim(regexp_replace(regexp_replace(lower(text),
         |        '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g')))) AS n
         |    FROM documents) WHERE n > 1),
         |near AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT d1 AS doc_id FROM lshp UNION ALL SELECT d2 FROM lshp)),
         |t1 AS (
         |  SELECT 1 AS tier, 'exact' AS method,
         |         CAST(count(*) AS BIGINT) AS n_flagged,
         |         CAST(count(*) AS BIGINT) AS n_new
         |  FROM exact),
         |t2 AS (
         |  SELECT 2 AS tier, 'normalized' AS method,
         |         (SELECT CAST(count(*) AS BIGINT) FROM norm) AS n_flagged,
         |         CAST(count(*) AS BIGINT) AS n_new
         |  FROM (SELECT doc_id FROM norm
         |        WHERE doc_id NOT IN (SELECT doc_id FROM exact))),
         |t3 AS (
         |  SELECT 3 AS tier, 'minhash_lsh' AS method,
         |         (SELECT CAST(count(*) AS BIGINT) FROM near) AS n_flagged,
         |         CAST(count(*) AS BIGINT) AS n_new
         |  FROM (SELECT doc_id FROM near
         |        WHERE doc_id NOT IN (SELECT doc_id FROM exact
         |                             UNION SELECT doc_id FROM norm)))
         |SELECT tier, method, n_flagged, n_new FROM t1
         |UNION ALL SELECT tier, method, n_flagged, n_new FROM t2
         |UNION ALL SELECT tier, method, n_flagged, n_new FROM t3
         |ORDER BY tier""".stripMargin
    })
}
