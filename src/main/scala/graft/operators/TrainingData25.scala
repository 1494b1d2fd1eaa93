package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 20: survey sampling and tail statistics — a
  * systematic (every-k-th in hash order) sample with a strata-
  * representativeness audit, and the Hill estimator of the
  * document-length tail index (the power-law diagnostic next to
  * t_zipf_buckets). Both Spark-first with full-replay DuckDB
  * oracles.
  */
object TrainingData25 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // o_systematic_sample — systematic sampling (Madow 1944): order
  // the population by a deterministic hash (md5 of the key — the
  // classic "random order without randomness"), take every k-th
  // row, and audit representativeness: per order-priority stratum,
  // population share vs sample share. Systematic sampling is the
  // cheapest fixed-rate sampler that still guarantees spread — and
  // the audit is the check that hash order didn't alias a stratum.
  // The global row index comes from the two-phase rank (range
  // partitions + per-partition row_number + broadcast offsets —
  // never a single-partition sort). Counts and shares are exact
  // integers through the micro-unit division. Scale shape: one rank
  // pass over the population, map-side-combining stratum aggregates,
  // one broadcast join of two ≤5-row frames.
  // ---------------------------------------------------------------
  val oSystematicSample: Q = (s, dir) => {
    val pop = Tables.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        md5(col("o_orderkey").cast("string")).as("h"))
    val ranked = Ranking.withGlobalRank(pop, "rk", col("h"), col("o_orderkey"))
      .localCheckpoint(eager = false) // count + sample both read the ranked frame
    val n = ranked.count()
    val k = math.max(1L, n / 256L)
    val sample = ranked.filter((col("rk") - 1) % k === 0)
    val popAgg = ranked.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_pop"))
    val samAgg = sample.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_sample"))
    popAgg.join(samAgg, Seq("o_orderpriority"), "left")
      .select(col("o_orderpriority"), col("n_pop"),
        coalesce(col("n_sample"), lit(0L)).as("n_sample"),
        (expr(s"CAST((n_pop * 1000000) div $n AS BIGINT)") /
          lit(1000000.0)).as("pop_share"),
        (expr(s"CAST((coalesce(n_sample, 0L) * 1000000)" +
          s" div ${math.max(1L, (n + k - 1) / k)} AS BIGINT)") /
          lit(1000000.0)).as("sample_share"),
        lit(k).as("step_k"))
      .orderBy(col("o_orderpriority"))
  }

  // ---------------------------------------------------------------
  // a_tail_index — Hill (1975) tail-index estimator over document
  // lengths: α̂ = k / Σᵢ₌₁..ₖ ln(x₍ᵢ₎ / x₍ₖ₊₁₎) on the top-k order
  // statistics (k = 64) — the standard power-law-tail diagnostic a
  // corpus report runs next to the Zipf bucket fit (α ≈ 1–2 means
  // heavy tail: truncation budgets and packing bins must plan for
  // it). Determinism: the top-65 selection is a TakeOrderedAndProject
  // on (n_chars DESC, doc_id) — a total order, so the threshold
  // x₍ₖ₊₁₎ is unambiguous even with tied lengths; the ln-ratio sum
  // folds in rank order (sorted-fold policy; ln is the one libm
  // call — round 6, the bm25 rule). Scale shape: map-side top-k to
  // 65 rows, then a bounded fold — the corpus never shuffles.
  // ---------------------------------------------------------------
  val aTailIndex: Q = (s, dir) => {
    val k = 64
    val top = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("x"))
      .orderBy(desc("x"), col("doc_id"))
      .limit(k + 1)
    top
      // sort key (BIG - x, doc_id) ascending == (x desc, doc_id asc)
      .agg(sort_array(collect_list(struct((lit(9999999999L) - col("x"))
          .as("nx"), col("doc_id").as("tid"), col("x").as("xv"))),
        asc = true).as("rs"))
      .select(expr(
        s"""aggregate(slice(rs, 1, $k), CAST(0.0 AS DOUBLE),
           |  (acc, r) -> acc + ln(CAST(r.xv AS DOUBLE)
           |    / CAST(element_at(rs, ${k + 1}).xv AS DOUBLE)))"""
          .stripMargin).as("lnsum"),
        expr(s"element_at(rs, ${k + 1}).xv").as("x_threshold"))
      .select(lit(k.toLong).as("k"), col("x_threshold"),
        round(lit(k.toDouble) / col("lnsum"), 6).as("hill_alpha"),
        round(col("lnsum"), 6).as("ln_ratio_sum"))
  }

  val queries: Map[String, Q] = Map(
    "o_systematic_sample" -> oSystematicSample,
    "a_tail_index" -> aTailIndex)

  val oracles: Map[String, String] = Map(
    "o_systematic_sample" ->
      """WITH pop AS (
        |  SELECT o_orderkey, o_orderpriority,
        |         md5(CAST(o_orderkey AS VARCHAR)) AS h
        |  FROM orders),
        |n_ AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pop),
        |k_ AS (SELECT greatest(1, n // 256) AS k, n FROM n_),
        |ranked AS (
        |  SELECT o_orderpriority,
        |         CAST(row_number() OVER (ORDER BY h, o_orderkey) AS BIGINT)
        |           AS rk
        |  FROM pop),
        |sam AS (
        |  SELECT r.o_orderpriority
        |  FROM ranked r CROSS JOIN k_
        |  WHERE (r.rk - 1) % k_.k = 0),
        |pa AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_pop
        |  FROM ranked GROUP BY 1),
        |sa AS (
        |  SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_sample
        |  FROM sam GROUP BY 1)
        |SELECT pa.o_orderpriority, pa.n_pop,
        |       coalesce(sa.n_sample, 0) AS n_sample,
        |       CAST((pa.n_pop * 1000000) // k_.n AS BIGINT) / 1000000.0
        |         AS pop_share,
        |       CAST((coalesce(sa.n_sample, 0) * 1000000)
        |         // greatest(1, (k_.n + k_.k - 1) // k_.k) AS BIGINT)
        |         / 1000000.0 AS sample_share,
        |       k_.k AS step_k
        |FROM pa LEFT JOIN sa USING (o_orderpriority) CROSS JOIN k_
        |ORDER BY pa.o_orderpriority""".stripMargin,
    "a_tail_index" ->
      """WITH top AS (
        |  SELECT CAST(n_chars AS BIGINT) AS x, doc_id
        |  FROM documents ORDER BY x DESC, doc_id LIMIT 65),
        |rs AS (
        |  SELECT list({'xv': x, 'tid': doc_id}
        |           ORDER BY 9999999999 - x, doc_id) AS rs
        |  FROM top)
        |SELECT CAST(64 AS BIGINT) AS k,
        |       rs[65].xv AS x_threshold,
        |       round(64.0 / list_sum(list_transform(range(1, 65),
        |         i -> ln(CAST(rs[i].xv AS DOUBLE)
        |           / CAST(rs[65].xv AS DOUBLE)))), 6) AS hill_alpha,
        |       round(list_sum(list_transform(range(1, 65),
        |         i -> ln(CAST(rs[i].xv AS DOUBLE)
        |           / CAST(rs[65].xv AS DOUBLE)))), 6) AS ln_ratio_sum
        |FROM rs""".stripMargin)
}
