package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 36: the Wald–Wolfowitz runs test (randomness audit
  * on the daily revenue sign sequence — regime persistence that
  * variance metrics miss), Heaps'-law vocabulary growth (V ∝ N^β —
  * the corpus-diversity fit that falls when a crawl starts repeating
  * itself), and a Jaccard-threshold sweep (near-dup pair/doc counts
  * across the threshold grid — the knob-tuning curve run before
  * committing a dedup threshold). All Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData41 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_runs_test — Wald–Wolfowitz runs test on daily revenue
  // dichotomized about the median: R runs of above/below signs,
  // z = (R − μ_R)/σ_R with μ_R = 2n₁n₂/n + 1 and
  // σ²_R = 2n₁n₂(2n₁n₂ − n)/(n²(n−1)). Too FEW runs = persistent
  // regimes (momentum), too many = oscillation. Values equal to the
  // median are dropped (the standard treatment). Scale shape: the
  // corpus reduces to the calendar-bounded daily series; the median
  // rank pick, the sign lag, and the run count all run over that
  // bounded series (documented low-cardinality family); all counts
  // exact longs into one fixed double DAG.
  // ---------------------------------------------------------------
  val aRunsTest: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
      .localCheckpoint(eager = false) // median pick AND the sign sequence
    val n0 = daily.agg(count(lit(1)).cast("long").as("n0"))
    val med = daily
      .withColumn("rk", row_number().over(Grain.bounded(col("m"), col("day")))
        .cast("long"))
      .crossJoin(broadcast(n0))
      .filter(col("rk") >= expr("(n0 + 1) div 2") &&
        col("rk") <= expr("(n0 + 2) div 2"))
      .agg((sum(col("m")).cast("double") / count(lit(1)).cast("double"))
        .as("med"))
    val signs = daily.crossJoin(broadcast(med))
      .filter(d(col("m")) =!= col("med"))
      .withColumn("above", d(col("m")) > col("med"))
      .withColumn("prev", lag(col("above"), 1).over(Grain.bounded(col("day"))))
    val agg = signs.agg(count(lit(1)).cast("long").as("n"),
      sum(when(col("above"), 1L).otherwise(0L)).cast("long").as("n1"),
      (sum(when(col("prev").isNull || col("prev") =!= col("above"), 1L)
        .otherwise(0L))).cast("long").as("r"))
      .withColumn("n2", col("n") - col("n1"))
    val tw = lit(2.0) * d(col("n1")) * d(col("n2"))
    val muR = tw / d(col("n")) + lit(1.0)
    val varR = tw * (tw - d(col("n"))) /
      (d(col("n")) * d(col("n")) * (d(col("n")) - lit(1.0)))
    val z = (d(col("r")) - muR) / sqrt(varR)
    agg.select(col("n").as("n_days_used"), col("n1").as("n_above"),
      col("n2").as("n_below"), col("r").as("n_runs"),
      round(z, 6).as("z"),
      when(abs(z) > 1.96, "non_random").otherwise(lit("random")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // t_vocab_growth — Heaps'-law fit V(N) = k·N^β over the corpus in
  // reproducible md5 ingestion order: per-doc novel-type counts
  // (each token charged to the FIRST doc in that order), cumulative
  // token/vocab curves via the two-phase global cumsum (never a
  // single-partition window over the corpus), then the log-log
  // least-squares slope. β ≈ 0.5 is healthy natural text; β falling
  // with corpus size is the repetition signature dedup exists to
  // fix. Scale shape: the rank and both cumsums are
  // Ranking.withGlobalRank/CumSums (range partition + P carries);
  // the first-occurrence charge is one min-aggregate on the token
  // key. Float policy: the regression folds ln() terms in pinned
  // rank order (sorted fold; plain sum at real scale — the
  // documented deviation class); outputs round to 6 dp.
  // ---------------------------------------------------------------
  val tVocabGrowth: Q = (s, dir) => {
    val base = Tables.table(s, dir, "documents")
      .select(col("doc_id"), md5(col("doc_id").cast("string")).as("key"),
        TF.tokenCount(col("text")).as("n_tok"))
    val ranked = Ranking.withGlobalRank(base, "rk", col("key"), col("doc_id"))
      .localCheckpoint(eager = false) // posting join + the cumsum input
    val novel = Tables.table(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(TF.tokens(col("text"))))
        .as("tok"))
      .join(ranked.select(col("doc_id"), col("rk")), Seq("doc_id"))
      .groupBy(col("tok")).agg(min(col("rk")).as("first_rk"))
      .groupBy(col("first_rk")).agg(count(lit(1)).cast("long").as("novel"))
    val joined = ranked
      .join(novel.withColumnRenamed("first_rk", "rk"), Seq("rk"), "left")
      .na.fill(0L, Seq("novel"))
    val cums = Ranking.withGlobalCumSums(joined,
      Seq("n_tok" -> "cum_tok", "novel" -> "cum_vocab"),
      col("key"), col("doc_id"))
    val pts = cums.select(col("rk"),
      log(d(col("cum_tok"))).as("x"), log(d(col("cum_vocab"))).as("y"))
    def fold(v: String): Column =
      expr(s"aggregate(sort_array(collect_list(struct(rk, $v))), 0D," +
        s" (a, q) -> a + q.$v)")
    val m = pts
      .select(col("rk"), col("x"), col("y"), (col("x") * col("y")).as("xy"),
        (col("x") * col("x")).as("xx"), (col("y") * col("y")).as("yy"))
      .agg(count(lit(1)).cast("long").as("n"), fold("x").as("sx"),
        fold("y").as("sy"), fold("xy").as("sxy"), fold("xx").as("sxx"),
        fold("yy").as("syy"))
    val beta = (d(col("n")) * col("sxy") - col("sx") * col("sy")) /
      (d(col("n")) * col("sxx") - col("sx") * col("sx"))
    val lnk = (col("sy") - beta * col("sx")) / d(col("n"))
    val r2num = (d(col("n")) * col("sxy") - col("sx") * col("sy")) *
      (d(col("n")) * col("sxy") - col("sx") * col("sy"))
    val r2den = (d(col("n")) * col("sxx") - col("sx") * col("sx")) *
      (d(col("n")) * col("syy") - col("sy") * col("sy"))
    val tot = Tables.table(s, dir, "documents")
      .select(explode(array_distinct(TF.tokens(col("text")))).as("tok"))
      .agg(countDistinct(col("tok")).cast("long").as("vocab_size"))
    m.crossJoin(broadcast(tot))
      .select(col("n").as("n_docs"), col("vocab_size"),
        round(beta, 6).as("beta"), round(lnk, 6).as("ln_k"),
        round(r2num / r2den, 6).as("r2"))
  }

  // ---------------------------------------------------------------
  // t_jaccard_threshold_sweep — near-dup yield across the threshold
  // grid {0.5 … 0.9}: pair count and distinct affected docs at each
  // cut, from ONE run of the prefix-filtered exact pair join at the
  // loosest threshold (every tighter cut is a filter over the same
  // pair stream — five dedup configurations priced for the cost of
  // one). The curve is how a curation run picks its threshold:
  // where the doc count stops falling, tightening buys nothing.
  // Scale shape: inherits dedup_jaccard_pairs' identical-set
  // collapse + rarest-first prefix postings; the sweep itself is a
  // 5× explode over the (already small) pair stream.
  // ---------------------------------------------------------------
  private val SweepThresholds = Seq(0.5, 0.6, 0.7, 0.8, 0.9)

  val tJaccardThresholdSweep: Q = (s, dir) => {
    // no checkpoint on the raw pair stream: its ONE consumer is the
    // exploded sweep below, whose own checkpoint is the shared
    // barrier for the five threshold readers — the former extra
    // materialization re-paid the full t=0.5 pair join once per run
    val pairs = Dedup.jaccardPairsRaw(s, dir, SweepThresholds.head)
    val sweep = pairs.select(col("d1"), col("d2"), col("jaccard"),
        explode(array(SweepThresholds.map(lit): _*)).as("threshold"))
      .filter(col("jaccard") >= col("threshold"))
      .localCheckpoint(eager = false) // pair-count AND doc-count consumers
    val np = sweep.groupBy(col("threshold"))
      .agg(count(lit(1)).cast("long").as("n_pairs"))
    val nd = sweep
      .select(col("threshold"), explode(array(col("d1"), col("d2"))).as("doc"))
      .groupBy(col("threshold"))
      .agg(countDistinct(col("doc")).cast("long").as("n_dup_docs"))
    np.join(nd, Seq("threshold")).orderBy(col("threshold"))
  }

  val queries: Map[String, Q] = Map(
    "a_runs_test" -> aRunsTest,
    "t_vocab_growth" -> tVocabGrowth,
    "t_jaccard_threshold_sweep" -> tJaccardThresholdSweep)

  val oracles: Map[String, String] = Map(
    "a_runs_test" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |n0 AS (SELECT CAST(count(*) AS BIGINT) AS n0 FROM daily),
        |med AS (
        |  SELECT CAST(sum(m) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS med
        |  FROM (SELECT m, CAST(row_number() OVER (ORDER BY m, day) AS BIGINT)
        |          AS rk FROM daily) CROSS JOIN n0
        |  WHERE rk >= (n0 + 1) // 2 AND rk <= (n0 + 2) // 2),
        |signs AS (
        |  SELECT m::DOUBLE > med AS above,
        |         lag(m::DOUBLE > med, 1) OVER (ORDER BY day) AS prev
        |  FROM daily CROSS JOIN med
        |  WHERE m::DOUBLE <> med),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN prev IS NULL OR prev <> above
        |           THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM signs),
        |f AS (
        |  SELECT n, n1, n - n1 AS n2, r,
        |         2.0 * n1::DOUBLE * (n - n1)::DOUBLE AS tw
        |  FROM agg)
        |SELECT n AS n_days_used, n1 AS n_above, n2 AS n_below, r AS n_runs,
        |       round((r::DOUBLE - (tw / n::DOUBLE + 1.0))
        |         / sqrt(tw * (tw - n::DOUBLE)
        |             / (n::DOUBLE * n::DOUBLE * (n::DOUBLE - 1.0))), 6) AS z,
        |       CASE WHEN abs((r::DOUBLE - (tw / n::DOUBLE + 1.0))
        |              / sqrt(tw * (tw - n::DOUBLE)
        |                  / (n::DOUBLE * n::DOUBLE * (n::DOUBLE - 1.0)))) > 1.96
        |            THEN 'non_random' ELSE 'random' END AS verdict
        |FROM f""".stripMargin,
    "t_vocab_growth" ->
      """WITH base AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         CAST(row_number() OVER (
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
        |           AS rk
        |  FROM documents),
        |post AS (
        |  SELECT tok, min(rk) AS first_rk
        |  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' ')))
        |          AS tok FROM documents) p
        |  JOIN base USING (doc_id)
        |  GROUP BY tok),
        |novel AS (
        |  SELECT first_rk AS rk, CAST(count(*) AS BIGINT) AS novel
        |  FROM post GROUP BY 1),
        |cums AS (
        |  SELECT b.rk,
        |         CAST(sum(b.n_tok) OVER (ORDER BY b.rk) AS BIGINT) AS cum_tok,
        |         CAST(sum(coalesce(n.novel, 0)) OVER (ORDER BY b.rk)
        |           AS BIGINT) AS cum_vocab
        |  FROM base b LEFT JOIN novel n ON n.rk = b.rk),
        |pts AS (
        |  SELECT rk, ln(cum_tok::DOUBLE) AS x, ln(cum_vocab::DOUBLE) AS y
        |  FROM cums),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         list_sum(list(x ORDER BY rk)) AS sx,
        |         list_sum(list(y ORDER BY rk)) AS sy,
        |         list_sum(list(x * y ORDER BY rk)) AS sxy,
        |         list_sum(list(x * x ORDER BY rk)) AS sxx,
        |         list_sum(list(y * y ORDER BY rk)) AS syy
        |  FROM pts),
        |tot AS (
        |  SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab_size
        |  FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS tok
        |        FROM documents))
        |SELECT n AS n_docs, vocab_size,
        |       round((n::DOUBLE * sxy - sx * sy)
        |         / (n::DOUBLE * sxx - sx * sx), 6) AS beta,
        |       round((sy - (n::DOUBLE * sxy - sx * sy)
        |           / (n::DOUBLE * sxx - sx * sx) * sx) / n::DOUBLE, 6) AS ln_k,
        |       round((n::DOUBLE * sxy - sx * sy) * (n::DOUBLE * sxy - sx * sy)
        |         / ((n::DOUBLE * sxx - sx * sx)
        |            * (n::DOUBLE * syy - sy * sy)), 6) AS r2
        |FROM m CROSS JOIN tot""".stripMargin,
    "t_jaccard_threshold_sweep" ->
      """WITH tokens AS (
        |  SELECT doc_id, lang, source,
        |         unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tokens GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM tokens a JOIN tokens b
        |    ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT d1, d2,
        |         CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        |  FROM inter
        |  JOIN sizes sa ON d1 = sa.doc_id
        |  JOIN sizes sb ON d2 = sb.doc_id
        |  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5),
        |sweep AS (
        |  SELECT d1, d2, jaccard, t.threshold
        |  FROM pairs CROSS JOIN (
        |    SELECT unnest(CAST([0.5, 0.6, 0.7, 0.8, 0.9] AS DOUBLE[]))
        |      AS threshold) t
        |  WHERE jaccard >= t.threshold),
        |np AS (
        |  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM sweep GROUP BY 1),
        |nd AS (
        |  SELECT threshold, CAST(count(DISTINCT doc) AS BIGINT) AS n_dup_docs
        |  FROM (SELECT threshold, d1 AS doc FROM sweep
        |        UNION ALL SELECT threshold, d2 FROM sweep)
        |  GROUP BY 1)
        |SELECT threshold, n_pairs, n_dup_docs
        |FROM np JOIN nd USING (threshold)
        |ORDER BY threshold""".stripMargin)
}
