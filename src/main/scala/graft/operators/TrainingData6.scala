package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 2: statistical monitoring and curation extensions —
  * Mann–Kendall trend test (Mann 1945; Kendall 1975), Gopher-style
  * document quality rules (Rae et al. 2021 §A1.1), first/last-touch
  * marketing attribution, k-core decomposition (Seidman 1983),
  * deterministic Poisson bootstrap (Chamandy et al. 2012 — the
  * streaming/distributed bootstrap), and MMR diversified retrieval
  * (Carbonell & Goldstein 1998) — all public algorithms re-expressed
  * Spark-first with full-replay DuckDB oracles.
  *
  * Reference behavior basis: the reference's serve tier stops at
  * dashboard scans; these extend the engine's training-data surface
  * (SURVEY extension families) like TrainingData1-5.
  */
object TrainingData6 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // a_mann_kendall — Mann–Kendall monotone-trend test on daily
  // revenue (the standard nonparametric "is this KPI drifting" test
  // in monitoring stacks): S = Σ_{i<j} sign(x_j − x_i) over the daily
  // series, tie-corrected variance
  //   var S = (n(n−1)(2n+5) − Σ_k t_k(t_k−1)(2t_k+5)) / 18,
  // z = (S∓1)/√var S (continuity-corrected), trend called at |z| >
  // 1.96. Scale shape: the corpus reduces through the exact-decimal
  // daily aggregate FIRST; the pairwise sign join is days² — bounded
  // by the CALENDAR (2.4k days → 2.9M pairs at every sf), never
  // rows². Signs compare exact decimals; S and both variance terms
  // are exact integers; the only floats are one division, one sqrt.
  // ---------------------------------------------------------------
  val aMannKendall: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
      .localCheckpoint(eager = false) // consumed by both pair sides + ties + n
    val sSt = daily.alias("a")
      .join(daily.alias("b"), col("a.day") < col("b.day")) // calendar²-bounded
      .agg(coalesce(sum(when(col("b.rev") > col("a.rev"), 1L)
        .when(col("b.rev") < col("a.rev"), -1L).otherwise(0L)), lit(0L))
        .cast("long").as("s_stat"))
    val ties = daily.groupBy(col("rev")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
        lit(0L)).cast("long").as("tie_term"))
    val n = daily.agg(count(lit(1)).as("n_days"))
    val z = when(col("s_stat") > 0, d(col("s_stat") - 1) / sqrt(col("var_s")))
      .when(col("s_stat") < 0, d(col("s_stat") + 1) / sqrt(col("var_s")))
      .otherwise(lit(0.0))
    n.crossJoin(broadcast(sSt)).crossJoin(broadcast(ties))
      .withColumn("var_s",
        d(col("n_days") * (col("n_days") - 1) * (lit(2) * col("n_days") + 5)
          - col("tie_term")) / lit(18.0))
      .select(col("n_days"), col("s_stat"), round(col("var_s"), 6).as("var_s"),
        round(z, 6).as("z"),
        when(z > 1.96, "increasing").when(z < -1.96, "decreasing")
          .otherwise(lit("no_trend")).as("trend"))
  }

  // ---------------------------------------------------------------
  // t_gopher_rules — the Gopher document-quality rule battery (Rae
  // et al. 2021 §A1.1, the filter set FineWeb/Dolma descend from),
  // adapted to the repo's primitives: word count in [50, 100k], mean
  // word length in [3, 10], ≥ 2 stopword hits (the shared 5-word
  // list), ≥ 80% alphabetic tokens, type-token ratio ≥ 0.2 (the
  // repetition proxy). Output: per-lang rule-level pass counts + the
  // conjunctive keep count — the per-rule attrition table a curation
  // run reports. Scale shape: one scan, one shuffle on the 5-key
  // lang; every flag is integer-derived (the two ratio rules are
  // single divisions of exact ints, compared identically by any
  // IEEE engine); all outputs exact longs.
  // ---------------------------------------------------------------
  val tGopherRules: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val nt = size(toks)
    val f = docs(s, dir).select(col("lang"),
      (nt >= 50 && nt <= 100000).as("r_wordcount"),
      (TF.avgWordLen(col("text")) >= 3.0 &&
        TF.avgWordLen(col("text")) <= 10.0).as("r_wordlen"),
      (size(filter(toks, t => t.isin(TF.stopwords: _*))) >= 2).as("r_stopword"),
      (d(size(filter(toks, t => t.rlike("[a-zA-Z]")))) / d(nt) >= 0.8)
        .as("r_alpha"),
      (d(size(array_distinct(toks))) / d(nt) >= 0.2).as("r_ttr"))
    def cnt(c: String) = sum(when(col(c), 1L).otherwise(0L)).cast("long").as(c)
    f.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), cnt("r_wordcount"), cnt("r_wordlen"),
        cnt("r_stopword"), cnt("r_alpha"), cnt("r_ttr"),
        sum(when(col("r_wordcount") && col("r_wordlen") && col("r_stopword")
          && col("r_alpha") && col("r_ttr"), 1L).otherwise(0L)).cast("long")
          .as("n_keep"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // ev_attribution — first-touch / last-touch conversion attribution
  // (the marketing-analytics classic; same mechanics as "which
  // upstream source produced this training doc"): for each purchase,
  // the first and the most recent preceding NON-purchase event of
  // the same user are the credited channels ('none' when the
  // purchase opens the history). Revenue credit per channel under
  // both models, side by side. Scale shape: one window pass per user
  // (ts, event_id)-ordered — the sessionize shape, no self-join;
  // money sums are exact DECIMAL(18,2) cast DOUBLE at the edge.
  // ---------------------------------------------------------------
  val evAttribution: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val p = Tables.table(s, dir, "events")
      .withColumn("first_touch",
        coalesce(first(touch, ignoreNulls = true).over(w), lit("none")))
      .withColumn("last_touch",
        coalesce(last(touch, ignoreNulls = true).over(w), lit("none")))
      .filter(col("event_type") === "purchase")
      .localCheckpoint(eager = false) // consumed by both channel aggregates
    val byFirst = p.groupBy(col("first_touch").as("channel"))
      .agg(count(lit(1)).as("n_first"),
        sum(dec(col("value"))).as("fv"))
    val byLast = p.groupBy(col("last_touch").as("channel"))
      .agg(count(lit(1)).as("n_last"),
        sum(dec(col("value"))).as("lv"))
    byFirst.join(byLast, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        d(coalesce(col("fv"), lit(0))).as("first_touch_value"),
        coalesce(col("n_last"), lit(0L)).as("n_last"),
        d(coalesce(col("lv"), lit(0))).as("last_touch_value"))
      .orderBy(col("channel"))
  }

  // ---------------------------------------------------------------
  // g_kcore — 3-core of the k-NN similarity graph (Seidman 1983):
  // iteratively peel nodes of degree < 3 until fixpoint — the
  // "dense neighborhoods" reduction that strips hair off the
  // near-dup graph before community detection. Spark runs the peel
  // as a driver-bounded loop (≤ 8 rounds, early-exit at fixpoint —
  // the sim_kmeans_converged convention) of degree-count + two
  // left-semi joins, localCheckpointing per round to bound lineage;
  // the oracle unrolls the SAME 8 rounds as chained CTEs, and
  // fixpoint makes early-exit ≡ full-unroll. Scale shape: each round
  // is one count aggregate + hash semi-joins on the edge set (out-
  // degree-3-bounded, so |E| ~ 6·|V|) — never pairwise.
  // ---------------------------------------------------------------
  val gKcore: Q = (s, dir) => {
    val kMin = 3; val maxRounds = 8
    var edges = TrainingData5.knnUndirected(s, dir).localCheckpoint(eager = false)
    var nNodes = edges.select(col("src")).distinct().count()
    var r = 0; var done = false
    while (!done && r < maxRounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("dg"))
        .filter(col("dg") >= kMin).select(col("src").as("node"))
        .localCheckpoint(eager = false) // consumed by both semi-join sides + count
      val k = keep.count()
      if (k == nNodes) done = true
      else {
        edges = edges
          .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .localCheckpoint(eager = false)
        nNodes = k
      }
      r += 1
    }
    edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).cast("long").as("core_deg"))
      .orderBy(col("node"))
  }

  /** Poisson(1) inverse-CDF thresholds, pre-scaled to the 48-bit
    * hash grid: weight w = #{k : T(k) ≤ h} for the 48-bit md5 hash h
    * — pure INTEGER comparisons, so the resample is bit-portable to
    * any engine with md5 (no float CDF to disagree on). T(k) =
    * floor(2⁴⁸ · e⁻¹ Σ_{j≤k} 1/j!), k = 0..7 (P(w>8) < 2⁻⁴⁰). */
  val poissonT: Seq[Long] = Seq(
    103548857136060L, 207097714272121L, 258872142840152L, 276130285696162L,
    280444821410164L, 281307728552965L, 281451546410098L, 281472091818260L)

  // ---------------------------------------------------------------
  // a_poisson_bootstrap — distributed bootstrap CI for the mean
  // event value via Poisson(1) resampling (Chamandy et al. 2012,
  // the production-scale bootstrap: independent per-row weights
  // need no global resample): B = 64 replicates; row r's weight in
  // replicate b is the Poisson(1) inverse-CDF of the 48-bit
  // md5(event_id#b) — deterministic, integer-compared (poissonT).
  // Replicate means divide exact integer sums (micro-quantized
  // decimal money); the CI is the (2nd, 63rd) order statistic of
  // the 64 means (≈ 2.5/97.5%), the SE the sample std via two
  // chained b-ordered folds (the DuckDB struct-accumulator quirk
  // forbids one two-field fold). Scale shape: the ×64 explode
  // map-combines straight to 64 groups — no shuffle growth, no
  // row² anywhere; sums are exact longs (micro-units × Σw ≲ 2⁶³
  // through ~10¹² rows; beyond that the dec38 sum family applies).
  // ---------------------------------------------------------------
  val aPoissonBootstrap: Q = (s, dir) => {
    val bN = 64
    val base = Tables.table(s, dir, "events")
      .select(col("event_id"),
        floor(dec(col("value")) * 1000000).cast("long").as("m"))
      .localCheckpoint(eager = false) // consumed by the explode and the point agg
    val tArr = array(poissonT.map(lit): _*)
    val rep = base
      .withColumn("b", explode(sequence(lit(0), lit(bN - 1))))
      .withColumn("h", conv(substring(md5(concat(
        col("event_id").cast("string"), lit("#"), col("b").cast("string"))),
        1, 12), 16, 10).cast("long"))
      .withColumn("w", size(filter(tArr, t => t <= col("h"))).cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("w")).cast("long").as("nb"),
        sum(col("w") * col("m")).cast("long").as("sb"))
      .withColumn("mean_b", d(col("sb")) / d(col("nb")) / lit(1000000.0))
    val folded = rep.agg(
      count(lit(1)).as("b_reps"),
      sort_array(collect_list(struct(col("mean_b"), col("b")))).as("byv"),
      expr("aggregate(sort_array(collect_list(struct(b, mean_b))), 0D," +
        " (a, x) -> a + x.mean_b)").as("sx"),
      expr("aggregate(sort_array(collect_list(struct(b, mean_b))), 0D," +
        " (a, x) -> a + x.mean_b * x.mean_b)").as("sxx"))
    val point = base.agg(count(lit(1)).as("n_events"),
      sum(col("m")).cast("long").as("sm"))
    folded.crossJoin(broadcast(point))
      .select(col("n_events"), col("b_reps"),
        round(d(col("sm")) / d(col("n_events")) / lit(1000000.0), 6)
          .as("point_mean"),
        round(element_at(col("byv"), 2).getField("mean_b"), 6).as("boot_lo"),
        round(element_at(col("byv"), bN - 1).getField("mean_b"), 6)
          .as("boot_hi"),
        round(sqrt((col("sxx") - col("sx") * col("sx") / lit(bN.toDouble))
          / lit((bN - 1).toDouble)), 6).as("boot_se"))
  }

  // ---------------------------------------------------------------
  // sim_mmr — Maximal Marginal Relevance diversified top-k
  // (Carbonell & Goldstein 1998, the standard RAG/search
  // de-redundancy re-rank): for each of 5 query vectors, greedily
  // pick 5 of the top-12 cosine candidates maximizing
  //   λ·rel(q, d) − (1−λ)·max_{s ∈ picked} sim(d, s),   λ = 0.7.
  // Spark unrolls the 5 greedy steps as a driver-built plan (each
  // step: semi-join the pair sims to the picked set, max per
  // candidate, windowed argmax) — no collect, parallel by query.
  // Scale shape: only the candidate leg touches the corpus (the
  // sim_cosine_topk broadcast brute baseline, 5 query vectors); the
  // greedy machinery runs on nQ·depth² = 720 pair rows regardless
  // of corpus size. Floats: rel/psim are the shared cosine twins,
  // the score is one fixed expression, argmax ties break on doc_id.
  // ---------------------------------------------------------------
  val simMmr: Q = (s, dir) => {
    val nQ = 5; val depth = 12; val kOut = 5; val lam = 0.7
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
    val qe = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val cand = emb.join(broadcast(qe), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        Similarity.cosine(col("qe"), col("e")).as("rel"), col("e"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("rel"), col("doc_id"))))
      .filter(col("rk") <= depth)
      .select(col("query_id"), col("doc_id"), col("rel"), col("e"))
      // nQ·depth = 60 rows by construction: single-partition is the
      // right layout for the greedy tail (the corpus-scan leg above
      // keeps its parallelism); without it every step's window/join
      // pays 32-partition shuffle scheduling on a 60-row frame
      .coalesce(1)
      .localCheckpoint(eager = false) // consumed by pair sims + every greedy step
    val ps = cand.alias("x")
      .join(cand.alias("y"), col("x.query_id") === col("y.query_id") &&
        col("x.doc_id") =!= col("y.doc_id"))
      .select(col("x.query_id").as("query_id"), col("x.doc_id").as("a"),
        col("y.doc_id").as("b"),
        Similarity.cosine(col("x.e"), col("y.e")).as("psim"))
      .coalesce(1)
      .localCheckpoint(eager = false) // nQ·depth² = 720 rows, reused 4×
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(desc("score"), col("doc_id"))
    var picked = cand
      .withColumn("score", lit(lam) * col("rel"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") === 1)
      .select(col("query_id"), lit(1).cast("int").as("step"), col("doc_id"),
        col("rel"), col("score"))
    for (step <- 2 to kOut) {
      val mx = ps
        .join(picked.select(col("query_id"), col("doc_id").as("b")),
          Seq("query_id", "b"), "left_semi")
        .groupBy(col("query_id"), col("a")).agg(max(col("psim")).as("mx"))
      val next = cand
        .join(picked.select(col("query_id"), col("doc_id")),
          Seq("query_id", "doc_id"), "left_anti")
        .join(mx.withColumnRenamed("query_id", "qid"),
          col("query_id") === col("qid") && col("doc_id") === col("a"))
        .drop("qid", "a")
        // 0.3 as a LITERAL: (1.0 - 0.7) in double arithmetic is
        // 0.30000000000000004 — a different double than the oracle's
        // written 0.3, and the scores would diverge past rounding
        .withColumn("score", lit(lam) * col("rel") - lit(0.3) * col("mx"))
        .withColumn("rn", row_number().over(wq)).filter(col("rn") === 1)
        .select(col("query_id"), lit(step).cast("int").as("step"),
          col("doc_id"), col("rel"), col("score"))
      // picked is referenced 3x per step (semi, anti, union): without
      // a per-step checkpoint the lineage grows 3^k and Catalyst
      // re-optimizes an exponentially growing plan (seconds of pure
      // driver CPU on 25-row frames)
      picked = picked.union(next).coalesce(1).localCheckpoint(eager = false)
    }
    picked.select(col("query_id"), col("step"), col("doc_id"),
      round(col("rel"), 6).as("rel"), round(col("score"), 6).as("mmr"))
      .orderBy(col("query_id"), col("step"))
  }

  val queries: Map[String, Q] = Map(
    "a_mann_kendall" -> aMannKendall,
    "t_gopher_rules" -> tGopherRules,
    "ev_attribution" -> evAttribution,
    "g_kcore" -> gKcore,
    "a_poisson_bootstrap" -> aPoissonBootstrap,
    "sim_mmr" -> simMmr)

  /** DuckDB dot/cosine — the bit-identical Similarity twins. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Hex md5 prefix → integer (fold twin of conv(substr(md5),16,10)). */
  private def hexSql(x: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  /** The 8 unrolled peel rounds of g_kcore's oracle (fixpoint makes
    * Spark's early-exit ≡ the full unroll). */
  private def kcoreRounds(n: Int): String =
    (1 to n).map { i =>
      s"""k$i AS MATERIALIZED (SELECT src AS node FROM p${i - 1}
         |  GROUP BY 1 HAVING count(*) >= 3),
         |p$i AS MATERIALIZED (SELECT e.src, e.dst FROM p${i - 1} e
         |  JOIN k$i a ON e.src = a.node JOIN k$i b ON e.dst = b.node)"""
        .stripMargin
    }.mkString(",\n")

  /** The 4 unrolled greedy steps 2..5 of sim_mmr's oracle. */
  private def mmrSteps(kOut: Int): String =
    (2 to kOut).map { i =>
      s"""s$i AS (
         |  SELECT query_id, CAST($i AS INTEGER) AS step, doc_id, rel, score
         |  FROM (
         |    SELECT c.query_id, c.doc_id, c.rel,
         |           0.7 * c.rel - 0.3 * m.mx AS score,
         |           row_number() OVER (PARTITION BY c.query_id
         |             ORDER BY (0.7 * c.rel - 0.3 * m.mx) DESC, c.doc_id) AS rn
         |    FROM (SELECT p.query_id, p.a, max(p.psim) AS mx
         |          FROM ps p JOIN sel${i - 1} s
         |            ON p.query_id = s.query_id AND p.b = s.doc_id
         |          GROUP BY 1, 2) m
         |    JOIN cand c ON c.query_id = m.query_id AND c.doc_id = m.a
         |    WHERE NOT EXISTS (SELECT 1 FROM sel${i - 1} s2
         |            WHERE s2.query_id = c.query_id
         |              AND s2.doc_id = c.doc_id))
         |  WHERE rn = 1),
         |sel$i AS (SELECT query_id, doc_id FROM sel${i - 1}
         |          UNION ALL SELECT query_id, doc_id FROM s$i)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "a_mann_kendall" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |p AS (
        |  SELECT CASE WHEN b.rev > a.rev THEN 1
        |              WHEN b.rev < a.rev THEN -1 ELSE 0 END AS sg
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |s AS (SELECT CAST(coalesce(sum(sg), 0) AS BIGINT) AS s_stat FROM p),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily),
        |t AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
        |        AS tie_term
        |      FROM (SELECT count(*) AS t FROM daily GROUP BY rev) WHERE t > 1),
        |v AS (
        |  SELECT n.n_days, s.s_stat,
        |         CAST(n.n_days * (n.n_days - 1) * (2 * n.n_days + 5) - t.tie_term
        |           AS DOUBLE) / 18.0 AS var_s
        |  FROM n CROSS JOIN s CROSS JOIN t),
        |z AS (
        |  SELECT *, CASE WHEN s_stat > 0
        |                 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(var_s)
        |                 WHEN s_stat < 0
        |                 THEN CAST(s_stat + 1 AS DOUBLE) / sqrt(var_s)
        |                 ELSE 0.0 END AS zr
        |  FROM v)
        |SELECT n_days, s_stat, round(var_s, 6) AS var_s, round(zr, 6) AS z,
        |       CASE WHEN zr > 1.96 THEN 'increasing'
        |            WHEN zr < -1.96 THEN 'decreasing'
        |            ELSE 'no_trend' END AS trend
        |FROM z""".stripMargin,
    "t_gopher_rules" ->
      """WITH f AS (
        |  SELECT lang,
        |         len(toks) BETWEEN 50 AND 100000 AS r_wordcount,
        |         (CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |            / CAST(len(toks) AS DOUBLE)) BETWEEN 3.0 AND 10.0
        |           AS r_wordlen,
        |         len(list_filter(toks, t -> t IN ('the','a','of','and','to')))
        |           >= 2 AS r_stopword,
        |         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-zA-Z]')))
        |             AS DOUBLE) / CAST(len(toks) AS DOUBLE) >= 0.8 AS r_alpha,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) >= 0.2 AS r_ttr
        |  FROM (SELECT lang, text, string_split(text, ' ') AS toks
        |        FROM documents))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN r_wordcount THEN 1 ELSE 0 END) AS BIGINT)
        |         AS r_wordcount,
        |       CAST(sum(CASE WHEN r_wordlen THEN 1 ELSE 0 END) AS BIGINT)
        |         AS r_wordlen,
        |       CAST(sum(CASE WHEN r_stopword THEN 1 ELSE 0 END) AS BIGINT)
        |         AS r_stopword,
        |       CAST(sum(CASE WHEN r_alpha THEN 1 ELSE 0 END) AS BIGINT)
        |         AS r_alpha,
        |       CAST(sum(CASE WHEN r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS r_ttr,
        |       CAST(sum(CASE WHEN r_wordcount AND r_wordlen AND r_stopword
        |                      AND r_alpha AND r_ttr THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_keep
        |FROM f GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_attribution" ->
      """WITH t AS (
        |  SELECT *,
        |         coalesce(first_value(CASE WHEN event_type <> 'purchase'
        |             THEN event_type END IGNORE NULLS) OVER w, 'none')
        |           AS first_touch,
        |         coalesce(last_value(CASE WHEN event_type <> 'purchase'
        |             THEN event_type END IGNORE NULLS) OVER w, 'none')
        |           AS last_touch
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |p AS (SELECT * FROM t WHERE event_type = 'purchase'),
        |f AS (
        |  SELECT first_touch AS channel, CAST(count(*) AS BIGINT) AS n_first,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS fv
        |  FROM p GROUP BY 1),
        |l AS (
        |  SELECT last_touch AS channel, CAST(count(*) AS BIGINT) AS n_last,
        |         SUM(CAST(value AS DECIMAL(18,2))) AS lv
        |  FROM p GROUP BY 1)
        |SELECT coalesce(f.channel, l.channel) AS channel,
        |       coalesce(f.n_first, 0) AS n_first,
        |       CAST(coalesce(f.fv, 0) AS DOUBLE) AS first_touch_value,
        |       coalesce(l.n_last, 0) AS n_last,
        |       CAST(coalesce(l.lv, 0) AS DOUBLE) AS last_touch_value
        |FROM f FULL OUTER JOIN l ON f.channel = l.channel
        |ORDER BY channel""".stripMargin,
    "g_kcore" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |p0 AS MATERIALIZED (SELECT src, dst FROM edges UNION
         |       SELECT dst, src FROM edges),
         |${kcoreRounds(8)}
         |SELECT src AS node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM p8 GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_poisson_bootstrap" -> {
      val tList = poissonT.mkString("[", ", ", "]")
      s"""WITH base AS (
         |  SELECT event_id,
         |         CAST(floor(CAST(value AS DECIMAL(18,2)) * 1000000) AS BIGINT)
         |           AS m
         |  FROM events),
         |rep AS (
         |  SELECT t.b, base.m,
         |         CAST(len(list_filter($tList, x -> x <=
         |           ${hexSql("CAST(base.event_id AS VARCHAR) || '#' || CAST(t.b AS VARCHAR)", 12)}
         |           )) AS BIGINT) AS w
         |  FROM base CROSS JOIN range(0, 64) t(b)),
         |agg AS (
         |  SELECT b, CAST(sum(w) AS BIGINT) AS nb,
         |         CAST(sum(w * m) AS BIGINT) AS sb
         |  FROM rep GROUP BY 1),
         |mn AS (
         |  SELECT b, CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) / 1000000.0
         |           AS mean_b
         |  FROM agg),
         |fold AS (
         |  SELECT CAST(count(*) AS BIGINT) AS b_reps,
         |         list(mean_b ORDER BY mean_b, b) AS byv,
         |         list_sum(list(mean_b ORDER BY b)) AS sx,
         |         list_sum(list(mean_b * mean_b ORDER BY b)) AS sxx
         |  FROM mn),
         |pt AS (SELECT CAST(count(*) AS BIGINT) AS n_events,
         |              CAST(sum(m) AS BIGINT) AS sm
         |       FROM base)
         |SELECT pt.n_events, fold.b_reps,
         |       round(CAST(pt.sm AS DOUBLE) / CAST(pt.n_events AS DOUBLE)
         |         / 1000000.0, 6) AS point_mean,
         |       round(fold.byv[2], 6) AS boot_lo,
         |       round(fold.byv[63], 6) AS boot_hi,
         |       round(sqrt((fold.sxx - fold.sx * fold.sx / 64.0) / 63.0), 6)
         |         AS boot_se
         |FROM fold CROSS JOIN pt""".stripMargin
    },
    "sim_mmr" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |           AS emb
         |  FROM embeddings),
         |cand AS (
         |  SELECT query_id, doc_id, rel FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS doc_id,
         |           ${cosSql("q.emb", "n.emb")} AS rel,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosSql("q.emb", "n.emb")} DESC, n.vec_id)
         |             AS rk
         |    FROM e q JOIN e n ON n.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5)
         |  WHERE rk <= 12),
         |ce AS (
         |  SELECT c.query_id, c.doc_id, c.rel, e.emb
         |  FROM cand c JOIN e ON c.doc_id = e.vec_id),
         |ps AS (
         |  SELECT x.query_id, x.doc_id AS a, y.doc_id AS b,
         |         ${cosSql("x.emb", "y.emb")} AS psim
         |  FROM ce x JOIN ce y
         |    ON x.query_id = y.query_id AND x.doc_id <> y.doc_id),
         |s1 AS (
         |  SELECT query_id, CAST(1 AS INTEGER) AS step, doc_id, rel,
         |         0.7 * rel AS score
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |          ORDER BY (0.7 * rel) DESC, doc_id) AS rn FROM cand)
         |  WHERE rn = 1),
         |sel1 AS (SELECT query_id, doc_id FROM s1),
         |${mmrSteps(5)}
         |SELECT query_id, step, doc_id, round(rel, 6) AS rel,
         |       round(score, 6) AS mmr
         |FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2
         |      UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4
         |      UNION ALL SELECT * FROM s5)
         |ORDER BY query_id, step""".stripMargin)
}
