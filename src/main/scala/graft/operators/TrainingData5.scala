package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 curation/retrieval extensions: hybrid lexical+vector
  * retrieval fusion (RRF), link prediction over the k-NN graph
  * (Adamic–Adar), temperature-scaled multilingual sampling weights,
  * leakage-safe (dup-group-consistent) split assignment, domain-level
  * quality gating, classifier calibration audit (reliability bins),
  * day-of-week seasonality, and a chi-square independence test —
  * all public algorithms (Cormack et al. 2009 RRF; Adamic & Adar
  * 2003; the multilingual alpha-sampling of XLM-style pretraining;
  * Naeini et al. ECE; Pearson 1900), re-expressed Spark-first with
  * full-replay DuckDB oracles.
  *
  * Reference behavior basis: the reference's serve tier stops at
  * dashboard scans; these extend the engine's north-star
  * training-data surface (SURVEY extension families: dedup,
  * similarity search, text curation, sampling).
  */
object TrainingData5 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  /** The deterministic md5-nibble split rule shared with
    * t_split_assign (train 12/16, val 2/16, test 2/16). */
  private def splitOf(key: Column): Column =
    when(substring(md5(key.cast("string")), 1, 1).isin("c", "d"), "val")
      .when(substring(md5(key.cast("string")), 1, 1).isin("e", "f"), "test")
      .otherwise("train")

  // ---------------------------------------------------------------
  // sim_rrf_fusion — hybrid retrieval via reciprocal-rank fusion
  // (Cormack et al. 2009, the standard lexical+vector ensembling in
  // RAG/search stacks): for each of 10 query documents, fuse (a) the
  // lexical ranking by distinct-token overlap with the query text
  // (integer-exact, so the lexical list is reproducible on any
  // engine) and (b) the embedding cosine ranking (doc_id ≡ vec_id —
  // the corpus alignment), each truncated at depth 20, with
  // rrf = Σ 1/(60 + rank). Ranks are integers, so the fused score is
  // a fixed-order sum of two exact rationals — bit-stable. Scale
  // shape: the lexical side is an inverted-index join on tokens
  // (query tokens × corpus postings, never query × corpus text); the
  // vector side broadcasts the 10 query vectors over one corpus
  // scan; both rank stages are per-query top-k windows over
  // already-trimmed candidate sets; missing ranks surface as -1.
  // ---------------------------------------------------------------
  val simRrfFusion: Q = (s, dir) => {
    val nQ = 10; val depth = 20; val kRrf = 60; val kOut = 5
    val dtoks = docs(s, dir)
      .select(col("doc_id"), explode(array_distinct(TF.tokens(col("text"))))
        .as("tok"))
      .localCheckpoint(eager = false) // consumed as both query tokens and postings
    val qtoks = dtoks.filter(col("doc_id") < nQ)
      .select(col("doc_id").as("query_id"), col("tok"))
    val lex = qtoks.join(dtoks, Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("ov"))
      .withColumn("lex_rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("ov"), col("doc_id"))))
      .filter(col("lex_rk") <= depth)
      .select(col("query_id"), col("doc_id"), col("lex_rk"))
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
    val qe = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
    val vec = emb.join(broadcast(qe), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        Similarity.cosine(col("qe"), col("e")).as("cos"))
      .withColumn("vec_rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("cos"), col("doc_id"))))
      .filter(col("vec_rk") <= depth)
      .select(col("query_id"), col("doc_id"), col("vec_rk"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      // a NULL rank contributes nothing: 1/(60+NULL) is NULL → 0
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kRrf) + col("lex_rk")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf) + col("vec_rk")), lit(0.0)))
      .withColumn("fused_rk", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(desc("rrf"), col("doc_id"))))
      .filter(col("fused_rk") <= kOut)
      .select(col("query_id"), col("doc_id"),
        coalesce(col("lex_rk"), lit(-1)).as("lex_rk"),
        coalesce(col("vec_rk"), lit(-1)).as("vec_rk"),
        round(col("rrf"), 6).as("rrf"), col("fused_rk"))
      .orderBy(col("query_id"), col("fused_rk"))
  }

  // ---------------------------------------------------------------
  // g_adamic_adar — link prediction over the k-NN similarity graph
  // (Adamic & Adar 2003): for every NON-adjacent 2-hop pair (u, v),
  // score Σ over common neighbors w of 1/ln(deg(w)) — the "which
  // near-dup clusters are about to merge" / "which docs are the same
  // topic" signal a curation pass reads off the similarity graph.
  // Edges come from the shared cell-blocked k-NN construction
  // (TrainingData2.knnEdgesWithAssigned), undirected by symmetric
  // union. Scale shape: pair work is Σ_w deg(w)² — bounded by cell
  // occupancy (the graph is cell-local, out-degree 3), never
  // corpus²; deg(w) ≥ 3 so ln(deg) never divides by zero; the AA
  // fold sums contributions in neighbor order (bit-stable); output
  // is a bounded top-100 on the 6-dp-rounded score (the bm25
  // rounded-rank precedent) with the (u, v) tiebreak.
  // ---------------------------------------------------------------
  /** The undirected k-NN edge set (symmetric closure of the cell-
    * blocked top-3 graph) — public so the spec can verify the
    * non-adjacency contract against the same edges. */
  def knnUndirected(s: SparkSession, dir: String): DataFrame = {
    val (edges, _) = TrainingData2.knnEdgesWithAssigned(s, dir)
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
  }

  val gAdamicAdar: Q = (s, dir) => {
    val und = knnUndirected(s, dir)
      .localCheckpoint(eager = false) // consumed by deg, both hop sides, anti join
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val a = und.alias("a"); val b = und.alias("b")
    val hops = a.join(b, col("a.dst") === col("b.src") &&
        col("a.src") < col("b.dst") && col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("u"), col("b.dst").as("v"), col("a.dst").as("w"))
      .join(deg, col("w") === col("node"))
      .select(col("u"), col("v"), col("w"),
        (lit(1.0) / log(d(col("deg")))).as("contrib"))
    hops
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("n_common"),
        expr("aggregate(sort_array(collect_list(struct(w, contrib))), 0D," +
          " (a, x) -> a + x.contrib)").as("aa"))
      // predict NEW links only: drop pairs already adjacent
      .join(und, col("u") === col("src") && col("v") === col("dst"), "left_anti")
      .select(col("u"), col("v"), col("n_common"), round(col("aa"), 6).as("aa"))
      .orderBy(desc("aa"), col("u"), col("v"))
      .limit(100)
  }

  // ---------------------------------------------------------------
  // t_temperature_mix — temperature-scaled multilingual sampling
  // weights (the α-sampling of XLM-R-style pretraining, α = 0.3):
  // per language, raw token share p_l, reweighted share
  // q_l = p_l^α / Σ p_m^α, and the up/down-sampling multiplier
  // q_l / p_l — the mixture table a training loader consumes to keep
  // low-resource languages from vanishing. Counts are exact longs;
  // shares are single divisions; pow/ln go through libm so the float
  // outputs round to 6 dp (the bm25 precedent), and the Σ p^α
  // normalizer folds in language order (≤ langs values — bit-stable
  // via the sorted-fold pattern). Scale shape: one map-side count
  // aggregate (lang cardinality groups), two broadcast-scalar joins.
  // ---------------------------------------------------------------
  val tTemperatureMix: Q = (s, dir) => {
    val alpha = 0.3
    val perLang = docs(s, dir)
      .select(col("lang"), TF.tokenCount(col("text")).as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("nt")).cast("long").as("n_tokens"))
    val tot = perLang.agg(sum(col("n_tokens")).cast("long").as("total_tokens"))
    val shared = perLang.crossJoin(broadcast(tot))
      .withColumn("raw_share", d(col("n_tokens")) / d(col("total_tokens")))
      .withColumn("w", pow(col("raw_share"), lit(alpha)))
      .localCheckpoint(eager = false) // consumed by the normalizer and the output
    val norm = shared.agg(
      expr("aggregate(sort_array(collect_list(struct(lang, w))), 0D," +
        " (a, x) -> a + x.w)").as("sum_w"))
    shared.crossJoin(broadcast(norm))
      .withColumn("alpha_share", col("w") / col("sum_w"))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("raw_share"), 6).as("raw_share"),
        round(col("alpha_share"), 6).as("alpha_share"),
        round(col("alpha_share") / col("raw_share"), 6).as("multiplier"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // t_leakage_safe_split — dup-group-consistent train/val/test
  // assignment: documents split by the md5 nibble of their near-dup
  // GROUP representative (the MinHash-LSH connected components of
  // dedup_groups), so two near-duplicates can never straddle splits
  // — the leakage-safe upgrade of t_split_assign's per-doc rule
  // (per-doc hashing leaks val/test content into train through
  // near-dup copies; group-keyed hashing is the standard fix). The
  // audit output per split: doc count, distinct group count, docs in
  // multi-doc groups, and how many docs MOVED vs the naive per-doc
  // rule. Scale shape: the group machinery is the existing LSH +
  // hybrid union-find (linear-ish in near-dup mass); membership
  // joins back on doc_id; everything after is one small aggregate.
  // All outputs integer — exact.
  // ---------------------------------------------------------------
  val tLeakageSafeSplit: Q = (s, dir) => {
    val membership = Dedup
      .dupGroups(Dedup.minhashLshPairsRaw(s, dir, portableHashes = true))
      .select(col("canonical_id"), explode(col("members")).as("doc_id"))
    docs(s, dir).select(col("doc_id"))
      .join(membership, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("rep"),
        col("canonical_id").isNotNull.as("grouped"))
      .withColumn("split", splitOf(col("rep")))
      .withColumn("naive", splitOf(col("doc_id")))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("rep")).as("n_groups"),
        sum(when(col("grouped"), 1L).otherwise(0L)).cast("long")
          .as("n_grouped_docs"),
        sum(when(col("split") =!= col("naive"), 1L).otherwise(0L)).cast("long")
          .as("n_moved_docs"))
      .orderBy(col("split"))
  }

  // ---------------------------------------------------------------
  // t_domain_filter — domain-level quality gating (the CommonCrawl
  // curation step between per-doc filters and dedup: a consistently
  // low-quality domain is dropped wholesale, catching boilerplate
  // farms whose individual pages pass per-doc thresholds): per
  // source, mean quality (per-doc scores quantized to exact integer
  // micro-units via floor(q·10⁶) — the t_dataset_card float policy,
  // no half-boundary), keep = mean ≥ 0.42, and the kept/dropped doc
  // accounting. One scan, one shuffle on the (tiny) source key;
  // integer sums + two divisions in a fixed order.
  // ---------------------------------------------------------------
  val tDomainFilter: Q = (s, dir) => {
    val threshold = 0.42
    docs(s, dir)
      .select(col("source"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).as("qm"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("qm")).cast("long").as("sum_qm"))
      .withColumn("mean_quality",
        d(col("sum_qm")) / d(col("n_docs")) / lit(1000000.0))
      .withColumn("keep_source", col("mean_quality") >= threshold)
      .select(col("source"), col("n_docs"),
        round(col("mean_quality"), 6).as("mean_quality"), col("keep_source"),
        when(col("keep_source"), col("n_docs")).otherwise(0L).cast("long")
          .as("n_docs_kept"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // t_calibration_ece — reliability bins for the linear quality
  // classifier (the calibration audit run before trusting model
  // scores as sampling weights; Naeini et al. 2015 ECE shape): docs
  // bin by predicted score decile; per bin, mean predicted score
  // (floor-micro exact sums — the t_dataset_card policy) vs the
  // observed positive rate against an INDEPENDENT ground truth
  // (heuristic quality ≥ 0.42 — not the classifier's own keep flag,
  // which would be circular), and the |gap| whose n-weighted sum is
  // ECE. Scale shape: one scan computing features + score, one
  // shuffle on the 10-bin key. The sigmoid goes through exp() so
  // binning/micro-floor sit on the documented 1-ulp-tolerant floor
  // grid; all sums are exact integers, divisions fixed-order.
  // ---------------------------------------------------------------
  val tCalibrationEce: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val f = docs(s, dir).select(col("doc_id"),
      (size(toks).cast("double") / lit(100.0)).as("x_len"),
      TF.stopwordRatio(col("text")).as("x_stop"),
      (TF.avgWordLen(col("text")) / lit(10.0)).as("x_wlen"),
      (size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
        .as("x_distinct"),
      (TF.qualityScore(col("text")) >= 0.42).as("good"))
    val logit = lit(-0.7) + lit(0.8) * col("x_len") + lit(2.0) * col("x_stop") +
      lit(-1.2) * col("x_wlen") + lit(1.5) * col("x_distinct")
    f.withColumn("score", lit(1.0) / (lit(1.0) + exp(-logit)))
      .withColumn("bin", least(lit(9L), floor(col("score") * 10).cast("long")))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(floor(col("score") * lit(1000000.0))).cast("long").as("sm"),
        sum(when(col("good"), 1L).otherwise(0L)).cast("long").as("n_pos"))
      .withColumn("mean_score", d(col("sm")) / d(col("n_docs")) / lit(1000000.0))
      .withColumn("pos_rate", d(col("n_pos")) / d(col("n_docs")))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        round(col("mean_score"), 6).as("mean_score"), col("pos_rate"),
        round(abs(col("mean_score") - col("pos_rate")), 6).as("abs_gap"))
      .orderBy(col("bin"))
  }

  // ---------------------------------------------------------------
  // w_dow_seasonality — day-of-week seasonal profile of revenue (the
  // weekly-seasonality decomposition every ops/forecast dashboard
  // starts from): per weekday, day count, average daily revenue, and
  // the seasonal index (weekday average ÷ overall daily average).
  // Money sums are exact DECIMAL(18,2) cast DOUBLE at the edge
  // (repo float policy); the index is two fixed-order divisions of
  // those exact sums — deterministic without rounding. dow is
  // Spark's dayofweek (1 = Sunday … 7 = Saturday; the oracle maps
  // DuckDB's 0-based dayofweek by +1). Scale shape: the row stream
  // reduces through the daily aggregate first, then 7 groups.
  // ---------------------------------------------------------------
  val wDowSeasonality: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
    val byDow = daily.groupBy(dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n_days"),
        expr("CAST(SUM(rev) AS DOUBLE)").as("sum_rev"))
    val overall = daily.agg(count(lit(1)).as("all_days"),
      expr("CAST(SUM(rev) AS DOUBLE)").as("all_rev"))
    byDow.crossJoin(broadcast(overall))
      .withColumn("avg_revenue", col("sum_rev") / d(col("n_days")))
      .withColumn("overall_avg", col("all_rev") / d(col("all_days")))
      .select(col("dow"), col("n_days"), col("avg_revenue"),
        (col("avg_revenue") / col("overall_avg")).as("seasonal_index"))
      .orderBy(col("dow"))
  }

  // ---------------------------------------------------------------
  // a_chi_square — Pearson chi-square independence test of the
  // (lang × source) contingency table, with Cramér's V effect size:
  // the corpus-composition audit ("is language balance uniform
  // across domains, or does some source skew monolingual"). Observed
  // counts and margins are exact integers; each expected count is
  // one fixed-order expression (row·col/N); the χ² statistic folds
  // cell contributions in (lang, source) order — the sorted-fold
  // float policy, ≤ langs·sources values. Scale shape: one count
  // aggregate on the (tiny) pair key, margins re-aggregate from it,
  // everything after is broadcast-scalar arithmetic.
  // ---------------------------------------------------------------
  val aChiSquare: Q = (s, dir) => {
    val cells = docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // consumed by both margins and the fold
    val rowT = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
    val colT = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("lang")).as("r"), countDistinct(col("source")).as("c"))
    cells.join(broadcast(rowT), "lang").join(broadcast(colT), "source")
      .crossJoin(broadcast(n))
      .withColumn("e", d(col("rt")) * d(col("ct")) / d(col("n")))
      .withColumn("contrib",
        (d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(expr("aggregate(sort_array(collect_list(struct(lang, source," +
        " contrib))), 0D, (a, x) -> a + x.contrib)").as("chi2"))
      .select(col("n").cast("long").as("n_docs"),
        col("r").cast("long").as("n_langs"),
        col("c").cast("long").as("n_sources"),
        ((col("r") - 1) * (col("c") - 1)).cast("long").as("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(sqrt(col("chi2") / (d(col("n")) *
          d(least(col("r") - 1, col("c") - 1)))), 6).as("cramers_v"))
  }

  // ---------------------------------------------------------------
  // w_holt_winters — additive Holt–Winters triple exponential
  // smoothing of daily revenue (Winters 1960): level + trend +
  // weekly seasonal (m = 7), α = 0.3, β = 0.1, γ = 0.2, restarting
  // each year (the w_brown_trend convention). The COUPLED recurrence
  //   ŝ     = s[(t−1) mod 7]
  //   l_t   = α(x_t − ŝ) + (1−α)(l_{t−1} + b_{t−1})
  //   b_t   = β(l_t − l_{t−1}) + (1−β)b_{t−1}
  //   s[(t−1) mod 7] ← γ(x_t − l_t) + (1−γ)ŝ
  //   fc    = l_t + b_t + s[t mod 7]        (one-step forecast)
  // initialized at l_0 = x_1, b_0 = 0, s ≡ 0 (phase keyed by the
  // day's index within the year, so calendar gaps can't shear the
  // season) cannot be two chained scalar folds (level, trend and
  // seven seasonal cells feed each other), so this op introduces the
  // third float-replay technique in the repo: ONE Spark
  // higher-order-function fold carrying the full (l, b, s[7])
  // state — lambdas build a fresh struct per step, so Spark is
  // immune to the DuckDB struct-accumulator mutation quirk — and a
  // DuckDB RECURSIVE CTE stepping day by day with the identical
  // arithmetic DAG (the list_reduce form would silently diverge:
  // DuckDB 1.0 mutates multi-field accumulators field by field).
  // Both engines evaluate the same IEEE op sequence, so the raw
  // doubles hash-match un-rounded (the w_ewma precedent).
  // Scale shape: the fold runs over DAYS per year partition (≤366),
  // never the row stream — the corpus reduces through the
  // exact-decimal daily aggregate first; per-year arrays are
  // bounded, the explode-back join is year×day-keyed.
  // ---------------------------------------------------------------
  val wHoltWinters: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("rev"))
      .withColumn("yr", year(col("day")))
      // ≤366-row windows per year partition — the documented
      // low-cardinality window family (never the fact stream)
      .withColumn("t", row_number().over(
        Window.partitionBy(col("yr")).orderBy(col("day"))).cast("int"))
      .localCheckpoint(eager = false) // consumed by the fold input and the join back
    val perYear = daily.groupBy(col("yr"))
      .agg(sort_array(collect_list(struct(col("t"), col("rev")))).as("days"))
    // textual pieces — Spark SQL lambdas have no let-binding, so the
    // level expression L is DUPLICATED into B/S/FC; pure arithmetic,
    // so every copy evaluates to the identical double
    val shat = "element_at(st.s, ((x.t - 1) % 7) + 1)"
    val lprev = "(CASE WHEN st.t = 0 THEN x.rev ELSE st.l END)"
    val L = s"0.3 * (x.rev - $shat) + 0.7 * ($lprev + st.b)"
    val B = s"0.1 * (($L) - $lprev) + 0.9 * st.b"
    val SNEW = s"0.2 * (x.rev - ($L)) + 0.8 * $shat"
    val S = s"transform(sequence(1, 7), j -> CASE WHEN j = ((x.t - 1) % 7) + 1" +
      s" THEN $SNEW ELSE element_at(st.s, j) END)"
    val FC = s"($L) + ($B) + element_at($S, (x.t % 7) + 1)"
    val fold =
      s"""aggregate(
         |  days,
         |  named_struct(
         |    'l', CAST(0.0 AS DOUBLE), 'b', CAST(0.0 AS DOUBLE),
         |    's', array_repeat(CAST(0.0 AS DOUBLE), 7), 't', 0,
         |    'out', CAST(array() AS
         |      ARRAY<STRUCT<t: INT, l: DOUBLE, b: DOUBLE, shat: DOUBLE, fc: DOUBLE>>)),
         |  (st, x) -> named_struct(
         |    'l', $L, 'b', $B, 's', $S, 't', st.t + 1,
         |    'out', concat(st.out, array(named_struct(
         |      't', x.t, 'l', $L, 'b', $B, 'shat', $shat, 'fc', $FC)))))""".stripMargin
    perYear.select(col("yr").as("oyr"), explode(expr(s"($fold).out")).as("o"))
      .join(daily, col("oyr") === col("yr") && col("o.t") === col("t"))
      .select(col("day"), col("rev").as("revenue"),
        col("o.l").as("level"), col("o.b").as("trend"),
        col("o.shat").as("seasonal"), col("o.fc").as("forecast_next"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // a_kmv_distinct — bottom-k (KMV / k-minimum-values) distinct
  // sketch per source (Bar-Yossef et al. 2002): keep the k = 8
  // smallest 48-bit md5 token-hashes; the k-th smallest h_k estimates
  // distinct count as (k−1)·2⁴⁸/h_k (exact count when fewer than k
  // survive). The OTHER sketch family next to HLL++
  // (a_approx_distinct) — and unlike HLL, the DuckDB oracle replays
  // it EXACTLY (min-k is order-free), so the estimate hash-matches
  // rather than being boolean-tolerance-checked. 48-bit hashes are
  // deliberate: they embed exactly in the Aggregator's double score
  // (< 2⁵³), so map-side top-k keeps the identical set on any
  // partitioning. Scale shape: the corpus pre-trims map-side to
  // k rows per source (TopKAggBy — never a per-source sort); the
  // exact count rides the same shuffle for the audit columns.
  // ---------------------------------------------------------------
  val aKmvDistinct: Q = (s, dir) => {
    val k = 8
    val toks = docs(s, dir)
      .select(col("source"), explode(array_distinct(TF.tokens(col("text"))))
        .as("tok"))
      .distinct() // one row per (source, token): hash each value once
      .withColumn("h", conv(substring(md5(col("tok")), 1, 12), 16, 10)
        .cast("long"))
    val mink = udaf(new graft.functions.TopKAgg(k))
    toks
      .groupBy(col("source"))
      // smallest k ⇔ top-k of the negated hash (exact: 48-bit < 2⁵³)
      .agg(countDistinct(col("tok")).as("n_distinct_exact"),
        mink((-col("h")).cast("double"), col("h")).as("mins"))
      .select(col("source"), col("n_distinct_exact"),
        size(col("mins")).as("kmv_k"),
        element_at(col("mins"), size(col("mins"))).getField("_2").as("hk"))
      .withColumn("kmv_est",
        when(col("kmv_k") < k, d(col("n_distinct_exact")))
          .otherwise(lit((k - 1).toDouble * math.pow(2.0, 48)) / d(col("hk"))))
      .select(col("source"), col("n_distinct_exact"), col("kmv_k"),
        round(col("kmv_est"), 6).as("kmv_est"),
        round(abs(col("kmv_est") - d(col("n_distinct_exact"))) /
          d(col("n_distinct_exact")), 6).as("rel_err"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // o_compaction_plan — small-partition compaction planning via
  // first-fit-decreasing bin packing (the table-maintenance step
  // that rewrites a fragmented 100 TB table: many small (lang,
  // source) partitions packed into target-sized shards). Capacity =
  // 2·max partition size (data-derived, so the plan is meaningful at
  // every sf); groups place largest-first into the first bin that
  // fits, else open a new bin — the classic 11/9·OPT+1 heuristic.
  // FFD is sequential by definition, but over the PARTITION LIST
  // (bounded by lang×source), never the row stream: the corpus
  // reduces to per-group counts first, and the greedy fold runs over
  // ≤100 structs. Integer-exact throughout; the DuckDB oracle steps
  // the same greedy rule as a recursive CTE (list_reduce's
  // multi-field accumulator mutation is avoided, as w_holt_winters
  // documents).
  // ---------------------------------------------------------------
  val oCompactionPlan: Q = (s, dir) => {
    val groups = docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
    val packedInput = groups.agg(
      (lit(2) * max(col("n"))).as("cap"),
      sort_array(collect_list(struct((-col("n")).as("negn"), col("lang"),
        col("source"), col("n")))).as("gs"))
    val POS = "array_position(transform(st.loads, l -> l + x.n <= cap), true)"
    val BIN = s"CAST(CASE WHEN ($POS) = 0 THEN size(st.loads) + 1" +
      s" ELSE ($POS) END AS INT)"
    val LOADS = s"CASE WHEN ($POS) = 0 THEN concat(st.loads, array(x.n))" +
      s" ELSE transform(st.loads, (l, i) -> CASE WHEN i = ($BIN) - 1" +
      s" THEN l + x.n ELSE l END) END"
    val fold =
      s"""aggregate(
         |  gs,
         |  named_struct(
         |    'loads', CAST(array() AS ARRAY<BIGINT>),
         |    'out', CAST(array() AS
         |      ARRAY<STRUCT<lang: STRING, source: STRING, n: BIGINT, bin: INT>>)),
         |  (st, x) -> named_struct(
         |    'loads', $LOADS,
         |    'out', concat(st.out, array(named_struct(
         |      'lang', x.lang, 'source', x.source, 'n', x.n, 'bin', $BIN)))))""".stripMargin
    packedInput
      .select(col("cap"), explode(expr(s"($fold).out")).as("o"))
      .select(col("o.lang").as("lang"), col("o.source").as("source"),
        col("o.n").as("n_docs"), col("o.bin").as("bin"), col("cap"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // a_psi_drift — population stability index between the first and
  // second half of the event stream (the model-monitoring companion
  // to a_ks_drift: KS tests the max gap, PSI weighs the whole
  // distribution shift the way credit-risk/ML-ops dashboards do).
  // Reference deciles come from EXACT order statistics of the
  // reference period — ranked by the TWO-PHASE global rank (range
  // partition + carries, never a single-partition window), edges =
  // values at ranks floor(i·n/10); both periods then bucket by
  // "count of edges strictly below v" (pure comparisons — no
  // interpolation arithmetic to disagree on). Counts are exact;
  // Laplace-smoothed shares (c+0.5)/(n+5) keep empty buckets
  // finite; per-bucket contribution (p_cur−p_ref)·ln(p_cur/p_ref)
  // rounds to 6 (the ln libm rule). PSI = Σ contrib.
  // ---------------------------------------------------------------
  val aPsiDrift: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("event_id"), col("value"), to_date(col("ts")).as("day"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(expr("date_add(d0, CAST(datediff(d1, d0) / 2 AS INT))").as("mid"))
    val tagged = ev.crossJoin(broadcast(span))
      .withColumn("period", when(col("day") <= col("mid"), "ref")
        .otherwise(lit("cur")))
      .localCheckpoint(eager = false) // consumed by the rank pass and the bucketing
    val ref = tagged.filter(col("period") === "ref")
    val n = ref.count()
    val ranked = Ranking.withGlobalRank(ref, "rk", col("value"), col("event_id"))
    val edges = ranked
      .filter(col("rk").isin((1 to 9).map(i => i.toLong * n / 10): _*))
      .agg(sort_array(collect_set(col("value"))).as("edges"))
    tagged.crossJoin(broadcast(edges))
      .withColumn("bucket",
        (lit(1) + size(filter(col("edges"), e => e < col("value"))))
          .cast("long"))
      .groupBy(col("bucket"))
      .agg(sum(when(col("period") === "ref", 1L).otherwise(0L)).cast("long")
          .as("n_ref"),
        sum(when(col("period") === "cur", 1L).otherwise(0L)).cast("long")
          .as("n_cur"))
      .crossJoin(broadcast(tagged.groupBy()
        .agg(sum(when(col("period") === "ref", 1L).otherwise(0L)).as("t_ref"),
          sum(when(col("period") === "cur", 1L).otherwise(0L)).as("t_cur"))))
      .withColumn("p_ref", (d(col("n_ref")) + lit(0.5)) / (d(col("t_ref")) + lit(5.0)))
      .withColumn("p_cur", (d(col("n_cur")) + lit(0.5)) / (d(col("t_cur")) + lit(5.0)))
      .select(col("bucket"), col("n_ref"), col("n_cur"),
        round(col("p_ref"), 6).as("p_ref"), round(col("p_cur"), 6).as("p_cur"),
        round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6)
          .as("psi_contrib"))
      .orderBy(col("bucket"))
  }

  val queries: Map[String, Q] = Map(
    "sim_rrf_fusion" -> simRrfFusion,
    "g_adamic_adar" -> gAdamicAdar,
    "t_temperature_mix" -> tTemperatureMix,
    "t_leakage_safe_split" -> tLeakageSafeSplit,
    "t_domain_filter" -> tDomainFilter,
    "t_calibration_ece" -> tCalibrationEce,
    "w_dow_seasonality" -> wDowSeasonality,
    "w_holt_winters" -> wHoltWinters,
    "a_kmv_distinct" -> aKmvDistinct,
    "o_compaction_plan" -> oCompactionPlan,
    "a_psi_drift" -> aPsiDrift,
    "a_chi_square" -> aChiSquare)

  /** DuckDB dot/cosine — the bit-identical Similarity twins (same
    * left-fold), shared with the sim_* oracle families. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Hex md5 prefix → integer (the fold twin of Spark's
    * conv(substring(md5(x),1,n),16,10) — same as TrainingData2's). */
  private def hexSql(x: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "a_kmv_distinct" ->
      s"""WITH tk AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest(list_distinct(string_split(text, ' '))) AS tok
         |    FROM documents)),
         |h AS (SELECT source, tok, ${hexSql("tok", 12)} AS h FROM tk),
         |mins AS (
         |  SELECT source, h,
         |         row_number() OVER (PARTITION BY source ORDER BY h) AS rk
         |  FROM h),
         |ex AS (SELECT source, CAST(count(*) AS BIGINT) AS n_distinct_exact
         |       FROM h GROUP BY 1),
         |kk AS (SELECT source, CAST(count(*) AS INTEGER) AS kmv_k,
         |              max(h) AS hk
         |       FROM mins WHERE rk <= 8 GROUP BY 1),
         |est AS (
         |  SELECT ex.source, ex.n_distinct_exact, kk.kmv_k,
         |         CASE WHEN kk.kmv_k < 8 THEN CAST(ex.n_distinct_exact AS DOUBLE)
         |              ELSE CAST(1970324836974592 AS DOUBLE) / CAST(kk.hk AS DOUBLE)
         |         END AS kmv_est
         |  FROM ex JOIN kk USING (source))
         |SELECT source, n_distinct_exact, kmv_k, round(kmv_est, 6) AS kmv_est,
         |       round(abs(kmv_est - CAST(n_distinct_exact AS DOUBLE))
         |         / CAST(n_distinct_exact AS DOUBLE), 6) AS rel_err
         |FROM est ORDER BY source""".stripMargin,
    // the greedy FFD rule steps group by group as a RECURSIVE CTE
    // (the w_holt_winters replay technique — list_reduce's
    // multi-field accumulator mutation is avoided)
    "o_compaction_plan" ->
      """WITH RECURSIVE g AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |cp AS (SELECT 2 * max(n) AS cap FROM g),
        |r AS (
        |  SELECT lang, source, n,
        |         CAST(row_number() OVER (ORDER BY n DESC, lang, source)
        |           AS INTEGER) AS rk
        |  FROM g),
        |ffd(rk, lang, source, n, bin, loads) AS (
        |  SELECT rk, lang, source, n, 1, [n] FROM r WHERE rk = 1
        |  UNION ALL
        |  SELECT rk, lang, source, n, bin,
        |         -- DuckDB list_position returns 0 (not NULL) when absent,
        |         -- matching Spark's array_position
        |         CASE WHEN pos = 0 THEN list_append(loads0, n)
        |              ELSE list_transform(range(1, len(loads0) + 1),
        |                     j -> CASE WHEN j = bin THEN loads0[j] + n
        |                          ELSE loads0[j] END)
        |         END AS loads
        |  FROM (SELECT rk, lang, source, n, loads0, bin, pos FROM (
        |          SELECT r2.rk AS rk, r2.lang AS lang, r2.source AS source,
        |                 r2.n AS n, f.loads AS loads0,
        |                 CAST(CASE WHEN list_position(list_transform(f.loads,
        |                        l -> l + r2.n <= cp.cap), true) = 0
        |                      THEN len(f.loads) + 1
        |                      ELSE list_position(list_transform(f.loads,
        |                        l -> l + r2.n <= cp.cap), true)
        |                      END AS INTEGER) AS bin,
        |                 list_position(list_transform(f.loads,
        |                   l -> l + r2.n <= cp.cap), true) AS pos
        |          FROM ffd f JOIN r r2 ON r2.rk = f.rk + 1 CROSS JOIN cp)))
        |SELECT ffd.lang, ffd.source, ffd.n AS n_docs, ffd.bin,
        |       CAST(cp.cap AS BIGINT) AS cap
        |FROM ffd CROSS JOIN cp
        |ORDER BY ffd.lang, ffd.source""".stripMargin,
    "a_psi_drift" ->
      """WITH ev AS (
        |  SELECT event_id, value, CAST(ts AS DATE) AS day FROM events),
        |sp AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |md AS (SELECT d0 + CAST(date_diff('day', d0, d1) // 2 AS INTEGER)
        |         AS mid FROM sp),
        |tg AS (
        |  SELECT ev.*, CASE WHEN ev.day <= md.mid THEN 'ref' ELSE 'cur' END
        |           AS period
        |  FROM ev CROSS JOIN md),
        |ref AS (SELECT value, event_id FROM tg WHERE period = 'ref'),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ref),
        |rkd AS (
        |  SELECT value,
        |         row_number() OVER (ORDER BY value, event_id) AS rk
        |  FROM ref),
        |rks AS (SELECT list_transform(range(1, 10), i -> (i * n) // 10) AS rl
        |        FROM nn),
        |ed AS (
        |  SELECT list(value ORDER BY value) AS edges FROM (
        |    SELECT DISTINCT value FROM rkd CROSS JOIN rks
        |    WHERE list_contains(rks.rl, rkd.rk))),
        |bk AS (
        |  SELECT 1 + len(list_filter(ed.edges, e -> e < tg.value)) AS bucket,
        |         tg.period
        |  FROM tg CROSS JOIN ed),
        |ct AS (
        |  SELECT bucket,
        |         CAST(sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_ref,
        |         CAST(sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_cur
        |  FROM bk GROUP BY 1),
        |tt AS (
        |  SELECT CAST(sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS t_ref,
        |         CAST(sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
        |           AS t_cur
        |  FROM tg),
        |pp AS (
        |  SELECT bucket, n_ref, n_cur,
        |         (CAST(n_ref AS DOUBLE) + 0.5) / (CAST(t_ref AS DOUBLE) + 5.0)
        |           AS p_ref,
        |         (CAST(n_cur AS DOUBLE) + 0.5) / (CAST(t_cur AS DOUBLE) + 5.0)
        |           AS p_cur
        |  FROM ct CROSS JOIN tt)
        |SELECT CAST(bucket AS BIGINT) AS bucket, n_ref, n_cur,
        |       round(p_ref, 6) AS p_ref, round(p_cur, 6) AS p_cur,
        |       round((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_contrib
        |FROM pp ORDER BY bucket""".stripMargin,
    "sim_rrf_fusion" ->
      s"""WITH dt AS (
         |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
         |  FROM documents),
         |ov AS (
         |  SELECT q.doc_id AS query_id, d.doc_id, count(*) AS ov
         |  FROM dt q JOIN dt d ON q.tok = d.tok AND d.doc_id <> q.doc_id
         |  WHERE q.doc_id < 10 GROUP BY 1, 2),
         |lex AS (
         |  SELECT query_id, doc_id, rk AS lex_rk FROM (
         |    SELECT query_id, doc_id, row_number() OVER (PARTITION BY query_id
         |      ORDER BY ov DESC, doc_id) AS rk FROM ov)
         |  WHERE rk <= 20),
         |e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |vec AS (
         |  SELECT query_id, doc_id, rk AS vec_rk FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS doc_id,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosSql("q.emb", "n.emb")} DESC, n.vec_id) AS rk
         |    FROM e q JOIN e n ON n.vec_id <> q.vec_id
         |    WHERE q.vec_id < 10)
         |  WHERE rk <= 20),
         |f AS (
         |  SELECT coalesce(l.query_id, v.query_id) AS query_id,
         |         coalesce(l.doc_id, v.doc_id) AS doc_id, l.lex_rk, v.vec_rk,
         |         coalesce(1.0 / (60 + l.lex_rk), 0.0)
         |           + coalesce(1.0 / (60 + v.vec_rk), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN vec v
         |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
         |SELECT query_id, doc_id,
         |       CAST(coalesce(lex_rk, -1) AS INTEGER) AS lex_rk,
         |       CAST(coalesce(vec_rk, -1) AS INTEGER) AS vec_rk,
         |       round(rrf, 6) AS rrf, CAST(rk AS INTEGER) AS fused_rk
         |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |        ORDER BY rrf DESC, doc_id) AS rk FROM f)
         |WHERE rk <= 5 ORDER BY query_id, fused_rk""".stripMargin,
    "g_adamic_adar" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (SELECT src, dst FROM edges UNION
         |        SELECT dst, src FROM edges),
         |deg AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY 1),
         |hop AS (
         |  SELECT a.src AS u, b.dst AS v, a.dst AS w
         |  FROM und a JOIN und b ON a.dst = b.src
         |  WHERE a.src < b.dst AND a.src <> b.dst),
         |nc AS (
         |  SELECT u, v, CAST(count(*) AS BIGINT) AS n_common,
         |         list_sum(list(1.0 / ln(CAST(d.deg AS DOUBLE)) ORDER BY hop.w))
         |           AS aa
         |  FROM hop JOIN deg d ON hop.w = d.node GROUP BY 1, 2),
         |nl AS (
         |  SELECT nc.* FROM nc LEFT JOIN und e2
         |    ON nc.u = e2.src AND nc.v = e2.dst
         |  WHERE e2.src IS NULL)
         |SELECT u, v, n_common, round(aa, 6) AS aa
         |FROM nl ORDER BY round(aa, 6) DESC, u, v LIMIT 100""".stripMargin,
    "t_temperature_mix" ->
      """WITH pl AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens FROM pl),
        |sh AS (
        |  SELECT lang, n_docs, n_tokens,
        |         CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE)
        |           AS raw_share,
        |         pow(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE),
        |             0.3) AS w
        |  FROM pl CROSS JOIN t),
        |nz AS (SELECT list_sum(list(w ORDER BY lang)) AS sum_w FROM sh)
        |SELECT lang, n_docs, n_tokens, round(raw_share, 6) AS raw_share,
        |       round(w / sum_w, 6) AS alpha_share,
        |       round(w / sum_w / raw_share, 6) AS multiplier
        |FROM sh CROSS JOIN nz ORDER BY lang""".stripMargin,
    "t_leakage_safe_split" ->
      s"""WITH RECURSIVE ${TrainingData.minhashCtes},
         |nodes AS (SELECT DISTINCT d1 AS id FROM lshp UNION SELECT d2 FROM lshp),
         |gedges AS (SELECT d1 AS a, d2 AS b FROM lshp UNION SELECT d2, d1 FROM lshp),
         |reach(id, rep) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.rep FROM gedges e JOIN reach r ON e.b = r.id),
         |reps AS (SELECT id, min(rep) AS rep FROM reach GROUP BY 1),
         |m AS (
         |  SELECT d.doc_id, coalesce(r.rep, d.doc_id) AS rep,
         |         r.rep IS NOT NULL AS grouped
         |  FROM documents d LEFT JOIN reps r ON d.doc_id = r.id),
         |sp AS (
         |  SELECT doc_id, rep, grouped,
         |         CASE WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) IN ('c','d')
         |              THEN 'val'
         |              WHEN substr(md5(CAST(rep AS VARCHAR)), 1, 1) IN ('e','f')
         |              THEN 'test' ELSE 'train' END AS split,
         |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d')
         |              THEN 'val'
         |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f')
         |              THEN 'test' ELSE 'train' END AS naive
         |  FROM m)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT rep) AS BIGINT) AS n_groups,
         |       CAST(sum(CASE WHEN grouped THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_grouped_docs,
         |       CAST(sum(CASE WHEN split <> naive THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_moved_docs
         |FROM sp GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_domain_filter" ->
      """WITH q AS (
        |  SELECT source,
        |         floor(((1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |           * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
        |                     / CAST(n_tokens AS DOUBLE), 10.0) / 10.0)
        |           * 1000000.0) AS qm
        |  FROM (SELECT source, text,
        |               len(string_split(text, ' ')) AS n_tokens,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(qm) AS BIGINT) AS sum_qm
        |  FROM q GROUP BY 1),
        |mq AS (
        |  SELECT source, n_docs,
        |         CAST(sum_qm AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0
        |           AS mean_quality
        |  FROM g)
        |SELECT source, n_docs, round(mean_quality, 6) AS mean_quality,
        |       mean_quality >= 0.42 AS keep_source,
        |       CAST(CASE WHEN mean_quality >= 0.42 THEN n_docs ELSE 0 END
        |         AS BIGINT) AS n_docs_kept
        |FROM mq ORDER BY source""".stripMargin,
    "t_calibration_ece" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS DOUBLE) / 100.0 AS x_len,
        |         CAST(n_stops AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS x_stop,
        |         (CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |            / CAST(len(toks) AS DOUBLE)) / 10.0 AS x_wlen,
        |         CAST(len(list_distinct(toks)) AS DOUBLE)
        |           / CAST(len(toks) AS DOUBLE) AS x_distinct,
        |         ((1.0 - CAST(n_stops AS DOUBLE) / CAST(len(toks) AS DOUBLE))
        |           * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                     / CAST(len(toks) AS DOUBLE), 10.0) / 10.0) >= 0.42
        |           AS good
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |sc AS (
        |  SELECT doc_id, good,
        |         1.0 / (1.0 + exp(-(-0.7 + 0.8 * x_len + 2.0 * x_stop
        |           + (-1.2) * x_wlen + 1.5 * x_distinct))) AS score
        |  FROM f),
        |b AS (
        |  SELECT least(9, CAST(floor(score * 10) AS BIGINT)) AS bin,
        |         CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(floor(score * 1000000.0)) AS BIGINT) AS sm,
        |         CAST(sum(CASE WHEN good THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        |  FROM sc GROUP BY 1),
        |mm AS (
        |  SELECT bin, n_docs, n_pos,
        |         CAST(sm AS DOUBLE) / CAST(n_docs AS DOUBLE) / 1000000.0
        |           AS mean_score,
        |         CAST(n_pos AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pos_rate
        |  FROM b)
        |SELECT bin, n_docs, n_pos, round(mean_score, 6) AS mean_score,
        |       pos_rate, round(abs(mean_score - pos_rate), 6) AS abs_gap
        |FROM mm ORDER BY bin""".stripMargin,
    "w_dow_seasonality" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |bd AS (
        |  SELECT dayofweek(day) + 1 AS dow, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(SUM(rev) AS DOUBLE) AS sum_rev
        |  FROM daily GROUP BY 1),
        |ov AS (
        |  SELECT CAST(count(*) AS BIGINT) AS all_days,
        |         CAST(SUM(rev) AS DOUBLE) AS all_rev
        |  FROM daily)
        |SELECT CAST(dow AS INTEGER) AS dow, n_days,
        |       sum_rev / CAST(n_days AS DOUBLE) AS avg_revenue,
        |       (sum_rev / CAST(n_days AS DOUBLE))
        |         / (all_rev / CAST(all_days AS DOUBLE)) AS seasonal_index
        |FROM bd CROSS JOIN ov ORDER BY dow""".stripMargin,
    // The recursive CTE steps the coupled (l, b, s[7]) state one day
    // at a time with the SAME arithmetic DAG as the Spark fold —
    // list_reduce is deliberately avoided (DuckDB 1.0 mutates
    // multi-field struct accumulators field by field, so a coupled
    // state silently diverges; the repo memory pins this)
    "w_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT day, rev, year(day) AS yr,
        |         CAST(row_number() OVER (PARTITION BY year(day) ORDER BY day)
        |           AS INTEGER) AS t
        |  FROM daily),
        |hw(yr, t, l, b, s, shat, fc) AS (
        |  SELECT yr, t, l, b, s, shat, l + b + s[(t % 7) + 1] AS fc FROM (
        |    SELECT yr, t, l,
        |           0.1 * (l - lprev) + 0.9 * 0.0 AS b,
        |           list_transform(range(1, 8), j -> CASE WHEN j = 1
        |             THEN 0.2 * (rev - l) + 0.8 * 0.0
        |             ELSE CAST(0.0 AS DOUBLE) END) AS s,
        |           -- explicit DOUBLE: the recursive CTE's column types
        |           -- come from the base arm, and a bare 0.0 is
        |           -- DECIMAL(1,1) — the recursive arm's double shat
        |           -- would then fail to cast
        |           CAST(0.0 AS DOUBLE) AS shat
        |    FROM (SELECT yr, t, rev, rev AS lprev,
        |                 0.3 * (rev - 0.0) + 0.7 * (rev + 0.0) AS l
        |          FROM d2 WHERE t = 1))
        |  UNION ALL
        |  SELECT yr, t, l, b, s, shat, l + b + s[(t % 7) + 1] AS fc FROM (
        |    SELECT yr, t, l,
        |           0.1 * (l - lprev) + 0.9 * bprev AS b,
        |           list_transform(range(1, 8), j -> CASE WHEN j = phase
        |             THEN 0.2 * (rev - l) + 0.8 * shat ELSE s0[j] END) AS s,
        |           shat
        |    FROM (SELECT d.yr, d.t, d.rev,
        |                 hw.l AS lprev, hw.b AS bprev, hw.s AS s0,
        |                 ((d.t - 1) % 7) + 1 AS phase,
        |                 hw.s[((d.t - 1) % 7) + 1] AS shat,
        |                 0.3 * (d.rev - hw.s[((d.t - 1) % 7) + 1])
        |                   + 0.7 * (hw.l + hw.b) AS l
        |          FROM hw JOIN d2 d ON d.yr = hw.yr AND d.t = hw.t + 1)))
        |SELECT d2.day, d2.rev AS revenue, hw.l AS level, hw.b AS trend,
        |       hw.shat AS seasonal, hw.fc AS forecast_next
        |FROM hw JOIN d2 ON hw.yr = d2.yr AND hw.t = d2.t
        |ORDER BY d2.day""".stripMargin,
    "a_chi_square" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT source, sum(o) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT sum(o) AS n, count(DISTINCT lang) AS r,
        |              count(DISTINCT source) AS c
        |       FROM cells),
        |k AS (
        |  SELECT cells.lang, cells.source,
        |         (CAST(o AS DOUBLE) - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |             / CAST(nn.n AS DOUBLE))
        |           * (CAST(o AS DOUBLE) - CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |               / CAST(nn.n AS DOUBLE))
        |           / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |               / CAST(nn.n AS DOUBLE)) AS contrib
        |  FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN nn),
        |s AS (
        |  SELECT list_sum(list(contrib ORDER BY lang, source)) AS chi2 FROM k)
        |SELECT CAST(nn.n AS BIGINT) AS n_docs, CAST(nn.r AS BIGINT) AS n_langs,
        |       CAST(nn.c AS BIGINT) AS n_sources,
        |       CAST((nn.r - 1) * (nn.c - 1) AS BIGINT) AS dof,
        |       round(s.chi2, 6) AS chi2,
        |       round(sqrt(s.chi2 / (CAST(nn.n AS DOUBLE)
        |         * CAST(least(nn.r - 1, nn.c - 1) AS DOUBLE))), 6) AS cramers_v
        |FROM s CROSS JOIN nn""".stripMargin)
}
