package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-12 batch 82: paired nonparametrics, trading-style series
  * monitors, a unit-root test, a corpus-shift audit, and a
  * late-interaction retrieval operator.
  *
  *  - a_wilcoxon_signrank — Wilcoxon signed-rank test of monthly
  *    revenue vs the same month one year earlier (the PAIRED
  *    companion of a_mann_whitney): exact half-unit midranks of
  *    |d|, tie-corrected normal z, A&S-erf p.
  *  - w_bollinger_bands — 20-day rolling mean ± 2σ breach days on
  *    daily revenue, all window moments exact integers (the
  *    monitoring-dashboard band rule).
  *  - w_rsi_wilder — Wilder's RSI(14) as a per-year day-ascending
  *    EWMA fold over exact gain/loss deltas; overbought/oversold
  *    day census (the w_croston/w_holt_grid array-fold family).
  *  - w_adf_test — Dickey–Fuller unit-root probe on the daily
  *    revenue AR(1): t-statistic of (b − 1) against the −2.86
  *    5% critical value (the granger exact-moment OLS machinery).
  *  - t_unigram_kl — per-source unigram KL(source ‖ corpus) in
  *    nats: token-shift audit before mixing sources into a
  *    training corpus; order-free quantized-contribution sum.
  *  - sim_maxsim_multivector — ColBERT-style late interaction over
  *    4×16-dim sub-vectors of the embedding: score = Σ_q max_d
  *    cos(sub_q, sub_d), top-3 per query (the multi-vector
  *    retrieval shape, exactly replayable).
  *
  * Float policy: exact integer/decimal moments; sequential state
  * folds only via aggregate(sort_array(...)) with a list_reduce
  * oracle twin (element-wise sequential in both engines); bulk
  * float sums quantized to integers BEFORE summation (order-free)
  * or hi/lo-split (TrainingData78's discipline); round-6 only on
  * O(1)-magnitude outputs.
  */
object TrainingData82 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  /** A&S 7.1.26 erf (x ≥ 0) — the a_bh_fdr polynomial. */
  private def erfAS(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = t * (lit(0.254829592) +
      t * (lit(-0.284496736) +
        t * (lit(1.421413741) +
          t * (lit(-1.453152027) + t * lit(1.061405429)))))
    lit(1.0) - poly * exp(-(x * x))
  }

  private def erfSql(x: String): String =
    s"""(1.0 - (1.0 / (1.0 + 0.3275911 * $x)) * (0.254829592
       |  + (1.0 / (1.0 + 0.3275911 * $x)) * ((-0.284496736)
       |  + (1.0 / (1.0 + 0.3275911 * $x)) * (1.421413741
       |  + (1.0 / (1.0 + 0.3275911 * $x)) * ((-1.453152027)
       |  + (1.0 / (1.0 + 0.3275911 * $x)) * 1.061405429))))
       |  * exp(-($x * $x)))""".stripMargin.replaceAll("\n", " ")

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  // ---------------------------------------------------------------
  // a_wilcoxon_signrank — pairs: (month m of year y) vs (m, y−1),
  // both present; d = exact cents difference, zeros dropped (the
  // standard signed-rank reduction). Midranks of |d| carry as
  // 2·midrank = 2·(# smaller) + (# equal incl. self) + 1 — exact
  // longs (the a_friedman_test discipline). W₂ = Σ_{d>0} rank2 =
  // 2·W⁺; E[W₂] = n(n+1)/2; Var(W₂)·12 = 2n(n+1)(2n+1) − Σ(t³−t)
  // (tie-corrected), all exact longs, so z is ONE double formula
  // over exact integers. p = 1 − erf(|z|/√2) two-sided via the
  // A&S polynomial. Scale shape: the corpus reduces in one monthly
  // aggregate (calendar-bounded rows); the rank join is over the
  // ≤#months² pair lattice.
  // ---------------------------------------------------------------
  val aWilcoxonSignrank: Q = (s, dir) => {
    val monthly = Tables.table(s, dir, "orders")
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("rev"))
      .localCheckpoint(eager = false) // both sides of the year-lag self-join
    val cur = monthly.alias("c"); val prv = monthly.alias("p")
    val pairs = cur.join(prv,
        col("c.m") === add_months(col("p.m"), 12))
      .select((col("c.rev") - col("p.rev")).as("dd"))
      .filter(col("dd") =!= 0L)
      .select(col("dd"), abs(col("dd")).as("ad"))
      .localCheckpoint(eager = false) // rank join reads it twice + tie census
    val a = pairs.alias("a"); val b = pairs.alias("b")
    // grouping (a.dd, a.ad) sums the per-a quantity over the k_a
    // identical a rows too, so the agg carries k·(rank2 − 1); the
    // group's W₂ contribution k·rank2 is then agg + k — never
    // un-divide and re-multiply
    val ranked = a.crossJoin(b)
      .groupBy(col("a.dd").as("dd"), col("a.ad").as("ad"))
      .agg(sum(when(col("b.ad") < col("a.ad"), 2L)
        .when(col("b.ad") === col("a.ad"), 1L).otherwise(0L))
        .cast("long").as("kr2m1")) // = k·(rank2 − 1)
    val mult = pairs.groupBy(col("dd"), col("ad"))
      .agg(count(lit(1)).cast("long").as("k"))
    val w2 = ranked.join(mult, Seq("dd", "ad"))
      .agg(
        sum(col("k")).cast("long").as("n"),
        sum(when(col("dd") > 0L, col("kr2m1") + col("k"))
          .otherwise(0L)).cast("long").as("w2"))
    val ties = pairs.groupBy(col("ad"))
      .agg(count(lit(1)).cast("long").as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t"))
        .cast("long").as("tie3"))
    val zrow = w2.crossJoin(broadcast(ties))
      .withColumn("mean2", col("n") * (col("n") + 1L) / lit(2L))
      .withColumn("var12",
        lit(2L) * col("n") * (col("n") + 1L) * (lit(2L) * col("n") + 1L) -
          col("tie3"))
      .withColumn("z",
        d(col("w2") - col("mean2")) / sqrt(d(col("var12")) / lit(12.0)))
    // hashed-output discipline (PLANS.md): the normal survival went
    // through the erf polynomial's exp() — p now ships as a bucket
    // from fixed two-sided z criticals via integer compares on
    // floor(|z|·10⁶) (z is rational+sqrt of exact longs:
    // deterministic), verdict from the same compare
    zrow
      .withColumn("zm", floor(abs(col("z")) * lit(1.0e6)).cast("long"))
      .select(col("n").as("n_pairs"),
        (d(col("w2")) / lit(2.0)).as("w_plus"),
        round(col("z"), 6).as("z"),
        when(col("zm") >= 3290526L, "p<0.001")
          .when(col("zm") >= 2575829L, "p<0.01")
          .when(col("zm") >= 1959963L, "p<0.05")
          .when(col("zm") >= 1644853L, "p<0.10")
          .otherwise(lit("p>=0.10")).as("p_bucket"),
        when(col("zm") >= 1959963L, "shifted")
          .otherwise(lit("no_shift")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // w_bollinger_bands — 20-day rolling window on daily revenue
  // cents: n·Σx² − (Σx)² stays an exact decimal(38,0) integer
  // (window sums of x and x² never touch floats), converts to
  // double via TrainingData78's hi/lo split, σ = √(nvar)/20; the
  // rolling mean is one exact ÷20 integral division to micro-cents.
  // Emitted rows: band-breach days only (|z| > 2 with a full
  // window), day-ascending. Scale shape: the corpus reduces to the
  // day grain in one aggregate; the window is a 20-row frame over
  // calendar-bounded rows (the documented benign unpartitioned-
  // window grain).
  // ---------------------------------------------------------------
  val wBollingerBands: Q = (s, dir) => {
    val w20 = org.apache.spark.sql.expressions.Window
      .orderBy(col("day")).rowsBetween(-19, 0)
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
    daily
      .withColumn("cnt", count(lit(1)).over(w20).cast("long"))
      .withColumn("sx", sum(col("x")).over(w20).cast("decimal(38,0)"))
      .withColumn("sxx",
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w20)
          .cast("decimal(38,0)"))
      .filter(col("cnt") === 20L)
      // nvar = 20·Σx² − (Σx)² — exact decimal(38,0) ≥ 0
      .withColumn("nvar",
        (lit(20) * col("sxx") - col("sx") * col("sx"))
          .cast("decimal(38,0)"))
      .withColumn("nvar_dbl",
        expr("CAST(nvar div 1000000000000 AS BIGINT)").cast("double") *
          lit(1.0e12) +
          expr("CAST(nvar % 1000000000000 AS BIGINT)").cast("double"))
      .withColumn("sigma", sqrt(col("nvar_dbl")) / lit(20.0))
      .withColumn("mean_mu",
        expr("CAST((sx * 1000000) div 20 AS BIGINT)"))
      .withColumn("z",
        (d(col("x")) - d(col("mean_mu")) / lit(1.0e6)) /
          when(col("sigma") > 0.0, col("sigma")).otherwise(lit(1.0)))
      .filter(abs(col("z")) > 2.0 && col("sigma") > 0.0)
      .select(col("day"), col("x").as("rev_cents"),
        col("mean_mu").as("mean_microcents"),
        round(col("z"), 6).as("z_score"),
        when(col("z") > 0.0, "above").otherwise(lit("below")).as("side"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // w_rsi_wilder — Wilder's RSI(14) per year: day-ascending EWMA
  // fold over exact gain/loss cents deltas, α = 1/14 from a zero
  // seed (the from-zero EWMA variant, documented; the classic
  // 14-day simple-average seed converges to the same trajectory
  // within a few τ). State [avgGain, avgLoss, overbought, oversold,
  // rsi] advances element-wise in BOTH engines (aggregate(...) here,
  // list_reduce there) — a sequential lambda fold is deterministic,
  // unlike a bulk float sum. Years are independent folds (documented
  // reset; keeps the fold length calendar-bounded and the years
  // parallel). Scale shape: corpus → day grain → ≤366-step fold.
  // ---------------------------------------------------------------
  val wRsiWilder: Q = (s, dir) => {
    val w = Grain.bounded(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .withColumn("xl", lag(col("x"), 1).over(w))
      .filter(col("xl").isNotNull)
      .withColumn("g", greatest(col("x") - col("xl"), lit(0L)))
      .withColumn("l", greatest(col("xl") - col("x"), lit(0L)))
      .withColumn("yr", year(col("day")).cast("long"))
    daily.groupBy(col("yr"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        expr(
          """aggregate(
            |  sort_array(collect_list(struct(day,
            |    CAST(g AS DOUBLE) AS g, CAST(l AS DOUBLE) AS l))),
            |  array(0.0D, 0.0D, 0.0D, 0.0D, 50.0D),
            |  (st, q) -> array(
            |    (13.0D * st[0] + q.g) / 14.0D,
            |    (13.0D * st[1] + q.l) / 14.0D,
            |    st[2] + IF((13.0D * st[1] + q.l) / 14.0D > 0.0D AND
            |      100.0D - 100.0D / (1.0D + ((13.0D * st[0] + q.g) / 14.0D)
            |        / ((13.0D * st[1] + q.l) / 14.0D)) > 70.0D
            |      OR (13.0D * st[1] + q.l) / 14.0D <= 0.0D, 1.0D, 0.0D),
            |    st[3] + IF((13.0D * st[1] + q.l) / 14.0D > 0.0D AND
            |      100.0D - 100.0D / (1.0D + ((13.0D * st[0] + q.g) / 14.0D)
            |        / ((13.0D * st[1] + q.l) / 14.0D)) < 30.0D, 1.0D, 0.0D),
            |    IF((13.0D * st[1] + q.l) / 14.0D > 0.0D,
            |      100.0D - 100.0D / (1.0D + ((13.0D * st[0] + q.g) / 14.0D)
            |        / ((13.0D * st[1] + q.l) / 14.0D)), 100.0D)))""".stripMargin
            .replaceAll("\n", " ")).as("st"))
      .select(col("yr").as("year"), col("n_days"),
        round(element_at(col("st"), 5), 6).as("rsi_final"),
        element_at(col("st"), 3).cast("long").as("overbought_days"),
        element_at(col("st"), 4).cast("long").as("oversold_days"))
      .orderBy(col("year"))
  }

  // ---------------------------------------------------------------
  // w_adf_test — Dickey–Fuller unit-root probe as the AR(1) fit
  // y_t = a + b·y_{t−1}: t = (b − 1)/se(b) against the −2.86 large-n
  // 5% DF critical value. Moments are exact cents sums with the
  // granger ÷10⁶ quantization on the two >2^53 products (all
  // positive — the div/floor divergence on negatives never arises);
  // RSS/se come from the order-free milli-floor integral scheme
  // (TrainingData78). Scale shape: one daily aggregate, one moment
  // row, one residual pass.
  // ---------------------------------------------------------------
  val wAdfTest: Q = (s, dir) => {
    val w = Grain.bounded(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("y"))
      .withColumn("yl", lag(col("y"), 1).over(w))
      .filter(col("yl").isNotNull)
      .localCheckpoint(eager = false) // moment row + residual pass
    def q6(name: String): Column =
      expr(s"CAST($name div 1000000 AS BIGINT)").cast("double") *
        lit(1.0e6)
    // widen BEFORE multiplying: day-grain revenue cents square past
    // Long at the 10× probe scale (ANSI overflow)
    val m = daily.agg(count(lit(1)).cast("long").as("m"),
      sum(col("yl")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(col("yl").cast("decimal(38,0)") * col("yl"))
        .cast("decimal(38,0)").as("sxx"),
      sum(col("y").cast("decimal(38,0)") * col("yl"))
        .cast("decimal(38,0)").as("sxy"))
      .select(col("m"), d(col("m")).as("n"), d(col("sx")).as("sx"),
        d(col("sy")).as("sy"), q6("sxx").as("sxx"), q6("sxy").as("sxy"))
      .withColumn("b",
        (col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")))
      .withColumn("a", (col("sy") - col("b") * col("sx")) / col("n"))
      .withColumn("sxx_c",
        col("sxx") - col("sx") * col("sx") / col("n"))
    val rss = daily.crossJoin(broadcast(m))
      .select(col("m"), col("b"), col("a"), col("sxx_c"),
        floor((d(col("y")) - col("a") - col("b") * d(col("yl"))) *
          1000.0).as("eq"))
      .groupBy(col("m"), col("b"), col("sxx_c"))
      .agg(sum(expr("CAST(eq AS DECIMAL(38,0)) * eq"))
        .cast("decimal(38,0)").as("rss_d"))
      .withColumn("rss",
        (expr("CAST(rss_d div 1000000000000 AS BIGINT)")
          .cast("double") * lit(1.0e12) +
          expr("CAST(rss_d % 1000000000000 AS BIGINT)")
            .cast("double")) / lit(1.0e6))
      .withColumn("s2", col("rss") / d(col("m") - 2L))
      // a zero quantized RSS (sub-milli perfect fit) defines t = 0
      // rather than dividing by zero (ANSI raises)
      .withColumn("t_df", when(col("rss") > 0.0,
        (col("b") - lit(1.0)) / sqrt(col("s2") / col("sxx_c")))
        .otherwise(lit(0.0)))
    rss.select(col("m").as("n_obs"),
      round(col("b"), 6).as("ar1_coef"),
      round(col("t_df"), 6).as("t_stat"),
      when(col("t_df") < -2.86, "stationary")
        .otherwise(lit("unit_root")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // t_unigram_kl — KL(p_source ‖ p_corpus) over unigram token
  // distributions: the shift audit run before weighting sources
  // into a training mixture. support(p) ⊆ support(q) by
  // construction, so no smoothing. Each term's contribution
  // (c/n_s)·ln((c·N)/(n_s·C)) quantizes to floor(·10⁹) BEFORE the
  // sum — the per-source total is an exact integer sum over a
  // vocab-sized set (a bulk double fold here would be exactly the
  // engine-vs-engine sum-kernel hazard TrainingData78 documents).
  // Scale shape: two token-grain aggregates + one broadcast-sized
  // per-source total join; everything after is vocab-grain.
  // ---------------------------------------------------------------
  val tUnigramKl: Q = (s, dir) => {
    val toks = Tables.table(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
    val st = toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(eager = false) // corpus totals + the contribution pass
    val perSource = st.groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("ns"),
        count(lit(1)).cast("long").as("vocab_s"))
    val perTok = st.groupBy(col("tok"))
      .agg(sum(col("c")).cast("long").as("ct"))
    val total = st.agg(sum(col("c")).cast("long").as("nn"))
    st.join(broadcast(perSource), "source")
      .join(perTok, "tok")
      .crossJoin(broadcast(total))
      .select(col("source"), col("ns"), col("vocab_s"),
        floor((d(col("c")) / d(col("ns"))) *
          log((d(col("c")) * d(col("nn"))) /
            (d(col("ns")) * d(col("ct")))) * lit(1.0e9)).as("kq"))
      .groupBy(col("source"), col("ns"), col("vocab_s"))
      .agg(sum(col("kq")).cast("long").as("kqs"))
      .select(col("source"), col("ns").as("n_tokens"),
        col("vocab_s").as("vocab_terms"),
        round(d(col("kqs")) / lit(1.0e9), 6).as("kl_nats"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // sim_maxsim_multivector — late-interaction (ColBERT-style)
  // retrieval: the 64-dim embedding reads as 4 "token" sub-vectors
  // of 16 dims; score(q, d) = Σ_{i=1..4} max_{j=1..4}
  // cos(q_i, d_j). Query set: vec_id < 4 (the brute-force-topk
  // convention). Max over 4 values is order-free; the Σ over the 4
  // query slots folds slot-ascending in both engines. Scale shape:
  // sub-vector explosion is a bounded ×4; the interaction join is
  // (4 queries × 4 slots, broadcast) × corpus slots — linear in the
  // corpus, top-3 via one bounded per-query window.
  // ---------------------------------------------------------------
  val simMaxsimMultivector: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding"))
        .as("e"))
      .select(col("vec_id"), explode(expr(
        "transform(sequence(0, 3), i -> struct(i AS slot," +
          " slice(e, i * 16 + 1, 16) AS sub))")).as("sv"))
      .select(col("vec_id"), col("sv.slot").as("slot"),
        col("sv.sub").as("sub"))
    val q = broadcast(emb.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("slot").as("qslot"),
        col("sub").as("qsub")))
    val best = q.join(emb.select(col("vec_id").as("neighbor_id"),
        col("sub").as("dsub")),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("qslot"), col("neighbor_id"),
        Similarity.cosine(col("qsub"), col("dsub")).as("cos"))
      .groupBy(col("query_id"), col("neighbor_id"), col("qslot"))
      .agg(max(col("cos")).as("mx"))
    val scored = best
      .groupBy(col("query_id"), col("neighbor_id"))
      .agg(expr("aggregate(sort_array(collect_list(struct(qslot, mx)))," +
        " 0D, (a, q) -> a + q.mx)").as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(desc("score"), col("neighbor_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("maxsim_score"),
        col("rk").cast("int").as("rk"))
      .orderBy(col("query_id"), col("rk"))
  }

  val queries: Map[String, Q] = Map(
    "a_wilcoxon_signrank" -> aWilcoxonSignrank,
    "w_bollinger_bands" -> wBollingerBands,
    "w_rsi_wilder" -> wRsiWilder,
    "w_adf_test" -> wAdfTest,
    "t_unigram_kl" -> tUnigramKl,
    "sim_maxsim_multivector" -> simMaxsimMultivector)

  val oracles: Map[String, String] = Map(
    "a_wilcoxon_signrank" ->
      s"""WITH monthly AS (
         |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
         |         CAST(sum($centsX) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |pairs AS (
         |  SELECT c.rev - p.rev AS dd, abs(c.rev - p.rev) AS ad
         |  FROM monthly c JOIN monthly p
         |    ON c.m = CAST(p.m + INTERVAL 12 MONTH AS DATE)
         |  WHERE c.rev <> p.rev),
         |ranked AS (
         |  SELECT a.dd, a.ad,
         |         CAST(sum(CASE WHEN b.ad < a.ad THEN 2
         |                       WHEN b.ad = a.ad THEN 1
         |                       ELSE 0 END) AS BIGINT) AS kr2m1
         |  FROM pairs a CROSS JOIN pairs b
         |  GROUP BY a.dd, a.ad),
         |mult AS (
         |  SELECT dd, ad, CAST(count(*) AS BIGINT) AS k
         |  FROM pairs GROUP BY 1, 2),
         |w2_ AS (
         |  SELECT CAST(sum(m.k) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN r.dd > 0
         |           THEN r.kr2m1 + m.k ELSE 0 END)
         |           AS BIGINT) AS w2
         |  FROM ranked r
         |  JOIN mult m ON r.dd = m.dd AND r.ad = m.ad),
         |ties AS (
         |  SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie3
         |  FROM (SELECT CAST(count(*) AS BIGINT) AS t
         |        FROM pairs GROUP BY ad)),
         |z_ AS (
         |  SELECT n, w2,
         |         CAST(w2 - n * (n + 1) // 2 AS DOUBLE)
         |           / sqrt(CAST(2 * n * (n + 1) * (2 * n + 1) - tie3
         |               AS DOUBLE) / 12.0) AS z
         |  FROM w2_ CROSS JOIN ties),
         |zm_ AS (
         |  SELECT *, CAST(floor(abs(z) * 1.0e6) AS BIGINT) AS zm FROM z_)
         |SELECT n AS n_pairs, CAST(w2 AS DOUBLE) / 2.0 AS w_plus,
         |       round(z, 6) AS z,
         |       CASE WHEN zm >= 3290526 THEN 'p<0.001'
         |            WHEN zm >= 2575829 THEN 'p<0.01'
         |            WHEN zm >= 1959963 THEN 'p<0.05'
         |            WHEN zm >= 1644853 THEN 'p<0.10'
         |            ELSE 'p>=0.10' END AS p_bucket,
         |       CASE WHEN zm >= 1959963
         |            THEN 'shifted' ELSE 'no_shift' END AS verdict
         |FROM zm_""".stripMargin,
    "w_bollinger_bands" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |win AS (
         |  SELECT day, x,
         |         CAST(count(*) OVER w AS BIGINT) AS cnt,
         |         CAST(sum(x) OVER w AS HUGEINT) AS sx,
         |         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) OVER w
         |           AS sxx
         |  FROM daily
         |  WINDOW w AS (ORDER BY day ROWS BETWEEN 19 PRECEDING
         |               AND CURRENT ROW)),
         |bands AS (
         |  SELECT day, x,
         |         CAST((20 * sxx - sx * sx) // 1000000000000 AS BIGINT)
         |           AS nv_hi,
         |         CAST((20 * sxx - sx * sx) % 1000000000000 AS BIGINT)
         |           AS nv_lo,
         |         CAST((sx * 1000000) // 20 AS BIGINT) AS mean_mu
         |  FROM win WHERE cnt = 20),
         |z_ AS (
         |  SELECT day, x, mean_mu,
         |         sqrt(CAST(nv_hi AS DOUBLE) * 1.0e12
         |           + CAST(nv_lo AS DOUBLE)) / 20.0 AS sigma
         |  FROM bands),
         |zz AS (
         |  SELECT day, x, mean_mu, sigma,
         |         (CAST(x AS DOUBLE) - CAST(mean_mu AS DOUBLE) / 1.0e6)
         |           / CASE WHEN sigma > 0.0 THEN sigma ELSE 1.0 END AS z
         |  FROM z_)
         |SELECT day, x AS rev_cents, mean_mu AS mean_microcents,
         |       round(z, 6) AS z_score,
         |       CASE WHEN z > 0.0 THEN 'above' ELSE 'below' END AS side
         |FROM zz WHERE abs(z) > 2.0 AND sigma > 0.0
         |ORDER BY day""".stripMargin,
    "w_rsi_wilder" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |dl AS (
         |  SELECT day, x, lag(x) OVER (ORDER BY day) AS xl
         |  FROM daily QUALIFY xl IS NOT NULL),
         |gl AS (
         |  SELECT CAST(year(day) AS BIGINT) AS yr, day,
         |         CAST(greatest(x - xl, 0) AS DOUBLE) AS g,
         |         CAST(greatest(xl - x, 0) AS DOUBLE) AS l
         |  FROM dl),
         |folded AS (
         |  SELECT yr, CAST(count(*) AS BIGINT) AS n_days,
         |         list_reduce(
         |           list_prepend([0.0, 0.0, 0.0, 0.0, 50.0],
         |             list([g, l, 0.0, 0.0, 0.0] ORDER BY day)),
         |           (st, q) -> [
         |             (13.0 * st[1] + q[1]) / 14.0,
         |             (13.0 * st[2] + q[2]) / 14.0,
         |             st[3] + CASE WHEN (13.0 * st[2] + q[2]) / 14.0 > 0.0
         |               AND 100.0 - 100.0 / (1.0
         |                 + ((13.0 * st[1] + q[1]) / 14.0)
         |                 / ((13.0 * st[2] + q[2]) / 14.0)) > 70.0
         |               OR (13.0 * st[2] + q[2]) / 14.0 <= 0.0
         |               THEN 1.0 ELSE 0.0 END,
         |             st[4] + CASE WHEN (13.0 * st[2] + q[2]) / 14.0 > 0.0
         |               AND 100.0 - 100.0 / (1.0
         |                 + ((13.0 * st[1] + q[1]) / 14.0)
         |                 / ((13.0 * st[2] + q[2]) / 14.0)) < 30.0
         |               THEN 1.0 ELSE 0.0 END,
         |             CASE WHEN (13.0 * st[2] + q[2]) / 14.0 > 0.0
         |               THEN 100.0 - 100.0 / (1.0
         |                 + ((13.0 * st[1] + q[1]) / 14.0)
         |                 / ((13.0 * st[2] + q[2]) / 14.0))
         |               ELSE 100.0 END]) AS st
         |  FROM gl GROUP BY yr)
         |SELECT yr AS year, n_days,
         |       round(st[5], 6) AS rsi_final,
         |       CAST(st[3] AS BIGINT) AS overbought_days,
         |       CAST(st[4] AS BIGINT) AS oversold_days
         |FROM folded ORDER BY year""".stripMargin,
    "w_adf_test" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS y
         |  FROM orders GROUP BY 1),
         |dl AS (
         |  SELECT day, y, lag(y) OVER (ORDER BY day) AS yl
         |  FROM daily QUALIFY yl IS NOT NULL),
         |mo AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |         CAST(count(*) AS DOUBLE) AS n,
         |         CAST(CAST(sum(yl) AS HUGEINT) AS DOUBLE) AS sx,
         |         CAST(CAST(sum(y) AS HUGEINT) AS DOUBLE) AS sy,
         |         CAST(sum(CAST(yl AS HUGEINT) * CAST(yl AS HUGEINT))
         |           // 1000000 AS BIGINT) * 1.0e6 AS sxx,
         |         CAST(sum(CAST(y AS HUGEINT) * CAST(yl AS HUGEINT))
         |           // 1000000 AS BIGINT) * 1.0e6 AS sxy
         |  FROM dl),
         |fit AS (
         |  SELECT m, n, sx,
         |         (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
         |         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
         |           / n AS a,
         |         sxx - sx * sx / n AS sxx_c
         |  FROM mo),
         |rss_ AS (
         |  SELECT f.m, f.b, f.sxx_c,
         |         (CAST(CAST(sum(CAST(floor((CAST(dl.y AS DOUBLE) - f.a
         |             - f.b * CAST(dl.yl AS DOUBLE)) * 1000.0) AS HUGEINT)
         |           * CAST(floor((CAST(dl.y AS DOUBLE) - f.a
         |             - f.b * CAST(dl.yl AS DOUBLE)) * 1000.0) AS HUGEINT))
         |           // 1000000000000 AS BIGINT) AS DOUBLE) * 1.0e12
         |           + CAST(CAST(sum(CAST(floor((CAST(dl.y AS DOUBLE) - f.a
         |             - f.b * CAST(dl.yl AS DOUBLE)) * 1000.0) AS HUGEINT)
         |           * CAST(floor((CAST(dl.y AS DOUBLE) - f.a
         |             - f.b * CAST(dl.yl AS DOUBLE)) * 1000.0) AS HUGEINT))
         |           % 1000000000000 AS BIGINT) AS DOUBLE)) / 1.0e6 AS rss
         |  FROM dl CROSS JOIN fit f
         |  GROUP BY f.m, f.b, f.sxx_c),
         |t_ AS (
         |  SELECT m, b,
         |         CASE WHEN rss > 0.0 THEN (b - 1.0)
         |           / sqrt((rss / CAST(m - 2 AS DOUBLE)) / sxx_c)
         |         ELSE 0.0 END AS t_df
         |  FROM rss_)
         |SELECT m AS n_obs, round(b, 6) AS ar1_coef,
         |       round(t_df, 6) AS t_stat,
         |       CASE WHEN t_df < -2.86 THEN 'stationary'
         |            ELSE 'unit_root' END AS verdict
         |FROM t_""".stripMargin,
    "t_unigram_kl" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |st AS (
        |  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM toks GROUP BY 1, 2),
        |per_source AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS ns,
        |         CAST(count(*) AS BIGINT) AS vocab_s
        |  FROM st GROUP BY 1),
        |per_tok AS (
        |  SELECT tok, CAST(sum(c) AS BIGINT) AS ct FROM st GROUP BY 1),
        |total AS (SELECT CAST(sum(c) AS BIGINT) AS nn FROM st),
        |contrib AS (
        |  SELECT st.source, ps.ns, ps.vocab_s,
        |         CAST(floor((CAST(st.c AS DOUBLE) / CAST(ps.ns AS DOUBLE))
        |           * ln((CAST(st.c AS DOUBLE) * CAST(t.nn AS DOUBLE))
        |             / (CAST(ps.ns AS DOUBLE) * CAST(pt.ct AS DOUBLE)))
        |           * 1.0e9) AS BIGINT) AS kq
        |  FROM st
        |  JOIN per_source ps ON st.source = ps.source
        |  JOIN per_tok pt ON st.tok = pt.tok
        |  CROSS JOIN total t)
        |SELECT source, ns AS n_tokens, vocab_s AS vocab_terms,
        |       round(CAST(sum(kq) AS DOUBLE) / 1.0e9, 6) AS kl_nats
        |FROM contrib GROUP BY source, ns, vocab_s
        |ORDER BY source""".stripMargin,
    "sim_maxsim_multivector" ->
      """WITH sv AS (
        |  SELECT vec_id, i AS slot,
        |         list_transform(embedding[i * 16 + 1 : i * 16 + 16],
        |           x -> CAST(x AS DOUBLE)) AS sub
        |  FROM embeddings, unnest([0, 1, 2, 3]) AS u(i)),
        |q AS (SELECT vec_id AS query_id, slot AS qslot, sub AS qsub
        |      FROM sv WHERE vec_id < 4),
        |best AS (
        |  SELECT q.query_id, d.vec_id AS neighbor_id, q.qslot,
        |         max(list_sum(list_transform(range(1, 17),
        |               i -> q.qsub[i] * d.sub[i]))
        |             / (sqrt(list_sum(list_transform(range(1, 17),
        |                  i -> q.qsub[i] * q.qsub[i])))
        |                * sqrt(list_sum(list_transform(range(1, 17),
        |                  i -> d.sub[i] * d.sub[i]))))) AS mx
        |  FROM q JOIN sv d ON d.vec_id <> q.query_id
        |  GROUP BY 1, 2, 3),
        |scored AS (
        |  SELECT query_id, neighbor_id,
        |         list_sum(list(mx ORDER BY qslot)) AS score
        |  FROM best GROUP BY 1, 2),
        |ranked AS (
        |  SELECT query_id, neighbor_id, score,
        |         row_number() OVER (PARTITION BY query_id
        |           ORDER BY score DESC, neighbor_id) AS rk
        |  FROM scored)
        |SELECT query_id, neighbor_id, round(score, 6) AS maxsim_score,
        |       CAST(rk AS INTEGER) AS rk
        |FROM ranked WHERE rk <= 3 ORDER BY query_id, rk""".stripMargin)
}
