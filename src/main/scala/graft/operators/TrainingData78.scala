package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-11 batch 78: lead–lag causality and influence diagnostics
  * on the daily series, and two curation audits that close gaps in
  * the dedup/decontamination families.
  *
  *  - w_granger_causality — 1-lag Granger test both directions
  *    between daily order volume and daily revenue: does yesterday's
  *    volume explain today's revenue beyond yesterday's revenue?
  *    (w_cross_correlation sees the lead–lag correlation; this asks
  *    whether it SURVIVES the autoregression.)
  *  - w_cooks_distance — Cook's influence of each day on the daily
  *    revenue OLS trend (the w_durbin_watson fit): which days singly
  *    steer the slope a monitoring dashboard trusts.
  *  - dedup_cohens_kappa — chance-corrected doc-level agreement
  *    between the lexical (MinHash-LSH) and semantic (cosine) dedup
  *    verdicts. dedup_method_agreement counts pair overlap; kappa
  *    asks whether doc-level flagging agreement beats chance.
  *  - t_semantic_leakage — embedding-space cross-split contamination:
  *    val/test docs whose cosine-0.4 near-dup neighbor sits in train (the
  *    semantic twin of the 13-gram t_split_contamination, same
  *    md5-nibble split rule).
  *
  * Float policy: exact decimal moments → fixed double formulas
  * (Cramer's rule for the 3×3 normal equations), order-free integral
  * residual-square sums (floored-cents residuals — a sequential
  * double fold proved DuckDB-version-sensitive at the round-11
  * driver gate). HASHED outputs are integer-exact or integer-compare
  * buckets: the r12 driver gate proved that even round(·,6) over an
  * exp()-derived p-value diverges by engine-libm ulps, so the χ²(1)
  * survival is now a bucket from fixed critical values, never an erf
  * evaluation (the PLANS.md "hashed-output discipline" rule).
  */
object TrainingData78 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_granger_causality — for each direction (x→y, y→x): fit
  //   restricted    y_t = a + b·y_{t-1}
  //   unrestricted  y_t = a + b·y_{t-1} + c·x_{t-1}
  // on the calendar-bounded daily (volume, revenue) series. All
  // nine cross-moments are exact decimal(38) sums; the 3×3 normal
  // equations solve by Cramer's rule as ONE fixed double formula
  // (no iterative solver, nothing order-sensitive); both RSS are
  // order-free integer sums of floored residual squares (see the
  // block comment at the fold). F = (RSS_r − RSS_u)/(RSS_u/(m−3)) with the
  // large-df2 χ²(1) survival p = 1 − erf(√(F/2)). Scale shape: the
  // corpus reduces to one daily aggregate; everything after is
  // day-count-bounded.
  // ---------------------------------------------------------------
  val wGrangerCausality: Q = (s, dir) => {
    val w = Grain.bounded(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).cast("long").as("vol"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("rev"))
      .withColumn("vol_l", lag(col("vol"), 1).over(w))
      .withColumn("rev_l", lag(col("rev"), 1).over(w))
      .filter(col("vol_l").isNotNull)
      .localCheckpoint(eager = false) // both directions read the same lagged grid
    def granger(yc: String, ylc: String, xlc: String,
        label: String): DataFrame = {
      val y = col(yc); val yl = col(ylc); val xl = col(xlc)
      // widen the DAY-GRAIN factor to decimal BEFORE multiplying:
      // daily revenue cents square to ~1e22 at the 10× probe scale,
      // past Long (ANSI overflow error) — the per-row product must
      // never happen in Long
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val m = daily.agg(count(lit(1)).cast("long").as("m"),
        sum(yl).cast("decimal(38,0)").as("s1"),
        sum(xl).cast("decimal(38,0)").as("s2"),
        sum(dec(yl) * yl).cast("decimal(38,0)").as("s11"),
        sum(dec(yl) * xl).cast("decimal(38,0)").as("s12"),
        sum(dec(xl) * xl).cast("decimal(38,0)").as("s22"),
        sum(y).cast("decimal(38,0)").as("t0"),
        sum(dec(y) * yl).cast("decimal(38,0)").as("t1"),
        sum(dec(y) * xl).cast("decimal(38,0)").as("t2"))
      // product moments reach ~1e19 cents² — far past 2^53, where a
      // raw dec38→double conversion rounds differently across
      // engines (the a_var_merge discipline / a_bootstrap_bca 10×
      // lesson). Each gets ONE exact integral division to a BIGINT
      // < 2^53 (headroom: good through ~9e21, i.e. 100× this SF),
      // then the scale factor re-applies as one exact double
      // multiply. Linear sums stay direct casts (< 2^53 until ~1e15
      // total cents).
      def q6(name: String): Column =
        expr(s"CAST($name div 1000000 AS BIGINT)").cast("double") *
          lit(1.0e6)
      val fit = m.select(col("m"),
        d(col("m")).as("n"), d(col("s1")).as("s1"), d(col("s2")).as("s2"),
        q6("s11").as("s11"), q6("s12").as("s12"),
        q6("s22").as("s22"), d(col("t0")).as("t0"),
        q6("t1").as("t1"), q6("t2").as("t2"))
        .withColumn("det",
          col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
            col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
            col("s2") * (col("s1") * col("s12") - col("s11") * col("s2")))
        .withColumn("b0",
          (col("t0") * (col("s11") * col("s22") - col("s12") * col("s12")) -
            col("s1") * (col("t1") * col("s22") - col("s12") * col("t2")) +
            col("s2") * (col("t1") * col("s12") - col("s11") * col("t2"))) /
            col("det"))
        .withColumn("b1",
          (col("n") * (col("t1") * col("s22") - col("s12") * col("t2")) -
            col("t0") * (col("s1") * col("s22") - col("s12") * col("s2")) +
            col("s2") * (col("s1") * col("t2") - col("t1") * col("s2"))) /
            col("det"))
        .withColumn("b2",
          (col("n") * (col("s11") * col("t2") - col("t1") * col("s12")) -
            col("s1") * (col("s1") * col("t2") - col("t1") * col("s2")) +
            col("t0") * (col("s1") * col("s12") - col("s11") * col("s2"))) /
            col("det"))
        // restricted 2-parameter fit on the same exact moments
        .withColumn("rb",
          (col("n") * col("t1") - col("s1") * col("t0")) /
            (col("n") * col("s11") - col("s1") * col("s1")))
        .withColumn("ra",
          (col("t0") - col("rb") * col("s1")) / col("n"))
      // RSS must be ORDER-FREE across engines: round 11's driver
      // gate red-flagged this op while the builder's local DuckDB
      // agreed — a day-ascending double fold (aggregate/sort_array
      // here, list_sum there) is only reproducible if the other
      // engine's sum kernel is also a strict sequential fold, and
      // DuckDB's float sum is version-dependent. So the residuals —
      // which ARE bit-identical across engines (same IEEE expression
      // over identical doubles) — quantize to exact BIGINT
      // milli-units (floor(e·1000): ≤1e-3 absolute, which also keeps
      // the rev→vol direction's O(1)-scale residuals meaningful),
      // square and sum in decimal(38,0) (exact integers commute),
      // and the exact sum converts to double via the hi/lo split
      // (hi = s div 10¹², lo = s mod 10¹², both <2^53 ⇒ exact;
      // hi·1e12 + lo is two IEEE ops — deterministic in ANY engine,
      // unlike a raw dec38→double cast above 2^53). Headroom:
      // e·1000 ≤ 9e18 and Σ(e·1000)² div 10¹² ≤ 9e18 hold through
      // ~sf5 of daily-revenue residuals; beyond that raise the split.
      val folds = daily.crossJoin(broadcast(fit))
        .select(col("m"), col("b1"), col("b2"),
          floor((y - col("b0") - col("b1") * yl - col("b2") * xl) *
            1000.0).as("euq"),
          floor((y - col("ra") - col("rb") * yl) * 1000.0).as("erq"))
        .groupBy(col("m"), col("b1"), col("b2"))
        .agg(
          sum(expr("CAST(euq AS DECIMAL(38,0)) * euq"))
            .cast("decimal(38,0)").as("rssu_d"),
          sum(expr("CAST(erq AS DECIMAL(38,0)) * erq"))
            .cast("decimal(38,0)").as("rssr_d"))
        .withColumn("rss_u",
          (expr("CAST(rssu_d div 1000000000000 AS BIGINT)")
            .cast("double") * lit(1.0e12) +
            expr("CAST(rssu_d % 1000000000000 AS BIGINT)")
              .cast("double")) / lit(1.0e6))
        .withColumn("rss_r",
          (expr("CAST(rssr_d div 1000000000000 AS BIGINT)")
            .cast("double") * lit(1.0e12) +
            expr("CAST(rssr_d % 1000000000000 AS BIGINT)")
              .cast("double")) / lit(1.0e6))
      // the ÷10⁶ moment quantization means neither fit is the exact
      // minimizer of the raw series, so rss_u can exceed rss_r by
      // jitter — clamp F at 0 (both engines identically); a zero
      // quantized RSS_u (perfect sub-milli fit) defines F = 0 rather
      // than dividing by zero (ANSI doubles raise). Capped at 1e9 so
      // floor(F·10⁶) stays far inside BIGINT even if a near-perfect
      // unrestricted fit drives F huge.
      val f = when(col("rss_u") > 0.0,
        least(lit(1.0e9), greatest(lit(0.0),
          (col("rss_r") - col("rss_u")) /
            (col("rss_u") / d(col("m") - 3L)))))
        .otherwise(lit(0.0))
      // HASHED-OUTPUT DISCIPLINE (the 2-round r11/r12 driver-gate
      // lesson, now a PLANS.md rule): every hashed column is either
      // an exact integer or a bucket decided by an integer compare.
      // The old output shipped round(·,6) doubles and a p-value via
      // exp() — libm transcendentals are NOT correctly rounded and
      // differ by ulps across engines, and round/threshold flips on
      // exactly such an ulp (the op was green on local DuckDB yet red
      // at the driver twice). Now: coefficients floor to micro-units
      // (b1/b2 are pure rational functions of identical exact-moment
      // doubles — +,-,*,/ are IEEE-correctly-rounded in both engines,
      // so floor(x·1e6) is deterministic); the RSS ships as the exact
      // decimal integer ÷10⁶ (pure integer ops); F floors to
      // micro-units; p collapses to a bucket from fixed χ²(1)
      // critical values (3.841459 for 0.05 etc. — integer compares on
      // F·10⁶, no erf anywhere near the hash).
      val fMicro = floor(f * lit(1.0e6)).cast("long")
      folds.select(lit(label).as("direction"), col("m").as("n_obs"),
        floor(col("b1") * lit(1.0e6)).cast("long").as("ar_coef_micro"),
        floor(col("b2") * lit(1.0e6)).cast("long").as("cross_coef_micro"),
        // exact integral Σ(e·1000)² runs to ~1e25 (past BIGINT even
        // ÷10⁶) — ship the ÷10¹² quantization (units of 10⁶ cents²),
        // a pure integer op with headroom through ~sf500
        expr("CAST(rssr_d div 1000000000000 AS BIGINT)")
          .as("rss_restricted_q"),
        expr("CAST(rssu_d div 1000000000000 AS BIGINT)")
          .as("rss_unrestricted_q"),
        fMicro.as("f_stat_micro"),
        when(fMicro >= 10827566L, "p<0.001")
          .when(fMicro >= 6634897L, "p<0.01")
          .when(fMicro >= 3841459L, "p<0.05")
          .when(fMicro >= 2705543L, "p<0.10")
          .otherwise(lit("p>=0.10")).as("p_bucket"),
        when(fMicro >= 3841459L, "causal_signal")
          .otherwise(lit("no_signal")).as("verdict"))
    }
    granger("rev", "rev_l", "vol_l", "volume_to_revenue")
      .unionAll(granger("vol", "vol_l", "rev_l", "revenue_to_volume"))
      .orderBy(col("direction"))
  }

  // ---------------------------------------------------------------
  // w_cooks_distance — influence of each day on the daily-revenue
  // time trend: D_t = e_t²·h_t / (p·s²·(1−h_t)²) with p = 2,
  // h_t = 1/m + (t−t̄)²/Sₜₜ (simple-regression leverage, closed
  // form — no hat-matrix inverse). The fit replays w_durbin_watson's
  // exact-moment OLS; s² is an order-free integral residual-square
  // sum (the w_granger_causality discipline). Top-10 by (D desc,
  // day) — TakeOrderedAndProject, never a global sort.
  // ---------------------------------------------------------------
  val wCooksDistance: Q = (s, dir) => {
    val w = Grain.bounded(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("y"))
      .withColumn("t", row_number().over(w).cast("long"))
      .localCheckpoint(eager = false)
    val m = daily.agg(count(lit(1)).cast("long").as("m"),
      sum(col("t")).cast("decimal(38,0)").as("st"),
      sum((col("t") * col("t")).cast("decimal(38,0)")).as("stt"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum((col("t") * col("y")).cast("decimal(38,0)")).as("sty"))
      .withColumn("slope",
        (d(col("m")) * d(col("sty")) - d(col("st")) * d(col("sy"))) /
          (d(col("m")) * d(col("stt")) - d(col("st")) * d(col("st"))))
      .withColumn("icept",
        (d(col("sy")) - col("slope") * d(col("st"))) / d(col("m")))
      // Sₜₜ (centered) and t̄ as exact-moment doubles
      .withColumn("tbar", d(col("st")) / d(col("m")))
      .withColumn("sxx", d(col("stt")) - d(col("st")) * d(col("st")) /
        d(col("m")))
    val resid = daily.crossJoin(broadcast(m))
      .select(col("m"), col("day"), col("t"), col("tbar"), col("sxx"),
        (d(col("y")) - col("icept") - col("slope") * d(col("t"))).as("e"))
      .withColumn("e2", col("e") * col("e"))
      .localCheckpoint(eager = false) // s² fold + the per-day influence pass
    // order-free RSS (the w_granger_causality discipline): milli-
    // cent-floored residual squares summed exactly in decimal(38,0),
    // hi/lo-split back to double. A day-ascending double fold is
    // only cross-engine-stable if the oracle engine's sum kernel is
    // also a strict sequential fold, which DuckDB's float sum is not
    // guaranteed to be across versions.
    val s2 = resid
      .select(col("m"), floor(col("e") * 1000.0).as("eq"))
      .groupBy(col("m"))
      .agg(sum(expr("CAST(eq AS DECIMAL(38,0)) * eq"))
        .cast("decimal(38,0)").as("rss_d"))
      .withColumn("rss",
        (expr("CAST(rss_d div 1000000000000 AS BIGINT)")
          .cast("double") * lit(1.0e12) +
          expr("CAST(rss_d % 1000000000000 AS BIGINT)")
            .cast("double")) / lit(1.0e6))
      .select(col("m"), (col("rss") / d(col("m") - 2L)).as("s2"))
    resid.join(broadcast(s2), "m")
      .withColumn("h", lit(1.0) / d(col("m")) +
        (d(col("t")) - col("tbar")) * (d(col("t")) - col("tbar")) / col("sxx"))
      .withColumn("cook", col("e2") * col("h") /
        (lit(2.0) * col("s2") * (lit(1.0) - col("h")) *
          (lit(1.0) - col("h"))))
      // residual ships as the exact milli-cent integer: round-6 of a
      // ~1e9-magnitude double needs 15+ significant digits, where
      // Spark's BigDecimal rounding and DuckDB's multiply-round-
      // divide disagree by an ulp (seen at sf0.1)
      .select(col("day"),
        floor(col("e") * 1000.0).as("residual_millicents"),
        round(col("h"), 6).as("leverage"),
        round(col("cook"), 6).as("cooks_d"))
      .orderBy(desc("cooks_d"), col("day")).limit(10)
  }

  // ---------------------------------------------------------------
  // dedup_cohens_kappa — the two registered near-dup detectors as
  // doc-level raters over the embeddings id space (vec_id ≡ doc_id
  // in the testdata contract): flagged = appears in any pair. The
  // 2×2 confusion feeds κ = (p_o − p_e)/(1 − p_e) on exact integer
  // counts, with the Landis–Koch band. Scale shape: both pair sets
  // are the registered banded/blocked constructions; doc sets are
  // two distinct-aggregates; the κ arithmetic is a ONE-ROW cross.
  // ---------------------------------------------------------------
  val dedupCohensKappa: Q = (s, dir) => {
    val lex = Dedup.minhashLshPairs(s, dir, portableHashes = true)
      .select(explode(array(col("d1"), col("d2"))).as("id"))
      .distinct().withColumn("in_lex", lit(1L))
    val sem = Similarity.cosineNearDupPairs(s, dir, 0.4)
      .select(explode(array(col("v1"), col("v2"))).as("id"))
      .distinct().withColumn("in_sem", lit(1L))
    val uni = Tables.table(s, dir, "embeddings")
      .select(col("vec_id").as("id"))
      .join(lex, Seq("id"), "left").join(sem, Seq("id"), "left")
      .select(coalesce(col("in_lex"), lit(0L)).as("l"),
        coalesce(col("in_sem"), lit(0L)).as("m"))
    val cells = uni.agg(count(lit(1)).cast("long").as("n"),
      sum(when(col("l") === 1L && col("m") === 1L, 1L).otherwise(0L))
        .cast("long").as("n11"),
      sum(when(col("l") === 1L && col("m") === 0L, 1L).otherwise(0L))
        .cast("long").as("n10"),
      sum(when(col("l") === 0L && col("m") === 1L, 1L).otherwise(0L))
        .cast("long").as("n01"))
      .withColumn("n00", col("n") - col("n11") - col("n10") - col("n01"))
    val po = d(col("n11") + col("n00")) / d(col("n"))
    val pe = (d(col("n11") + col("n10")) * d(col("n11") + col("n01")) +
      d(col("n01") + col("n00")) * d(col("n10") + col("n00"))) /
      (d(col("n")) * d(col("n")))
    val kappa = (po - pe) / (lit(1.0) - pe)
    cells.select(col("n").as("n_docs"), col("n11").as("both_flag"),
      col("n10").as("lexical_only"), col("n01").as("semantic_only"),
      col("n00").as("neither"),
      round(po, 6).as("p_observed"), round(pe, 6).as("p_chance"),
      round(kappa, 6).as("kappa"),
      when(kappa < 0.2, "slight").when(kappa < 0.4, "fair")
        .when(kappa < 0.6, "moderate").when(kappa < 0.8, "substantial")
        .otherwise(lit("near_perfect")).as("agreement_band"))
  }

  // ---------------------------------------------------------------
  // t_semantic_leakage — the embedding twin of t_split_contamination:
  // same md5-nibble split rule (c,d → val; e,f → test; else train),
  // leak = a val/test doc with a label-blocked cosine ≥ 0.4 train
  // neighbor (the dedup_embedding_cosine near-dup contract; the
  // synthetic corpus has no cross-split pairs above 0.9 — the
  // threshold matches the registered semantic near-dup tier). Per leaked doc: neighbor count and the strongest
  // train cosine — the SemDeDup-style evidence an eval-integrity
  // review needs before trusting a benchmark number. Scale shape:
  // pairs come from the registered blocked detector (never
  // all-pairs); the split tag is a scan-side expression; the rollup
  // is one aggregate over the (small) leak set.
  // ---------------------------------------------------------------
  private def splitOf(c: Column): Column =
    when(substring(md5(c.cast("string")), 1, 1).isin("c", "d"), "val")
      .when(substring(md5(c.cast("string")), 1, 1).isin("e", "f"), "test")
      .otherwise(lit("train"))

  val tSemanticLeakage: Q = (s, dir) => {
    val pairs = Similarity.cosineNearDupPairs(s, dir, 0.4)
      .select(col("v1"), col("v2"), col("cosine"),
        splitOf(col("v1")).as("sp1"), splitOf(col("v2")).as("sp2"))
    // orient: (eval doc, train neighbor) in either pair direction
    val leaks = pairs
      .filter(col("sp1") =!= col("sp2") &&
        (col("sp1") === "train" || col("sp2") === "train"))
      .select(
        when(col("sp1") === "train", col("v2")).otherwise(col("v1"))
          .as("doc_id"),
        when(col("sp1") === "train", col("sp2")).otherwise(col("sp1"))
          .as("split"),
        col("cosine"))
    leaks.groupBy(col("doc_id"), col("split"))
      .agg(count(lit(1)).cast("long").as("n_train_neighbors"),
        max(col("cosine")).as("max_train_cosine"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "w_granger_causality" -> wGrangerCausality,
    "w_cooks_distance" -> wCooksDistance,
    "dedup_cohens_kappa" -> dedupCohensKappa,
    "t_semantic_leakage" -> tSemanticLeakage)

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Moments CTE (named `$nm`) for one Granger direction. Product
    * moments run through HUGEINT (exact 128-bit — DuckDB promotes
    * wide-decimal products to DOUBLE) and the same ÷10⁶ integral
    * quantization as the engine side before their ONE double cast. */
  private def grangerMoments(nm: String, y: String, yl: String,
      xl: String): String = {
    def q6(e: String): String =
      s"CAST(($e) // 1000000 AS BIGINT) * 1.0e6"
    s"""$nm AS (
       |  SELECT CAST(count(*) AS BIGINT) AS m,
       |         CAST(count(*) AS DOUBLE) AS n,
       |         CAST(CAST(sum($yl) AS HUGEINT) AS DOUBLE) AS s1,
       |         CAST(CAST(sum($xl) AS HUGEINT) AS DOUBLE) AS s2,
       |         ${q6(s"sum(CAST($yl AS HUGEINT) * CAST($yl AS HUGEINT))")}
       |           AS s11,
       |         ${q6(s"sum(CAST($yl AS HUGEINT) * CAST($xl AS HUGEINT))")}
       |           AS s12,
       |         ${q6(s"sum(CAST($xl AS HUGEINT) * CAST($xl AS HUGEINT))")}
       |           AS s22,
       |         CAST(CAST(sum($y) AS HUGEINT) AS DOUBLE) AS t0,
       |         ${q6(s"sum(CAST($y AS HUGEINT) * CAST($yl AS HUGEINT))")}
       |           AS t1,
       |         ${q6(s"sum(CAST($y AS HUGEINT) * CAST($xl AS HUGEINT))")}
       |           AS t2
       |  FROM dl)""".stripMargin
  }

  /** Fit CTE (named `$nm`, reading moments `$mo`): Cramer solve. */
  private def grangerFit(nm: String, mo: String): String =
    s"""$nm AS (
       |  SELECT m, b0, b1, b2, rb, (t0 - rb * s1) / n AS ra
       |  FROM (
       |    SELECT m, n, s1, t0,
       |           (t0 * (s11 * s22 - s12 * s12)
       |             - s1 * (t1 * s22 - s12 * t2)
       |             + s2 * (t1 * s12 - s11 * t2)) / det AS b0,
       |           (n * (t1 * s22 - s12 * t2)
       |             - t0 * (s1 * s22 - s12 * s2)
       |             + s2 * (s1 * t2 - t1 * s2)) / det AS b1,
       |           (n * (s11 * t2 - t1 * s12)
       |             - s1 * (s1 * t2 - t1 * s2)
       |             + t0 * (s1 * s12 - s11 * s2)) / det AS b2,
       |           (n * t1 - s1 * t0) / (n * s11 - s1 * s1) AS rb
       |    FROM (
       |      SELECT m, n, s1, s2, s11, s12, s22, t0, t1, t2,
       |             n * (s11 * s22 - s12 * s12)
       |               - s1 * (s1 * s22 - s12 * s2)
       |               + s2 * (s1 * s12 - s11 * s2) AS det
       |      FROM $mo)))""".stripMargin

  /** Order-free quantized RSS in DuckDB SQL: floor(e·1000) squared,
    * summed exactly in HUGEINT, hi/lo-split back to double — the
    * engine fold's bit-identical twin (see wGrangerCausality). */
  private def rssSql(e: String): String =
    s"""((CAST(CAST(sum(CAST(floor(($e) * 1000.0) AS HUGEINT)
       |  * CAST(floor(($e) * 1000.0) AS HUGEINT)) // 1000000000000
       |  AS BIGINT) AS DOUBLE) * 1.0e12
       |  + CAST(CAST(sum(CAST(floor(($e) * 1000.0) AS HUGEINT)
       |  * CAST(floor(($e) * 1000.0) AS HUGEINT)) % 1000000000000
       |  AS BIGINT) AS DOUBLE)) / 1.0e6)""".stripMargin
      .replaceAll("\n", " ")

  /** Exact HUGEINT Σ floor(e·1000)² for one residual expression. */
  private def rssHuge(e: String): String =
    s"""sum(CAST(floor(($e) * 1000.0) AS HUGEINT)
       |  * CAST(floor(($e) * 1000.0) AS HUGEINT))""".stripMargin
      .replaceAll("\n", " ")

  /** hi/lo-split HUGEINT → double (the engine fold's twin). */
  private def hugeToDouble(h: String): String =
    s"""((CAST(CAST($h // 1000000000000 AS BIGINT) AS DOUBLE) * 1.0e12
       |  + CAST(CAST($h % 1000000000000 AS BIGINT) AS DOUBLE)) / 1.0e6)"""
      .stripMargin.replaceAll("\n", " ")

  /** Final SELECT for one direction off fit CTE `$fit`. Hashed
    * outputs are integer-exact or integer-compare buckets — no
    * transcendental, no round() (see wGrangerCausality). */
  private def grangerSelect(fit: String, y: String, yl: String,
      xl: String, label: String): String =
    s"""SELECT '$label' AS direction, m AS n_obs,
       |       CAST(floor(b1 * 1.0e6) AS BIGINT) AS ar_coef_micro,
       |       CAST(floor(b2 * 1.0e6) AS BIGINT) AS cross_coef_micro,
       |       CAST(rssr_h // 1000000000000 AS BIGINT) AS rss_restricted_q,
       |       CAST(rssu_h // 1000000000000 AS BIGINT) AS rss_unrestricted_q,
       |       CAST(floor(fv * 1.0e6) AS BIGINT) AS f_stat_micro,
       |       CASE WHEN CAST(floor(fv * 1.0e6) AS BIGINT) >= 10827566
       |              THEN 'p<0.001'
       |            WHEN CAST(floor(fv * 1.0e6) AS BIGINT) >= 6634897
       |              THEN 'p<0.01'
       |            WHEN CAST(floor(fv * 1.0e6) AS BIGINT) >= 3841459
       |              THEN 'p<0.05'
       |            WHEN CAST(floor(fv * 1.0e6) AS BIGINT) >= 2705543
       |              THEN 'p<0.10'
       |            ELSE 'p>=0.10' END AS p_bucket,
       |       CASE WHEN CAST(floor(fv * 1.0e6) AS BIGINT) >= 3841459
       |            THEN 'causal_signal' ELSE 'no_signal' END AS verdict
       |FROM (
       |  SELECT m, b1, b2, rssu_h, rssr_h,
       |         CASE WHEN rss_u > 0.0 THEN
       |           least(1.0e9, greatest(0.0, (rss_r - rss_u)
       |             / (rss_u / CAST(m - 3 AS DOUBLE))))
       |         ELSE 0.0 END AS fv
       |  FROM (
       |    SELECT m, b1, b2, rssu_h, rssr_h,
       |           ${hugeToDouble("rssu_h")} AS rss_u,
       |           ${hugeToDouble("rssr_h")} AS rss_r
       |    FROM (
       |      SELECT f.m, f.b1, f.b2,
       |             ${rssHuge(s"$y - f.b0 - f.b1 * $yl - f.b2 * $xl")}
       |               AS rssu_h,
       |             ${rssHuge(s"$y - f.ra - f.rb * $yl")} AS rssr_h
       |      FROM dl CROSS JOIN $fit f
       |      GROUP BY f.m, f.b1, f.b2)))""".stripMargin

  val oracles: Map[String, String] = Map(
    "w_granger_causality" ->
      s"""WITH d0 AS (
         |  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS vol,
         |         CAST(sum($centsX) AS BIGINT) AS rev
         |  FROM orders GROUP BY 1),
         |dl AS (
         |  SELECT day, vol, rev,
         |         lag(vol) OVER (ORDER BY day) AS vol_l,
         |         lag(rev) OVER (ORDER BY day) AS rev_l
         |  FROM d0 QUALIFY vol_l IS NOT NULL),
         |${grangerMoments("mo_a", "rev", "rev_l", "vol_l")},
         |${grangerMoments("mo_b", "vol", "vol_l", "rev_l")},
         |${grangerFit("fit_a", "mo_a")},
         |${grangerFit("fit_b", "mo_b")}
         |${grangerSelect("fit_a", "dl.rev", "dl.rev_l", "dl.vol_l",
        "volume_to_revenue")}
         |UNION ALL
         |${grangerSelect("fit_b", "dl.vol", "dl.vol_l", "dl.rev_l",
        "revenue_to_volume")}
         |ORDER BY direction""".stripMargin,
    "w_cooks_distance" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS y,
         |         CAST(row_number() OVER (ORDER BY o_orderdate) AS BIGINT)
         |           AS t
         |  FROM orders GROUP BY 1),
         |mo AS (
         |  SELECT CAST(count(*) AS BIGINT) AS m,
         |         CAST(CAST(sum(t) AS DECIMAL(38,0)) AS DOUBLE) AS st,
         |         CAST(CAST(sum(CAST(t * t AS DECIMAL(38,0)))
         |           AS DECIMAL(38,0)) AS DOUBLE) AS stt,
         |         CAST(CAST(sum(y) AS DECIMAL(38,0)) AS DOUBLE) AS sy,
         |         CAST(CAST(sum(CAST(t * y AS DECIMAL(38,0)))
         |           AS DECIMAL(38,0)) AS DOUBLE) AS sty
         |  FROM daily),
         |fit AS (
         |  SELECT m,
         |         (CAST(m AS DOUBLE) * sty - st * sy)
         |           / (CAST(m AS DOUBLE) * stt - st * st) AS slope,
         |         (sy - (CAST(m AS DOUBLE) * sty - st * sy)
         |           / (CAST(m AS DOUBLE) * stt - st * st) * st)
         |           / CAST(m AS DOUBLE) AS icept,
         |         st / CAST(m AS DOUBLE) AS tbar,
         |         stt - st * st / CAST(m AS DOUBLE) AS sxx
         |  FROM mo),
         |resid AS (
         |  SELECT f.m, d.day, d.t, f.tbar, f.sxx,
         |         CAST(d.y AS DOUBLE) - f.icept
         |           - f.slope * CAST(d.t AS DOUBLE) AS e
         |  FROM daily d CROSS JOIN fit f),
         |s2_ AS (
         |  SELECT m, ${rssSql("e")} / CAST(m - 2 AS DOUBLE) AS s2
         |  FROM resid GROUP BY m),
         |infl AS (
         |  SELECT r.day, r.e,
         |         1.0 / CAST(r.m AS DOUBLE)
         |           + (CAST(r.t AS DOUBLE) - r.tbar)
         |             * (CAST(r.t AS DOUBLE) - r.tbar) / r.sxx AS h,
         |         s.s2
         |  FROM resid r CROSS JOIN s2_ s)
         |SELECT day, CAST(floor(e * 1000.0) AS BIGINT)
         |         AS residual_millicents,
         |       round(h, 6) AS leverage,
         |       round(e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h)), 6)
         |         AS cooks_d
         |FROM infl
         |ORDER BY cooks_d DESC, day LIMIT 10""".stripMargin,
    "dedup_cohens_kappa" ->
      s"""WITH ${TrainingData.minhashCtes},
         |lexdocs AS (
         |  SELECT DISTINCT unnest([d1, d2]) AS id FROM lshp),
         |emb0 AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |semdocs AS (
         |  SELECT DISTINCT unnest([v1, v2]) AS id FROM (
         |    SELECT a.vec_id AS v1, b.vec_id AS v2
         |    FROM emb0 a JOIN emb0 b
         |      ON a.label = b.label AND a.vec_id < b.vec_id
         |    WHERE list_sum(list_transform(range(1, len(a.emb) + 1),
         |            i -> a.emb[i] * b.emb[i]))
         |          / (sqrt(list_sum(list_transform(
         |               range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
         |             * sqrt(list_sum(list_transform(
         |               range(1, len(b.emb) + 1), i -> b.emb[i] * b.emb[i]))))
         |          >= 0.4)),
         |uni AS (
         |  SELECT e.vec_id,
         |         CASE WHEN l.id IS NOT NULL THEN 1 ELSE 0 END AS l,
         |         CASE WHEN s.id IS NOT NULL THEN 1 ELSE 0 END AS m
         |  FROM embeddings e
         |  LEFT JOIN lexdocs l ON e.vec_id = l.id
         |  LEFT JOIN semdocs s ON e.vec_id = s.id),
         |cells AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN l = 1 AND m = 1 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n11,
         |         CAST(sum(CASE WHEN l = 1 AND m = 0 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n10,
         |         CAST(sum(CASE WHEN l = 0 AND m = 1 THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n01
         |  FROM uni),
         |k AS (
         |  SELECT n, n11, n10, n01, n - n11 - n10 - n01 AS n00,
         |         CAST(n11 + n - n11 - n10 - n01 AS DOUBLE)
         |           / CAST(n AS DOUBLE) AS po,
         |         (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE)
         |           + CAST(n01 + n - n11 - n10 - n01 AS DOUBLE)
         |             * CAST(n10 + n - n11 - n10 - n01 AS DOUBLE))
         |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe
         |  FROM cells)
         |SELECT n AS n_docs, n11 AS both_flag, n10 AS lexical_only,
         |       n01 AS semantic_only, n00 AS neither,
         |       round(po, 6) AS p_observed, round(pe, 6) AS p_chance,
         |       round((po - pe) / (1.0 - pe), 6) AS kappa,
         |       CASE WHEN (po - pe) / (1.0 - pe) < 0.2 THEN 'slight'
         |            WHEN (po - pe) / (1.0 - pe) < 0.4 THEN 'fair'
         |            WHEN (po - pe) / (1.0 - pe) < 0.6 THEN 'moderate'
         |            WHEN (po - pe) / (1.0 - pe) < 0.8 THEN 'substantial'
         |            ELSE 'near_perfect' END AS agreement_band
         |FROM k""".stripMargin,
    "t_semantic_leakage" ->
      """WITH emb0 AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |pairs AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |         round(list_sum(list_transform(range(1, len(a.emb) + 1),
        |             i -> a.emb[i] * b.emb[i]))
        |           / (sqrt(list_sum(list_transform(
        |                range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
        |              * sqrt(list_sum(list_transform(
        |                range(1, len(b.emb) + 1),
        |                i -> b.emb[i] * b.emb[i])))), 6) AS cosine,
        |         list_sum(list_transform(range(1, len(a.emb) + 1),
        |             i -> a.emb[i] * b.emb[i]))
        |           / (sqrt(list_sum(list_transform(
        |                range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
        |              * sqrt(list_sum(list_transform(
        |                range(1, len(b.emb) + 1),
        |                i -> b.emb[i] * b.emb[i])))) AS cos_raw
        |  FROM emb0 a JOIN emb0 b
        |    ON a.label = b.label AND a.vec_id < b.vec_id),
        |sp AS (
        |  SELECT v1, v2, cosine,
        |         CASE WHEN substr(md5(CAST(v1 AS VARCHAR)), 1, 1)
        |                IN ('c','d') THEN 'val'
        |              WHEN substr(md5(CAST(v1 AS VARCHAR)), 1, 1)
        |                IN ('e','f') THEN 'test'
        |              ELSE 'train' END AS sp1,
        |         CASE WHEN substr(md5(CAST(v2 AS VARCHAR)), 1, 1)
        |                IN ('c','d') THEN 'val'
        |              WHEN substr(md5(CAST(v2 AS VARCHAR)), 1, 1)
        |                IN ('e','f') THEN 'test'
        |              ELSE 'train' END AS sp2
        |  FROM pairs WHERE cos_raw >= 0.4),
        |leaks AS (
        |  SELECT CASE WHEN sp1 = 'train' THEN v2 ELSE v1 END AS doc_id,
        |         CASE WHEN sp1 = 'train' THEN sp2 ELSE sp1 END AS split,
        |         cosine
        |  FROM sp
        |  WHERE sp1 <> sp2 AND (sp1 = 'train' OR sp2 = 'train'))
        |SELECT doc_id, split, CAST(count(*) AS BIGINT) AS n_train_neighbors,
        |       max(cosine) AS max_train_cosine
        |FROM leaks GROUP BY 1, 2 ORDER BY doc_id""".stripMargin)
}
