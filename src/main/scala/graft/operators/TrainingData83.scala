package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-12 batch 83: a two-sample distribution test, a spectral
  * flatness audit, sampled shortest-path betweenness, and a
  * multimodal scene-cut detector.
  *
  *  - a_ks_two_sample — Kolmogorov–Smirnov weekend-vs-weekday daily
  *    revenue: D from EXACT integer ECDF cross-products on the
  *    value grid, the classical asymptotic p (3-term alternating
  *    series).
  *  - w_spectral_entropy — Shannon entropy of the normalized
  *    periodogram (the w_periodogram power grid): is the series'
  *    variance concentrated in a few lines (strong seasonality) or
  *    broadband noise?
  *  - g_betweenness_sampled — Brandes dependency accumulation from
  *    4 md5-sampled roots on the k-NN graph (the
  *    g_harmonic_centrality BFS conventions), with σ path counts
  *    exact longs and δ accumulated in exact integer NANO-units —
  *    order-free, engine-portable.
  *  - mm_scene_cuts — frame-difference scene cuts over the opaque
  *    media blobs: 16-byte windows through the portable hex path
  *    (the mm_byte_entropy idiom), integer window sums, cut when
  *    |Δ| exceeds the threshold. The video-shot-boundary shape on
  *    stand-in payloads — all plumbing real, no decoder.
  *
  * Float policy: exact integer statistics everywhere except the
  * closed-form p / entropy edges; bulk float folds quantize
  * per-term to integers BEFORE summation (order-free — the
  * TrainingData78 lesson) or pin day order exactly as the green
  * w_periodogram does.
  */
object TrainingData83 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  // ---------------------------------------------------------------
  // a_ks_two_sample — samples: daily revenue on weekend days
  // (dayofweek ∈ {Sun, Sat} — the a_cohens_h / ev_logrank weekend
  // convention) vs weekday days. The ECDF gap is computed on the
  // VALUE grid: per distinct revenue v, c1/c2 = cumulative group
  // counts (one window over the value order — day-grain rows), and
  // D·N1·N2 = max |c1·N2 − c2·N1| stays an EXACT long (≤ 2400³).
  // λ = (√nₑ + 0.12 + 0.11/√nₑ)·D (A&S / Numerical-Recipes form),
  // p = 2·Σ_{k=1..3} (−1)^{k−1} e^{−2k²λ²}, clamped to [0, 1].
  // Scale shape: the corpus reduces to the day grain; everything
  // after is calendar-bounded.
  // ---------------------------------------------------------------
  val aKsTwoSample: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .withColumn("we",
        when(dayofweek(col("day")).isin(1, 7), 1L).otherwise(0L))
    val wv = Grain.bounded(col("x"))
    val grid = daily.groupBy(col("x"))
      .agg(sum(col("we")).cast("long").as("g1"),
        sum(lit(1L) - col("we")).cast("long").as("g2"))
      .withColumn("c1", sum(col("g1")).over(wv).cast("long"))
      .withColumn("c2", sum(col("g2")).over(wv).cast("long"))
    val tot = daily.agg(sum(col("we")).cast("long").as("n1"),
      sum(lit(1L) - col("we")).cast("long").as("n2"))
    val dmax = grid.crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("c1") * col("n2") - col("c2") * col("n1")).as("dn"))
      .groupBy(col("n1"), col("n2"))
      .agg(max(col("dn")).cast("long").as("dnum"))
      .withColumn("d_stat", d(col("dnum")) / (d(col("n1")) * d(col("n2"))))
      .withColumn("ne",
        d(col("n1")) * d(col("n2")) / (d(col("n1")) + d(col("n2"))))
      .withColumn("lam",
        (sqrt(col("ne")) + lit(0.12) + lit(0.11) / sqrt(col("ne"))) *
          col("d_stat"))
      // hashed-output discipline (PLANS.md): the 3-term KS survival
      // goes through exp() — p ships as a bucket from the fixed λ
      // criticals of that SAME truncated series (solved offline:
      // 2Σ(−1)^{k−1}e^{−2k²λ²} = α at λ = 1.223848 / 1.358099 /
      // 1.627624 / 1.949475), via integer compares on floor(λ·10⁶).
      // λ is rational+sqrt of exact counts: deterministic.
      .withColumn("lm", floor(col("lam") * lit(1.0e6)).cast("long"))
    dmax.select(col("n1").as("n_weekend"), col("n2").as("n_weekday"),
      round(col("d_stat"), 6).as("d_stat"),
      round(col("lam"), 6).as("lambda_ks"),
      when(col("lm") >= 1949474L, "p<0.001")
        .when(col("lm") >= 1627623L, "p<0.01")
        .when(col("lm") >= 1358098L, "p<0.05")
        .when(col("lm") >= 1223847L, "p<0.10")
        .otherwise(lit("p>=0.10")).as("p_bucket"),
      when(col("lm") >= 1358098L, "distributions_differ")
        .otherwise(lit("consistent")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // w_spectral_entropy — the w_periodogram power grid (identical
  // day-ordered cos/sin folds — that op's oracle-green float
  // discipline), then Shannon entropy of the normalized spectrum:
  // per-frequency contributions −p·ln p floor-quantized to NANO-nats
  // and summed exactly (≤512 terms, order-free). entropy_norm =
  // H/ln K ∈ [0,1]: ≪1 means a few dominant lines (strong
  // seasonality), ≈1 means broadband. Scale shape: day×frequency
  // grid is calendar-bounded at any corpus size.
  // ---------------------------------------------------------------
  val wSpectralEntropy: Q = (s, dir) => {
    // shared optimized grid (TrainingData36.fourierPower): the day
    // series folds as ONE array row per frequency — identical terms
    // in identical order to the former exploded day×frequency grid
    val pw = TrainingData36.fourierPower(s, dir)
      .localCheckpoint(eager = false) // total + share/entropy pass
    val tot = pw.agg(count(lit(1)).cast("long").as("kk"),
      expr("aggregate(sort_array(collect_list(struct(k, p))), 0D," +
        " (a, x) -> a + x.p)").as("tp"))
    pw.crossJoin(broadcast(tot))
      .select(col("kk"), col("tp"), col("k"),
        (col("p") / col("tp")).as("sh"))
      .select(col("kk"), col("tp"),
        // zero-power spectrum line: sh=0 makes -0·ln(0) a NaN whose
        // floor Spark folds to null while DuckDB raises on the CAST
        // — guard on both sides so it contributes exactly 0 nats
        when(col("sh") > 0.0,
          floor(-col("sh") * log(col("sh")) * lit(1.0e9)))
          .otherwise(lit(0L)).as("hq"),
        col("sh"))
      .groupBy(col("kk"))
      .agg(sum(col("hq")).cast("long").as("hqs"),
        max(col("sh")).as("top_share"))
      .select(col("kk").as("n_freqs"),
        round(d(col("hqs")) / lit(1.0e9), 6).as("spectral_entropy_nats"),
        round(d(col("hqs")) / lit(1.0e9) / log(d(col("kk"))), 6)
          .as("entropy_norm"),
        round(col("top_share"), 6).as("top_share"),
        when(d(col("hqs")) / lit(1.0e9) / log(d(col("kk"))) < 0.5,
          "concentrated")
          .when(d(col("hqs")) / lit(1.0e9) / log(d(col("kk"))) < 0.9,
            "mixed")
          .otherwise(lit("broadband")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // g_betweenness_sampled — Brandes (2001) from 4 md5-sampled roots
  // on the undirected k-NN graph, hop cap 8 (the
  // g_harmonic_centrality conventions). Forward: BFS level sets
  // carry σ (shortest-path counts — exact longs, sums over
  // predecessor levels). Backward: δ(v) = Σ_{w ∈ succ}
  // (σ_v/σ_w)·(1 + δ(w)) accumulates in exact integer NANO-units —
  // δq(v) = Σ_w ⌊σ_v·(10⁹ + δq(w)) / σ_w⌋, a decimal(38,0)
  // product + one integral division per edge, so the per-node sum
  // is order-free (a raw double Σ here would be the TrainingData78
  // sum-kernel hazard on every level). Output: top-10 nodes by
  // root-summed δ. Scale shape: ≤16 driver-stepped bounded jobs
  // (the documented BFS family); every frame is (roots ×
  // reachable-nodes)-bounded.
  // ---------------------------------------------------------------
  val gBetweennessSampled: Q = (s, dir) => {
    val maxHops = 8
    val edges = TrainingData5.knnUndirected(s, dir).localCheckpoint(eager = false)
    val roots = edges.select(col("src").as("node")).distinct()
      .orderBy(md5(col("node").cast("string")), col("node")).limit(4)
      .select(col("node").as("root"), col("node"), lit(1L).as("sigma"))
      .localCheckpoint(eager = false)
    var frontier = roots
    var visited = roots.select(col("root"), col("node"))
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var hop = 1; var done = false
    while (!done && hop <= maxHops) {
      val next = edges
        .join(frontier.select(col("root"), col("node").as("src"),
          col("sigma")), Seq("src"))
        .groupBy(col("root"), col("dst").as("node"))
        .agg(sum(col("sigma")).cast("long").as("sigma"))
        .join(visited, Seq("root", "node"), "left_anti")
        .localCheckpoint(eager = false)
      if (next.isEmpty) done = true
      else {
        layers += next
        // lazy union, no checkpoint: member frames are already
        // materialized (roots + per-hop checkpoints) — re-writing the
        // growing visited set each hop was a pure extra job per hop
        visited = visited.union(next.select(col("root"), col("node")))
        frontier = next
      }
      hop += 1
    }
    // backward dependency accumulation, deepest level first
    var dq = layers.last.withColumn("dq", lit(0L))
    var acc = dq.select(col("root"), col("node"), col("dq"))
    for (i <- (layers.size - 2) to 0 by -1) {
      val succ = dq.select(col("root"), col("node").as("dst"),
        col("sigma").as("sw"), col("dq").as("dw"))
      val terms = layers(i)
        .join(edges.select(col("src").as("node"), col("dst")), Seq("node"))
        .join(succ, Seq("root", "dst"))
        .groupBy(col("root"), col("node"))
        .agg(sum(expr(
          "CAST(CAST(sigma AS DECIMAL(38,0)) * (1000000000 + dw)" +
            " div sw AS BIGINT)")).cast("long").as("dq"))
      dq = layers(i).join(terms, Seq("root", "node"), "left")
        .select(col("root"), col("node"), col("sigma"),
          coalesce(col("dq"), lit(0L)).as("dq"))
        .localCheckpoint(eager = false)
      acc = acc.union(dq.select(col("root"), col("node"), col("dq")))
    }
    acc.groupBy(col("node"))
      .agg(sum(col("dq")).cast("long").as("bq"))
      .orderBy(desc("bq"), col("node")).limit(10)
      .select(col("node"), round(d(col("bq")) / lit(1.0e9), 6)
        .as("betweenness"))
  }

  // ---------------------------------------------------------------
  // mm_scene_cuts — shot-boundary detection over opaque media
  // blobs: the blob reads as consecutive 16-byte "frames" through
  // the portable hex path (uppercase hex on both engines, bytes via
  // strpos into '0123456789ABCDEF' — no UDF, no decoder); per-frame
  // signature = exact integer byte sum; a CUT is |Δ signature| >
  // 256 between consecutive frames. Per doc: frame count, cut
  // count, max |Δ|, static/dynamic verdict. Everything integer.
  // Scale shape: the frame explosion is output-linear in total
  // bytes; the delta window partitions by doc.
  // ---------------------------------------------------------------
  private val CutThreshold = 256L

  val mmSceneCuts: Q = (s, dir) => {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .filter(length(col("hx")) >= 32)
    val frames = docs
      .select(col("doc_id"), col("hx"),
        explode(expr("sequence(0, CAST(length(hx) / 32 AS INT) - 1)"))
          .as("w"))
      .select(col("doc_id"), col("w"),
        expr(
          """aggregate(sequence(0, 15), CAST(0 AS BIGINT),
            |  (a, j) -> a
            |    + (instr('0123456789ABCDEF',
            |         substr(hx, w * 32 + j * 2 + 1, 1)) - 1) * 16
            |    + (instr('0123456789ABCDEF',
            |         substr(hx, w * 32 + j * 2 + 2, 1)) - 1))"""
            .stripMargin.replaceAll("\n", " ")).as("sig"))
    val wd = Window.partitionBy(col("doc_id")).orderBy(col("w"))
    frames
      .withColumn("prev", lag(col("sig"), 1).over(wd))
      .withColumn("delta",
        when(col("prev").isNotNull, abs(col("sig") - col("prev")))
          .otherwise(lit(null).cast("long")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_frames"),
        sum(when(col("delta") > CutThreshold, 1L).otherwise(0L))
          .cast("long").as("n_cuts"),
        coalesce(max(col("delta")), lit(0L)).cast("long")
          .as("max_delta"))
      .select(col("doc_id"), col("n_frames"), col("n_cuts"),
        col("max_delta"),
        when(col("n_cuts") >= 3L, "dynamic").otherwise(lit("static"))
          .as("verdict"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "a_ks_two_sample" -> aKsTwoSample,
    "w_spectral_entropy" -> wSpectralEntropy,
    "g_betweenness_sampled" -> gBetweennessSampled,
    "mm_scene_cuts" -> mmSceneCuts)

  /** Forward BFS rounds carrying σ (the mrBfsRounds shape + path
    * counts); backward rounds accumulate δ in nano-units. */
  private def sigmaBfsRounds(n: Int): String =
    (1 to n).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT f.root, e.dst AS node,
         |         CAST(sum(f.sigma) AS BIGINT) AS sigma
         |  FROM p0 e JOIN l${i - 1} f ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} x
         |                    WHERE x.root = f.root AND x.node = e.dst)
         |  GROUP BY 1, 2),
         |v$i AS MATERIALIZED (
         |  SELECT root, node FROM v${i - 1}
         |  UNION SELECT root, node FROM l$i)"""
        .stripMargin
    }.mkString(",\n")

  private def deltaRounds(n: Int): String =
    (n - 1 to 1 by -1).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT v.root, v.node, v.sigma,
         |         COALESCE(CAST(sum(
         |           CAST(CAST(v.sigma AS HUGEINT) * (1000000000 + w.dq)
         |             // w.sigma AS BIGINT)) AS BIGINT), 0) AS dq
         |  FROM l$i v
         |  LEFT JOIN p0 e ON e.src = v.node
         |  LEFT JOIN d${i + 1} w ON w.root = v.root AND w.node = e.dst
         |  GROUP BY 1, 2, 3)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "a_ks_two_sample" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x,
         |         CASE WHEN dayofweek(o_orderdate) IN (0, 6)
         |              THEN 1 ELSE 0 END AS we
         |  FROM orders GROUP BY 1),
         |grid AS (
         |  SELECT x, CAST(sum(we) AS BIGINT) AS g1,
         |         CAST(sum(1 - we) AS BIGINT) AS g2
         |  FROM daily GROUP BY 1),
         |cum AS (
         |  SELECT x,
         |         CAST(sum(g1) OVER (ORDER BY x) AS BIGINT) AS c1,
         |         CAST(sum(g2) OVER (ORDER BY x) AS BIGINT) AS c2
         |  FROM grid),
         |tot AS (
         |  SELECT CAST(sum(we) AS BIGINT) AS n1,
         |         CAST(sum(1 - we) AS BIGINT) AS n2
         |  FROM daily),
         |dm AS (
         |  SELECT t.n1, t.n2,
         |         CAST(max(abs(c.c1 * t.n2 - c.c2 * t.n1)) AS BIGINT)
         |           AS dnum
         |  FROM cum c CROSS JOIN tot t GROUP BY 1, 2),
         |st AS (
         |  SELECT n1, n2,
         |         CAST(dnum AS DOUBLE)
         |           / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
         |         CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
         |           / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS ne
         |  FROM dm),
         |lm AS (
         |  SELECT n1, n2, d_stat,
         |         (sqrt(ne) + 0.12 + 0.11 / sqrt(ne)) * d_stat AS lam
         |  FROM st),
         |pk AS (
         |  SELECT n1, n2, d_stat, lam,
         |         CAST(floor(lam * 1.0e6) AS BIGINT) AS lmq
         |  FROM lm)
         |SELECT n1 AS n_weekend, n2 AS n_weekday,
         |       round(d_stat, 6) AS d_stat,
         |       round(lam, 6) AS lambda_ks,
         |       CASE WHEN lmq >= 1949474 THEN 'p<0.001'
         |            WHEN lmq >= 1627623 THEN 'p<0.01'
         |            WHEN lmq >= 1358098 THEN 'p<0.05'
         |            WHEN lmq >= 1223847 THEN 'p<0.10'
         |            ELSE 'p>=0.10' END AS p_bucket,
         |       CASE WHEN lmq >= 1358098 THEN 'distributions_differ'
         |            ELSE 'consistent' END AS verdict
         |FROM pk""".stripMargin,
    "w_spectral_entropy" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS m
         |  FROM orders GROUP BY 1),
         |idx AS (
         |  SELECT m, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT)
         |           AS t
         |  FROM daily),
         |n AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(m) AS BIGINT) AS sm
         |  FROM daily),
         |mu AS (SELECT n, sm::DOUBLE / n::DOUBLE AS mu FROM n),
         |freq AS (
         |  SELECT unnest(generate_series(1, CAST(least(512, (n - 1) // 2)
         |           AS BIGINT))) AS k, n, mu
         |  FROM mu),
         |terms AS (
         |  SELECT f.k, f.n, i.t,
         |         (i.m::DOUBLE - f.mu)
         |           * cos(2.0 * pi() * f.k::DOUBLE * i.t::DOUBLE
         |               / f.n::DOUBLE) AS c,
         |         (i.m::DOUBLE - f.mu)
         |           * sin(2.0 * pi() * f.k::DOUBLE * i.t::DOUBLE
         |               / f.n::DOUBLE) AS s2
         |  FROM idx i CROSS JOIN freq f),
         |pw AS (
         |  SELECT k, n,
         |         (list_sum(list(c ORDER BY t)) * list_sum(list(c ORDER BY t))
         |          + list_sum(list(s2 ORDER BY t))
         |            * list_sum(list(s2 ORDER BY t))) / n::DOUBLE AS p
         |  FROM terms GROUP BY k, n),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS kk,
         |         list_sum(list(p ORDER BY k)) AS tp
         |  FROM pw),
         |hq AS (
         |  SELECT t.kk,
         |         CASE WHEN p / t.tp > 0.0
         |              THEN CAST(floor(-(p / t.tp) * ln(p / t.tp) * 1.0e9)
         |                AS BIGINT)
         |              ELSE 0 END AS hq,
         |         p / t.tp AS sh
         |  FROM pw CROSS JOIN tot t),
         |agg AS (
         |  SELECT kk, CAST(sum(hq) AS BIGINT) AS hqs,
         |         max(sh) AS top_share
         |  FROM hq GROUP BY kk)
         |SELECT kk AS n_freqs,
         |       round(CAST(hqs AS DOUBLE) / 1.0e9, 6)
         |         AS spectral_entropy_nats,
         |       round(CAST(hqs AS DOUBLE) / 1.0e9
         |         / ln(CAST(kk AS DOUBLE)), 6) AS entropy_norm,
         |       round(top_share, 6) AS top_share,
         |       CASE WHEN CAST(hqs AS DOUBLE) / 1.0e9
         |              / ln(CAST(kk AS DOUBLE)) < 0.5 THEN 'concentrated'
         |            WHEN CAST(hqs AS DOUBLE) / 1.0e9
         |              / ln(CAST(kk AS DOUBLE)) < 0.9 THEN 'mixed'
         |            ELSE 'broadband' END AS verdict
         |FROM agg""".stripMargin,
    "g_betweenness_sampled" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |p0 AS MATERIALIZED (SELECT src, dst FROM edges UNION
         |       SELECT dst, src FROM edges),
         |roots AS MATERIALIZED (
         |  SELECT node AS root, node FROM (
         |    SELECT DISTINCT src AS node FROM p0)
         |  ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 4),
         |l0 AS (SELECT root, node, CAST(1 AS BIGINT) AS sigma FROM roots),
         |v0 AS (SELECT root, node FROM roots),
         |${sigmaBfsRounds(8)},
         |d8 AS (SELECT root, node, sigma, CAST(0 AS BIGINT) AS dq FROM l8),
         |${deltaRounds(8)},
         |alld AS (
         |  ${(1 to 8).map(i => s"SELECT root, node, dq FROM d$i")
            .mkString("\n  UNION ALL\n  ")})
         |SELECT node, round(CAST(bq AS DOUBLE) / 1.0e9, 6) AS betweenness
         |FROM (
         |  SELECT node, CAST(sum(dq) AS BIGINT) AS bq
         |  FROM alld GROUP BY node)
         |ORDER BY bq DESC, node LIMIT 10""".stripMargin,
    "mm_scene_cuts" ->
      s"""WITH docs AS (
         |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx FROM documents
         |  WHERE length(hex(CAST(text AS BLOB))) >= 32),
         |frames AS (
         |  SELECT doc_id, w,
         |         CAST(list_sum(list_transform(range(0, 16),
         |           j -> (strpos('0123456789ABCDEF',
         |                  substr(hx, w * 32 + j * 2 + 1, 1)) - 1) * 16
         |              + (strpos('0123456789ABCDEF',
         |                  substr(hx, w * 32 + j * 2 + 2, 1)) - 1)))
         |           AS BIGINT) AS sig
         |  FROM (SELECT doc_id, hx,
         |          unnest(range(0, CAST(length(hx) // 32 AS INT))) AS w
         |        FROM docs)),
         |deltas AS (
         |  SELECT doc_id, w, sig,
         |         abs(sig - lag(sig) OVER (PARTITION BY doc_id ORDER BY w))
         |           AS delta
         |  FROM frames)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
         |       CAST(sum(CASE WHEN delta > $CutThreshold THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_cuts,
         |       CAST(coalesce(max(delta), 0) AS BIGINT) AS max_delta,
         |       CASE WHEN sum(CASE WHEN delta > $CutThreshold
         |              THEN 1 ELSE 0 END) >= 3
         |            THEN 'dynamic' ELSE 'static' END AS verdict
         |FROM deltas GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
