package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 43: Newman modularity of the label partition over
  * the k-NN graph (is the labeling visible in embedding space? —
  * the graph dual of sim_cluster_purity), the turning-point
  * randomness test on daily revenue (Kendall — counts local extrema
  * where a_runs_test counts sign regimes), and per-language
  * character-bigram entropy (the compression/encoding-garbage probe:
  * mojibake and binary spill crater it). All Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData48 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // g_modularity — per-label modularity contribution over the
  // symmetrized cell-blocked k-NN edges: Q_c = e_cc/|P| − (d_c/|P|)²
  // over ordered pairs P (|P| = 2m), Q = Σ_c Q_c (Newman 2006).
  // Q ≈ 0 means the labels are invisible to the neighborhood
  // structure — clustering or label-blocked dedup won't work. Scale
  // shape: the edge set is the bounded cell-blocked top-3; the label
  // join is a broadcast of the (vec_id → label) projection per side;
  // everything reduces to exact per-label integer counts and two
  // fixed divisions, round-6.
  // ---------------------------------------------------------------
  val gModularity: Q = (s, dir) => {
    val e = TrainingData35.knnDirectedEdges(s, dir)
      .select(col("src"), col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val lab = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val labeled = und
      .join(lab.select(col("vec_id").as("src"), col("label").as("ls")), Seq("src"))
      .join(lab.select(col("vec_id").as("dst"), col("label").as("ld")), Seq("dst"))
      .localCheckpoint(eager = false) // total AND the per-label rollup
    val tot = labeled.agg(count(lit(1)).cast("long").as("p"))
    labeled.groupBy(col("ls").as("label"))
      .agg(count(lit(1)).cast("long").as("d_c"),
        sum(when(col("ls") === col("ld"), 1L).otherwise(0L))
          .cast("long").as("e_within"))
      .crossJoin(broadcast(tot))
      .select(col("label"), col("d_c"), col("e_within"),
        round(d(col("e_within")) / d(col("p")) -
          (d(col("d_c")) / d(col("p"))) * (d(col("d_c")) / d(col("p"))), 6)
          .as("q_contribution"))
      .orderBy(col("label"))
  }

  // ---------------------------------------------------------------
  // w_turning_points — Kendall's turning-point test on daily
  // revenue: T = # local extrema (x_{t−1} < x_t > x_{t+1} or the
  // mirror), E[T] = 2(n−2)/3, Var[T] = (16n−29)/90 under
  // randomness; |z| large = smoother (trend) or choppier
  // (oscillation) than noise. Complements a_runs_test (which sees
  // regimes, not local shape). Scale shape: the corpus reduces to
  // the calendar-bounded daily series; one lag/lead window over it
  // (documented family); all counts exact into one double DAG.
  // ---------------------------------------------------------------
  val wTurningPoints: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
    val w = Grain.bounded(col("day"))
    val t = daily
      .withColumn("prev", lag(col("m"), 1).over(w))
      .withColumn("nxt", lead(col("m"), 1).over(w))
      .filter(col("prev").isNotNull && col("nxt").isNotNull)
      .agg(count(lit(1)).cast("long").as("n_interior"),
        sum(when((col("prev") < col("m") && col("m") > col("nxt")) ||
            (col("prev") > col("m") && col("m") < col("nxt")), 1L)
          .otherwise(0L)).cast("long").as("t"))
    val n = d(col("n_interior")) + lit(2.0)
    val mu = lit(2.0) * (n - lit(2.0)) / lit(3.0)
    val vr = (lit(16.0) * n - lit(29.0)) / lit(90.0)
    val z = (d(col("t")) - mu) / sqrt(vr)
    t.select((col("n_interior") + 2).cast("long").as("n_days"),
      col("t").as("n_turning_points"),
      round(mu, 6).as("expected"),
      round(z, 6).as("z"),
      when(z < -1.96, "trending").when(z > 1.96, "oscillating")
        .otherwise(lit("random")).as("verdict"))
  }

  // ---------------------------------------------------------------
  // t_char_bigram_entropy — character-bigram Shannon entropy per
  // language: clean natural text sits in a narrow per-language band;
  // mojibake, base64 spill, or wrong-language routing shifts it
  // sharply (entropy up for random bytes, down for repeated
  // boilerplate). Scale shape: the bigram explode is scan-local
  // (linear in characters), one (lang, bigram) aggregate with
  // map-side combine, then a per-lang sorted entropy fold over the
  // bounded bigram alphabet; round-6 (libm ln).
  // ---------------------------------------------------------------
  val tCharBigramEntropy: Q = (s, dir) => {
    val bg = Tables.table(s, dir, "documents")
      .select(col("lang"), explode(expr(
        "transform(sequence(1, length(text) - 1)," +
          " i -> substring(text, i, 2))")).as("bg"))
      .groupBy(col("lang"), col("bg"))
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = bg.groupBy(col("lang"))
      .agg(sum(col("c")).cast("long").as("t"),
        count(lit(1)).cast("long").as("n_distinct"))
    bg.join(tot, Seq("lang"))
      .select(col("lang"), col("t"), col("n_distinct"), col("bg"),
        (-(d(col("c")) / d(col("t"))) * log(d(col("c")) / d(col("t"))))
          .as("term"))
      .groupBy(col("lang"), col("t"), col("n_distinct"))
      .agg(expr("aggregate(sort_array(collect_list(struct(bg, term))), 0D," +
        " (a, x) -> a + x.term)").as("h"))
      .select(col("lang"), col("t").as("n_bigrams"), col("n_distinct"),
        round(col("h"), 6).as("entropy"),
        round(col("h") / log(d(col("n_distinct"))), 6).as("normalized"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "g_modularity" -> gModularity,
    "w_turning_points" -> wTurningPoints,
    "t_char_bigram_entropy" -> tCharBigramEntropy)

  val oracles: Map[String, String] = Map(
    "g_modularity" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT dst, src FROM edges),
         |lab AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings),
         |labeled AS (
         |  SELECT ls.label AS ls, ld.label AS ld
         |  FROM und u JOIN lab ls ON ls.vec_id = u.src
         |             JOIN lab ld ON ld.vec_id = u.dst),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS p FROM labeled)
         |SELECT ls AS label, CAST(count(*) AS BIGINT) AS d_c,
         |       CAST(sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS BIGINT)
         |         AS e_within,
         |       round(CAST(sum(CASE WHEN ls = ld THEN 1 ELSE 0 END) AS BIGINT)
         |           ::DOUBLE / p::DOUBLE
         |         - (CAST(count(*) AS BIGINT)::DOUBLE / p::DOUBLE)
         |           * (CAST(count(*) AS BIGINT)::DOUBLE / p::DOUBLE), 6)
         |         AS q_contribution
         |FROM labeled CROSS JOIN tot
         |GROUP BY ls, p ORDER BY label""".stripMargin,
    "w_turning_points" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |tp AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_interior,
        |         CAST(sum(CASE WHEN (prev < m AND m > nxt)
        |               OR (prev > m AND m < nxt) THEN 1 ELSE 0 END)
        |           AS BIGINT) AS t
        |  FROM (SELECT m, lag(m, 1) OVER (ORDER BY day) AS prev,
        |               lead(m, 1) OVER (ORDER BY day) AS nxt
        |        FROM daily)
        |  WHERE prev IS NOT NULL AND nxt IS NOT NULL),
        |f AS (
        |  SELECT n_interior, t,
        |         n_interior::DOUBLE + 2.0 AS n,
        |         2.0 * (n_interior::DOUBLE + 2.0 - 2.0) / 3.0 AS mu,
        |         (16.0 * (n_interior::DOUBLE + 2.0) - 29.0) / 90.0 AS vr
        |  FROM tp)
        |SELECT n_interior + 2 AS n_days, t AS n_turning_points,
        |       round(mu, 6) AS expected,
        |       round((t::DOUBLE - mu) / sqrt(vr), 6) AS z,
        |       CASE WHEN (t::DOUBLE - mu) / sqrt(vr) < -1.96 THEN 'trending'
        |            WHEN (t::DOUBLE - mu) / sqrt(vr) > 1.96 THEN 'oscillating'
        |            ELSE 'random' END AS verdict
        |FROM f""".stripMargin,
    "t_char_bigram_entropy" ->
      """WITH bg AS (
        |  SELECT lang, text[i:i+1] AS bg
        |  FROM documents
        |  CROSS JOIN unnest(range(1, length(text))) AS r(i)),
        |cnt AS (
        |  SELECT lang, bg, CAST(count(*) AS BIGINT) AS c
        |  FROM bg GROUP BY 1, 2),
        |tot AS (
        |  SELECT lang, CAST(sum(c) AS BIGINT) AS t,
        |         CAST(count(*) AS BIGINT) AS n_distinct
        |  FROM cnt GROUP BY 1),
        |h AS (
        |  SELECT lang, t, n_distinct,
        |         list_sum(list(-(c::DOUBLE / t::DOUBLE)
        |           * ln(c::DOUBLE / t::DOUBLE) ORDER BY bg)) AS h
        |  FROM cnt JOIN tot USING (lang)
        |  GROUP BY lang, t, n_distinct)
        |SELECT lang, t AS n_bigrams, n_distinct,
        |       round(h, 6) AS entropy,
        |       round(h / ln(n_distinct::DOUBLE), 6) AS normalized
        |FROM h ORDER BY lang""".stripMargin)
}
