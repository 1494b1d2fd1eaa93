package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-9 batch 31: degree assortativity of the k-NN graph (Newman
  * 2002 — do hubs link to hubs?), a Fourier periodogram with Fisher's
  * g peak ranking on daily revenue (Fisher 1929 — is the weekly cycle
  * a real spectral line?), and a simplified (centroid-based)
  * silhouette audit of the k-means codebook (Rousseeuw 1987;
  * the linear-time centroid variant, Hruschka et al. 2004). All
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData36 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // g_assortativity — degree assortativity coefficient of the
  // symmetrized cell-blocked k-NN graph: the Pearson correlation of
  // endpoint degrees over all ordered edge pairs (Newman 2002).
  // Positive r = hubs attach to hubs (assortative); ANN graphs are
  // typically DISassortative (hubs absorb antihubs' edges — the
  // sim_hubness failure mode, quantified here as one number).
  // Ordered pairs make the pair set exactly symmetric, so the x and
  // y marginals coincide and r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²).
  // Scale shape: edges are the bounded cell-blocked top-3 set;
  // symmetrize is one union+distinct; degrees one count aggregate;
  // the moment reduction is all exact integers (map-combinable) into
  // a fixed double formula — the a_autocorr recipe. Degenerate
  // regular graph (zero variance) yields NULL, not a 0/0.
  // ---------------------------------------------------------------
  val gAssortativity: Q = (s, dir) => {
    val e = TrainingData35.knnDirectedEdges(s, dir)
      .select(col("src"), col("dst"))
    // symmetrize: an undirected edge contributes both ordered pairs
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = false) // consumed by the degree count AND the pair join
    val deg = und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
    val pairs = und
      .join(deg.select(col("id").as("src"), col("deg").as("x")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("y")), Seq("dst"))
    val m = pairs.agg(count(lit(1)).cast("long").as("np"),
      sum(col("x")).cast("long").as("sx"),
      sum(col("x") * col("y")).cast("long").as("sxy"),
      sum(col("x") * col("x")).cast("long").as("sxx"))
    val num = d(col("np")) * d(col("sxy")) - d(col("sx")) * d(col("sx"))
    val den = d(col("np")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    m.crossJoin(broadcast(deg.agg(count(lit(1)).cast("long").as("n_nodes"))))
      .select(col("n_nodes"),
        (col("np") / 2).cast("long").as("n_und_edges"),
        when(den === 0.0, lit(null).cast("double"))
          .otherwise(round(num / den, 6)).as("assortativity"))
  }

  // ---------------------------------------------------------------
  // w_periodogram — Fourier periodogram of mean-centered daily
  // revenue at the Fourier frequencies k = 1..min(512, ⌊(n−1)/2⌋),
  // ranked by variance share (Fisher's g statistic = the top share:
  // the classical test for a hidden periodicity — the weekly line
  // should dominate a retail series). I_k = (C_k² + S_k²)/n with
  // C_k = Σ_t xc_t·cos(2πkt/n). Scale shape: the day series is
  // calendar-bounded (the documented low-cardinality family), so the
  // day×frequency term grid is bounded (≤ n·512 rows) at ANY corpus
  // scale — the only corpus-size work is the exact-decimal daily
  // aggregate. Float policy: cos/sin are libm (1-ulp class), so the
  // per-frequency sums fold in pinned day order (sorted fold ≡
  // DuckDB list_sum(list ORDER BY t)) and every output goes through
  // round(…, 6) — the bm25 rule; ranking is on the ROUNDED share
  // with the frequency index as tiebreak (the rounded-rank rule).
  // ---------------------------------------------------------------
  /** Shared Fourier power grid (k, n, p) over mean-centered daily
    * revenue, k = 1..min(512, ⌊(n−1)/2⌋) — consumed by w_periodogram
    * here and w_spectral_entropy (TrainingData83). The day series is
    * calendar-bounded, so it collapses to ONE array row and each
    * frequency folds over it in t order: identical terms in the
    * identical order to the former day×frequency exploded grid —
    * whose two sorted collect_list ObjectHashAggregates pushed ~2.5M
    * structs per run — with theta's multiplication chain preserved
    * (((2π)·k)·t)/n so every double matches bit-for-bit. */
  private[operators] def fourierPower(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
    val base = daily
      .withColumn("t", (row_number().over(Grain.bounded(col("day"))) - 1)
        .cast("long"))
      .agg(sort_array(collect_list(struct(col("t"), col("m")))).as("ser"),
        count(lit(1)).cast("long").as("n"),
        sum(col("m")).cast("long").as("sm"))
      .withColumn("mu", d(col("sm")) / d(col("n")))
    base.select(explode(sequence(lit(1L),
        least(lit(512L), ((col("n") - 1) / 2).cast("long")))).as("k"),
        col("n"), col("mu"), col("ser"))
      // the 1-row parent leaves all 512 folds in ONE task; spread the
      // frequency rows so the ~2.5M cos/sin evaluations parallelize
      .repartition(col("k"))
      .select(col("k"), col("n"),
        expr("aggregate(ser, 0D, (a, x) -> a +" +
          " (CAST(x.m AS DOUBLE) - mu) * cos(2.0D * pi()" +
          " * CAST(k AS DOUBLE) * CAST(x.t AS DOUBLE)" +
          " / CAST(n AS DOUBLE)))").as("cc"),
        expr("aggregate(ser, 0D, (a, x) -> a +" +
          " (CAST(x.m AS DOUBLE) - mu) * sin(2.0D * pi()" +
          " * CAST(k AS DOUBLE) * CAST(x.t AS DOUBLE)" +
          " / CAST(n AS DOUBLE)))").as("ss"))
      .select(col("k"), col("n"),
        ((col("cc") * col("cc") + col("ss") * col("ss")) / d(col("n"))).as("p"))
  }

  val wPeriodogram: Q = (s, dir) => {
    val pw = fourierPower(s, dir)
    val tot = pw.agg(expr("aggregate(sort_array(collect_list(struct(k, p)))," +
      " 0D, (a, x) -> a + x.p)").as("tp"))
    pw.crossJoin(broadcast(tot))
      .withColumn("share", round(col("p") / col("tp"), 6))
      .withColumn("rank", row_number().over(
        Grain.bounded(desc("share"), col("k"))).cast("int"))
      .filter(col("rank") <= 5)
      .select(col("rank"), col("k"),
        round(d(col("n")) / d(col("k")), 3).as("period_days"),
        col("share").as("power_share"))
      .orderBy(col("rank"))
  }

  // ---------------------------------------------------------------
  // sim_silhouette — simplified silhouette over the k-means seed
  // codebook (k=8, the sim_kmeans seeds): per vector, a = cosine
  // distance to its nearest centroid, b = distance to the runner-up;
  // s = (b − a)/max(a, b) = (b − a)/b since the nearest is argmax.
  // The centroid-based variant is LINEAR in corpus size (Hruschka et
  // al. 2004) — the pairwise original is corpus² and exists only as
  // a definition, never a plan. Scale shape: one broadcast-codebook
  // scan per vector (corpus never shuffles), bounded k×1 aggregate.
  // Float policy: s comes from Similarity.dot doubles (bit-identical
  // across engines, the repo's pinned claim), quantized to exact
  // micro-units floor(s·10⁶) — integer sums, one division at the
  // edge (the t_dataset_card rule). A duplicate-centroid b = 0
  // yields s = 0 by convention (documented; cannot arise with
  // distinct seed vectors).
  // ---------------------------------------------------------------
  val simSilhouette: Q = (s, dir) => {
    val k = 8
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e0"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"), x => x / col("nrm")).as("e"))
      .localCheckpoint(eager = false) // consumed by seed pick AND the scoring scan
    val cents = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .withColumn("cid", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
      .select(col("cid").cast("long").as("cid"), col("e").as("ce"))
    val scored = emb.crossJoin(broadcast(cents))
      .withColumn("cos", Similarity.dot(col("e"), col("ce")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cid"))))
      .filter(col("rk") <= 2)
      .groupBy(col("vec_id"))
      .agg(max(when(col("rk") === 1, col("cid"))).as("cluster"),
        max(when(col("rk") === 1, col("cos"))).as("cos1"),
        max(when(col("rk") === 2, col("cos"))).as("cos2"))
    val a = lit(1.0) - col("cos1")
    val b = lit(1.0) - col("cos2")
    scored
      .withColumn("smicro",
        when(b === 0.0, lit(0L))
          .otherwise(floor((b - a) / b * lit(1000000.0)).cast("long")))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        (sum(col("smicro")).cast("double") / lit(1000000.0) /
          count(lit(1)).cast("double")).as("mean_silhouette"),
        (min(col("smicro")).cast("double") / lit(1000000.0)).as("min_silhouette"),
        (max(col("smicro")).cast("double") / lit(1000000.0)).as("max_silhouette"))
      .orderBy(col("cluster"))
  }

  val queries: Map[String, Q] = Map(
    "g_assortativity" -> gAssortativity,
    "w_periodogram" -> wPeriodogram,
    "sim_silhouette" -> simSilhouette)

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  val oracles: Map[String, String] = Map(
    "g_assortativity" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT dst, src FROM edges),
         |deg AS (
         |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |  FROM und GROUP BY 1),
         |pairs AS (
         |  SELECT dx.deg AS x, dy.deg AS y
         |  FROM und u JOIN deg dx ON dx.id = u.src
         |             JOIN deg dy ON dy.id = u.dst),
         |m AS (
         |  SELECT CAST(count(*) AS BIGINT) AS np,
         |         CAST(sum(x) AS BIGINT) AS sx,
         |         CAST(sum(x * y) AS BIGINT) AS sxy,
         |         CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM pairs)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
         |       np // 2 AS n_und_edges,
         |       CASE WHEN np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE = 0.0
         |            THEN NULL
         |            ELSE round((np::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sx::DOUBLE)
         |                   / (np::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE), 6)
         |       END AS assortativity
         |FROM m""".stripMargin,
    "w_periodogram" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |idx AS (
        |  SELECT m, CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS t
        |  FROM daily),
        |n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(m) AS BIGINT) AS sm
        |  FROM daily),
        |mu AS (SELECT n, sm::DOUBLE / n::DOUBLE AS mu FROM n),
        |freq AS (
        |  SELECT unnest(generate_series(1, CAST(least(512, (n - 1) // 2)
        |           AS BIGINT))) AS k, n, mu
        |  FROM mu),
        |terms AS (
        |  SELECT f.k, f.n, i.t,
        |         (i.m::DOUBLE - f.mu)
        |           * cos(2.0 * pi() * f.k::DOUBLE * i.t::DOUBLE / f.n::DOUBLE) AS c,
        |         (i.m::DOUBLE - f.mu)
        |           * sin(2.0 * pi() * f.k::DOUBLE * i.t::DOUBLE / f.n::DOUBLE) AS s2
        |  FROM idx i CROSS JOIN freq f),
        |pw AS (
        |  SELECT k, n,
        |         (list_sum(list(c ORDER BY t)) * list_sum(list(c ORDER BY t))
        |          + list_sum(list(s2 ORDER BY t)) * list_sum(list(s2 ORDER BY t)))
        |           / n::DOUBLE AS p
        |  FROM terms GROUP BY k, n),
        |tot AS (SELECT list_sum(list(p ORDER BY k)) AS tp FROM pw),
        |shares AS (
        |  SELECT k, n, round(p / tp, 6) AS share
        |  FROM pw CROSS JOIN tot)
        |SELECT CAST(rank AS INTEGER) AS rank, k,
        |       round(n::DOUBLE / k::DOUBLE, 3) AS period_days,
        |       share AS power_share
        |FROM (SELECT k, n, share,
        |             row_number() OVER (ORDER BY share DESC, k) AS rank
        |      FROM shares)
        |WHERE rank <= 5 ORDER BY rank""".stripMargin,
    "sim_silhouette" ->
      s"""WITH e0 AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |e AS (
         |  SELECT vec_id,
         |         list_transform(emb, x -> x / sqrt(list_sum(
         |           list_transform(range(1, len(emb) + 1), i -> emb[i] * emb[i])))) AS e
         |  FROM e0),
         |cents AS (
         |  SELECT CAST(rn AS BIGINT) AS cid, e AS ce
         |  FROM (SELECT vec_id, e,
         |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM e)
         |  WHERE rn <= 8),
         |rk2 AS (
         |  SELECT vec_id, cid, cos, rk FROM (
         |    SELECT e.vec_id, c.cid, ${dotSql("e.e", "c.ce")} AS cos,
         |           row_number() OVER (PARTITION BY e.vec_id
         |             ORDER BY ${dotSql("e.e", "c.ce")} DESC, c.cid) AS rk
         |    FROM e CROSS JOIN cents c) WHERE rk <= 2),
         |piv AS (
         |  SELECT vec_id,
         |         max(CASE WHEN rk = 1 THEN cid END) AS cluster,
         |         max(CASE WHEN rk = 1 THEN cos END) AS cos1,
         |         max(CASE WHEN rk = 2 THEN cos END) AS cos2
         |  FROM rk2 GROUP BY 1),
         |sm AS (
         |  SELECT cluster,
         |         CASE WHEN 1.0 - cos2 = 0.0 THEN CAST(0 AS BIGINT)
         |              ELSE CAST(floor(((1.0 - cos2) - (1.0 - cos1))
         |                     / (1.0 - cos2) * 1000000.0) AS BIGINT)
         |         END AS smicro
         |  FROM piv)
         |SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         |       CAST(sum(smicro) AS DOUBLE) / 1000000.0
         |         / CAST(count(*) AS DOUBLE) AS mean_silhouette,
         |       CAST(min(smicro) AS DOUBLE) / 1000000.0 AS min_silhouette,
         |       CAST(max(smicro) AS DOUBLE) / 1000000.0 AS max_silhouette
         |FROM sm GROUP BY 1 ORDER BY cluster""".stripMargin)
}
