package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 16: ANN index tuning and resampling inference —
  * the IVF nprobe recall/cost sweep (the tuning table every vector
  * store publishes) and a delete-one-group jackknife variance for
  * the corpus quality mean. Both Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData19 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // sim_ivf_nprobe_sweep — the IVF tuning curve: for nprobe ∈
  // {1, 2, 4} probed cells (of the 16 deterministic md5-seeded
  // centroids shared with sim_cosine_ivf), recall@5 against the
  // exact cosine ground truth and the candidate volume actually
  // scanned — the recall-vs-cost table that decides an index's
  // operating point. A corpus vector lives in exactly ONE cell
  // (argmax assignment), so a candidate's probe rank is the rank of
  // its cell in the query's preference order; sweeping p is a
  // filter on that rank, not a re-scan. Integer hit/candidate
  // counts; recall is one division. Scale shape: the 16-row
  // centroid table broadcasts for both assignment passes (the
  // sim_cosine_ivf shape); the sweep explodes only the ≤3×
  // candidate frame of the 10 queries; the brute-truth leg is the
  // deliberate allowlisted baseline.
  // ---------------------------------------------------------------
  val simIvfNprobeSweep: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // centroids + assignment + query probes
    val cents = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .select(col("vec_id").as("cid"), col("e").as("ce"))
    def ranked(src: DataFrame): DataFrame = src
      .crossJoin(broadcast(cents))
      .withColumn("csim", Similarity.cosine(col("e"), col("ce")))
      .withColumn("crk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(desc("csim"), col("cid"))))
    val assigned = ranked(emb).filter(col("crk") === 1)
      .select(col("vec_id").as("neighbor_id"), col("e").as("ne"),
        col("cid").as("cell"))
    val probes = ranked(emb.filter(col("vec_id") < 10))
      .filter(col("crk") <= 4)
      .select(col("vec_id").as("query_id"), col("e").as("qe"),
        col("cid").as("cell"), col("crk").as("probe_rk"))
    val cand = broadcast(probes)
      .join(assigned, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("probe_rk"),
        Similarity.cosine(col("qe"), col("ne")).as("cos"))
      .localCheckpoint(eager = false) // swept three times
    val truth = Similarity.bruteForceTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    val sweep = Seq(1, 2, 4).map { p =>
      val w = Window.partitionBy(col("query_id"))
        .orderBy(desc("cos"), col("neighbor_id"))
      val c = cand.filter(col("probe_rk") <= p)
      val top5 = c.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .join(truth, Seq("query_id", "neighbor_id"), "left")
      val nCand = c.groupBy().agg(count(lit(1)).as("n_candidates"))
      top5.agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
          count(lit(1)).as("n_ranked"))
        .crossJoin(broadcast(nCand))
        .select(lit(p).as("nprobe"), col("n_candidates"),
          col("n_hits").cast("long").as("n_hits"),
          round(d(col("n_hits")) / lit(50.0), 6).as("recall_at_5"))
    }
    sweep.reduceLeft(_ unionAll _).orderBy(col("nprobe"))
  }

  // ---------------------------------------------------------------
  // a_jackknife_variance — delete-one-group jackknife (Quenouille/
  // Tukey; the G = 16 md5-fold variant a distributed pipeline uses
  // because delete-one-ROW is 10¹² recomputes) for the corpus mean
  // quality score: fold g's leave-out mean is (S − s_g)/(N − n_g)
  // from EXACT integer micro-unit sums, and the jackknife variance
  // is (G−1)/G · Σ (m_g − m̄)². The whole estimator is ONE tiny
  // aggregate (16 fold rows collected into an array on a single
  // row) + HOF folds in fold order — no joins, no window, nothing
  // beyond the one reduce. The companion of a_poisson_bootstrap
  // (resampling) on the estimation side.
  // ---------------------------------------------------------------
  val aJackknifeVariance: Q = (s, dir) => {
    val folds = Tables.table(s, dir, "documents")
      .select(substring(md5(col("doc_id").cast("string")), 1, 1).as("g"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).cast("long")
          .as("q"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("sq"))
    folds
      .agg(sum(col("n")).cast("long").as("nn"),
        sum(col("sq")).cast("long").as("ss"),
        count(lit(1)).as("gg"),
        sort_array(collect_list(struct(col("g"), col("n"), col("sq"))))
          .as("arr"))
      .withColumn("ms", expr(
        """transform(arr, x ->
          |  (CAST(ss - x.sq AS DOUBLE) / CAST(nn - x.n AS DOUBLE))
          |    / 1000000.0)""".stripMargin))
      .withColumn("mbar",
        expr("aggregate(ms, 0D, (a, x) -> a + x)") / d(col("gg")))
      .withColumn("jvar", expr(
        "aggregate(ms, 0D, (a, x) -> a + (x - mbar) * (x - mbar))") *
        (d(col("gg")) - lit(1.0)) / d(col("gg")))
      .select(col("nn").as("n_docs"), col("gg").as("n_folds"),
        round(d(col("ss")) / d(col("nn")) / lit(1000000.0), 6)
          .as("mean_quality"),
        round(col("mbar"), 6).as("jk_mean"),
        round(sqrt(col("jvar")), 6).as("jk_se"))
  }

  val queries: Map[String, Q] = Map(
    "sim_ivf_nprobe_sweep" -> simIvfNprobeSweep,
    "a_jackknife_variance" -> aJackknifeVariance)

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  val oracles: Map[String, String] = Map(
    "sim_ivf_nprobe_sweep" ->
      s"""WITH e AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |cents AS (
        |  SELECT vec_id AS cid, emb AS ce
        |  FROM (SELECT vec_id, emb,
        |               row_number() OVER (ORDER BY md5(CAST(vec_id AS
        |                 VARCHAR)), vec_id) AS rn
        |        FROM e)
        |  WHERE rn <= 16),
        |scoredc AS (
        |  SELECT e.vec_id, e.emb, c.cid, ${cosSql("e.emb", "c.ce")} AS csim
        |  FROM e CROSS JOIN cents c),
        |assigned AS (
        |  SELECT vec_id AS neighbor_id, emb AS ne, cid AS cell
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY csim DESC, cid) AS crk
        |        FROM scoredc)
        |  WHERE crk = 1),
        |probes AS (
        |  SELECT vec_id AS query_id, emb AS qe, cid AS cell, crk AS probe_rk
        |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |          ORDER BY csim DESC, cid) AS crk
        |        FROM scoredc WHERE vec_id < 10)
        |  WHERE crk <= 4),
        |cand AS (
        |  SELECT p.query_id, a.neighbor_id, p.probe_rk,
        |         ${cosSql("p.qe", "a.ne")} AS cos
        |  FROM probes p JOIN assigned a USING (cell)
        |  WHERE a.neighbor_id <> p.query_id),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id
        |             ORDER BY ${cosSql("q.emb", "x.emb")} DESC, x.vec_id)
        |             AS rk
        |    FROM e q, e x WHERE q.vec_id < 10 AND x.vec_id <> q.vec_id)
        |  WHERE rk <= 5),
        |ps AS (SELECT unnest([1, 2, 4]) AS nprobe),
        |sw AS (
        |  SELECT ps.nprobe, cand.query_id, cand.neighbor_id, cand.cos
        |  FROM cand CROSS JOIN ps WHERE cand.probe_rk <= ps.nprobe),
        |top5 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY nprobe, query_id
        |             ORDER BY cos DESC, neighbor_id) AS rk
        |    FROM sw) WHERE rk <= 5),
        |ncand AS (
        |  SELECT nprobe, CAST(count(*) AS BIGINT) AS n_candidates
        |  FROM sw GROUP BY 1),
        |hits AS (
        |  SELECT t.nprobe, CAST(count(g.neighbor_id) AS BIGINT) AS n_hits
        |  FROM top5 t LEFT JOIN truth g
        |    ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
        |  GROUP BY 1)
        |SELECT CAST(ps.nprobe AS INT) AS nprobe, ncand.n_candidates,
        |       hits.n_hits,
        |       round(CAST(hits.n_hits AS DOUBLE) / 50.0, 6) AS recall_at_5
        |FROM ps JOIN ncand USING (nprobe) JOIN hits USING (nprobe)
        |ORDER BY nprobe""".stripMargin,
    "a_jackknife_variance" ->
      """WITH folds AS (
        |  SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS g,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(floor((1.0 - CAST(n_stops AS DOUBLE)
        |             / CAST(len(toks) AS DOUBLE))
        |             * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE), 10.0) / 10.0
        |             * 1000000.0) AS BIGINT)) AS BIGINT) AS sq
        |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)
        |  GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sq) AS BIGINT) AS ss,
        |         CAST(count(*) AS BIGINT) AS gg,
        |         list_sort(list(struct_pack(g := g, n := n, sq := sq)))
        |           AS arr
        |  FROM folds),
        |ms AS (
        |  SELECT *, list_transform(arr, x ->
        |           (CAST(ss - x.sq AS DOUBLE) / CAST(nn - x.n AS DOUBLE))
        |             / 1000000.0) AS ms
        |  FROM agg),
        |mb AS (
        |  SELECT *, list_reduce(list_prepend(CAST(0 AS DOUBLE), ms),
        |           (a, b) -> a + b) / CAST(gg AS DOUBLE) AS mbar
        |  FROM ms),
        |jv AS (
        |  SELECT *, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(ms, x -> (x - mbar) * (x - mbar))),
        |           (a, b) -> a + b)
        |         * (CAST(gg AS DOUBLE) - 1.0) / CAST(gg AS DOUBLE) AS jvar
        |  FROM mb)
        |SELECT nn AS n_docs, gg AS n_folds,
        |       round(CAST(ss AS DOUBLE) / CAST(nn AS DOUBLE) / 1000000.0, 6)
        |         AS mean_quality,
        |       round(mbar, 6) AS jk_mean,
        |       round(sqrt(jvar), 6) AS jk_se
        |FROM jv""".stripMargin)
}
