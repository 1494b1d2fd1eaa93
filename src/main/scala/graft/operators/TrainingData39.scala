package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-9 batch 34: intrinsic-dimension estimation (Levina &
  * Bickel 2004 MLE over k-NN distances — the manifold audit that
  * says whether 64 stored dimensions carry 64 dimensions of signal),
  * NDCG@5 ranking quality of the IVF index against the brute-force
  * truth (Järvelin & Kekäläinen 2002 — recall says WHETHER the
  * truth came back, NDCG says WHERE it landed), and per-label
  * embedding centroid drift between deterministic corpus halves
  * (the embedding-space counterpart of a_psi_drift — re-embedding /
  * upstream-model drift shows up as centroid rotation before any
  * downstream metric moves). All Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData39 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // e_intrinsic_dim — pooled Levina–Bickel MLE with k = 3 over the
  // cell-blocked k-NN graph: for each vector with a full 3-neighbor
  // list, the log distance ratios ln(T₃/T₁) + ln(T₃/T₂); pooled
  // d̂ = (k−1)·n / Σ — eq. (8)'s global average. Distances are
  // chordal on the unit sphere (√(2−2cos), exact given the
  // bit-identical dot). Scale shape: reuses the bounded k-NN edge
  // set (near-linear at fixed cell width); the per-vector pivot is
  // one 3-row group; the pooled Σ folds ln terms in src order (the
  // g_pagerank sorted-fold rule — plain sum at real scale, the
  // documented deviation class). Vectors with a zero nearest
  // distance (exact duplicates — dedup's jurisdiction) are excluded
  // from n, keeping every log finite.
  // ---------------------------------------------------------------
  val eIntrinsicDim: Q = (s, dir) => {
    val (edges, assigned) = TrainingData2.knnEdgesWithAssigned(s, dir)
    val withD = edges
      .join(assigned.select(col("vec_id").as("src"), col("e").as("se")), Seq("src"))
      .join(assigned.select(col("vec_id").as("dst"), col("e").as("de")), Seq("dst"))
      .withColumn("cos", Similarity.dot(col("se"), col("de")))
      .withColumn("dist", sqrt(greatest(lit(2.0) - lit(2.0) * col("cos"), lit(0.0))))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(desc("cos"), col("dst"))))
    val per = withD.groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        max(when(col("rk") === 1, col("dist"))).as("t1"),
        max(when(col("rk") === 2, col("dist"))).as("t2"),
        max(when(col("rk") === 3, col("dist"))).as("t3"))
      .filter(col("cnt") === 3 && col("t1") > 0.0)
      .select(col("src"),
        (log(col("t3") / col("t1")) + log(col("t3") / col("t2"))).as("term"))
    val nVec = Tables.table(s, dir, "embeddings")
      .agg(count(lit(1)).cast("long").as("n_vectors"))
    per.agg(count(lit(1)).cast("long").as("n_used"),
        expr("aggregate(sort_array(collect_list(struct(src, term))), 0D," +
          " (a, x) -> a + x.term)").as("sum_lr"))
      .crossJoin(broadcast(nVec))
      .select(col("n_vectors"), col("n_used"),
        round(lit(2.0) * d(col("n_used")) / col("sum_lr"), 6).as("dim_mle"))
  }

  // ---------------------------------------------------------------
  // sim_ndcg — NDCG@5 of the IVF retrieval against the brute-force
  // cosine truth, binary gains: DCG = Σ_hits 1/log₂(rank+1) over
  // the IVF ranking, IDCG from the truth list itself — position-
  // aware where sim_ann_recall_eval is set-based (an index that
  // returns the right five in the wrong order scores recall 1 but
  // NDCG < 1). Both legs are the registered operators. Scale shape:
  // both retrievals are the deliberate broadcast-query baselines;
  // the fold is over ≤5 rows per query, in pinned rank order (log₂
  // is libm → sorted fold + round-6, the bm25 rule).
  // ---------------------------------------------------------------
  val simNdcg: Q = (s, dir) => {
    val ivf = Similarity.ivfSampleTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), col("rk"))
    val bf = Similarity.bruteForceTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), col("rk").as("brk"))
    val j = ivf.join(bf.withColumn("hit", lit(1L))
        .select(col("query_id"), col("neighbor_id"), col("hit")),
        Seq("query_id", "neighbor_id"), "left")
      .select(col("query_id"), col("rk"),
        when(col("hit").isNotNull, lit(1.0) / log2(d(col("rk")) + lit(1.0)))
          .otherwise(lit(0.0)).as("g"),
        when(col("hit").isNotNull, 1L).otherwise(0L).as("h"))
    val dcg = j.groupBy(col("query_id"))
      .agg(sum(col("h")).cast("long").as("n_hits"),
        expr("aggregate(sort_array(collect_list(struct(rk, g))), 0D," +
          " (a, x) -> a + x.g)").as("dcg"))
    val idcg = bf.select(col("query_id"), col("brk"),
        (lit(1.0) / log2(d(col("brk")) + lit(1.0))).as("g"))
      .groupBy(col("query_id"))
      .agg(expr("aggregate(sort_array(collect_list(struct(brk, g))), 0D," +
        " (a, x) -> a + x.g)").as("idcg"))
    dcg.join(idcg, Seq("query_id"))
      .select(col("query_id"), col("n_hits"),
        round(col("dcg") / col("idcg"), 6).as("ndcg_at_5"))
      .orderBy(col("query_id"))
  }

  // ---------------------------------------------------------------
  // e_centroid_drift — per-label centroid rotation between the
  // deterministic even/odd vec_id halves: 1 − cos(c_even, c_odd)
  // per label, plus the half sizes. Near 0 = the halves agree on
  // where the label lives; a hot label = upstream embedding drift
  // or a label whose members split into modes. Scale shape: one
  // corpus scan explodes to (label, half, dim) partial sums
  // (map-combinable; the member fold pins vec_id order for the
  // oracle — plain avg at real scale, the sim_kmeans deviation
  // class), centroids are a labels×2×dim frame, the cosine is one
  // bounded self-join.
  // ---------------------------------------------------------------
  val eCentroidDrift: Q = (s, dir) => {
    val base = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        (col("vec_id") % 2 === 0).as("even"),
        posexplode(Similarity.toDoubleArr(col("embedding"))).as(Seq("pos", "v")))
    val cents = base.groupBy(col("label"), col("even"), col("pos"))
      .agg(expr("aggregate(sort_array(collect_list(struct(vec_id, v))), 0D," +
        " (a, x) -> a + x.v)").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", col("sv") / d(col("n")))
      .groupBy(col("label"), col("even"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
        .as("c"), max(col("n")).cast("long").as("n_members"))
    val ev = cents.filter(col("even"))
      .select(col("label"), col("c").as("ce"), col("n_members").as("n_even"))
    val od = cents.filter(!col("even"))
      .select(col("label"), col("c").as("co"), col("n_members").as("n_odd"))
    ev.join(od, Seq("label"))
      .select(col("label"), col("n_even"), col("n_odd"),
        round(lit(1.0) - Similarity.dot(col("ce"), col("co")) /
          (sqrt(Similarity.dot(col("ce"), col("ce"))) *
            sqrt(Similarity.dot(col("co"), col("co")))), 6).as("drift"))
      .orderBy(col("label"))
  }

  val queries: Map[String, Q] = Map(
    "e_intrinsic_dim" -> eIntrinsicDim,
    "sim_ndcg" -> simNdcg,
    "e_centroid_drift" -> eCentroidDrift)

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  val oracles: Map[String, String] = Map(
    "e_intrinsic_dim" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |wd AS (
         |  SELECT ed.src, ed.dst,
         |         sqrt(greatest(2.0 - 2.0 * ${dotSql("sa.emb", "da.emb")}, 0.0))
         |           AS dist,
         |         row_number() OVER (PARTITION BY ed.src
         |           ORDER BY ${dotSql("sa.emb", "da.emb")} DESC, ed.dst) AS rk
         |  FROM edges ed
         |  JOIN assigned sa ON sa.vec_id = ed.src
         |  JOIN assigned da ON da.vec_id = ed.dst),
         |per AS (
         |  SELECT src,
         |         ln(max(CASE WHEN rk = 3 THEN dist END)
         |           / max(CASE WHEN rk = 1 THEN dist END))
         |         + ln(max(CASE WHEN rk = 3 THEN dist END)
         |           / max(CASE WHEN rk = 2 THEN dist END)) AS term
         |  FROM wd GROUP BY src
         |  HAVING count(*) = 3 AND max(CASE WHEN rk = 1 THEN dist END) > 0.0),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_used,
         |         list_sum(list(term ORDER BY src)) AS sum_lr
         |  FROM per)
         |SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vectors,
         |       n_used,
         |       round(2.0 * n_used::DOUBLE / sum_lr, 6) AS dim_mle
         |FROM agg""".stripMargin,
    "sim_ndcg" ->
      s"""WITH ivf AS (SELECT * FROM (
         |${TrainingData.oracles("sim_cosine_ivf")}
         |)),
         |bf AS (SELECT * FROM (
         |${TrainingData.oracles("sim_cosine_topk")}
         |)),
         |j AS (
         |  SELECT i.query_id, i.rk,
         |         CASE WHEN b.neighbor_id IS NOT NULL
         |              THEN 1.0 / log2(i.rk::DOUBLE + 1.0) ELSE 0.0 END AS g,
         |         CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END AS h
         |  FROM ivf i LEFT JOIN bf b
         |    ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id),
         |dcg AS (
         |  SELECT query_id, CAST(sum(h) AS BIGINT) AS n_hits,
         |         list_sum(list(g ORDER BY rk)) AS dcg
         |  FROM j GROUP BY 1),
         |idcg AS (
         |  SELECT query_id,
         |         list_sum(list(1.0 / log2(rk::DOUBLE + 1.0) ORDER BY rk)) AS idcg
         |  FROM bf GROUP BY 1)
         |SELECT d.query_id, d.n_hits, round(d.dcg / i.idcg, 6) AS ndcg_at_5
         |FROM dcg d JOIN idcg i USING (query_id)
         |ORDER BY d.query_id""".stripMargin,
    "e_centroid_drift" ->
      s"""WITH base AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         vec_id % 2 = 0 AS even,
         |         unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS v,
         |         unnest(range(1, len(embedding) + 1)) AS pos
         |  FROM embeddings),
         |cd AS (
         |  SELECT label, even, pos,
         |         list_sum(list(v ORDER BY vec_id)) AS sv,
         |         count(*) AS n
         |  FROM base GROUP BY 1, 2, 3),
         |cents AS (
         |  SELECT label, even, list(sv / n ORDER BY pos) AS c,
         |         CAST(max(n) AS BIGINT) AS n_members
         |  FROM cd GROUP BY 1, 2)
         |SELECT e.label, e.n_members AS n_even, o.n_members AS n_odd,
         |       round(1.0 - ${dotSql("e.c", "o.c")}
         |         / (sqrt(${dotSql("e.c", "e.c")})
         |            * sqrt(${dotSql("o.c", "o.c")})), 6) AS drift
         |FROM (SELECT * FROM cents WHERE even) e
         |JOIN (SELECT * FROM cents WHERE NOT even) o USING (label)
         |ORDER BY e.label""".stripMargin)
}
