package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-9 batch 5: retrieval-feedback, graph-local, time-series and
  * sequence extensions — Rocchio pseudo-relevance feedback (Rocchio
  * 1971, the query-expansion classic), per-node local clustering
  * coefficients (Watts & Strogatz 1998), classical additive seasonal
  * decomposition (the moving-average trend + day-of-week seasonal
  * split), and session path mining (top event-type trigrams) — all
  * public algorithms re-expressed Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData9 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // sim_rocchio_prf — Rocchio pseudo-relevance feedback: retrieve
  // top-5 by cosine, expand the query q' = q + 0.75·centroid(top-5),
  // re-retrieve with q' (the one-round PRF every classic IR stack
  // ships; feedback docs stay eligible, as standard). Output: the
  // re-ranked top-5 with both ranks side by side (-1 = newly pulled
  // in by expansion). Scale shape: both retrieval legs are the
  // broadcast 5-query brute baseline (one corpus scan each — the
  // sim_cosine_topk family); the centroid folds over 5×64 doubles
  // in rank order (fixed-order ≡ list_sum twin). α=1, β=0.75 are
  // written literals on both engines.
  // ---------------------------------------------------------------
  val simRocchioPrf: Q = (s, dir) => {
    val nQ = 5; val k = 5
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // consumed by both retrieval legs
    val qe = emb.filter(col("vec_id") < nQ)
      .select(col("vec_id").as("query_id"), col("e").as("qe"))
      .localCheckpoint(eager = false) // consumed by init retrieval + expansion
    val init = emb.join(broadcast(qe), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        Similarity.cosine(col("qe"), col("e")).as("cos0"), col("e"))
      .withColumn("rk_init", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("cos0"), col("doc_id"))))
      .filter(col("rk_init") <= k)
      .localCheckpoint(eager = false) // consumed by the centroid + the rank join
    val cent = init
      .groupBy(col("query_id"))
      .agg(sort_array(collect_list(struct(col("rk_init"), col("e"))))
        .as("docs"))
      .withColumn("cent", expr(
        "transform(sequence(1, 64), j -> aggregate(docs, CAST(0.0 AS DOUBLE)," +
          " (a, x) -> a + element_at(x.e, j)) / 5.0)"))
      .join(qe, "query_id")
      .select(col("query_id"),
        expr("zip_with(qe, cent, (a, b) -> a + 0.75 * b)").as("qx"))
    val prf = emb.join(broadcast(cent), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        Similarity.cosine(col("qx"), col("e")).as("cos_prf"))
      .withColumn("rk_prf", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(desc("cos_prf"), col("doc_id"))))
      .filter(col("rk_prf") <= k)
    prf
      .join(init.select(col("query_id"), col("doc_id"), col("rk_init")),
        Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"), col("rk_prf"),
        round(col("cos_prf"), 6).as("cos_prf"),
        coalesce(col("rk_init"), lit(-1)).as("rk_init"))
      .orderBy(col("query_id"), col("rk_prf"))
  }

  // ---------------------------------------------------------------
  // g_local_clustering — per-node local clustering coefficient over
  // the k-NN similarity graph (Watts & Strogatz 1998): lcc(v) =
  // 2·tri(v) / (deg(v)·(deg(v)−1)) — the "is this doc inside a
  // dense near-dup pocket or on a bridge" signal, the node-local
  // twin of g_triangles' global coefficient. Scale shape: wedge
  // pairs are Σ deg² (out-degree-3-bounded — never corpus²); the
  // closing-edge check is one hash join against the edge set; knn
  // degrees are ≥ 3, so the denominator never vanishes. Top-100 on
  // the rounded lcc with the node tiebreak (the bm25 precedent).
  // ---------------------------------------------------------------
  val gLocalClustering: Q = (s, dir) => {
    val und = TrainingData5.knnUndirected(s, dir)
      .localCheckpoint(eager = false) // consumed by wedges (twice), closure, degrees
    val deg = und.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val tri = und.alias("x")
      .join(und.alias("y"), col("x.src") === col("y.src") &&
        col("x.dst") < col("y.dst"))
      .join(und.alias("e"), col("e.src") === col("x.dst") &&
        col("e.dst") === col("y.dst"))
      .groupBy(col("x.src").as("node")).agg(count(lit(1)).as("tri"))
    deg.join(tri, Seq("node"), "left")
      .select(col("node"), col("deg").cast("long").as("deg"),
        coalesce(col("tri"), lit(0L)).cast("long").as("tri"))
      .withColumn("lcc", round(lit(2.0) * d(col("tri")) /
        (d(col("deg")) * d(col("deg") - 1)), 6))
      .orderBy(desc("lcc"), col("node"))
      .limit(100)
  }

  // ---------------------------------------------------------------
  // w_seasonal_decompose — classical additive decomposition of daily
  // revenue: trend = centered 7-day moving average (full windows
  // only — year edges stay NULL; per-year partitions, the
  // w_holt_winters restart convention), seasonal = the day-of-week
  // mean of the detrended series re-centered to sum 0, residual =
  // detrended − seasonal. Scale shape: the corpus reduces through
  // the exact-decimal daily aggregate FIRST; the ±3-row window and
  // both seasonal folds run over CALENDAR-bounded frames (the
  // detrended per-dow fold sorts by day — the sorted-fold float
  // policy; 7-decimal-day sums are exact before the single /7).
  // ---------------------------------------------------------------
  val wSeasonalDecompose: Q = (s, dir) => {
    val w = Window.partitionBy(col("yr")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
      .withColumn("yr", year(col("day")))
      .withColumn("trend",
        when(count(lit(1)).over(w) === 7,
          expr("CAST(SUM(rev) OVER (PARTITION BY yr ORDER BY day" +
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)") / 7.0))
      .withColumn("detr", d(col("rev")) - col("trend"))
      .localCheckpoint(eager = false) // consumed by the dow means and the output
    val dowM = daily.filter(col("detr").isNotNull)
      .groupBy(dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n"),
        expr("aggregate(sort_array(collect_list(struct(day, detr))), 0D," +
          " (a, x) -> a + x.detr)").as("sd"))
      .withColumn("m", col("sd") / d(col("n")))
      .localCheckpoint(eager = false) // consumed by the grand mean + the join
    val grand = dowM.agg((expr(
      "aggregate(sort_array(collect_list(struct(dow, m))), 0D," +
        " (a, x) -> a + x.m)") / d(count(lit(1)))).as("gm"))
    daily
      .join(broadcast(dowM.select(col("dow"), col("m"))),
        dayofweek(col("day")) === col("dow"), "left")
      .crossJoin(broadcast(grand))
      .select(col("day"), d(col("rev")).as("revenue"),
        round(col("trend"), 6).as("trend"),
        round(col("m") - col("gm"), 6).as("seasonal"),
        round(col("detr") - (col("m") - col("gm")), 6).as("residual"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // ev_path_mining — top session paths: sessionize each user's
  // stream on 30-minute gaps (the w_sessionize_users rule), read off
  // the (ts, event_id)-ordered event-type sequence per session, and
  // count every length-3 path (trigram shingles via the native
  // TokenShingles pass — the same primitive the text n-gram family
  // uses). Output: the 20 most frequent paths (count desc, path
  // tiebreak) — the "what do users actually do" sequence readout.
  // Scale shape: one window pass to sessionize, one bounded
  // per-session collect (sessions are gap-bounded), map-side
  // combinable path counts; the type alphabet caps distinct paths
  // at |types|³.
  // ---------------------------------------------------------------
  val evPathMining: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = Tables.table(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_session")).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    val seqs = sess.groupBy(col("user_id"), col("sess_id"))
      .agg(expr("transform(sort_array(collect_list(struct(ts, event_id," +
        " event_type))), x -> x.event_type)").as("seq"))
    seqs
      // TokenShingles emits ONE whole-array shingle for shorter-than-n
      // inputs (the minhash convention); paths want full trigrams only
      .filter(size(col("seq")) >= 3)
      .select(explode(graft.plans.HashExpressions
        .tokenShingles(col("seq"), 3)).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .orderBy(desc("n_paths"), col("path"))
      .limit(20)
  }

  // ---------------------------------------------------------------
  // ev_ltv_cohort — the cohort lifetime-value triangle (the
  // monetized twin of ev_cohort_retention): users cohort by the ISO
  // week of their first signup; each purchase lands in its
  // week-offset bucket (exact integer-µs floor-div weeks from the
  // user's own signup); per (cohort, offset): revenue and the
  // running cumulative LTV per cohort user. Money stays exact
  // DECIMAL(18,2) through the cumulative window (offsets per cohort
  // are CALENDAR-bounded — the documented low-cardinality window
  // family) and divides by the cohort size once at the edge. Scale
  // shape: per-user min aggregate → purchase equi-join → ≤
  // cohorts×offsets cells.
  // ---------------------------------------------------------------
  val evLtvCohort: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events").localCheckpoint(eager = false)
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s0"))
      .withColumn("cohort", date_trunc("week", col("s0")).cast("date"))
      .localCheckpoint(eager = false) // consumed by sizes and the purchase join
    val sizes = su.groupBy(col("cohort")).agg(count(lit(1)).as("n_users"))
    val buckets = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("s0"))
      .select(col("cohort"),
        expr("(unix_micros(ts) - unix_micros(s0)) div 604800000000")
          .as("week_offset"),
        col("value").cast("decimal(18,2)").as("v"))
      .groupBy(col("cohort"), col("week_offset"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("v")).as("rev"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cohort")).orderBy(col("week_offset"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    buckets
      .withColumn("cum", sum(col("rev")).over(wc))
      .join(sizes, "cohort")
      .select(col("cohort"), col("week_offset"), col("n_users"),
        col("n_purchases"), d(col("rev")).as("revenue"),
        (d(col("cum")) / d(col("n_users"))).as("cum_ltv_per_user"))
      .orderBy(col("cohort"), col("week_offset"))
  }

  val queries: Map[String, Q] = Map(
    "ev_ltv_cohort" -> evLtvCohort,
    "sim_rocchio_prf" -> simRocchioPrf,
    "g_local_clustering" -> gLocalClustering,
    "w_seasonal_decompose" -> wSeasonalDecompose,
    "ev_path_mining" -> evPathMining)

  /** DuckDB dot/cosine — the bit-identical Similarity twins. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  val oracles: Map[String, String] = Map(
    "ev_ltv_cohort" ->
      """WITH su AS (
        |  SELECT user_id, min(ts) AS s0,
        |         CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |sz AS (SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        |       FROM su GROUP BY 1),
        |bk AS (
        |  SELECT su.cohort,
        |         (epoch_us(e.ts) - epoch_us(su.s0)) // 604800000000
        |           AS week_offset,
        |         CAST(count(*) AS BIGINT) AS n_purchases,
        |         SUM(CAST(e.value AS DECIMAL(18,2))) AS rev
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s0
        |  GROUP BY 1, 2),
        |cm AS (
        |  SELECT *, SUM(rev) OVER (PARTITION BY cohort ORDER BY week_offset
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM bk)
        |SELECT cm.cohort, cm.week_offset, sz.n_users, cm.n_purchases,
        |       CAST(cm.rev AS DOUBLE) AS revenue,
        |       CAST(cm.cum AS DOUBLE) / CAST(sz.n_users AS DOUBLE)
        |         AS cum_ltv_per_user
        |FROM cm JOIN sz ON cm.cohort = sz.cohort
        |ORDER BY cm.cohort, cm.week_offset""".stripMargin,
    "sim_rocchio_prf" ->
      s"""WITH e AS (
         |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE))
         |           AS emb
         |  FROM embeddings),
         |init AS (
         |  SELECT query_id, doc_id, emb, rk_init FROM (
         |    SELECT q.vec_id AS query_id, n.vec_id AS doc_id, n.emb,
         |           row_number() OVER (PARTITION BY q.vec_id
         |             ORDER BY ${cosSql("q.emb", "n.emb")} DESC, n.vec_id)
         |             AS rk_init
         |    FROM e q JOIN e n ON n.vec_id <> q.vec_id
         |    WHERE q.vec_id < 5)
         |  WHERE rk_init <= 5),
         |cent AS (
         |  SELECT query_id,
         |         list_transform(range(1, 65),
         |           j -> list_sum(list_transform(docs, dd -> dd[j])) / 5.0)
         |           AS cent
         |  FROM (SELECT query_id, list(emb ORDER BY rk_init) AS docs
         |        FROM init GROUP BY 1)),
         |qx AS (
         |  SELECT c.query_id,
         |         list_transform(range(1, 65),
         |           j -> q.emb[j] + 0.75 * c.cent[j]) AS qx
         |  FROM cent c JOIN e q ON q.vec_id = c.query_id),
         |prf AS (
         |  SELECT query_id, doc_id, cos_prf, rk_prf FROM (
         |    SELECT qx.query_id, n.vec_id AS doc_id,
         |           ${cosSql("qx.qx", "n.emb")} AS cos_prf,
         |           row_number() OVER (PARTITION BY qx.query_id
         |             ORDER BY ${cosSql("qx.qx", "n.emb")} DESC, n.vec_id)
         |             AS rk_prf
         |    FROM qx JOIN e n ON n.vec_id <> qx.query_id)
         |  WHERE rk_prf <= 5)
         |SELECT p.query_id, p.doc_id, CAST(p.rk_prf AS INTEGER) AS rk_prf,
         |       round(p.cos_prf, 6) AS cos_prf,
         |       CAST(coalesce(i.rk_init, -1) AS INTEGER) AS rk_init
         |FROM prf p LEFT JOIN init i
         |  ON p.query_id = i.query_id AND p.doc_id = i.doc_id
         |ORDER BY p.query_id, p.rk_prf""".stripMargin,
    "g_local_clustering" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (SELECT src, dst FROM edges UNION
         |        SELECT dst, src FROM edges),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |tri AS (
         |  SELECT x.src AS node, CAST(count(*) AS BIGINT) AS tri
         |  FROM und x JOIN und y ON x.src = y.src AND x.dst < y.dst
         |  JOIN und e2 ON e2.src = x.dst AND e2.dst = y.dst
         |  GROUP BY 1),
         |j AS (
         |  SELECT deg.node, deg.deg, coalesce(tri.tri, 0) AS tri
         |  FROM deg LEFT JOIN tri ON deg.node = tri.node)
         |SELECT node, deg, tri,
         |       round(2.0 * CAST(tri AS DOUBLE)
         |         / (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)), 6) AS lcc
         |FROM j
         |ORDER BY round(2.0 * CAST(tri AS DOUBLE)
         |  / (CAST(deg AS DOUBLE) * CAST(deg - 1 AS DOUBLE)), 6) DESC, node
         |LIMIT 100""".stripMargin,
    "w_seasonal_decompose" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |         year(o_orderdate) AS yr
        |  FROM orders GROUP BY 1),
        |tr AS (
        |  SELECT day, rev, yr,
        |         CASE WHEN count(*) OVER w = 7
        |           THEN CAST(SUM(rev) OVER w AS DOUBLE) / 7.0 END AS trend
        |  FROM daily
        |  WINDOW w AS (PARTITION BY yr ORDER BY day
        |               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |dt AS (SELECT *, CAST(rev AS DOUBLE) - trend AS detr FROM tr),
        |dm AS (
        |  SELECT dayofweek(day) + 1 AS dow, CAST(count(*) AS BIGINT) AS n,
        |         list_sum(list(detr ORDER BY day)) AS sd
        |  FROM dt WHERE detr IS NOT NULL GROUP BY 1),
        |dmm AS (SELECT dow, sd / CAST(n AS DOUBLE) AS m FROM dm),
        |gm AS (SELECT list_sum(list(m ORDER BY dow))
        |         / CAST(count(*) AS DOUBLE) AS gm FROM dmm)
        |SELECT dt.day, CAST(dt.rev AS DOUBLE) AS revenue,
        |       round(dt.trend, 6) AS trend,
        |       round(dmm.m - gm.gm, 6) AS seasonal,
        |       round(dt.detr - (dmm.m - gm.gm), 6) AS residual
        |FROM dt LEFT JOIN dmm ON dayofweek(dt.day) + 1 = dmm.dow
        |CROSS JOIN gm
        |ORDER BY dt.day""".stripMargin,
    "ev_path_mining" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
        |                   > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sid AS (
        |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND CURRENT ROW) AS sess_id
        |  FROM s),
        |sq AS (
        |  SELECT user_id, sess_id,
        |         list(event_type ORDER BY ts, event_id) AS seq
        |  FROM sid GROUP BY 1, 2),
        |paths AS (
        |  SELECT unnest(list_transform(range(1, len(seq) - 1),
        |           i -> seq[i] || ' ' || seq[i + 1] || ' ' || seq[i + 2]))
        |           AS path
        |  FROM sq WHERE len(seq) >= 3)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_paths
        |FROM paths GROUP BY 1
        |ORDER BY n_paths DESC, path LIMIT 20""".stripMargin)
}
