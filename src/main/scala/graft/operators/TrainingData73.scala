package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-11 batch 73: density-based outlier scoring on the k-NN
  * graph and the two-sample survival comparison.
  *
  *  - sim_lof_outliers — Local Outlier Factor (Breunig et al. 2000)
  *    over the SAME cell-blocked k-NN graph as sim_knn_graph /
  *    g_adamic_adar: the embedding-space "is this document in a
  *    sparse region relative to its neighbors" score a curation
  *    pass uses to surface mislabeled/junk vectors before training.
  *  - ev_logrank — log-rank test (Mantel 1966) comparing the
  *    signup→purchase Kaplan–Meier survival of weekend-signup vs
  *    weekday-signup cohorts, on the exact risk-set ledger the
  *    ev_survival_km machinery defines.
  */
object TrainingData73 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // sim_lof_outliers — LOF with k = the graph's out-degree (3):
  // d(p,o) = 1 − cos on unit vectors; k-distance(p) = max d over
  // N(p); reach-dist(p,o) = max(d(p,o), kdist(o)); lrd(p) =
  // |N(p)| / Σ reach-dist; LOF(p) = (Σ lrd(o) / |N(p)|) / lrd(p).
  // Every stage is an edge-keyed join or a ≤k-element fold in dst
  // order (sorted-fold float policy) — the pair blow-up was already
  // paid (and trimmed map-side) by the shared TopKAgg edge build,
  // so LOF itself is linear in edges. Top-20 on the 6-dp-rounded
  // score with the vec_id tiebreak (rounded-rank policy). Scale
  // shape: edges = 3n rows; three joins keyed on them; no new pair
  // work at any SF.
  // ---------------------------------------------------------------
  /** The shared k-NN construction, re-exported for the spec's
    * driver replay (the builder itself is operators-private). */
  private[graft] def lofInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = TrainingData2.knnEdgesWithAssigned(s, dir)

  val simLofOutliers: Q = (s, dir) => {
    val (edges, assigned) = TrainingData2.knnEdgesWithAssigned(s, dir)
    val embs = assigned.select(col("vec_id"), col("e"))
    val de = edges
      .join(embs.select(col("vec_id").as("src"), col("e").as("es")), "src")
      .join(embs.select(col("vec_id").as("dst"), col("e").as("ed")), "dst")
      .select(col("src"), col("dst"),
        (lit(1.0) - Similarity.dot(col("es"), col("ed"))).as("dist"))
      .localCheckpoint(eager = false) // kdist + reach + the lof neighbor join
    val kdist = de.groupBy(col("src").as("node"))
      .agg(max(col("dist")).as("kdist"))
    val lrd = de
      .join(kdist.select(col("node").as("dst"), col("kdist").as("kd_o")),
        "dst")
      .withColumn("rd", greatest(col("dist"), col("kd_o")))
      .groupBy(col("src"))
      .agg(count(lit(1)).cast("long").as("nn"),
        expr("aggregate(sort_array(collect_list(struct(dst, rd))), 0D," +
          " (a, x) -> a + x.rd)").as("srd"))
      .withColumn("lrd", d(col("nn")) / col("srd"))
      .localCheckpoint(eager = false) // the p side and the o side of the LOF join
    val lof = de.select(col("src"), col("dst"))
      .join(lrd.select(col("src").as("dst"), col("lrd").as("lrd_o")), "dst")
      .groupBy(col("src"))
      .agg(expr("aggregate(sort_array(collect_list(struct(dst, lrd_o)))," +
        " 0D, (a, x) -> a + x.lrd_o)").as("slro"))
      .join(lrd.select(col("src"), col("nn"), col("srd"), col("lrd")), "src")
      .join(kdist.withColumnRenamed("node", "src"), "src")
    lof.select(col("src").as("vec_id"), col("nn").as("k_used"),
      round(col("kdist"), 6).as("kdist"),
      round(col("lrd"), 6).as("lrd"),
      round(col("slro") / d(col("nn")) / col("lrd"), 6).as("lof"))
      .orderBy(desc("lof"), col("vec_id"))
      .limit(20)
  }

  // ---------------------------------------------------------------
  // ev_logrank — H0: weekend-signup and weekday-signup users share
  // one signup→purchase survival curve. Durations and censoring are
  // EXACTLY ev_survival_km's ledger (first purchase at/after first
  // signup, censored at the stream horizon, integer-µs day floors);
  // the group label is the a_cohens_h weekend convention. At each
  // distinct duration with any event: O₁ = d₁ₜ, E₁ = dₜ·n₁ₜ/nₜ,
  // V = dₜ(n₁ₜ/nₜ)(1−n₁ₜ/nₜ)(nₜ−dₜ)/(nₜ−1); χ² = (Σ(O−E))²/ΣV,
  // df 1. Risk sets come from per-group EXCLUSIVE cumsums over the
  // ≤horizon-day aggregated time table (calendar-bounded window —
  // the gold-frame class); the O−E and V folds run t-ascending.
  // ---------------------------------------------------------------
  val evLogrank: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events").localCheckpoint(eager = false)
    val hz = ev.agg(max(col("ts")).as("hzts"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s0"))
      .localCheckpoint(eager = false) // purchase filter + durations
    val p0 = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("s0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p0"))
    val durs = su.join(p0, Seq("user_id"), "left")
      .crossJoin(broadcast(hz))
      .select(col("user_id"),
        when(dayofweek(col("s0")).isin(1, 7), "weekend")
          .otherwise("weekday").as("g"),
        when(col("p0").isNotNull, 1L).otherwise(0L).as("ev"),
        expr("(unix_micros(coalesce(p0, hzts)) - unix_micros(s0))" +
          " div 86400000000").as("t_days"))
      .localCheckpoint(eager = false) // totals + the time table
    val tots = durs.groupBy(col("g")).agg(count(lit(1)).cast("long").as("tot"))
    val byTG = durs.groupBy(col("t_days"), col("g"))
      .agg(sum(col("ev")).cast("long").as("dd"),
        count(lit(1)).cast("long").as("cc"))
    // dense ≤horizon-days × 2 grid, exclusive per-group cumsum
    val dense = durs.select(col("t_days")).distinct()
      .crossJoin(broadcast(tots))
      .join(byTG, Seq("t_days", "g"), "left")
      .select(col("t_days"), col("g"), col("tot"),
        coalesce(col("dd"), lit(0L)).as("dd"),
        coalesce(col("cc"), lit(0L)).as("cc"))
      .withColumn("gone", coalesce(sum(col("cc")).over(
        Window.partitionBy(col("g")).orderBy(col("t_days"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("atrisk", col("tot") - col("gone"))
    val wide = dense.groupBy(col("t_days"))
      .agg(sum(when(col("g") === "weekend", col("dd")).otherwise(0L))
        .cast("long").as("d1"),
        sum(col("dd")).cast("long").as("dt"),
        sum(when(col("g") === "weekend", col("atrisk")).otherwise(0L))
          .cast("long").as("n1"),
        sum(col("atrisk")).cast("long").as("nt"))
      .filter(col("dt") > 0 && col("nt") > 1)
      .withColumn("oe", d(col("d1")) -
        d(col("dt")) * d(col("n1")) / d(col("nt")))
      .withColumn("vv", d(col("dt")) * (d(col("n1")) / d(col("nt"))) *
        (lit(1.0) - d(col("n1")) / d(col("nt"))) *
        (d(col("nt") - col("dt")) / d(col("nt") - 1L)))
    val folded = wide.agg(
      count(lit(1)).cast("long").as("n_event_times"),
      sum(col("d1")).cast("long").as("o1"),
      expr("aggregate(sort_array(collect_list(struct(t_days, oe))), 0D," +
        " (a, x) -> a + x.oe)").as("soe"),
      expr("aggregate(sort_array(collect_list(struct(t_days, vv))), 0D," +
        " (a, x) -> a + x.vv)").as("sv"))
    folded
      .crossJoin(broadcast(tots.groupBy()
        .agg(sum(when(col("g") === "weekend", col("tot")).otherwise(0L))
          .cast("long").as("n_weekend"),
          sum(when(col("g") === "weekday", col("tot")).otherwise(0L))
            .cast("long").as("n_weekday"))))
      .select(col("n_weekend"), col("n_weekday"), col("n_event_times"),
        col("o1").as("observed_weekend"),
        round(d(col("o1")) - col("soe"), 6).as("expected_weekend"),
        // ΣV = 0 ⟺ one cohort never at risk at any event time (tiny
        // SFs): the test is undefined — NULL, not a division error
        when(col("sv") > 0.0,
          round(col("soe") * col("soe") / col("sv"), 6)).as("chi2"),
        when(col("sv") > 0.0,
          col("soe") * col("soe") / col("sv") > 3.841).as("significant"))
  }

  val queries: Map[String, Q] = Map(
    "sim_lof_outliers" -> simLofOutliers,
    "ev_logrank" -> evLogrank)

  /** DuckDB dot product — same one-liner as TrainingData2.dotSql. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  val oracles: Map[String, String] = Map(
    "sim_lof_outliers" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |de AS (
         |  SELECT ed.src, ed.dst,
         |         1.0 - ${dotSql("es.emb", "et.emb")} AS dist
         |  FROM edges ed JOIN e es ON ed.src = es.vec_id
         |                JOIN e et ON ed.dst = et.vec_id),
         |kd AS (SELECT src AS node, max(dist) AS kdist FROM de GROUP BY 1),
         |lrd AS (
         |  SELECT de.src, CAST(count(*) AS BIGINT) AS nn,
         |         list_sum(list(greatest(de.dist, kd.kdist)
         |           ORDER BY de.dst)) AS srd
         |  FROM de JOIN kd ON de.dst = kd.node
         |  GROUP BY 1),
         |lrd2 AS (
         |  SELECT src, nn, srd, CAST(nn AS DOUBLE) / srd AS lrd FROM lrd),
         |lof AS (
         |  SELECT de.src,
         |         list_sum(list(lo.lrd ORDER BY de.dst)) AS slro
         |  FROM de JOIN lrd2 lo ON de.dst = lo.src
         |  GROUP BY 1)
         |SELECT f.src AS vec_id, p.nn AS k_used,
         |       round(kd.kdist, 6) AS kdist,
         |       round(p.lrd, 6) AS lrd,
         |       round(f.slro / CAST(p.nn AS DOUBLE) / p.lrd, 6) AS lof
         |FROM lof f JOIN lrd2 p ON f.src = p.src
         |           JOIN kd ON f.src = kd.node
         |ORDER BY round(f.slro / CAST(p.nn AS DOUBLE) / p.lrd, 6) DESC,
         |         f.src
         |LIMIT 20""".stripMargin,
    "ev_logrank" ->
      """WITH hz AS (SELECT max(ts) AS hzts FROM events),
        |su AS (
        |  SELECT user_id, min(ts) AS s0 FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id, min(e.ts) AS p0
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s0
        |  GROUP BY 1),
        |durs AS (
        |  SELECT su.user_id,
        |         CASE WHEN dayofweek(su.s0) + 1 IN (1, 7)
        |              THEN 'weekend' ELSE 'weekday' END AS g,
        |         CASE WHEN p0.p0 IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         (epoch_us(coalesce(p0.p0, hz.hzts)) - epoch_us(su.s0))
        |           // 86400000000 AS t_days
        |  FROM su LEFT JOIN p0 ON su.user_id = p0.user_id
        |  CROSS JOIN hz),
        |tots AS (SELECT g, CAST(count(*) AS BIGINT) AS tot
        |         FROM durs GROUP BY 1),
        |bytg AS (
        |  SELECT t_days, g, CAST(sum(ev) AS BIGINT) AS dd,
        |         CAST(count(*) AS BIGINT) AS cc
        |  FROM durs GROUP BY 1, 2),
        |dense AS (
        |  SELECT t.t_days, o.g, o.tot,
        |         coalesce(b.dd, 0) AS dd, coalesce(b.cc, 0) AS cc
        |  FROM (SELECT DISTINCT t_days FROM durs) t
        |  CROSS JOIN tots o
        |  LEFT JOIN bytg b ON b.t_days = t.t_days AND b.g = o.g),
        |risk AS (
        |  SELECT *, tot - coalesce(CAST(sum(cc) OVER (PARTITION BY g
        |           ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
        |           AND 1 PRECEDING) AS BIGINT), 0) AS atrisk
        |  FROM dense),
        |wide AS (
        |  SELECT t_days,
        |         CAST(sum(CASE WHEN g = 'weekend' THEN dd ELSE 0 END)
        |           AS BIGINT) AS d1,
        |         CAST(sum(dd) AS BIGINT) AS dt,
        |         CAST(sum(CASE WHEN g = 'weekend' THEN atrisk ELSE 0 END)
        |           AS BIGINT) AS n1,
        |         CAST(sum(atrisk) AS BIGINT) AS nt
        |  FROM risk GROUP BY 1),
        |terms AS (
        |  SELECT t_days, d1, dt, n1, nt,
        |         CAST(d1 AS DOUBLE) - CAST(dt AS DOUBLE)
        |           * CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE) AS oe,
        |         CAST(dt AS DOUBLE) * (CAST(n1 AS DOUBLE)
        |           / CAST(nt AS DOUBLE))
        |           * (1.0 - CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
        |           * (CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE))
        |           AS vv
        |  FROM wide WHERE dt > 0 AND nt > 1),
        |folded AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_event_times,
        |         CAST(sum(d1) AS BIGINT) AS o1,
        |         list_sum(list(oe ORDER BY t_days)) AS soe,
        |         list_sum(list(vv ORDER BY t_days)) AS sv
        |  FROM terms),
        |gt AS (
        |  SELECT CAST(sum(CASE WHEN g = 'weekend' THEN tot ELSE 0 END)
        |           AS BIGINT) AS n_weekend,
        |         CAST(sum(CASE WHEN g = 'weekday' THEN tot ELSE 0 END)
        |           AS BIGINT) AS n_weekday
        |  FROM tots)
        |SELECT gt.n_weekend, gt.n_weekday, f.n_event_times,
        |       f.o1 AS observed_weekend,
        |       round(CAST(f.o1 AS DOUBLE) - f.soe, 6) AS expected_weekend,
        |       CASE WHEN f.sv > 0 THEN round(f.soe * f.soe / f.sv, 6)
        |            END AS chi2,
        |       CASE WHEN f.sv > 0 THEN f.soe * f.soe / f.sv > 3.841
        |            END AS significant
        |FROM folded f CROSS JOIN gt""".stripMargin)
}
