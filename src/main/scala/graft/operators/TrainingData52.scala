package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 47: the participation ratio of the embedding
  * second-moment spectrum (PR = (Σλ)²/Σλ² = tr(M)²/‖M‖²_F — how
  * many dimensions the variance actually occupies, computed WITHOUT
  * an eigensolve from the exact quantized Gram), per-user circadian
  * activity fingerprints (hour-of-day entropy — the behavioral
  * complement of ev_bot_flag's rate screen), and a cross-table
  * freshness audit (per-table staleness vs the newest timestamp in
  * the warehouse — the data-quality check upstream of every daily
  * job). All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData52 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // e_participation_ratio — PR of the uncentered second-moment
  // matrix M = (1/n)ΣxxT: PR = tr(M)²/‖M‖²_F ∈ [1, dim]. Both
  // invariants come straight from the Gram — no eigensolve — and
  // the e_pca_power 2⁻²⁰ quantization makes every Gram entry an
  // EXACT integer, so trace² and the Frobenius sum are exact until
  // one final division (the scale factors cancel). PR ≈ dim means
  // isotropic spread; PR ≪ dim means a few directions carry
  // everything and aggressive compression (PQ/int8/truncation) is
  // safe. Scale shape: the Gram is one map-combining aggregate of
  // dim² integer products (corpus-linear); the PR reduction reads
  // dim² rows.
  // ---------------------------------------------------------------
  val eParticipationRatio: Q = (s, dir) => {
    val dim = 64
    val q = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)" +
          " AS BIGINT))").as("qv"))
      .localCheckpoint(eager = false) // Gram pass AND the count
    val ex = q.select(col("qv"), posexplode(col("qv")).as(Seq("i0", "qi")))
    val aggExprs = (0 until dim).map(j =>
      sum(col("qi") * element_at(col("qv"), j + 1)).cast("long").as(s"s$j"))
    val gram = ex.groupBy(col("i0")).agg(aggExprs.head, aggExprs.tail: _*)
      .select(col("i0"), posexplode(array((0 until dim).map(j =>
        col(s"s$j")): _*)).as(Seq("j0", "g")))
    val nVec = q.agg(count(lit(1)).cast("long").as("n_vectors"))
    gram.agg(
        sum(when(col("i0") === col("j0"), col("g")).otherwise(0L))
          .cast("long").as("trace"),
        // cast BEFORE the square: g itself reaches ~2^49, so g·g
        // overflows long; decimal(38,0) holds the ~2^98 products
        sum(col("g").cast("decimal(38,0)") * col("g")).as("frob"))
      .crossJoin(broadcast(nVec))
      .select(col("n_vectors"), lit(dim.toLong).as("dim"),
        round(d(col("trace")) * d(col("trace")) / d(col("frob")), 6)
          .as("participation_ratio"),
        round(d(col("trace")) * d(col("trace")) / d(col("frob")) /
          lit(dim.toDouble), 6).as("pr_share"))
  }

  // ---------------------------------------------------------------
  // ev_circadian — per-user hour-of-day fingerprint: active-hour
  // count, Shannon entropy of the 24-bin profile, and the peak hour
  // (smallest hour on count ties). Humans concentrate in a daily
  // band (low entropy, a stable peak); schedulers spread flat —
  // the behavioral axis ev_bot_flag's CV screen doesn't see. Scale
  // shape: one (user, hour) aggregate (map-combinable), a ≤24-term
  // sorted entropy fold and a max(struct) argmax per user — no
  // windows, no joins.
  // ---------------------------------------------------------------
  val evCircadian: Q = (s, dir) => {
    val byHour = Tables.table(s, dir, "events")
      .select(col("user_id"), hour(col("ts")).cast("long").as("hr"))
      .groupBy(col("user_id"), col("hr"))
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = byHour.groupBy(col("user_id"))
      .agg(sum(col("c")).cast("long").as("n"))
    byHour.join(tot, Seq("user_id"))
      .select(col("user_id"), col("n"), col("hr"), col("c"),
        (-(d(col("c")) / d(col("n"))) * log(d(col("c")) / d(col("n"))))
          .as("term"))
      .groupBy(col("user_id"), col("n"))
      .agg(count(lit(1)).cast("long").as("n_active_hours"),
        expr("aggregate(sort_array(collect_list(struct(hr, term))), 0D," +
          " (a, x) -> a + x.term)").as("h"),
        max(struct(col("c").as("c"), (-col("hr")).as("neg"))).as("top"))
      .select(col("user_id"), col("n").as("n_events"), col("n_active_hours"),
        round(col("h"), 6).as("hour_entropy"),
        (-col("top.neg")).cast("long").as("peak_hour"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------
  // q_dq_freshness — cross-table staleness audit: each table's
  // newest temporal column against the warehouse-wide newest
  // timestamp, in days — the first check a scheduled pipeline runs
  // (a stale upstream silently freezes every derived metric). Scale
  // shape: one max-aggregate scan per table (min/max are
  // footer-level statistics in parquet — effectively free), a
  // 3-row result.
  // ---------------------------------------------------------------
  val qDqFreshness: Q = (s, dir) => {
    def leg(table: String, tsCol: Column): DataFrame =
      Tables.table(s, dir, table)
        .agg(count(lit(1)).cast("long").as("n_rows"),
          max(to_date(tsCol)).as("max_date"))
        .select(lit(table).as("table_name"), col("n_rows"), col("max_date"))
    val legs = leg("orders", col("o_orderdate"))
      .unionAll(leg("lineitem", col("l_shipdate")))
      .unionAll(leg("events", col("ts")))
      .localCheckpoint(eager = false) // the global max AND the output rows
    val ref = legs.agg(max(col("max_date")).as("ref_date"))
    legs.crossJoin(broadcast(ref))
      .select(col("table_name"), col("n_rows"), col("max_date"),
        datediff(col("ref_date"), col("max_date")).cast("long")
          .as("staleness_days"))
      .orderBy(col("table_name"))
  }

  val queries: Map[String, Q] = Map(
    "e_participation_ratio" -> eParticipationRatio,
    "ev_circadian" -> evCircadian,
    "q_dq_freshness" -> qDqFreshness)

  val oracles: Map[String, String] = Map(
    "e_participation_ratio" ->
      """WITH q AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
        |           * 1048576.0) AS BIGINT)) AS qv
        |  FROM embeddings),
        |gram AS (
        |  SELECT i, j, CAST(sum(qv[i] * qv[j]) AS BIGINT) AS g
        |  FROM q
        |  CROSS JOIN unnest(range(1, 65)) AS r1(i)
        |  CROSS JOIN unnest(range(1, 65)) AS r2(j)
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT CAST(sum(CASE WHEN i = j THEN g ELSE 0 END) AS BIGINT)
        |           AS trace,
        |         sum(CAST(g AS DECIMAL(38,0)) * g) AS frob
        |  FROM gram),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_vectors FROM q)
        |SELECT n_vectors, CAST(64 AS BIGINT) AS dim,
        |       round(trace::DOUBLE * trace::DOUBLE / frob::DOUBLE, 6)
        |         AS participation_ratio,
        |       round(trace::DOUBLE * trace::DOUBLE / frob::DOUBLE / 64.0, 6)
        |         AS pr_share
        |FROM m CROSS JOIN n""".stripMargin,
    "ev_circadian" ->
      """WITH byhour AS (
        |  SELECT user_id, CAST(hour(ts) AS BIGINT) AS hr,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n
        |  FROM byhour GROUP BY 1)
        |SELECT b.user_id, t.n AS n_events,
        |       CAST(count(*) AS BIGINT) AS n_active_hours,
        |       round(list_sum(list(
        |         -(c::DOUBLE / t.n::DOUBLE) * ln(c::DOUBLE / t.n::DOUBLE)
        |         ORDER BY hr)), 6) AS hour_entropy,
        |       CAST(-max({'c': c, 'neg': -hr}).neg AS BIGINT) AS peak_hour
        |FROM byhour b JOIN tot t USING (user_id)
        |GROUP BY b.user_id, t.n
        |ORDER BY b.user_id""".stripMargin,
    "q_dq_freshness" ->
      """WITH legs AS (
        |  SELECT 'orders' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
        |         CAST(max(o_orderdate) AS DATE) AS max_date
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem', CAST(count(*) AS BIGINT),
        |         CAST(max(l_shipdate) AS DATE)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'events', CAST(count(*) AS BIGINT),
        |         CAST(max(ts) AS DATE)
        |  FROM events),
        |ref AS (SELECT max(max_date) AS ref_date FROM legs)
        |SELECT table_name, n_rows, max_date,
        |       CAST(datediff('day', max_date, ref_date) AS BIGINT)
        |         AS staleness_days
        |FROM legs CROSS JOIN ref
        |ORDER BY table_name""".stripMargin)
}
