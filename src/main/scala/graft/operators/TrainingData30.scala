package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 25: forecast-backtest scoring (MASE, Hyndman &
  * Koehler 2006), breadth-first search layers over the k-NN
  * similarity graph (the "blast radius" audit for near-dup
  * clusters), and uniform Shapley conversion credit (the symmetric
  * special case of Shapley attribution, Dalessandro et al. 2012).
  * All Spark-first with full-replay DuckDB oracles; float policy:
  * integer-exact sums with one double division at the edge.
  */
object TrainingData30 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------
  // w_backtest_mase — seasonal-naive backtest scored by MASE
  // (Hyndman & Koehler 2006): per event_type, daily counts on a
  // dense date spine; the last 14 days are the test window, the
  // rest train. One-step seasonal-naive (m = 7) forecasts each day
  // as the count 7 days earlier; MASE = test MAE / in-sample naive
  // MAE, the scale-free score that lets event types of different
  // volumes share one dashboard. Scale shape: ONE groupBy builds
  // the daily counts (map-side combine), the spine is a broadcast
  // sequence() cross join, and the m-lag is a per-type window
  // (partitioned — bounded by spine length, never global). Daily
  // counts and |errors| are integers, so both MAE sums are exact
  // longs; MASE = (Σtest·n_train)/(Σtrain·n_test) is ONE double
  // division of exact integer products (round 6).
  // ---------------------------------------------------------------
  val wBacktestMase: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"))
    val daily = ev.groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("c"))
    val span = ev.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"), col("d1"))
    val dense = Tables.table(s, dir, "events")
      .select(col("event_type")).distinct()
      .crossJoin(broadcast(spine))
      .join(daily, Seq("event_type", "day"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val scored = dense
      .withColumn("lag7", lag(col("c"), 7).over(w))
      .filter(col("lag7").isNotNull)
      .withColumn("abs_err", abs(col("c") - col("lag7")))
      .withColumn("is_test", col("day") > date_sub(col("d1"), 14))
    scored.groupBy(col("event_type"))
      .agg(
        sum(when(!col("is_test"), 1L).otherwise(0L)).cast("long").as("n_train"),
        sum(when(col("is_test"), 1L).otherwise(0L)).cast("long").as("n_test"),
        sum(when(!col("is_test"), col("abs_err"))).cast("long").as("sum_train"),
        sum(when(col("is_test"), col("abs_err"))).cast("long").as("sum_test"))
      .select(col("event_type"), col("n_train"), col("n_test"),
        round(d(col("sum_train")) / d(col("n_train")), 6).as("mae_train"),
        round(d(col("sum_test")) / d(col("n_test")), 6).as("mae_test"),
        round(d(col("sum_test") * col("n_train")) /
          d(col("sum_train") * col("n_test")), 6).as("mase"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------
  // g_bfs_layers — BFS layer census from the smallest node of the
  // k-NN similarity graph: how far does a near-dup neighborhood
  // reach in ≤ 8 hops (the "blast radius" a curator checks before
  // dropping a cluster)? Spark runs the frontier expansion as a
  // driver-bounded loop (≤ 8 rounds, early-exit on an empty
  // frontier — the g_kcore convention): each round is one hash join
  // edges⋈frontier + distinct + one anti join against the visited
  // set, localCheckpointed to bound lineage. The oracle unrolls the
  // SAME 8 rounds as chained CTEs; early-exit ≡ full unroll because
  // an empty frontier stays empty. Scale shape: frontier work is
  // |edges ⋈ frontier|, never pairwise; the visited set only grows
  // by distinct node ids. Output is the per-layer census (count +
  // id range), so the result stays tiny at any graph size.
  // ---------------------------------------------------------------
  val gBfsLayers: Q = (s, dir) => {
    val maxHops = 8
    val edges = TrainingData5.knnUndirected(s, dir).localCheckpoint(eager = false)
    val seed = edges.agg(min(col("src")).as("node"))
    var frontier = seed.select(col("node")).localCheckpoint(eager = false)
    var visited = frontier
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame](
      frontier.select(lit(0).cast("long").as("layer"), col("node")))
    var hop = 1; var done = false
    while (!done && hop <= maxHops) {
      val next = edges
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(eager = false) // consumed by census, union, next round
      if (next.isEmpty) done = true
      else {
        layers += next.select(lit(hop).cast("long").as("layer"), col("node"))
        // lazy union, no checkpoint: every member frame is already
        // materialized (seed + per-hop checkpoints), so re-writing
        // the ever-growing visited set each hop was a pure extra job
        // per hop; the anti-join just scans ≤maxHops cached parts
        visited = visited.union(next)
        frontier = next
      }
      hop += 1
    }
    layers.reduce(_ unionAll _)
      .groupBy(col("layer"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("node")).as("min_node"), max(col("node")).as("max_node"))
      .orderBy(col("layer"))
  }

  // ---------------------------------------------------------------
  // ev_shapley_credit — uniform Shapley conversion credit: each
  // purchase splits its revenue equally across the DISTINCT
  // non-purchase channels seen earlier in the user's history (for a
  // symmetric value function the Shapley value IS the uniform
  // split; purchases with no prior touch credit 'none'). The
  // complement of ev_attribution's first/last-touch: position-free
  // credit. Scale shape: one window pass per user collects the
  // distinct prior channel set ((ts, event_id)-ordered, the
  // sessionize shape), the explode is ≤ |event_types| per purchase,
  // and the credit aggregate groups by (channel, k) FIRST — exact
  // long micro-unit sums per k — so the final per-channel fold adds
  // ≤ |event_types| doubles in k order (bit-stable at any corpus
  // size; no per-purchase float list ever materializes).
  // ---------------------------------------------------------------
  val evShapleyCredit: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when(col("event_type") =!= "purchase", col("event_type"))
    val p = Tables.table(s, dir, "events")
      .withColumn("chs", collect_set(touch).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        floor(dec(col("value")) * 1000000).cast("long").as("m"),
        when(size(col("chs")) === 0, array(lit("none")))
          .otherwise(col("chs")).as("chs"))
      .withColumn("k", size(col("chs")).cast("long"))
    val perK = p.select(col("m"), col("k"), explode(col("chs")).as("channel"))
      .groupBy(col("channel"), col("k"))
      .agg(count(lit(1)).as("n_conv"), sum(col("m")).cast("long").as("mk"))
      .withColumn("term", d(col("mk")) / d(col("k")) / lit(1000000.0))
    perK.groupBy(col("channel"))
      .agg(sum(col("n_conv")).cast("long").as("n_conversions"),
        round(expr("aggregate(sort_array(collect_list(struct(k, term)))," +
          " 0D, (a, x) -> a + x.term)"), 6).as("credit"))
      .orderBy(col("channel"))
  }

  val queries: Map[String, Q] = Map(
    "w_backtest_mase" -> wBacktestMase,
    "g_bfs_layers" -> gBfsLayers,
    "ev_shapley_credit" -> evShapleyCredit)

  /** The 8 unrolled BFS rounds of g_bfs_layers' oracle (an empty
    * frontier stays empty, so Spark's early-exit ≡ full unroll). */
  private def bfsRounds(n: Int): String =
    (1 to n).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT DISTINCT e.dst AS node FROM p0 e
         |  JOIN l${i - 1} f ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} x WHERE x.node = e.dst)),
         |v$i AS MATERIALIZED (
         |  SELECT node FROM v${i - 1} UNION SELECT node FROM l$i)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "w_backtest_mase" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day FROM events),
        |daily AS (
        |  SELECT event_type, day, CAST(count(*) AS BIGINT) AS c
        |  FROM ev GROUP BY 1, 2),
        |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM ev),
        |spine AS (
        |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day,
        |         d1
        |  FROM span),
        |dense AS (
        |  SELECT t.event_type, s.day, s.d1, coalesce(dd.c, 0) AS c
        |  FROM (SELECT DISTINCT event_type FROM ev) t
        |  CROSS JOIN spine s
        |  LEFT JOIN daily dd ON dd.event_type = t.event_type AND dd.day = s.day),
        |scored AS (
        |  SELECT event_type,
        |         abs(c - lag(c, 7) OVER (PARTITION BY event_type ORDER BY day))
        |           AS abs_err,
        |         day > d1 - 14 AS is_test
        |  FROM dense
        |  QUALIFY lag(c, 7) OVER (PARTITION BY event_type ORDER BY day)
        |    IS NOT NULL)
        |SELECT event_type,
        |       CAST(sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_train,
        |       CAST(sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_test,
        |       round(CAST(sum(CASE WHEN NOT is_test THEN abs_err END) AS DOUBLE)
        |         / sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END), 6) AS mae_train,
        |       round(CAST(sum(CASE WHEN is_test THEN abs_err END) AS DOUBLE)
        |         / sum(CASE WHEN is_test THEN 1 ELSE 0 END), 6) AS mae_test,
        |       round(CAST(sum(CASE WHEN is_test THEN abs_err END)
        |           * sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS DOUBLE)
        |         / (sum(CASE WHEN NOT is_test THEN abs_err END)
        |           * sum(CASE WHEN is_test THEN 1 ELSE 0 END)), 6) AS mase
        |FROM scored GROUP BY event_type ORDER BY event_type""".stripMargin,
    "g_bfs_layers" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |p0 AS MATERIALIZED (SELECT src, dst FROM edges UNION
         |       SELECT dst, src FROM edges),
         |l0 AS (SELECT min(src) AS node FROM p0),
         |v0 AS (SELECT node FROM l0),
         |${bfsRounds(8)},
         |census AS (
         |${(0 to 8).map(i =>
             s"  SELECT CAST($i AS BIGINT) AS layer, node FROM l$i")
             .mkString("\n  UNION ALL\n")})
         |SELECT layer, CAST(count(*) AS BIGINT) AS n_nodes,
         |       min(node) AS min_node, max(node) AS max_node
         |FROM census GROUP BY layer ORDER BY layer""".stripMargin,
    "ev_shapley_credit" ->
      """WITH p AS (
        |  SELECT event_id,
        |         CAST(floor(CAST(value AS DECIMAL(18,2)) * 1000000) AS BIGINT)
        |           AS m,
        |         user_id, ts
        |  FROM events WHERE event_type = 'purchase'),
        |pre AS (
        |  SELECT p.event_id, p.m, e.event_type AS channel
        |  FROM p JOIN events e
        |    ON e.user_id = p.user_id
        |   AND (e.ts < p.ts OR (e.ts = p.ts AND e.event_id < p.event_id))
        |  WHERE e.event_type <> 'purchase'
        |  GROUP BY 1, 2, 3),
        |chs AS (
        |  SELECT p.event_id, p.m,
        |         coalesce(pr.channel, 'none') AS channel
        |  FROM p LEFT JOIN pre pr ON pr.event_id = p.event_id),
        |withk AS (
        |  SELECT event_id, m, channel,
        |         CAST(count(*) OVER (PARTITION BY event_id) AS BIGINT) AS k
        |  FROM chs),
        |perk AS (
        |  SELECT channel, k, CAST(count(*) AS BIGINT) AS n_conv,
        |         CAST(sum(m) AS BIGINT) AS mk
        |  FROM withk GROUP BY 1, 2)
        |SELECT channel,
        |       CAST(sum(n_conv) AS BIGINT) AS n_conversions,
        |       round(list_sum(list(CAST(mk AS DOUBLE) / k / 1000000.0
        |         ORDER BY k)), 6) AS credit
        |FROM perk GROUP BY channel ORDER BY channel""".stripMargin)
}
