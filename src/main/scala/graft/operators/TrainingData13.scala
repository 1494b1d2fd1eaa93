package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 10: sequence labeling and coverage estimation —
  * a two-state min-cost Viterbi burst detector over the daily order
  * series (the Kleinberg burst-detection shape with integer L1
  * costs, so the whole DP is exact on both engines), and a
  * capture–recapture (Lincoln–Petersen/Chapman) corpus-size
  * estimate from two deterministic hash crawls — the "how big is
  * the deduplicated web corpus really" audit.
  */
object TrainingData13 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_viterbi_burst — per-year two-state burst labeling of daily
  // order counts (Kleinberg 2002's automaton with L1 emission
  // costs): state 0 emits around the year's median daily count λ,
  // state 1 around 2λ; switching costs λ. The optimal labeling is
  // the min-cost path through the 2×T trellis — a TRUE Viterbi with
  // backtracking, run as ONE higher-order fold per year that
  // carries both frontier costs AND both argmin paths
  // (c0, c1, s0[], s1[]); every quantity is an INTEGER (costs live
  // on the doubled grid 2·x vs med₂ = twice the median, so the
  // even-count median average stays integral) — the DP is
  // bit-exact by construction, no float policy needed. Ties prefer
  // staying in the current state, and the final frontier tie
  // prefers the base state. The DuckDB oracle replays the identical
  // recurrence as a RECURSIVE CTE stepping the same per-year
  // arrays (the w_holt_winters technique — list_reduce's
  // struct-accumulator mutation quirk rules it out).
  // Scale shape: the corpus reduces through the daily count
  // aggregate first; folds run over CALENDAR-bounded per-year
  // arrays (≤366 steps, ≤366-int paths) in parallel across years;
  // the explode back to rows is map-side.
  // ---------------------------------------------------------------
  val wViterbiBurst: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))
    val years = daily.groupBy(year(col("day")).as("yr"))
      .agg(sort_array(collect_list(struct(col("day"), col("x")))).as("arr"),
        count(lit(1)).as("n"))
      .withColumn("xs", expr("transform(arr, e -> e.x)"))
      .withColumn("med2", expr(
        """array_sort(xs)[CAST((n + 1) div 2 AS INT) - 1] +
          |array_sort(xs)[CAST((n + 2) div 2 AS INT) - 1]""".stripMargin))
    val vit = years.withColumn("fin", expr(
      """aggregate(
        |  xs,
        |  named_struct(
        |    'c0', CAST(0 AS BIGINT), 'c1', CAST(med2 AS BIGINT),
        |    's0', CAST(array() AS ARRAY<INT>),
        |    's1', CAST(array() AS ARRAY<INT>)),
        |  (a, x) -> named_struct(
        |    'c0', least(a.c0, a.c1 + med2) + abs(2 * x - med2),
        |    'c1', least(a.c1, a.c0 + med2) + abs(2 * x - 2 * med2),
        |    's0', array_append(
        |      CASE WHEN a.c0 <= a.c1 + med2 THEN a.s0 ELSE a.s1 END, 0),
        |    's1', array_append(
        |      CASE WHEN a.c1 <= a.c0 + med2 THEN a.s1 ELSE a.s0 END, 1)),
        |  a -> named_struct(
        |    'cost', CASE WHEN a.c0 <= a.c1 THEN a.c0 ELSE a.c1 END,
        |    'seq',  CASE WHEN a.c0 <= a.c1 THEN a.s0 ELSE a.s1 END))
        |""".stripMargin))
    vit
      .select(col("med2"), col("fin.cost").as("path_cost"),
        posexplode(expr("arrays_zip(arr, fin.seq)")).as(Seq("i", "z")))
      .select(col("z.arr.day").as("day"), col("z.arr.x").as("n_orders"),
        col("z.seq").cast("int").as("burst"),
        round(d(col("med2")) / lit(2.0), 6).as("base_rate"),
        col("path_cost"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // a_capture_recapture — Lincoln–Petersen corpus-size estimation
  // with the Chapman correction: two INDEPENDENT deterministic
  // "crawls" sample each doc with p = 1/2 by disjoint hex digits of
  // its md5 fingerprint (digit 1 < '8' / digit 2 < '8' — the
  // repo's portable-hash convention, so the oracle replays the
  // exact same membership), and the dedup'd-universe estimate is
  // N̂ = (n₁+1)(n₂+1)/(m+1) − 1 from the capture counts alone. The
  // audit reports the estimate against the true doc count (which a
  // real crawl pipeline would NOT know — that is the point of the
  // check). One scan, one one-row aggregate; counts exact, the
  // estimate is one fixed division.
  // ---------------------------------------------------------------
  val aCaptureRecapture: Q = (s, dir) => {
    val h = md5(col("text"))
    val caps = Tables.table(s, dir, "documents").select(
      when(substring(h, 1, 1) < "8", 1L).otherwise(0L).as("in_a"),
      when(substring(h, 2, 1) < "8", 1L).otherwise(0L).as("in_b"))
    caps
      .agg(count(lit(1)).as("n_total"), sum(col("in_a")).as("n1"),
        sum(col("in_b")).as("n2"),
        sum(col("in_a") * col("in_b")).as("m"))
      .select(col("n_total"), col("n1").cast("long").as("n1"),
        col("n2").cast("long").as("n2"), col("m").cast("long").as("m"),
        round((d(col("n1")) + lit(1.0)) * (d(col("n2")) + lit(1.0)) /
          (d(col("m")) + lit(1.0)) - lit(1.0), 6).as("n_hat"),
        round(((d(col("n1")) + lit(1.0)) * (d(col("n2")) + lit(1.0)) /
          (d(col("m")) + lit(1.0)) - lit(1.0) - d(col("n_total"))) /
          d(col("n_total")), 6).as("rel_err"))
  }

  val queries: Map[String, Q] = Map(
    "w_viterbi_burst" -> wViterbiBurst,
    "a_capture_recapture" -> aCaptureRecapture)

  val oracles: Map[String, String] = Map(
    "w_viterbi_burst" ->
      """WITH RECURSIVE daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |ys AS (
        |  SELECT year(day) AS yr,
        |         list(x ORDER BY day) AS xs,
        |         list(day ORDER BY day) AS days,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM daily GROUP BY 1),
        |m AS (
        |  SELECT yr, xs, days, n,
        |         CAST(list_sort(xs)[CAST((n + 1) // 2 AS INT)]
        |            + list_sort(xs)[CAST((n + 2) // 2 AS INT)] AS BIGINT)
        |           AS med2
        |  FROM ys),
        |step AS (
        |  SELECT yr, 0 AS t, CAST(0 AS BIGINT) AS c0,
        |         CAST(med2 AS BIGINT) AS c1,
        |         CAST([] AS INT[]) AS s0, CAST([] AS INT[]) AS s1,
        |         xs, days, n, med2
        |  FROM m
        |  UNION ALL
        |  SELECT yr, t + 1,
        |         least(c0, c1 + med2) + abs(2 * xs[t + 1] - med2),
        |         least(c1, c0 + med2) + abs(2 * xs[t + 1] - 2 * med2),
        |         list_append(CASE WHEN c0 <= c1 + med2 THEN s0 ELSE s1 END,
        |           0),
        |         list_append(CASE WHEN c1 <= c0 + med2 THEN s1 ELSE s0 END,
        |           1),
        |         xs, days, n, med2
        |  FROM step WHERE t < n),
        |fin AS (
        |  SELECT yr, days, xs, med2,
        |         CASE WHEN c0 <= c1 THEN c0 ELSE c1 END AS path_cost,
        |         CASE WHEN c0 <= c1 THEN s0 ELSE s1 END AS seq
        |  FROM step WHERE t = n),
        |rows_ AS (
        |  SELECT unnest(days) AS day, unnest(xs) AS n_orders,
        |         unnest(seq) AS burst, med2, path_cost
        |  FROM fin)
        |SELECT day, n_orders, CAST(burst AS INTEGER) AS burst,
        |       round(CAST(med2 AS DOUBLE) / 2.0, 6) AS base_rate,
        |       path_cost
        |FROM rows_ ORDER BY day""".stripMargin,
    "a_capture_recapture" ->
      """WITH caps AS (
        |  SELECT CASE WHEN substring(md5(text), 1, 1) < '8'
        |              THEN 1 ELSE 0 END AS in_a,
        |         CASE WHEN substring(md5(text), 2, 1) < '8'
        |              THEN 1 ELSE 0 END AS in_b
        |  FROM documents),
        |agg AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(in_a) AS BIGINT) AS n1,
        |         CAST(sum(in_b) AS BIGINT) AS n2,
        |         CAST(sum(in_a * in_b) AS BIGINT) AS m
        |  FROM caps)
        |SELECT n_total, n1, n2, m,
        |       round((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
        |         / (CAST(m AS DOUBLE) + 1.0) - 1.0, 6) AS n_hat,
        |       round(((CAST(n1 AS DOUBLE) + 1.0) * (CAST(n2 AS DOUBLE) + 1.0)
        |         / (CAST(m AS DOUBLE) + 1.0) - 1.0
        |         - CAST(n_total AS DOUBLE)) / CAST(n_total AS DOUBLE), 6)
        |         AS rel_err
        |FROM agg""".stripMargin)
}
