package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 17: gap repair and denoising-objective prep — a
  * calendar-spine linear-interpolation fill for the daily revenue
  * series (the time-series repair step next to w_fill_forward's
  * step-function fill), and the T5 span-corruption plan (Raffel et
  * al. 2020) computed as deterministic per-document span statistics.
  * Both Spark-first with full-replay DuckDB oracles.
  */
object TrainingData22 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_interpolate_linear — calendar-spine gap fill with exact linear
  // interpolation: the daily-revenue series is re-indexed on the
  // full min..max day spine, and each missing day gets the linear
  // blend of its nearest known neighbors,
  // (prev·(nd−d) + next·(d−pd)) / (nd−pd); the leading/trailing
  // runs extend the nearest endpoint flat. Exactness: day totals
  // are integer cents; the blend numerator stays integer and leaves
  // integer space only through the positive micro-unit integral
  // division (the a_var_merge rule — and keeping the numerator
  // non-negative sidesteps the Spark-truncates vs DuckDB-floors
  // disagreement on negative integral division). Scale shape: the
  // corpus reduces through the day aggregate FIRST (map-side
  // combining); the spine join and both neighbor-carry windows run
  // on the calendar-bounded daily frame (≤2.6k rows at any fact
  // scale — the documented bounded-window class), never on facts.
  // ---------------------------------------------------------------
  val wInterpolateLinear: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long")
        .as("rev"))
    val spine = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    val known = when(col("rev").isNotNull,
      struct(col("day").as("d"), col("rev").as("r")))
    val wPrev = Grain.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Grain.bounded(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("day"), "left")
      .withColumn("p", last(known, ignoreNulls = true).over(wPrev))
      .withColumn("nx", first(known, ignoreNulls = true).over(wNext))
      .select(col("day"), col("rev").as("rev_cents"),
        (when(col("rev").isNotNull, col("rev") * 10000L)
          .when(col("p").isNotNull && col("nx").isNotNull, expr(
            """CAST(((p.r * datediff(nx.d, day)
              |  + nx.r * datediff(day, p.d)) * 10000)
              |  div datediff(nx.d, p.d) AS BIGINT)""".stripMargin))
          .when(col("p").isNotNull, col("p.r") * 10000L)
          .otherwise(col("nx.r") * 10000L) / lit(1000000.0))
          .as("filled"),
        col("rev").isNull.as("is_interpolated"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // t_span_corruption — the T5 denoising-objective plan: each token
  // is independently marked for corruption by a deterministic
  // hash coin (first md5 hex digit of doc_id·position ∈ {0,1} —
  // p = 1/8), consecutive marks form sentinel spans, and the
  // operator reports the per-document plan statistics every span-
  // corruption dataloader needs to budget sentinels and targets:
  // token count, corrupted count, span count, longest span, ratio.
  // Span count is the run-start sum; the longest span falls out of
  // the gap between consecutive UNCORRUPTED positions (0 / n+1
  // sentinels) — both O(n) array folds, no per-doc quadratic work,
  // no shuffle at all: the whole plan is one map-side projection
  // over the documents scan followed by the output sort. Integer
  // counts; the ratio is the only double (round 6).
  // ---------------------------------------------------------------
  val tSpanCorruption: Q = (s, dir) => {
    import graft.functions.{TextFunctions => TF}
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .withColumn("flags", expr(
        """transform(sequence(1, CAST(n AS INT)), i ->
          |  CASE WHEN substring(md5(concat(CAST(doc_id AS STRING), '_',
          |    CAST(i AS STRING))), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END)"""
          .stripMargin))
      .withColumn("n_corrupted", expr(
        "aggregate(flags, 0L, (acc, f) -> acc + f)"))
      .withColumn("n_spans", expr(
        """aggregate(sequence(1, CAST(n AS INT)), 0L, (acc, i) ->
          |  acc + (CASE WHEN element_at(flags, i) = 1 THEN
          |    (CASE WHEN i = 1 THEN 1
          |          WHEN element_at(flags, i - 1) = 0 THEN 1
          |          ELSE 0 END)
          |    ELSE 0 END))""".stripMargin))
      .withColumn("bounds", expr(
        """concat(array(0), filter(sequence(1, CAST(n AS INT)),
          |  i -> element_at(flags, i) = 0), array(CAST(n AS INT) + 1))"""
          .stripMargin))
      .withColumn("max_span_len", expr(
        """array_max(transform(sequence(2, size(bounds)), k ->
          |  element_at(bounds, k) - element_at(bounds, k - 1) - 1))"""
          .stripMargin).cast("long"))
      .select(col("doc_id"), col("n").as("n_tokens"),
        col("n_corrupted"), col("n_spans"), col("max_span_len"),
        round(d(col("n_corrupted")) / d(col("n")), 6).as("corrupt_ratio"))
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, Q] = Map(
    "w_interpolate_linear" -> wInterpolateLinear,
    "t_span_corruption" -> tSpanCorruption)

  val oracles: Map[String, String] = Map(
    "w_interpolate_linear" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(
        |           (SELECT min(day) FROM daily),
        |           (SELECT max(day) FROM daily),
        |           INTERVAL 1 DAY)) AS DATE) AS day),
        |carried AS (
        |  SELECT s.day, d.rev,
        |         last_value(CASE WHEN d.rev IS NOT NULL
        |             THEN {'d': s.day, 'r': d.rev} END IGNORE NULLS)
        |           OVER (ORDER BY s.day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS p,
        |         first_value(CASE WHEN d.rev IS NOT NULL
        |             THEN {'d': s.day, 'r': d.rev} END IGNORE NULLS)
        |           OVER (ORDER BY s.day
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS nx
        |  FROM spine s LEFT JOIN daily d USING (day))
        |SELECT day, rev AS rev_cents,
        |       (CASE WHEN rev IS NOT NULL THEN rev * 10000
        |             WHEN p IS NOT NULL AND nx IS NOT NULL THEN
        |               CAST(((p.r * (nx.d - day) + nx.r * (day - p.d))
        |                 * 10000) // (nx.d - p.d) AS BIGINT)
        |             WHEN p IS NOT NULL THEN p.r * 10000
        |             ELSE nx.r * 10000 END) / 1000000.0 AS filled,
        |       rev IS NULL AS is_interpolated
        |FROM carried ORDER BY day""".stripMargin,
    "t_span_corruption" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS t,
        |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |flagged AS (
        |  SELECT doc_id, n,
        |         list_transform(range(1, CAST(n AS INT) + 1), i ->
        |           CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || '_'
        |             || CAST(i AS VARCHAR)), 1, 1) IN ('0', '1')
        |           THEN 1 ELSE 0 END) AS flags
        |  FROM toks),
        |stats AS (
        |  SELECT doc_id, n,
        |         CAST(list_sum(flags) AS BIGINT) AS n_corrupted,
        |         CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
        |           i -> CASE WHEN flags[i] = 1
        |                  AND (i = 1 OR flags[i - 1] = 0)
        |                THEN 1 ELSE 0 END)) AS BIGINT) AS n_spans,
        |         [0] || list_filter(range(1, CAST(n AS INT) + 1),
        |           i -> flags[i] = 0) || [CAST(n AS INT) + 1] AS bounds
        |  FROM flagged)
        |SELECT doc_id, n AS n_tokens, n_corrupted, n_spans,
        |       CAST(list_max(list_transform(range(2, len(bounds) + 1),
        |         k -> bounds[k] - bounds[k - 1] - 1)) AS BIGINT)
        |         AS max_span_len,
        |       round(CAST(n_corrupted AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |         AS corrupt_ratio
        |FROM stats ORDER BY doc_id""".stripMargin)
}
