package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 56: a quality-classifier DISTILLATION trained
  * inside the engine (full-batch logistic regression over the
  * registered C4 keep decision — the fasttext-style quality-filter
  * training loop every corpus pipeline runs, here with exact
  * sorted-fold gradients so the whole 5-step descent replays in
  * DuckDB), and Holt's linear-trend smoothing grid (the
  * double-exponential companion the w_ses_grid family was missing —
  * level+trend state folded per prefix, 3×3 (α, β) grid ranked by
  * RMSE). Full-replay oracles for both.
  */
object TrainingData56 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_quality_logreg — distill the registered C4 rule
  // (t_c4_filters.keep) into a 2-feature linear model: x1 =
  // ln(1 + n_tokens), x2 = avg_word_len, 5 full-batch gradient
  // steps at lr = 0.1 from w = 0. Each output row k reports the
  // loss/accuracy evaluated at w_{k−1} and the updated weights w_k —
  // so the loss column is the descent trace (non-increasing on any
  // smooth enough objective; the spec pins final < initial).
  // Determinism: per-doc sigmoids are round(·, 12)-quantized then
  // clamped to [1e−12, 1−1e−12] (libm exp differs across engines by
  // ulps; the quantization keeps five chained steps from compounding
  // them), and every corpus reduction is a sorted fold by doc_id —
  // bit-stable under any partitioning (the round-6 discipline).
  // Scale shape: one feature scan localCheckpointed, then per step
  // ONE aggregate over the corpus (map-side combining collect_list
  // folds — bounded by corpus rows, no shuffle growth) feeding a
  // 3-double driver update; 5 steps = 5 bounded jobs, the k-means /
  // MMR driver-built-steps class.
  // ---------------------------------------------------------------
  private val LogregSteps = 5
  private val LogregLr = 0.1

  val tQualityLogreg: Q = (s, dir) => {
    val feats = TrainingData2.tC4Filters(s, dir)
      .select(col("doc_id"),
        log(lit(1.0) + d(col("n_tokens"))).as("x1"),
        col("avg_word_len").as("x2"),
        when(col("keep"), 1.0).otherwise(0.0).as("y"))
      .localCheckpoint(eager = false) // five gradient passes share one scan
    def fold(v: String): Column =
      expr("aggregate(sort_array(collect_list(named_struct(" +
        s"'doc_id', doc_id, 'v', $v))), 0D, (a, q) -> a + q.v)")
    var w = (0.0, 0.0, 0.0)
    val rows = (1 to LogregSteps).map { k =>
      val p = least(greatest(
        round(lit(1.0) / (lit(1.0) +
          exp(-(lit(w._1) + lit(w._2) * col("x1") + lit(w._3) * col("x2")))),
          12), lit(1e-12)), lit(1.0) - lit(1e-12))
      val agg = feats
        .select(col("doc_id"), col("x1"), col("x2"), col("y"), p.as("p"))
        .agg(count(lit(1)).cast("double").as("n"),
          fold("p - y").as("g0"),
          fold("(p - y) * x1").as("g1"),
          fold("(p - y) * x2").as("g2"),
          fold("-(y * ln(p) + (1.0D - y) * ln(1.0D - p))").as("ls"),
          sum(when((col("p") >= 0.5) === (col("y") === 1.0), 1L)
            .otherwise(0L)).cast("long").as("acc"))
        .collect().head
      val n = agg.getAs[Double]("n")
      val loss = agg.getAs[Double]("ls") / n
      val accuracy = agg.getAs[Long]("acc").toDouble / n
      w = (w._1 - LogregLr * agg.getAs[Double]("g0") / n,
        w._2 - LogregLr * agg.getAs[Double]("g1") / n,
        w._3 - LogregLr * agg.getAs[Double]("g2") / n)
      (k.toLong, w._1, w._2, w._3, loss, accuracy)
    }
    import s.implicits._
    rows.toDF("step", "w0", "w1", "w2", "ls", "ac")
      .select(col("step"), round(col("w0"), 6).as("w_bias"),
        round(col("w1"), 6).as("w_log_tokens"),
        round(col("w2"), 6).as("w_avg_word_len"),
        round(col("ls"), 6).as("log_loss"),
        round(col("ac"), 6).as("accuracy"))
      .orderBy(col("step"))
  }

  // ---------------------------------------------------------------
  // w_holt_grid — Holt's linear-trend (double exponential)
  // smoothing grid over daily revenue: level l_t = αx_t +
  // (1−α)(l_{t−1}+b_{t−1}), trend b_t = β(l_t−l_{t−1}) + (1−β)b_{t−1},
  // one-step forecast f_t = l_{t−1}+b_{t−1}, init (l₂, b₂) =
  // (x₂, x₂−x₁), errors scored from t = 3. The (α, β) ∈ {0.2,0.5,0.8}²
  // grid ranks by RMSE — the trend-aware companion of w_ses_grid
  // (Holt 1957/2004). Scale shape: calendar-bounded like the SES
  // grid — each row folds its own day-prefix (Σ T² ≈ 2.9M fold steps
  // at 2.4k days, embarrassingly parallel over (row, α, β)); the
  // 2-double state rides an array accumulator; SSE via sorted fold.
  // ---------------------------------------------------------------
  private val HoltParams = Seq(0.2, 0.5, 0.8)

  val wHoltGrid: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("x"))
    val w = Grain.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val grid = HoltParams.flatMap(a => HoltParams.map(b => (a, b)))
    val errs = daily
      .withColumn("prefix", collect_list(col("x")).over(w))
      .filter(size(col("prefix")) >= 2)
      .select(col("day"), col("x"), col("prefix"),
        explode(array(grid.map { case (a, b) =>
          struct(lit(a).as("alpha"), lit(b).as("beta"))
        }: _*)).as("ab"))
      .select(col("day"), col("x"), col("prefix"),
        col("ab.alpha").as("alpha"), col("ab.beta").as("beta"))
      // fold [l, b] through prefix elements 3..t−1 from the
      // (x₂, x₂−x₁) init; the forecast for THIS row is l + b
      .withColumn("st", expr(
        "aggregate(slice(prefix, 3, size(prefix) - 2)," +
          " array(element_at(prefix, 2)," +
          " element_at(prefix, 2) - element_at(prefix, 1))," +
          " (a, v) -> array(" +
          "   alpha * v + (1.0D - alpha) * (element_at(a, 1) + element_at(a, 2))," +
          "   beta * (alpha * v + (1.0D - alpha) * (element_at(a, 1)" +
          "     + element_at(a, 2)) - element_at(a, 1))" +
          "     + (1.0D - beta) * element_at(a, 2)))"))
      .withColumn("f", element_at(col("st"), 1) + element_at(col("st"), 2))
      .withColumn("e2", (col("x") - col("f")) * (col("x") - col("f")))
    val scored = errs.groupBy(col("alpha"), col("beta"))
      .agg(count(lit(1)).cast("long").as("n_forecasts"),
        expr("aggregate(sort_array(collect_list(struct(day, e2))), 0D," +
          " (a, q) -> a + q.e2)").as("sse"))
      .withColumn("rmse", round(sqrt(col("sse") / d(col("n_forecasts"))), 6))
    scored
      .withColumn("rank", row_number().over(
        Grain.bounded(col("rmse"), col("alpha"), col("beta"))).cast("int"))
      .select(col("alpha"), col("beta"), col("n_forecasts"), col("rmse"),
        col("rank"))
      .orderBy(col("alpha"), col("beta"))
  }

  val queries: Map[String, Q] = Map(
    "t_quality_logreg" -> tQualityLogreg,
    "w_holt_grid" -> wHoltGrid)

  private def logregStepCtes: String =
    (1 to LogregSteps).map { k =>
      s"""e$k AS (
         |  SELECT f.doc_id, f.x1, f.x2, f.y,
         |         least(greatest(round(1.0 / (1.0 + exp(-(w0 + w1 * x1
         |           + w2 * x2))), 12), 1e-12), 1.0 - 1e-12) AS p
         |  FROM f CROSS JOIN s${k - 1}),
         |a$k AS (
         |  SELECT CAST(count(*) AS DOUBLE) AS n,
         |         list_sum(list(p - y ORDER BY doc_id)) AS g0,
         |         list_sum(list((p - y) * x1 ORDER BY doc_id)) AS g1,
         |         list_sum(list((p - y) * x2 ORDER BY doc_id)) AS g2,
         |         list_sum(list(-(y * ln(p) + (1.0 - y) * ln(1.0 - p))
         |           ORDER BY doc_id)) AS ls,
         |         sum(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
         |           AS acc
         |  FROM e$k),
         |s$k AS (
         |  SELECT w0 - $LogregLr * g0 / n AS w0,
         |         w1 - $LogregLr * g1 / n AS w1,
         |         w2 - $LogregLr * g2 / n AS w2,
         |         ls / n AS loss, CAST(acc AS DOUBLE) / n AS accuracy
         |  FROM a$k CROSS JOIN s${k - 1})""".stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "t_quality_logreg" ->
      s"""WITH c4 AS (SELECT * FROM (
         |${TrainingData2.oracles("t_c4_filters")}
         |)),
         |f AS (
         |  SELECT doc_id, ln(1.0 + CAST(n_tokens AS DOUBLE)) AS x1,
         |         avg_word_len AS x2,
         |         CASE WHEN keep THEN 1.0 ELSE 0.0 END AS y
         |  FROM c4),
         |s0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
         |$logregStepCtes,
         |out AS (
         |${(1 to LogregSteps).map(k =>
        s"  SELECT $k AS step, w0, w1, w2, loss, accuracy FROM s$k")
        .mkString("\n  UNION ALL\n")}
         |)
         |SELECT CAST(step AS BIGINT) AS step,
         |       round(w0, 6) AS w_bias,
         |       round(w1, 6) AS w_log_tokens,
         |       round(w2, 6) AS w_avg_word_len,
         |       round(loss, 6) AS log_loss,
         |       round(accuracy, 6) AS accuracy
         |FROM out ORDER BY step""".stripMargin,
    "w_holt_grid" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day,
         |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS x
         |  FROM orders GROUP BY 1),
         |pre AS (
         |  SELECT day, x,
         |         list(x) OVER (ORDER BY day
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prefix
         |  FROM daily),
         |errs AS (
         |  SELECT day, x, alpha, beta,
         |         list_reduce(
         |           list_concat(
         |             [[prefix[2], prefix[2] - prefix[1]]],
         |             list_transform(prefix[3:], v -> [v, 0.0])),
         |           (a, e) -> [
         |             alpha * e[1] + (1.0 - alpha) * (a[1] + a[2]),
         |             beta * (alpha * e[1] + (1.0 - alpha) * (a[1] + a[2])
         |               - a[1]) + (1.0 - beta) * a[2]]) AS st
         |  FROM pre CROSS JOIN (
         |    SELECT a.alpha, b.beta
         |    FROM (SELECT unnest(CAST([${HoltParams.mkString(", ")}]
         |            AS DOUBLE[])) AS alpha) a
         |    CROSS JOIN (SELECT unnest(CAST([${HoltParams.mkString(", ")}]
         |            AS DOUBLE[])) AS beta) b)
         |  WHERE len(prefix) >= 2),
         |scored AS (
         |  SELECT alpha, beta, CAST(count(*) AS BIGINT) AS n_forecasts,
         |         round(sqrt(list_sum(list(
         |             (x - (st[1] + st[2])) * (x - (st[1] + st[2]))
         |             ORDER BY day)) / CAST(count(*) AS DOUBLE)), 6) AS rmse
         |  FROM errs GROUP BY 1, 2)
         |SELECT alpha, beta, n_forecasts, rmse,
         |       CAST(row_number() OVER (ORDER BY rmse, alpha, beta)
         |         AS INTEGER) AS rank
         |FROM scored ORDER BY alpha, beta""".stripMargin)
}
