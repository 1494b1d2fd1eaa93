package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 39: an SES smoothing-constant grid search (the
  * model-selection loop behind every w_ewma-style monitor — which α
  * actually forecasts best?), a columnar-encoding advisor
  * (dictionary / run-length benefit per column, the layout decision
  * a 100 TB parquet writer makes), and a session-depth histogram
  * (the engagement distribution sessionization exists to feed). All
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData44 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_ses_grid — simple-exponential-smoothing α grid {0.1 … 0.9}
  // scored by one-step-ahead RMSE on daily revenue: s_t = αx_t +
  // (1−α)s_{t−1} seeded s_1 = x_1, forecast error e_t = x_t − s_{t−1}.
  // The winning α is what w_ewma_revenue should run with — measured,
  // not guessed. Scale shape: the corpus reduces to the calendar-
  // bounded daily series; the per-row prefix fold is the proven
  // w_brown_trend order-pinned pattern (scalar fold seeded on the
  // first element — never a struct accumulator, see the brown note),
  // replicated per α by a 9-row explode; the SSE folds in pinned day
  // order. RMSE ranks on the 6-dp-rounded value with α as tiebreak
  // (the bm25 rounded-rank rule).
  // ---------------------------------------------------------------
  private val SesAlphas = Seq(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)

  val wSesGrid: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("x"))
    val w = Grain.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val errs = daily
      .withColumn("prefix", collect_list(col("x")).over(w))
      .filter(size(col("prefix")) >= 1)
      .select(col("day"), col("x"), col("prefix"),
        explode(array(SesAlphas.map(lit): _*)).as("alpha"))
      .withColumn("s_prev", expr("aggregate(slice(prefix, 2," +
        " size(prefix) - 1), element_at(prefix, 1)," +
        " (a, v) -> a * (1.0D - alpha) + alpha * v)"))
      .withColumn("e2", (col("x") - col("s_prev")) * (col("x") - col("s_prev")))
    val scored = errs.groupBy(col("alpha"))
      .agg(count(lit(1)).cast("long").as("n_forecasts"),
        expr("aggregate(sort_array(collect_list(struct(day, e2))), 0D," +
          " (a, q) -> a + q.e2)").as("sse"))
      .withColumn("rmse", round(sqrt(col("sse") / d(col("n_forecasts"))), 6))
    scored
      .withColumn("rank", row_number().over(
        Grain.bounded(col("rmse"), col("alpha"))).cast("int"))
      .select(col("alpha"), col("n_forecasts"), col("rmse"), col("rank"))
      .orderBy(col("alpha"))
  }

  // ---------------------------------------------------------------
  // o_encoding_advisor — per-column layout advisor over orders in
  // o_orderkey (write) order: exact NDV (dictionary benefit =
  // rows/ndv) and run count (RLE benefit = rows/runs). The numbers
  // a parquet writer's encoding chooser works from; a column with
  // rle_ratio ≈ 1 in write order may still compress sorted — pair
  // with o_zorder_layout for the sort decision. Scale shape: NDV is
  // a map-combining distinct aggregate; the run count is TWO-PHASE
  // (the Ranking discipline): range-partition on the key (frozen),
  // per-partition local change counts via a partition-LOCAL lag, and
  // the P boundary seams close on the driver from P carry rows —
  // never a single global window over the row stream.
  // ---------------------------------------------------------------
  private val AdvisorCols = Seq("o_orderstatus", "o_orderpriority")

  val oEncodingAdvisor: Q = (s, dir) => {
    // the seam-close below collects ONE carry row per range partition
    // (the Ranking.scala carry discipline) — cap P so a caller setting
    // spark.sql.shuffle.partitions=100k can't turn that bounded driver
    // collect into a 100k-row funnel; 4096 ranges is plenty of
    // parallelism for a single-column run count at any corpus size
    val nPart = math.min(math.max(
      s.conf.get("spark.sql.shuffle.partitions", "32").toInt, 1), 4096)
    val parts = Tables.table(s, dir, "orders")
      .select(col("o_orderkey") +: AdvisorCols.map(col): _*)
      .repartitionByRange(nPart, col("o_orderkey"))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(eager = false) // carries AND the local-lag pass share one assignment
    val w = Window.partitionBy(col("__pid")).orderBy(col("o_orderkey"))
    val lagged = AdvisorCols.foldLeft(parts) { (df, c) =>
      df.withColumn(s"chg_$c",
        when(lag(col(c), 1).over(w).isNotNull &&
          lag(col(c), 1).over(w) =!= col(c), 1L).otherwise(0L))
    }
    val carries = lagged.groupBy(col("__pid"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        AdvisorCols.flatMap(c => Seq(
          sum(col(s"chg_$c")).cast("long").as(s"lchg_$c"),
          min_by(col(c), col("o_orderkey")).as(s"first_$c"),
          max_by(col(c), col("o_orderkey")).as(s"last_$c"))): _*)
      .collect().sortBy(_.getAs[Int]("__pid"))
      .filter(_.getAs[Long]("cnt") > 0)
    // close the P−1 partition seams on the driver (P carry rows —
    // the withGlobalRank offset-map class, constant at any scale)
    val runsByCol = AdvisorCols.map { c =>
      val localChanges = carries.map(_.getAs[Long](s"lchg_$c")).sum
      val seams = carries.sliding(2).count {
        case Array(p, q) =>
          p.getAs[String](s"last_$c") != q.getAs[String](s"first_$c")
        case _ => false
      }
      c -> (localChanges + seams + 1)
    }.toMap
    val ndv = Tables.table(s, dir, "orders")
      .agg(count(lit(1)).cast("long").as("rows"),
        AdvisorCols.map(c => countDistinct(col(c)).cast("long").as(s"ndv_$c")): _*)
    ndv.select(explode(array(AdvisorCols.map(c =>
        struct(lit(c).as("column"), col("rows"), col(s"ndv_$c").as("ndv"),
          lit(runsByCol(c)).as("n_runs"))): _*)).as("r"))
      .select(col("r.column"), col("r.rows"), col("r.ndv"), col("r.n_runs"),
        round(d(col("r.rows")) / d(col("r.ndv")), 6).as("dict_ratio"),
        round(d(col("r.rows")) / d(col("r.n_runs")), 6).as("rle_ratio"))
      .orderBy(col("column"))
  }

  // ---------------------------------------------------------------
  // ev_session_depth — events-per-session histogram under the
  // standard 30-minute inactivity cut: the engagement distribution
  // (how deep do sessions go) that sessionization feeds to product
  // analytics. Scale shape: ONE per-user lag window marks session
  // starts, a per-user running sum numbers them (both user-parallel),
  // then two bounded aggregates (per-session depth, depth
  // histogram) — all integer-exact.
  // ---------------------------------------------------------------
  val evSessionDepth: Q = (s, dir) => {
    val gapUs = 1800L * 1000000L
    val ev = Tables.table(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val sess = ev
      .withColumn("new_sess",
        when(lag(col("us"), 1).over(w).isNull ||
          col("us") - lag(col("us"), 1).over(w) >= gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).cast("long").as("depth"))
    sess.groupBy(col("depth"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("depth"))
  }

  val queries: Map[String, Q] = Map(
    "w_ses_grid" -> wSesGrid,
    "o_encoding_advisor" -> oEncodingAdvisor,
    "ev_session_depth" -> evSessionDepth)

  val oracles: Map[String, String] = Map(
    "w_ses_grid" ->
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
         |  SELECT day, x, alpha,
         |         list_reduce(prefix,
         |           (a, v) -> a * (1.0 - alpha) + alpha * v) AS s_prev
         |  FROM pre CROSS JOIN (
         |    SELECT unnest(CAST([${SesAlphas.mkString(", ")}] AS DOUBLE[]))
         |      AS alpha)
         |  WHERE len(prefix) >= 1),
         |scored AS (
         |  SELECT alpha, CAST(count(*) AS BIGINT) AS n_forecasts,
         |         round(sqrt(list_sum(list((x - s_prev) * (x - s_prev)
         |             ORDER BY day)) / CAST(count(*) AS DOUBLE)), 6) AS rmse
         |  FROM errs GROUP BY 1)
         |SELECT alpha, n_forecasts, rmse,
         |       CAST(row_number() OVER (ORDER BY rmse, alpha) AS INTEGER)
         |         AS rank
         |FROM scored ORDER BY alpha""".stripMargin,
    "o_encoding_advisor" -> {
      val cols = AdvisorCols.map { c =>
        s"""SELECT '$c' AS "column",
           |       (SELECT CAST(count(*) AS BIGINT) FROM orders) AS "rows",
           |       (SELECT CAST(count(DISTINCT $c) AS BIGINT) FROM orders)
           |         AS ndv,
           |       (SELECT CAST(1 + sum(CASE WHEN prev IS NOT NULL
           |             AND prev <> $c THEN 1 ELSE 0 END) AS BIGINT)
           |        FROM (SELECT $c,
           |                     lag($c, 1) OVER (ORDER BY o_orderkey) AS prev
           |              FROM orders)) AS n_runs""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH per AS (
         |$cols)
         |SELECT "column", "rows", ndv, n_runs,
         |       round("rows"::DOUBLE / ndv::DOUBLE, 6) AS dict_ratio,
         |       round("rows"::DOUBLE / n_runs::DOUBLE, 6) AS rle_ratio
         |FROM per ORDER BY "column"""".stripMargin
    },
    "ev_session_depth" ->
      """WITH marks AS (
        |  SELECT user_id,
        |         CASE WHEN lag(epoch_us(ts), 1) OVER w IS NULL
        |               OR epoch_us(ts) - lag(epoch_us(ts), 1) OVER w
        |                  >= 1800 * 1000000 THEN 1 ELSE 0 END AS new_sess,
        |         epoch_us(ts) AS us, event_id
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |sess AS (
        |  SELECT user_id,
        |         sum(new_sess) OVER (PARTITION BY user_id
        |           ORDER BY us, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
        |  FROM marks),
        |depths AS (
        |  SELECT CAST(count(*) AS BIGINT) AS depth
        |  FROM sess GROUP BY user_id, sess_id)
        |SELECT depth, CAST(count(*) AS BIGINT) AS n_sessions
        |FROM depths GROUP BY 1 ORDER BY 1""".stripMargin)
}
