package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 12: causal/diagnostic analytics and ML feature
  * prep — a difference-in-differences estimator over the order
  * panel, the hashing-trick (feature hashing) bag-of-words audit,
  * and the Ljung–Box portmanteau white-noise test on daily revenue.
  * All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData15 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // a_diff_in_diff — difference-in-differences (the 2×2 canonical
  // design): treatment = even-custkey customers (a deterministic
  // pseudo-experiment the oracle replays), pre/post split at the
  // calendar midpoint of the order range, outcome = mean order
  // value. DiD = (T̄post − T̄pre) − (C̄post − C̄pre) — the estimator a
  // growth team runs on a rollout. Money sums are exact
  // DECIMAL(18,2); each cell mean is ONE double division of exact
  // aggregates; DiD is a fixed-order expression of the four means.
  // Scale shape: one scan, one ONE-ROW aggregate with 8 conditional
  // sums — no shuffle beyond the scalar reduce; the midpoint is a
  // driver-side literal off the (min, max) date aggregate.
  // ---------------------------------------------------------------
  val aDiffInDiff: Q = (s, dir) => {
    val o = Tables.table(s, dir, "orders").select(
      (col("o_custkey") % 2 === 0).as("treat"),
      to_date(col("o_orderdate")).as("day"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
      .localCheckpoint(eager = false) // consumed by the range probe + the cell agg
    val mm = o.agg(min(col("day")), max(col("day"))).head()
    val lo = mm.getDate(0).toLocalDate; val hi = mm.getDate(1).toLocalDate
    val mid = lo.plusDays(java.time.temporal.ChronoUnit.DAYS.between(lo, hi) / 2)
    val cell = (t: Boolean, p: Boolean) => {
      val in = col("treat") === t &&
        (if (p) col("day") >= lit(mid.toString).cast("date")
         else col("day") < lit(mid.toString).cast("date"))
      (sum(when(in, lit(1L)).otherwise(0L)),
        sum(when(in, col("price")).otherwise(lit(0).cast("decimal(18,2)"))))
    }
    val (ntp, stp) = cell(true, true); val (nta, sta) = cell(true, false)
    val (ncp, scp) = cell(false, true); val (nca, sca) = cell(false, false)
    o.agg(ntp.as("n_treat_post"), stp.as("s_tp"), nta.as("n_treat_pre"),
        sta.as("s_ta"), ncp.as("n_ctrl_post"), scp.as("s_cp"),
        nca.as("n_ctrl_pre"), sca.as("s_ca"))
      .withColumn("m_tp", d(col("s_tp")) / d(col("n_treat_post")))
      .withColumn("m_ta", d(col("s_ta")) / d(col("n_treat_pre")))
      .withColumn("m_cp", d(col("s_cp")) / d(col("n_ctrl_post")))
      .withColumn("m_ca", d(col("s_ca")) / d(col("n_ctrl_pre")))
      .select(col("n_treat_pre"), col("n_treat_post"), col("n_ctrl_pre"),
        col("n_ctrl_post"),
        round(col("m_ta"), 6).as("mean_treat_pre"),
        round(col("m_tp"), 6).as("mean_treat_post"),
        round(col("m_ca"), 6).as("mean_ctrl_pre"),
        round(col("m_cp"), 6).as("mean_ctrl_post"),
        round((col("m_tp") - col("m_ta")) - (col("m_cp") - col("m_ca")), 6)
          .as("did"))
  }

  // ---------------------------------------------------------------
  // t_hashed_features — the hashing trick (Weinberger et al. 2009):
  // tokens hash into 64 feature buckets by the portable 60-bit md5
  // (mod 64), the fixed-width sparse representation a linear
  // classifier trains on without a vocabulary. Per doc: token
  // count, distinct tokens, nonzero buckets, the exact integer L2²
  // of the count vector, the argmax bucket (ties → smallest
  // bucket id, via one max(struct) — no window), and the collision
  // rate (distinct tokens that lost their own bucket). ALL integer
  // except the final rate division. Scale shape: two stacked
  // partial-agg reductions ((doc, token) → (doc, bucket) → doc);
  // the 64-bucket key keeps every frame bounded by docs×64.
  // ---------------------------------------------------------------
  val tHashedFeatures: Q = (s, dir) => {
    val tokc = docs(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long") % 64)
      .localCheckpoint(eager = false) // distinct-token stats + bucket regroup
    val perBucket = tokc.groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("c")).as("bc"), count(lit(1)).as("n_toks_in"))
    val perDoc = perBucket.groupBy(col("doc_id"))
      .agg(sum(col("bc")).cast("long").as("n_tokens"),
        sum(col("n_toks_in")).cast("long").as("n_distinct"),
        count(lit(1)).as("n_nonzero"),
        sum(col("bc") * col("bc")).cast("long").as("l2_sq"),
        max(struct(col("bc").as("c"), (-col("bucket")).as("nb"))).as("top"))
    perDoc.select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        col("n_nonzero"), col("l2_sq"),
        (-col("top.nb")).cast("long").as("top_bucket"),
        col("top.c").cast("long").as("top_count"),
        round((d(col("n_distinct")) - d(col("n_nonzero"))) /
          d(col("n_distinct")), 6).as("collision_rate"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // w_ljung_box — Ljung–Box portmanteau test (Ljung & Box 1978) for
  // autocorrelation in daily revenue: ρ_k for lags 1..7 and
  // Q = n(n+2)·Σ ρ_k²/(n−k), the "is this KPI white noise or is
  // there structure worth modeling" pre-check before ARIMA-style
  // forecasting (the diagnostic companion of w_holt_winters /
  // a_autocorr). Daily revenue reduces through the exact-decimal
  // aggregate; the day-ordered series is CALENDAR-bounded (one
  // array, ≤ a few thousand doubles), so the ρ folds are bounded
  // fixed-order index folds (Spark aggregate(sequence...) ≡ DuckDB
  // list_reduce over range — identical left-to-right IEEE order);
  // mean and each ρ are fixed divisions; ln-free, so only 6-dp rounding
  // at the edge for cross-engine double printing.
  // ---------------------------------------------------------------
  val wLjungBox: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
    val series = daily.agg(count(lit(1)).as("n"),
        expr("CAST(SUM(rev) AS DOUBLE)").as("tot"),
        sort_array(collect_list(struct(col("day"), col("rev")))).as("arr"))
      .withColumn("xs", expr("transform(arr, e -> CAST(e.rev AS DOUBLE))"))
      .withColumn("m", col("tot") / d(col("n")))
    val s0 = expr(
      """aggregate(sequence(1, CAST(n AS INT)), 0D,
        |  (a, i) -> a + (element_at(xs, i) - m) * (element_at(xs, i) - m))
        |""".stripMargin)
    def sk(k: Int) = expr(
      s"""aggregate(sequence(1, CAST(n AS INT) - $k), 0D,
         |  (a, i) -> a + (element_at(xs, i) - m)
         |              * (element_at(xs, i + $k) - m))""".stripMargin)
    val withRho = (1 to 7).foldLeft(series.withColumn("s0", s0)) {
      case (df, k) => df.withColumn(s"rho$k", sk(k) / col("s0"))
    }
    val q = (1 to 7).map(k =>
        (col(s"rho$k") * col(s"rho$k")) / (d(col("n")) - lit(k.toDouble)))
      .reduceLeft(_ + _) * (d(col("n")) * (d(col("n")) + lit(2.0)))
    withRho.select(
      (col("n").cast("long").as("n_days") +:
        (1 to 7).map(k => round(col(s"rho$k"), 6).as(s"rho$k")) :+
        round(q, 6).as("q_stat") :+ lit(7L).as("dof")): _*)
  }

  val queries: Map[String, Q] = Map(
    "a_diff_in_diff" -> aDiffInDiff,
    "t_hashed_features" -> tHashedFeatures,
    "w_ljung_box" -> wLjungBox)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "a_diff_in_diff" ->
      """WITH o AS (
        |  SELECT o_custkey % 2 = 0 AS treat,
        |         CAST(o_orderdate AS DATE) AS day,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders),
        |mid AS (
        |  SELECT min(day) + CAST(date_diff('day', min(day), max(day)) // 2
        |           AS BIGINT) * INTERVAL 1 DAY AS mid
        |  FROM o),
        |agg AS (
        |  SELECT
        |    CAST(sum(CASE WHEN treat AND day >= mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_treat_post,
        |    sum(CASE WHEN treat AND day >= mid THEN price
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_tp,
        |    CAST(sum(CASE WHEN treat AND day < mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_treat_pre,
        |    sum(CASE WHEN treat AND day < mid THEN price
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_ta,
        |    CAST(sum(CASE WHEN NOT treat AND day >= mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ctrl_post,
        |    sum(CASE WHEN NOT treat AND day >= mid THEN price
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_cp,
        |    CAST(sum(CASE WHEN NOT treat AND day < mid THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ctrl_pre,
        |    sum(CASE WHEN NOT treat AND day < mid THEN price
        |        ELSE CAST(0 AS DECIMAL(18,2)) END) AS s_ca
        |  FROM o CROSS JOIN mid),
        |m AS (
        |  SELECT *,
        |         CAST(s_tp AS DOUBLE) / CAST(n_treat_post AS DOUBLE) AS m_tp,
        |         CAST(s_ta AS DOUBLE) / CAST(n_treat_pre AS DOUBLE) AS m_ta,
        |         CAST(s_cp AS DOUBLE) / CAST(n_ctrl_post AS DOUBLE) AS m_cp,
        |         CAST(s_ca AS DOUBLE) / CAST(n_ctrl_pre AS DOUBLE) AS m_ca
        |  FROM agg)
        |SELECT n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
        |       round(m_ta, 6) AS mean_treat_pre,
        |       round(m_tp, 6) AS mean_treat_post,
        |       round(m_ca, 6) AS mean_ctrl_pre,
        |       round(m_cp, 6) AS mean_ctrl_post,
        |       round((m_tp - m_ta) - (m_cp - m_ca), 6) AS did
        |FROM m""".stripMargin,
    "t_hashed_features" ->
      s"""WITH tokc AS (
        |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c,
        |         ${hex15("tok")} % 64 AS bucket
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |pb AS (
        |  SELECT doc_id, bucket, CAST(sum(c) AS BIGINT) AS bc,
        |         CAST(count(*) AS BIGINT) AS n_toks_in
        |  FROM tokc GROUP BY 1, 2),
        |pd AS (
        |  SELECT doc_id, CAST(sum(bc) AS BIGINT) AS n_tokens,
        |         CAST(sum(n_toks_in) AS BIGINT) AS n_distinct,
        |         CAST(count(*) AS BIGINT) AS n_nonzero,
        |         CAST(sum(bc * bc) AS BIGINT) AS l2_sq,
        |         max(struct_pack(c := bc, nb := -bucket)) AS top
        |  FROM pb GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct, n_nonzero, l2_sq,
        |       CAST(-top.nb AS BIGINT) AS top_bucket,
        |       CAST(top.c AS BIGINT) AS top_count,
        |       round((CAST(n_distinct AS DOUBLE) - CAST(n_nonzero AS DOUBLE))
        |         / CAST(n_distinct AS DOUBLE), 6) AS collision_rate
        |FROM pd ORDER BY doc_id""".stripMargin,
    "w_ljung_box" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |ser AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(SUM(rev) AS DOUBLE) AS tot,
        |         list(CAST(rev AS DOUBLE) ORDER BY day) AS xs
        |  FROM daily),
        |base AS (SELECT *, tot / CAST(n AS DOUBLE) AS m FROM ser),
        |s0 AS (
        |  SELECT *, list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, CAST(n AS INT) + 1),
        |             i -> (xs[i] - m) * (xs[i] - m))), (a, b) -> a + b) AS s0
        |  FROM base),
        |rho AS (
        |  SELECT *,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 1 + 1),
        |        i -> (xs[i] - m) * (xs[i + 1] - m))), (a, b) -> a + b) / s0
        |      AS rho1,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 2 + 1),
        |        i -> (xs[i] - m) * (xs[i + 2] - m))), (a, b) -> a + b) / s0
        |      AS rho2,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 3 + 1),
        |        i -> (xs[i] - m) * (xs[i + 3] - m))), (a, b) -> a + b) / s0
        |      AS rho3,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 4 + 1),
        |        i -> (xs[i] - m) * (xs[i + 4] - m))), (a, b) -> a + b) / s0
        |      AS rho4,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 5 + 1),
        |        i -> (xs[i] - m) * (xs[i + 5] - m))), (a, b) -> a + b) / s0
        |      AS rho5,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 6 + 1),
        |        i -> (xs[i] - m) * (xs[i + 6] - m))), (a, b) -> a + b) / s0
        |      AS rho6,
        |    list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |      list_transform(range(1, CAST(n AS INT) - 7 + 1),
        |        i -> (xs[i] - m) * (xs[i + 7] - m))), (a, b) -> a + b) / s0
        |      AS rho7
        |  FROM s0)
        |SELECT n AS n_days,
        |       round(rho1, 6) AS rho1, round(rho2, 6) AS rho2,
        |       round(rho3, 6) AS rho3, round(rho4, 6) AS rho4,
        |       round(rho5, 6) AS rho5, round(rho6, 6) AS rho6,
        |       round(rho7, 6) AS rho7,
        |       round((rho1 * rho1 / (CAST(n AS DOUBLE) - 1.0)
        |         + rho2 * rho2 / (CAST(n AS DOUBLE) - 2.0)
        |         + rho3 * rho3 / (CAST(n AS DOUBLE) - 3.0)
        |         + rho4 * rho4 / (CAST(n AS DOUBLE) - 4.0)
        |         + rho5 * rho5 / (CAST(n AS DOUBLE) - 5.0)
        |         + rho6 * rho6 / (CAST(n AS DOUBLE) - 6.0)
        |         + rho7 * rho7 / (CAST(n AS DOUBLE) - 7.0))
        |         * (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 2.0)), 6)
        |         AS q_stat,
        |       CAST(7 AS BIGINT) AS dof
        |FROM rho""".stripMargin)
}
