package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-12 batch 85: a join-planning advisor, an EWMA control
  * chart, a code-vs-prose gate, and a decision-stump distillation of
  * the quality rule.
  *
  *  - o_broadcast_advisor — per dimension table: measured row count
  *    × estimated row width (exact integral-division avg string
  *    lengths + fixed-type widths) vs the 10 MiB broadcast
  *    threshold, at current size AND at 100× — the "did I broadcast
  *    the right side" audit a 100 TB join plan starts from.
  *  - w_ewma_control — EWMA control chart (λ = 0.2, 3σ) on daily
  *    revenue with the exact time-varying limits
  *    ±3σ√(λ/(2−λ)·(1−(1−λ)^{2t})): the monitoring twin of
  *    w_cusum_drift with proper start-up limits.
  *  - t_code_detect — code-vs-prose gate from exact symbol counts
  *    (translate-based, no regex scan per class): the corpus routing
  *    decision before code-specific filters run.
  *  - t_stump_split — one-split decision stump distilling the
  *    registered C4 keep rule onto the n_tokens axis: exact counts
  *    per candidate threshold, information gain in nats, best split
  *    ranked — the weak-learner audit of a quality classifier.
  *
  * Float policy: exact integer counts/moments everywhere; the EWMA
  * fold is an element-wise sequential lambda (aggregate here,
  * list_reduce there); large-magnitude chart outputs ship as
  * floor(·1000) exact integers (the round-6-past-15-digits hazard);
  * stump entropies are one fixed double formula over exact counts.
  */
object TrainingData85 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  // ---------------------------------------------------------------
  // o_broadcast_advisor — est_row_bytes = fixed-type widths + the
  // exact integral-division mean of each string column; est_bytes =
  // rows × est_row_bytes, compared to the 10 MiB default
  // autoBroadcastJoinThreshold now and at a 100× fact-growth
  // extrapolation (dimensions that stop fitting at 100× are exactly
  // the ones that silently flip a plan from broadcast to shuffle on
  // the cluster). All arithmetic integer-exact. Scale shape: one
  // count + string-length aggregate per dimension table.
  // ---------------------------------------------------------------
  private val BroadcastThreshold = 10L * 1024L * 1024L
  private[operators] val AdvisorTables: Seq[(String, Long, Seq[String])] =
    Seq(
      ("region", 4L, Seq("r_name")),
      ("nation", 8L, Seq("n_name")),
      ("customer", 20L, Seq("c_name", "c_mktsegment")),
      ("supplier", 20L, Seq("s_name")),
      ("part", 20L, Seq("p_name", "p_brand", "p_type")))

  val oBroadcastAdvisor: Q = (s, dir) => {
    AdvisorTables.map { case (t, fixed, strs) =>
      val tab = Tables.table(s, dir, t)
      val aggs = count(lit(1)).cast("long").as("n_rows") +:
        strs.map(c => sum(length(col(c)).cast("long")).cast("decimal(38,0)")
          .as(s"sl_$c"))
      val base = tab.agg(aggs.head, aggs.tail: _*)
      val widthExpr = strs.map(c =>
        s"CAST(sl_$c div n_rows AS BIGINT)").mkString(" + ")
      base.select(lit(t).as("table_name"), col("n_rows"),
        (lit(fixed) + expr(widthExpr)).cast("long").as("est_row_bytes"))
    }.reduce(_ unionAll _)
      .withColumn("est_bytes", (col("n_rows") * col("est_row_bytes"))
        .cast("long"))
      .select(col("table_name"), col("n_rows"), col("est_row_bytes"),
        col("est_bytes"),
        when(col("est_bytes") <= BroadcastThreshold, "broadcast")
          .otherwise(lit("shuffle")).as("advice"),
        when(col("est_bytes") * 100L <= BroadcastThreshold, "broadcast")
          .otherwise(lit("shuffle")).as("advice_100x"))
      .orderBy(col("table_name"))
  }

  // ---------------------------------------------------------------
  // w_ewma_control — z_t = λ·x_t + (1−λ)·z_{t−1} from z_0 = μ, with
  // μ the exact micro-cent mean and σ the hi/lo-split sample sd of
  // the daily series; the chart flags |z_t − μ| >
  // 3σ√(λ/(2−λ)·(1−(1−λ)^{2t})) (start-up-corrected limits). The
  // fold state [z, (1−λ)^{2t}, n_ooc, first_ooc_t, t] advances
  // element-wise in BOTH engines; chart-scale outputs ship as
  // floor(·1000) exact integers. Scale shape: one daily aggregate,
  // one moment row, one calendar-bounded fold.
  // ---------------------------------------------------------------
  val wEwmaControl: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .localCheckpoint(eager = false) // moment row + the fold
    val mo = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("x").cast("decimal(38,0)") * col("x"))
        .cast("decimal(38,0)").as("sxx"))
      .withColumn("mu_mu", expr("CAST((sx * 1000000) div n AS BIGINT)"))
      .withColumn("mu", d(col("mu_mu")) / lit(1.0e6))
      .withColumn("nvar",
        (col("n") * col("sxx") - col("sx") * col("sx"))
          .cast("decimal(38,0)"))
      .withColumn("nvd",
        expr("CAST(nvar div 1000000000000 AS BIGINT)").cast("double") *
          lit(1.0e12) +
          expr("CAST(nvar % 1000000000000 AS BIGINT)").cast("double"))
      .withColumn("sigma",
        sqrt(col("nvd") / (d(col("n")) * d(col("n") - 1L))))
    val folded = daily.crossJoin(broadcast(mo))
      .groupBy(col("n"), col("mu_mu"), col("mu"), col("sigma"))
      .agg(expr(
        """aggregate(
          |  sort_array(collect_list(struct(day, CAST(x AS DOUBLE) AS x))),
          |  array(mu, 1.0D, 0.0D, -1.0D, 0.0D),
          |  (st, q) -> array(
          |    0.2D * q.x + 0.8D * st[0],
          |    st[1] * 0.64D,
          |    st[2] + IF(abs(0.2D * q.x + 0.8D * st[0] - mu)
          |      > 3.0D * sigma * sqrt(0.2D / 1.8D
          |        * (1.0D - st[1] * 0.64D)), 1.0D, 0.0D),
          |    IF(st[3] < 0.0D AND abs(0.2D * q.x + 0.8D * st[0] - mu)
          |      > 3.0D * sigma * sqrt(0.2D / 1.8D
          |        * (1.0D - st[1] * 0.64D)), st[4] + 1.0D, st[3]),
          |    st[4] + 1.0D))""".stripMargin.replaceAll("\n", " "))
        .as("st"))
    folded.select(col("n").as("n_days"),
      col("mu_mu").as("mean_microcents"),
      floor(col("sigma") * 1000.0).cast("long").as("sigma_millicents"),
      element_at(col("st"), 3).cast("long").as("n_ooc_days"),
      element_at(col("st"), 4).cast("long").as("first_ooc_t"),
      floor(element_at(col("st"), 1) * 1000.0).cast("long")
        .as("ewma_final_millicents"))
  }

  // ---------------------------------------------------------------
  // t_code_detect — exact symbol census via translate (deleting a
  // class and diffing lengths — one pass per class, no per-char
  // explode): braces/brackets, statement punctuation, underscores,
  // digits. code_score = (2·braces + 2·stmt + under + digits)/len;
  // verdict 'code' above 0.05. Scale shape: a pure map over the
  // documents scan.
  // ---------------------------------------------------------------
  val tCodeDetect: Q = (s, dir) => {
    def cnt(cls: String): Column =
      (length(col("text")) -
        length(translate(col("text"), cls, ""))).cast("long")
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"),
        cnt("{}[]()<>").as("n_brace"),
        cnt(";=&|").as("n_stmt"),
        cnt("_").as("n_under"),
        cnt("0123456789").as("n_digit"))
      .filter(col("len") > 0L)
      .withColumn("code_score",
        round((d(lit(2L) * col("n_brace") + lit(2L) * col("n_stmt") +
          col("n_under") + col("n_digit"))) / d(col("len")), 6))
      .select(col("doc_id"), col("len"), col("n_brace"), col("n_stmt"),
        col("n_under"), col("n_digit"), col("code_score"),
        when(col("code_score") > 0.05, "code").otherwise(lit("prose"))
          .as("verdict"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // t_stump_split — distill the registered C4 keep rule into ONE
  // threshold on n_tokens: for θ ∈ {10, 20, ..., 100}, exact
  // (n, pos) counts on each side from ONE conditional aggregate
  // (the grid is constant-bounded — never a per-distinct-value
  // scan), IG = H(parent) − weighted child entropies in nats (one
  // fixed double formula over exact counts; p ∈ {0,1} contributes
  // 0). Ranked by (rounded IG desc, θ asc). The stump should
  // rediscover the rule's own n_tokens < 20 / > 90 screens.
  // ---------------------------------------------------------------
  private val StumpGrid: Seq[Long] = (1L to 10L).map(_ * 10L)

  val tStumpSplit: Q = (s, dir) => {
    val base = TrainingData2.tC4Filters(s, dir)
      .select(col("n_tokens"),
        when(col("keep"), 1L).otherwise(0L).as("y"))
    val aggs = StumpGrid.flatMap { th =>
      Seq(
        sum(when(col("n_tokens") <= th, 1L).otherwise(0L)).cast("long")
          .as(s"nl_$th"),
        sum(when(col("n_tokens") <= th, col("y")).otherwise(0L))
          .cast("long").as(s"pl_$th"))
    } ++ Seq(count(lit(1)).cast("long").as("n"),
      sum(col("y")).cast("long").as("pos"))
    val wide = base.agg(aggs.head, aggs.tail: _*)
    def hBits(p: Column, n: Column): Column = {
      val q = d(p) / d(n)
      when(p === 0L || p === n, lit(0.0))
        .otherwise(-q * log(q) - (lit(1.0) - q) * log(lit(1.0) - q))
    }
    val rows = StumpGrid.map { th =>
      wide.select(lit(th).as("threshold"),
        col(s"nl_$th").as("n_left"), col(s"pl_$th").as("pos_left"),
        (col("n") - col(s"nl_$th")).as("n_right"),
        (col("pos") - col(s"pl_$th")).as("pos_right"),
        col("n"), col("pos"))
    }.reduce(_ unionAll _)
    val ig = hBits(col("pos"), col("n")) -
      when(col("n_left") > 0L,
        d(col("n_left")) / d(col("n")) *
          hBits(col("pos_left"), col("n_left"))).otherwise(lit(0.0)) -
      when(col("n_right") > 0L,
        d(col("n_right")) / d(col("n")) *
          hBits(col("pos_right"), col("n_right"))).otherwise(lit(0.0))
    import org.apache.spark.sql.expressions.Window
    rows.withColumn("ig", round(ig, 6))
      .withColumn("rank", row_number().over(
        Grain.bounded(desc("ig"), col("threshold"))).cast("int"))
      .select(col("rank"), col("threshold"), col("n_left"),
        col("pos_left"), col("n_right"), col("pos_right"), col("ig"))
      .orderBy(col("rank"))
  }

  val queries: Map[String, Q] = Map(
    "o_broadcast_advisor" -> oBroadcastAdvisor,
    "w_ewma_control" -> wEwmaControl,
    "t_code_detect" -> tCodeDetect,
    "t_stump_split" -> tStumpSplit)

  private val c4Cte =
    """f AS (
      |  SELECT doc_id, lang, text, string_split(text, ' ') AS toks
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, lang, text,
      |         CAST(len(toks) AS BIGINT) AS n_tokens,
      |         CAST(length(text) - len(toks) + 1 AS DOUBLE)
      |           / CAST(len(toks) AS DOUBLE) AS avg_word_len,
      |         len(list_filter(toks, t -> t IN ('the','a','of','and','to')))
      |           AS n_stop,
      |         list_max(list_transform(toks, t -> length(t))) AS max_wl
      |  FROM f),
      |lbl AS (
      |  SELECT n_tokens,
      |         CASE WHEN NOT ((n_tokens < 20) OR (n_tokens > 90)
      |              OR NOT (avg_word_len >= 3.0 AND avg_word_len <= 10.0)
      |              OR (n_stop = 0) OR regexp_matches(text, '[{}\[\]<>]')
      |              OR (max_wl > 20)) THEN 1 ELSE 0 END AS y
      |  FROM s)""".stripMargin

  val oracles: Map[String, String] = Map(
    "o_broadcast_advisor" -> {
      val per = AdvisorTables.map { case (t, fixed, strs) =>
        val widths = strs.map(c =>
          s"CAST(CAST(sum(length($c)) AS HUGEINT) // count(*) AS BIGINT)")
          .mkString(" + ")
        s"""SELECT '$t' AS table_name,
           |       CAST(count(*) AS BIGINT) AS rows_,
           |       CAST($fixed + $widths AS BIGINT) AS est_row_bytes
           |FROM $t""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH base AS (
         |$per)
         |SELECT table_name, rows_ AS n_rows, est_row_bytes,
         |       CAST(rows_ * est_row_bytes AS BIGINT) AS est_bytes,
         |       CASE WHEN rows_ * est_row_bytes <= 10485760
         |            THEN 'broadcast' ELSE 'shuffle' END AS advice,
         |       CASE WHEN rows_ * est_row_bytes * 100 <= 10485760
         |            THEN 'broadcast' ELSE 'shuffle' END AS advice_100x
         |FROM base ORDER BY table_name""".stripMargin
    },
    "w_ewma_control" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |mo AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST((CAST(sum(x) AS HUGEINT) * 1000000) // count(*)
         |           AS BIGINT) AS mu_mu,
         |         CAST((CAST(count(*) AS HUGEINT)
         |             * sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
         |             - CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
         |           // 1000000000000 AS BIGINT) AS nv_hi,
         |         CAST((CAST(count(*) AS HUGEINT)
         |             * sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
         |             - CAST(sum(x) AS HUGEINT) * CAST(sum(x) AS HUGEINT))
         |           % 1000000000000 AS BIGINT) AS nv_lo
         |  FROM daily),
         |st AS (
         |  SELECT n, mu_mu,
         |         CAST(mu_mu AS DOUBLE) / 1.0e6 AS mu,
         |         sqrt((CAST(nv_hi AS DOUBLE) * 1.0e12
         |             + CAST(nv_lo AS DOUBLE))
         |           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
         |           AS sigma
         |  FROM mo),
         |folded AS (
         |  SELECT s.n, s.mu_mu, s.sigma,
         |         list_reduce(
         |           list_prepend([s.mu, 1.0, 0.0, -1.0, 0.0],
         |             list([CAST(d.x AS DOUBLE), 0.0, 0.0, 0.0, 0.0]
         |               ORDER BY d.day)),
         |           (st, q) -> [
         |             0.2 * q[1] + 0.8 * st[1],
         |             st[2] * 0.64,
         |             st[3] + CASE WHEN abs(0.2 * q[1] + 0.8 * st[1] - s.mu)
         |               > 3.0 * s.sigma * sqrt(0.2 / 1.8
         |                 * (1.0 - st[2] * 0.64)) THEN 1.0 ELSE 0.0 END,
         |             CASE WHEN st[4] < 0.0
         |               AND abs(0.2 * q[1] + 0.8 * st[1] - s.mu)
         |               > 3.0 * s.sigma * sqrt(0.2 / 1.8
         |                 * (1.0 - st[2] * 0.64))
         |               THEN st[5] + 1.0 ELSE st[4] END,
         |             st[5] + 1.0]) AS fs
         |  FROM st s CROSS JOIN daily d
         |  GROUP BY s.n, s.mu_mu, s.sigma, s.mu)
         |SELECT n AS n_days, mu_mu AS mean_microcents,
         |       CAST(floor(sigma * 1000.0) AS BIGINT) AS sigma_millicents,
         |       CAST(fs[3] AS BIGINT) AS n_ooc_days,
         |       CAST(fs[4] AS BIGINT) AS first_ooc_t,
         |       CAST(floor(fs[1] * 1000.0) AS BIGINT)
         |         AS ewma_final_millicents
         |FROM folded""".stripMargin,
    "t_code_detect" ->
      """WITH c AS (
        |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len,
        |         CAST(length(text) - length(translate(text, '{}[]()<>', ''))
        |           AS BIGINT) AS n_brace,
        |         CAST(length(text) - length(translate(text, ';=&|', ''))
        |           AS BIGINT) AS n_stmt,
        |         CAST(length(text) - length(translate(text, '_', ''))
        |           AS BIGINT) AS n_under,
        |         CAST(length(text)
        |           - length(translate(text, '0123456789', ''))
        |           AS BIGINT) AS n_digit
        |  FROM documents WHERE length(text) > 0)
        |SELECT doc_id, len, n_brace, n_stmt, n_under, n_digit,
        |       round(CAST(2 * n_brace + 2 * n_stmt + n_under + n_digit
        |           AS DOUBLE) / CAST(len AS DOUBLE), 6) AS code_score,
        |       CASE WHEN CAST(2 * n_brace + 2 * n_stmt + n_under + n_digit
        |           AS DOUBLE) / CAST(len AS DOUBLE)
        |           > 0.05 THEN 'code' ELSE 'prose' END AS verdict
        |FROM c ORDER BY doc_id""".stripMargin,
    "t_stump_split" ->
      s"""WITH $c4Cte,
         |grid AS (
         |  SELECT unnest([10, 20, 30, 40, 50, 60, 70, 80, 90, 100])
         |           AS threshold),
         |cells AS (
         |  SELECT g.threshold,
         |         CAST(sum(CASE WHEN l.n_tokens <= g.threshold
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_left,
         |         CAST(sum(CASE WHEN l.n_tokens <= g.threshold
         |           THEN l.y ELSE 0 END) AS BIGINT) AS pos_left,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(l.y) AS BIGINT) AS pos
         |  FROM lbl l CROSS JOIN grid g
         |  GROUP BY g.threshold),
         |scored AS (
         |  SELECT threshold, n_left, pos_left,
         |         n - n_left AS n_right, pos - pos_left AS pos_right,
         |         n, pos,
         |         (CASE WHEN pos = 0 OR pos = n THEN 0.0
         |          ELSE -(pos::DOUBLE / n::DOUBLE)
         |              * ln(pos::DOUBLE / n::DOUBLE)
         |            - (1.0 - pos::DOUBLE / n::DOUBLE)
         |              * ln(1.0 - pos::DOUBLE / n::DOUBLE) END)
         |         - (CASE WHEN n_left > 0 THEN (n_left::DOUBLE / n::DOUBLE)
         |            * (CASE WHEN pos_left = 0 OR pos_left = n_left
         |               THEN 0.0
         |               ELSE -(pos_left::DOUBLE / n_left::DOUBLE)
         |                   * ln(pos_left::DOUBLE / n_left::DOUBLE)
         |                 - (1.0 - pos_left::DOUBLE / n_left::DOUBLE)
         |                   * ln(1.0 - pos_left::DOUBLE / n_left::DOUBLE)
         |               END) ELSE 0.0 END)
         |         - (CASE WHEN n - n_left > 0
         |            THEN ((n - n_left)::DOUBLE / n::DOUBLE)
         |            * (CASE WHEN pos - pos_left = 0
         |                 OR pos - pos_left = n - n_left THEN 0.0
         |               ELSE -((pos - pos_left)::DOUBLE
         |                     / (n - n_left)::DOUBLE)
         |                   * ln((pos - pos_left)::DOUBLE
         |                     / (n - n_left)::DOUBLE)
         |                 - (1.0 - (pos - pos_left)::DOUBLE
         |                     / (n - n_left)::DOUBLE)
         |                   * ln(1.0 - (pos - pos_left)::DOUBLE
         |                     / (n - n_left)::DOUBLE) END)
         |            ELSE 0.0 END) AS ig_raw
         |  FROM cells)
         |SELECT CAST(rank AS INTEGER) AS rank,
         |       CAST(threshold AS BIGINT) AS threshold, n_left, pos_left,
         |       n_right, pos_right, ig
         |FROM (
         |  SELECT threshold, n_left, pos_left, n_right, pos_right,
         |         round(ig_raw, 6) AS ig,
         |         row_number() OVER (ORDER BY round(ig_raw, 6) DESC,
         |           threshold) AS rank
         |  FROM scored)
         |ORDER BY rank""".stripMargin)
}
