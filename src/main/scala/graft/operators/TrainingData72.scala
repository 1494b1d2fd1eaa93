package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 72: character-entropy quality gating, rank
  * correlation on the daily grid, and a parquet row-group advisor.
  *
  *  - t_char_entropy_gate — per-document character-level Shannon
  *    entropy with low/high gates (repetitive-keyboard-mash vs
  *    random-noise tails — the cheap gibberish filter C4-class
  *    pipelines run before any model-based scoring).
  *  - a_kendall_taub — Kendall τ-b (tie-adjusted) between daily
  *    order volume and daily revenue, exact counts over the
  *    calendar² pair lattice (the w_theil_sen boundedness class).
  *  - o_rowgroup_advisor — rows-per-row-group and file-count
  *    recommendation per table from EXACT average row widths — the
  *    knob a 100 TB writer sets before o_compaction_plan applies.
  */
object TrainingData72 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_char_entropy_gate — H = ln(L) − (Σ c·ln c)/L per doc over its
  // character counts (exact longs; the fold runs char-ascending over
  // the ≤alphabet-size count list — bounded, the count-of-counts
  // discipline at per-doc granularity). Gates: H < 2.5 nats ⇒
  // too-repetitive, H > 4.5 ⇒ noise-like; both thresholds are
  // corpus-independent constants so the gate is stable under
  // sharding. Per-lang roll-up: doc counts per verdict + the mean
  // entropy (doc_id-ascending sorted fold). Scale shape: one
  // (doc, char) count aggregate — map-combining — then per-doc
  // bounded folds; no windows, no pairs.
  // ---------------------------------------------------------------
  private val EntLo = 2.5
  private val EntHi = 4.5

  val tCharEntropyGate: Q = (s, dir) => {
    val perDoc = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), "")).as("ch"))
      .groupBy(col("doc_id"), col("lang"), col("ch"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("c")).cast("long").as("len"),
        expr("aggregate(sort_array(collect_list(struct(ch, c))), 0D," +
          " (a, q) -> a + CAST(q.c AS DOUBLE) * ln(CAST(q.c AS DOUBLE)))")
          .as("sclnc"))
      .withColumn("h", log(d(col("len"))) - col("sclnc") / d(col("len")))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("h") < EntLo, 1L).otherwise(0L)).cast("long")
          .as("n_repetitive"),
        sum(when(col("h") > EntHi, 1L).otherwise(0L)).cast("long")
          .as("n_noise"),
        expr("aggregate(sort_array(collect_list(struct(doc_id, h))), 0D," +
          " (a, q) -> a + q.h)").as("sh"))
      .select(col("lang"), col("n_docs"), col("n_repetitive"), col("n_noise"),
        round(d(col("n_docs") - col("n_repetitive") - col("n_noise")) /
          d(col("n_docs")), 6).as("keep_rate"),
        round(col("sh") / d(col("n_docs")), 6).as("mean_entropy"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // a_kendall_taub — τ-b between daily order count and daily revenue
  // over all day pairs: C, D, and the single-sided tie counts are
  // EXACT LONGS off one day₁<day₂ self-join of the ≤calendar-length
  // daily frame (pairs of DAYS, never of orders — the w_theil_sen /
  // a_hodges_lehmann boundedness class: at 100× the fact data the
  // day count barely moves). τ-b = (C−D)/√((n₀−t_x)(n₀−t_y)); the
  // z uses the no-tie null variance n(n−1)(2n+5)/18 (the standard
  // first-order approximation, stated as such).
  // ---------------------------------------------------------------
  val aKendallTaub: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).cast("long").as("x"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
          .cast("long").as("y"))
      .localCheckpoint(eager = false) // both sides of the day-pair lattice
    val a = daily.alias("a"); val b = daily.alias("b")
    val pairs = a.join(b, col("a.day") < col("b.day"))
      .select(
        signum(d(col("b.x")) - d(col("a.x"))).as("sx"),
        signum(d(col("b.y")) - d(col("a.y"))).as("sy"))
    val st = pairs.agg(
      count(lit(1)).cast("long").as("n0"),
      sum(when(col("sx") * col("sy") > 0, 1L).otherwise(0L)).cast("long")
        .as("c"),
      sum(when(col("sx") * col("sy") < 0, 1L).otherwise(0L)).cast("long")
        .as("dd"),
      sum(when(col("sx") === 0 && col("sy") =!= 0, 1L).otherwise(0L))
        .cast("long").as("tx"),
      sum(when(col("sy") === 0 && col("sx") =!= 0, 1L).otherwise(0L))
        .cast("long").as("ty"),
      sum(when(col("sx") === 0 && col("sy") === 0, 1L).otherwise(0L))
        .cast("long").as("txy"))
      .crossJoin(broadcast(daily.agg(count(lit(1)).cast("long").as("n"))))
    val taub = d(col("c") - col("dd")) /
      sqrt(d(col("n0") - col("tx") - col("txy")) *
        d(col("n0") - col("ty") - col("txy")))
    val z = (lit(3.0) * d(col("c") - col("dd"))) /
      sqrt(d(col("n")) * d(col("n") - 1L) * (lit(2.0) * d(col("n")) + 5.0)
        / 2.0)
    st.select(col("n").as("n_days"), col("n0").as("n_pairs"),
      col("c").as("concordant"), col("dd").as("discordant"),
      col("tx").as("ties_x"), col("ty").as("ties_y"),
      round(taub, 6).as("tau_b"), round(z, 6).as("z"))
  }

  // ---------------------------------------------------------------
  // o_rowgroup_advisor — per table: EXACT average row width from
  // fixed column sizes + measured string lengths (Σ length exact
  // longs, ONE division), then rows-per-128MiB-row-group and the
  // projected row-group count for the table — the writer-side twin
  // of o_compaction_plan (which fixes file sizes after the fact)
  // and o_encoding_advisor (which picks encodings within the
  // group). In-memory widths, deliberately pre-compression: the
  // advisor sets the UPPER bound a writer flushes at. Scale shape:
  // one map-side sum per table over the string columns only.
  // ---------------------------------------------------------------
  private val RowGroupBytes = 128L * 1024 * 1024

  val oRowgroupAdvisor: Q = (s, dir) => {
    // (table, fixed bytes per row, string columns)
    def leg(name: String, fixed: Long, strCols: Seq[String]): DataFrame = {
      val t = Tables.table(s, dir, name)
      val strLen =
        if (strCols.isEmpty) lit(0L)
        else strCols.map(c => length(col(c)).cast("long")).reduce(_ + _)
      t.agg(count(lit(1)).cast("long").as("n_rows"),
        sum(strLen).cast("long").as("str_bytes"))
        .select(lit(name).as("table_name"), col("n_rows"),
          // integral division (the DuckDB // twin) — widths stay long
          (lit(fixed) + expr("str_bytes div n_rows")).as("avg_row_bytes"))
    }
    val legs = Seq(
      leg("orders", 8L + 8 + 8 + 8, Seq("o_orderstatus", "o_orderpriority")),
      leg("lineitem", 8L * 7, Seq("l_returnflag", "l_linestatus")),
      leg("events", 8L * 4, Seq("event_type", "props")),
      leg("documents", 8L * 2, Seq("text", "lang", "source")))
    legs.reduce(_.unionAll(_))
      .withColumn("rows_per_group",
        least(col("n_rows"), expr(s"${RowGroupBytes}L div avg_row_bytes")))
      .select(col("table_name"), col("n_rows"), col("avg_row_bytes"),
        col("rows_per_group"),
        ceil(d(col("n_rows")) / d(col("rows_per_group"))).cast("long")
          .as("n_row_groups"))
      .orderBy(col("table_name"))
  }

  val queries: Map[String, Q] = Map(
    "t_char_entropy_gate" -> tCharEntropyGate,
    "a_kendall_taub" -> aKendallTaub,
    "o_rowgroup_advisor" -> oRowgroupAdvisor)

  val oracles: Map[String, String] = Map(
    "t_char_entropy_gate" ->
      s"""WITH cc AS (
         |  SELECT doc_id, lang, ch, CAST(count(*) AS BIGINT) AS c
         |  FROM (SELECT doc_id, lang, unnest(string_split(text, '')) AS ch
         |        FROM documents)
         |  GROUP BY 1, 2, 3),
         |pd AS (
         |  SELECT doc_id, lang, CAST(sum(c) AS BIGINT) AS len,
         |         list_sum(list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
         |           ORDER BY ch)) AS sclnc
         |  FROM cc GROUP BY 1, 2),
         |h AS (
         |  SELECT doc_id, lang,
         |         ln(CAST(len AS DOUBLE)) - sclnc / CAST(len AS DOUBLE) AS h
         |  FROM pd)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN h < $EntLo THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_repetitive,
         |       CAST(sum(CASE WHEN h > $EntHi THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_noise,
         |       round(CAST(count(*)
         |           - sum(CASE WHEN h < $EntLo THEN 1 ELSE 0 END)
         |           - sum(CASE WHEN h > $EntHi THEN 1 ELSE 0 END) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE), 6) AS keep_rate,
         |       round(list_sum(list(h ORDER BY doc_id))
         |         / CAST(count(*) AS DOUBLE), 6) AS mean_entropy
         |FROM h GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_kendall_taub" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT sign(CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS sx,
        |         sign(CAST(b.y AS DOUBLE) - CAST(a.y AS DOUBLE)) AS sy
        |  FROM daily a JOIN daily b ON a.day < b.day),
        |st AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n0,
        |         CAST(sum(CASE WHEN sx * sy > 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS c,
        |         CAST(sum(CASE WHEN sx * sy < 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS dd,
        |         CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS tx,
        |         CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS ty,
        |         CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS txy
        |  FROM pairs),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily)
        |SELECT nn.n AS n_days, st.n0 AS n_pairs,
        |       st.c AS concordant, st.dd AS discordant,
        |       st.tx AS ties_x, st.ty AS ties_y,
        |       round(CAST(st.c - st.dd AS DOUBLE)
        |         / sqrt(CAST(st.n0 - st.tx - st.txy AS DOUBLE)
        |                * CAST(st.n0 - st.ty - st.txy AS DOUBLE)), 6)
        |         AS tau_b,
        |       round((3.0 * CAST(st.c - st.dd AS DOUBLE))
        |         / sqrt(CAST(nn.n AS DOUBLE) * CAST(nn.n - 1 AS DOUBLE)
        |                * (2.0 * CAST(nn.n AS DOUBLE) + 5.0) / 2.0), 6)
        |         AS z
        |FROM st CROSS JOIN nn""".stripMargin,
    "o_rowgroup_advisor" -> {
      def legSql(name: String, fixed: Long, strCols: Seq[String]): String = {
        val strLen =
          if (strCols.isEmpty) "0"
          else strCols.map(c => s"CAST(length($c) AS BIGINT)").mkString(" + ")
        s"""SELECT '$name' AS table_name,
           |       CAST(count(*) AS BIGINT) AS n_rows,
           |       $fixed + CAST(sum($strLen) AS BIGINT) // count(*)
           |         AS avg_row_bytes
           |FROM $name""".stripMargin
      }
      val legs = Seq(
        legSql("orders", 8L + 8 + 8 + 8,
          Seq("o_orderstatus", "o_orderpriority")),
        legSql("lineitem", 8L * 7, Seq("l_returnflag", "l_linestatus")),
        legSql("events", 8L * 4, Seq("event_type", "props")),
        legSql("documents", 8L * 2, Seq("text", "lang", "source")))
      s"""WITH base AS (
         |${legs.mkString("\nUNION ALL\n")}),
         |adv AS (
         |  SELECT table_name, n_rows, avg_row_bytes,
         |         least(n_rows, ${RowGroupBytes} // avg_row_bytes)
         |           AS rows_per_group
         |  FROM base)
         |SELECT table_name, n_rows, avg_row_bytes, rows_per_group,
         |       CAST(ceil(CAST(n_rows AS DOUBLE)
         |         / CAST(rows_per_group AS DOUBLE)) AS BIGINT)
         |         AS n_row_groups
         |FROM adv ORDER BY table_name""".stripMargin
    })
}
