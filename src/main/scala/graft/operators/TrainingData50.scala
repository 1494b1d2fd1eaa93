package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 45: t-closeness (Li et al. 2007 — the third leg of
  * the privacy trio after t_k_anonymity and t_l_diversity: is any
  * QI cell's sensitive-value DISTRIBUTION far from the corpus
  * baseline?), partial correlation (does order volume correlate
  * with revenue beyond what basket size explains?), and the Hurst
  * exponent by rescaled-range analysis (Hurst 1951 — long-memory
  * detection: H > ½ trending, H < ½ mean-reverting). All
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData50 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_t_closeness — per (lang, source) QI cell, the ordered earth-
  // mover's distance between the cell's quality-decile distribution
  // and the corpus baseline: EMD = Σ|cumP − cumQ| / (m−1) over the
  // m = 10 ordered deciles (the Li et al. ordered-attribute form).
  // A cell with t > 0.3 leaks its members' quality bracket even
  // after k-anonymity holds. Scale shape: one scan to exact
  // (cell × decile) counts, the 10-row baseline broadcasts, the EMD
  // is a ≤10-term sorted fold per cell — all integer counts until
  // two fixed divisions.
  // ---------------------------------------------------------------
  val tTCloseness: Q = (s, dir) => {
    val decile = least(floor(TF.qualityScore(col("text")) * lit(10.0)), lit(9.0))
      .cast("long")
    val base = Tables.table(s, dir, "documents")
      .select(col("lang"), col("source"), decile.as("dec"))
      .localCheckpoint(eager = false) // cell counts AND the global baseline
    val cells = base.groupBy(col("lang"), col("source"), col("dec"))
      .agg(count(lit(1)).cast("long").as("c"))
    val cellTot = cells.groupBy(col("lang"), col("source"))
      .agg(sum(col("c")).cast("long").as("n"))
    val glob = base.groupBy(col("dec")).agg(count(lit(1)).cast("long").as("g"))
    val globTot = base.agg(count(lit(1)).cast("long").as("gt"))
    // dense decile grid per cell (absent deciles are zero mass)
    val grid = cellTot.select(col("lang"), col("source"), col("n"),
      explode(sequence(lit(0L), lit(9L))).as("dec"))
    val withMass = grid
      .join(cells, Seq("lang", "source", "dec"), "left")
      .na.fill(0L, Seq("c"))
      .join(broadcast(glob), Seq("dec"), "left")
      .na.fill(0L, Seq("g"))
      .crossJoin(broadcast(globTot))
      .withColumn("p", d(col("c")) / d(col("n")))
      .withColumn("q", d(col("g")) / d(col("gt")))
    val wc = Window.partitionBy(col("lang"), col("source")).orderBy(col("dec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withMass
      .withColumn("cumdiff", abs(sum(col("p") - col("q")).over(wc)))
      .groupBy(col("lang"), col("source"), col("n"))
      .agg(expr("aggregate(sort_array(collect_list(struct(dec, cumdiff))), 0D," +
        " (a, x) -> a + x.cumdiff)").as("emd_sum"))
      .select(col("lang"), col("source"), col("n").as("n_docs"),
        round(col("emd_sum") / lit(9.0), 6).as("t_closeness"),
        (col("emd_sum") / lit(9.0) > 0.3).as("breach"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // a_partial_corr — partial correlation of daily order count and
  // daily revenue CONTROLLING for mean order value:
  // r_xy·z = (r_xy − r_xz r_yz) / √((1−r_xz²)(1−r_yz²)). If volume
  // and revenue only co-move through basket size, the partial
  // collapses — the spurious-correlation screen for metric trees.
  // Scale shape: the corpus reduces to the calendar-bounded daily
  // series; x, y are exact ints, z = y/x is a double, so the
  // z-moments fold in pinned day order (sorted fold); one fixed
  // double DAG, round-6.
  // ---------------------------------------------------------------
  val aPartialCorr: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).cast("long").as("x"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("y"))
      .withColumn("z", d(col("y")) / d(col("x")))
    def fold(v: String): Column =
      expr(s"aggregate(sort_array(collect_list(struct(day, $v))), 0D," +
        s" (a, q) -> a + q.$v)")
    val m = daily
      .select(col("day"), d(col("x")).as("xd"), d(col("y")).as("yd"), col("z"),
        (d(col("x")) * d(col("y"))).as("xy"),
        (d(col("x")) * col("z")).as("xz"),
        (d(col("y")) * col("z")).as("yz"),
        (d(col("x")) * d(col("x"))).as("xx"),
        (d(col("y")) * d(col("y"))).as("yy"),
        (col("z") * col("z")).as("zz"))
      .agg(count(lit(1)).cast("long").as("n"),
        fold("xd").as("sx"), fold("yd").as("sy"), fold("z").as("sz"),
        fold("xy").as("sxy"), fold("xz").as("sxz"), fold("yz").as("syz"),
        fold("xx").as("sxx"), fold("yy").as("syy"), fold("zz").as("szz"))
    def r(sab: Column, sa: Column, sb: Column, saa: Column, sbb: Column): Column =
      (d(col("n")) * sab - sa * sb) /
        (sqrt(d(col("n")) * saa - sa * sa) * sqrt(d(col("n")) * sbb - sb * sb))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    m.select(col("n").as("n_days"),
      round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      round((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 6)
        .as("partial_r_xy_given_z"))
  }

  // ---------------------------------------------------------------
  // w_hurst — rescaled-range (R/S) estimate of the Hurst exponent
  // on daily revenue: for block sizes s ∈ {16, 32, 64, 128}, each
  // full block's R (range of the cumulative deviation walk) over S
  // (population std, exact-moment form), averaged per size; H = the
  // log-log slope. Persistent series (H > ½) break i.i.d. bootstrap
  // and forecast assumptions. Scale shape: the series is
  // calendar-bounded; blocks are partition-local windows (the
  // per-block walk is sequential by definition, block-parallel
  // across the grid); the per-size means and the 4-point regression
  // are sorted folds; round-6 (libm ln/sqrt at the edges).
  // ---------------------------------------------------------------
  private val HurstSizes = Seq(16L, 32L, 64L, 128L)

  val wHurst: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
      .withColumn("rk", (row_number().over(Grain.bounded(col("day"))) - 1)
        .cast("long"))
      .localCheckpoint(eager = false) // consumed once per block size
    val grid = daily
      .select(col("day"), col("m"), col("rk"),
        explode(array(HurstSizes.map(lit): _*)).as("s"))
      .withColumn("b", (col("rk") / col("s")).cast("long"))
    val stats = grid.groupBy(col("s"), col("b"))
      .agg(count(lit(1)).cast("long").as("cnt"),
        sum(col("m")).cast("long").as("sm"),
        sum((col("m") * col("m")).cast("decimal(38,0)")).as("smm"))
      .filter(col("cnt") === col("s")) // full blocks only
      .withColumn("mu", d(col("sm")) / d(col("s")))
      .withColumn("sd", sqrt((d(col("smm")) -
        d(col("sm")) * d(col("sm")) / d(col("s"))) / d(col("s"))))
    val walk = grid.join(stats.select(col("s"), col("b"), col("mu"), col("sd")),
        Seq("s", "b"))
      .withColumn("rundev", sum(d(col("m")) - col("mu")).over(
        Window.partitionBy(col("s"), col("b")).orderBy(col("rk"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("s"), col("b"), col("sd"))
      .agg((max(col("rundev")) - min(col("rundev"))).as("r"))
      .filter(col("sd") > 0.0)
      .withColumn("rs", col("r") / col("sd"))
    val perSize = walk.groupBy(col("s"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        expr("aggregate(sort_array(collect_list(struct(b, rs))), 0D," +
          " (a, x) -> a + x.rs)").as("sum_rs"))
      .withColumn("mean_rs", col("sum_rs") / d(col("n_blocks")))
      .withColumn("lx", log(d(col("s"))))
      .withColumn("ly", log(col("mean_rs")))
      .localCheckpoint(eager = false) // the 4-row regression AND the output rows
    def fold(v: String): Column =
      expr(s"aggregate(sort_array(collect_list(struct(s, $v))), 0D," +
        s" (a, q) -> a + q.$v)")
    val reg = perSize
      .select(col("s"), col("lx"), col("ly"), (col("lx") * col("ly")).as("lxy"),
        (col("lx") * col("lx")).as("lxx"))
      .agg(count(lit(1)).cast("long").as("k"),
        fold("lx").as("slx"), fold("ly").as("sly"),
        fold("lxy").as("slxy"), fold("lxx").as("slxx"))
      .select(((d(col("k")) * col("slxy") - col("slx") * col("sly")) /
        (d(col("k")) * col("slxx") - col("slx") * col("slx"))).as("hurst"))
    perSize.crossJoin(broadcast(reg))
      .select(col("s").as("block_size"), col("n_blocks"),
        round(col("mean_rs"), 6).as("mean_rs"),
        round(col("hurst"), 6).as("hurst"))
      .orderBy(col("block_size"))
  }

  val queries: Map[String, Q] = Map(
    "t_t_closeness" -> tTCloseness,
    "a_partial_corr" -> aPartialCorr,
    "w_hurst" -> wHurst)

  val oracles: Map[String, String] = Map(
    "t_t_closeness" ->
      """WITH base AS (
        |  SELECT lang, source,
        |         CAST(least(floor(
        |           (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |             * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
        |                     / CAST(n_tokens AS DOUBLE), 10.0) / 10.0
        |           * 10.0), 9.0) AS BIGINT) AS dec
        |  FROM (SELECT lang, source, text,
        |               len(string_split(text, ' ')) AS n_tokens,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |cells AS (
        |  SELECT lang, source, dec, CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1, 2, 3),
        |celltot AS (
        |  SELECT lang, source, CAST(sum(c) AS BIGINT) AS n
        |  FROM cells GROUP BY 1, 2),
        |gdist AS (SELECT dec, CAST(count(*) AS BIGINT) AS g FROM base GROUP BY 1),
        |gdtot AS (SELECT CAST(count(*) AS BIGINT) AS gt FROM base),
        |grid AS (
        |  SELECT ct.lang, ct.source, ct.n, dd.dec
        |  FROM celltot ct CROSS JOIN (
        |    SELECT unnest(range(0, 10)) AS dec) dd),
        |mass AS (
        |  SELECT gr.lang, gr.source, gr.n, gr.dec,
        |         coalesce(ce.c, 0)::DOUBLE / gr.n::DOUBLE AS p,
        |         coalesce(gl.g, 0)::DOUBLE / gt.gt::DOUBLE AS q
        |  FROM grid gr
        |  LEFT JOIN cells ce ON ce.lang = gr.lang AND ce.source = gr.source
        |    AND ce.dec = gr.dec
        |  LEFT JOIN gdist gl ON gl.dec = gr.dec
        |  CROSS JOIN gdtot gt),
        |cum AS (
        |  SELECT lang, source, n, dec,
        |         abs(sum(p - q) OVER (PARTITION BY lang, source ORDER BY dec
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |           AS cumdiff
        |  FROM mass),
        |emd AS (
        |  SELECT lang, source, n,
        |         list_sum(list(cumdiff ORDER BY dec)) AS emd_sum
        |  FROM cum GROUP BY 1, 2, 3)
        |SELECT lang, source, n AS n_docs,
        |       round(emd_sum / 9.0, 6) AS t_closeness,
        |       emd_sum / 9.0 > 0.3 AS breach
        |FROM emd ORDER BY lang, source""".stripMargin,
    "a_partial_corr" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |t AS (
        |  SELECT day, x::DOUBLE AS xd, y::DOUBLE AS yd,
        |         y::DOUBLE / x::DOUBLE AS z
        |  FROM daily),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         list_sum(list(xd ORDER BY day)) AS sx,
        |         list_sum(list(yd ORDER BY day)) AS sy,
        |         list_sum(list(z ORDER BY day)) AS sz,
        |         list_sum(list(xd * yd ORDER BY day)) AS sxy,
        |         list_sum(list(xd * z ORDER BY day)) AS sxz,
        |         list_sum(list(yd * z ORDER BY day)) AS syz,
        |         list_sum(list(xd * xd ORDER BY day)) AS sxx,
        |         list_sum(list(yd * yd ORDER BY day)) AS syy,
        |         list_sum(list(z * z ORDER BY day)) AS szz
        |  FROM t),
        |rr AS (
        |  SELECT n,
        |         (n::DOUBLE * sxy - sx * sy)
        |           / (sqrt(n::DOUBLE * sxx - sx * sx)
        |              * sqrt(n::DOUBLE * syy - sy * sy)) AS rxy,
        |         (n::DOUBLE * sxz - sx * sz)
        |           / (sqrt(n::DOUBLE * sxx - sx * sx)
        |              * sqrt(n::DOUBLE * szz - sz * sz)) AS rxz,
        |         (n::DOUBLE * syz - sy * sz)
        |           / (sqrt(n::DOUBLE * syy - sy * sy)
        |              * sqrt(n::DOUBLE * szz - sz * sz)) AS ryz
        |  FROM m)
        |SELECT n AS n_days, round(rxy, 6) AS r_xy, round(rxz, 6) AS r_xz,
        |       round(ryz, 6) AS r_yz,
        |       round((rxy - rxz * ryz)
        |         / sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        |         AS partial_r_xy_given_z
        |FROM rr""".stripMargin,
    "w_hurst" -> {
      val sizes = HurstSizes.mkString(", ")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day,
         |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
         |           AS BIGINT)) AS BIGINT) AS m
         |  FROM orders GROUP BY 1),
         |idx AS (
         |  SELECT day, m,
         |         CAST(row_number() OVER (ORDER BY day) - 1 AS BIGINT) AS rk
         |  FROM daily),
         |grid AS (
         |  SELECT day, m, rk, s, rk // s AS b
         |  FROM idx CROSS JOIN (SELECT unnest([$sizes]) AS s)),
         |stats AS (
         |  SELECT s, b, CAST(count(*) AS BIGINT) AS cnt,
         |         CAST(sum(m) AS BIGINT) AS sm,
         |         sum(CAST(m AS DECIMAL(38,0)) * m) AS smm
         |  FROM grid GROUP BY 1, 2),
         |fs AS (
         |  SELECT s, b, sm::DOUBLE / s::DOUBLE AS mu,
         |         sqrt((smm::DOUBLE - sm::DOUBLE * sm::DOUBLE / s::DOUBLE)
         |           / s::DOUBLE) AS sd
         |  FROM stats WHERE cnt = s),
         |walk AS (
         |  SELECT g.s, g.b, f.sd,
         |         sum(g.m::DOUBLE - f.mu) OVER (PARTITION BY g.s, g.b
         |           ORDER BY g.rk
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |           AS rundev
         |  FROM grid g JOIN fs f ON f.s = g.s AND f.b = g.b),
         |blocks AS (
         |  SELECT s, b, sd, max(rundev) - min(rundev) AS r
         |  FROM walk GROUP BY 1, 2, 3),
         |rs AS (
         |  SELECT s, b, r / sd AS rs FROM blocks WHERE sd > 0.0),
         |persize AS (
         |  SELECT s, CAST(count(*) AS BIGINT) AS n_blocks,
         |         list_sum(list(rs ORDER BY b))
         |           / CAST(count(*) AS BIGINT)::DOUBLE AS mean_rs
         |  FROM rs GROUP BY 1),
         |pts AS (
         |  SELECT s, n_blocks, mean_rs,
         |         ln(s::DOUBLE) AS lx, ln(mean_rs) AS ly
         |  FROM persize),
         |reg AS (
         |  SELECT (CAST(count(*) AS BIGINT)::DOUBLE
         |             * list_sum(list(lx * ly ORDER BY s))
         |           - list_sum(list(lx ORDER BY s))
         |             * list_sum(list(ly ORDER BY s)))
         |         / (CAST(count(*) AS BIGINT)::DOUBLE
         |             * list_sum(list(lx * lx ORDER BY s))
         |           - list_sum(list(lx ORDER BY s))
         |             * list_sum(list(lx ORDER BY s))) AS hurst
         |  FROM pts)
         |SELECT CAST(s AS BIGINT) AS block_size, n_blocks,
         |       round(mean_rs, 6) AS mean_rs, round(hurst, 6) AS hurst
         |FROM pts CROSS JOIN reg
         |ORDER BY block_size""".stripMargin
    })
}
