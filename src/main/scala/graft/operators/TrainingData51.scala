package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 46: upper/lower tail dependence between order
  * volume and revenue (the copula diagnostic — correlation says
  * nothing about whether EXTREMES co-occur), seasonal/trend strength
  * (Hyndman's F-statistics over the registered classical
  * decomposition — one number each for "how seasonal, how trended"),
  * and the rich-club coefficient of the k-NN graph (do
  * high-degree nodes preferentially interconnect — the hub-cartel
  * structure hubness audits suspect). All Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData51 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_tail_dependence — empirical tail-dependence estimates between
  // daily order count (x) and daily revenue (y): λ_U = P(y > q95_y |
  // x > q95_x), λ_L with both below q05 — the co-crash/co-boom
  // probability a Pearson r hides. Thresholds are type-1 quantiles
  // (value at rank ⌈q·n⌉, day tiebreak — the w_pot_gpd rule). Scale
  // shape: the corpus reduces to the calendar-bounded daily series;
  // both threshold picks are rank filters over it; the conditional
  // counts are one aggregate of exact integers.
  // ---------------------------------------------------------------
  val aTailDependence: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(count(lit(1)).cast("long").as("x"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).cast("long").as("y"))
      .localCheckpoint(eager = false) // two rank picks AND the count pass
    val n = daily.agg(count(lit(1)).cast("long").as("n"))
    def thresh(c: String, q: Double, out: String): DataFrame =
      daily.withColumn("rk",
          row_number().over(Grain.bounded(col(c), col("day"))).cast("long"))
        .crossJoin(broadcast(n))
        .filter(col("rk") === ceil(lit(q) * d(col("n"))).cast("long"))
        .select(col(c).as(out))
    val qs = thresh("x", 0.95, "qx_hi").crossJoin(thresh("y", 0.95, "qy_hi"))
      .crossJoin(thresh("x", 0.05, "qx_lo")).crossJoin(thresh("y", 0.05, "qy_lo"))
    daily.crossJoin(broadcast(qs)).crossJoin(broadcast(n))
      .agg(max(col("n")).as("n_days"),
        sum(when(col("x") > col("qx_hi"), 1L).otherwise(0L))
          .cast("long").as("n_x_hi"),
        sum(when(col("x") > col("qx_hi") && col("y") > col("qy_hi"), 1L)
          .otherwise(0L)).cast("long").as("n_both_hi"),
        sum(when(col("x") < col("qx_lo"), 1L).otherwise(0L))
          .cast("long").as("n_x_lo"),
        sum(when(col("x") < col("qx_lo") && col("y") < col("qy_lo"), 1L)
          .otherwise(0L)).cast("long").as("n_both_lo"))
      .select(col("n_days"), col("n_x_hi"), col("n_both_hi"),
        col("n_x_lo"), col("n_both_lo"),
        when(col("n_x_hi") > 0,
          round(d(col("n_both_hi")) / d(col("n_x_hi")), 6)).as("lambda_upper"),
        when(col("n_x_lo") > 0,
          round(d(col("n_both_lo")) / d(col("n_x_lo")), 6)).as("lambda_lower"))
  }

  // ---------------------------------------------------------------
  // w_season_strength — Hyndman's strength statistics over the
  // registered classical decomposition (w_seasonal_decompose's exact
  // trend/seasonal/residual construction, replicated expression for
  // expression): F_seasonal = max(0, 1 − Var(R)/Var(S+R)),
  // F_trend = max(0, 1 − Var(R)/Var(T+R)) — each in [0,1], the
  // one-number summary the decomposition's row stream doesn't give.
  // Scale shape: identical to the decomposition (calendar-bounded
  // windows + folds); the variances are day-ordered sorted folds of
  // the component series; round-6.
  // ---------------------------------------------------------------
  val wSeasonStrength: Q = (s, dir) => {
    val w = Window.partitionBy(col("yr")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("SUM(CAST(o_totalprice AS DECIMAL(18,2)))").as("rev"))
      .withColumn("yr", year(col("day")))
      .withColumn("trend",
        when(count(lit(1)).over(w) === 7,
          expr("CAST(SUM(rev) OVER (PARTITION BY yr ORDER BY day" +
            " ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS DOUBLE)") / 7.0))
      .withColumn("detr", d(col("rev")) - col("trend"))
      .localCheckpoint(eager = false) // dow means AND the strength pass
    val dowM = daily.filter(col("detr").isNotNull)
      .groupBy(dayofweek(col("day")).as("dow"))
      .agg(count(lit(1)).as("n"),
        expr("aggregate(sort_array(collect_list(struct(day, detr))), 0D," +
          " (a, x) -> a + x.detr)").as("sd"))
      .withColumn("m", col("sd") / d(col("n")))
      .localCheckpoint(eager = false)
    val grand = dowM.agg((expr(
      "aggregate(sort_array(collect_list(struct(dow, m))), 0D," +
        " (a, x) -> a + x.m)") / d(count(lit(1)))).as("gm"))
    val comp = daily.filter(col("detr").isNotNull)
      .join(broadcast(dowM.select(col("dow"), col("m"))),
        dayofweek(col("day")) === col("dow"), "left")
      .crossJoin(broadcast(grand))
      .select(col("day"),
        (col("m") - col("gm")).as("seas"),
        (col("detr") - (col("m") - col("gm"))).as("resid"),
        col("detr"),
        (d(col("rev")) - (col("m") - col("gm"))).as("deseas"))
    def varOf(v: String): Column = {
      val sv = expr(s"aggregate(sort_array(collect_list(struct(day, $v)))," +
        s" 0D, (a, q) -> a + q.$v)")
      val svv = expr(s"aggregate(sort_array(collect_list(struct(day," +
        s" $v * $v))), 0D, (a, q) -> a + q.col2)")
      (svv - sv * sv / d(count(lit(1)))) / d(count(lit(1)))
    }
    comp.agg(count(lit(1)).cast("long").as("n_days_used"),
        varOf("resid").as("var_r"), varOf("detr").as("var_sr"),
        varOf("deseas").as("var_tr"))
      .select(col("n_days_used"),
        round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_sr")), 6)
          .as("f_seasonal"),
        round(greatest(lit(0.0), lit(1.0) - col("var_r") / col("var_tr")), 6)
          .as("f_trend"))
  }

  // ---------------------------------------------------------------
  // g_rich_club — rich-club coefficient of the symmetrized k-NN
  // graph: φ(k) = E_{>k} / (N_{>k}(N_{>k}−1)) over ordered pairs —
  // the density of the subgraph induced by nodes of degree > k
  // (Zhou & Mondragón 2004). Rising φ(k) = hubs interconnect (the
  // cartel ANN recall audits fear); flat = degree mixing is neutral.
  // Scale shape: bounded edge set + degree join; the k grid is a
  // constant 4× fan-out over the (already small) edge stream; all
  // integer counts, one division.
  // ---------------------------------------------------------------
  private val RichKs = Seq(2L, 3L, 4L, 5L)

  val gRichClub: Q = (s, dir) => {
    val e = TrainingData35.knnDirectedEdges(s, dir)
      .select(col("src"), col("dst"))
    val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(eager = false) // degrees AND the rich-edge count
    val deg = und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).cast("long").as("deg"))
      .localCheckpoint(eager = false) // node counts per k AND both edge-side joins
    val ks = RichKs.map(lit)
    val rich = deg.select(col("id"), col("deg"),
        explode(array(ks: _*)).as("k"))
      .filter(col("deg") > col("k"))
    val nRich = rich.groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_rich"))
    val edges = und
      .join(deg.select(col("id").as("src"), col("deg").as("ds")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("dd")), Seq("dst"))
      .select(col("ds"), col("dd"), explode(array(ks: _*)).as("k"))
      .filter(col("ds") > col("k") && col("dd") > col("k"))
      .groupBy(col("k")).agg(count(lit(1)).cast("long").as("e_rich"))
    nRich.join(edges, Seq("k"), "left")
      .na.fill(0L, Seq("e_rich"))
      .select(col("k"), col("n_rich"), (col("e_rich") / 2).cast("long")
          .as("n_und_edges"),
        when(col("n_rich") > 1,
          round(d(col("e_rich")) / (d(col("n_rich")) * (d(col("n_rich")) -
            lit(1.0))), 6)).as("phi"))
      .orderBy(col("k"))
  }

  val queries: Map[String, Q] = Map(
    "a_tail_dependence" -> aTailDependence,
    "w_season_strength" -> wSeasonStrength,
    "g_rich_club" -> gRichClub)

  val oracles: Map[String, String] = Map(
    "a_tail_dependence" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day, CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS y
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |qxh AS (
        |  SELECT x AS qx_hi FROM (
        |    SELECT x, CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS rk
        |    FROM daily) CROSS JOIN n
        |  WHERE rk = CAST(ceil(0.95 * n::DOUBLE) AS BIGINT)),
        |qyh AS (
        |  SELECT y AS qy_hi FROM (
        |    SELECT y, CAST(row_number() OVER (ORDER BY y, day) AS BIGINT) AS rk
        |    FROM daily) CROSS JOIN n
        |  WHERE rk = CAST(ceil(0.95 * n::DOUBLE) AS BIGINT)),
        |qxl AS (
        |  SELECT x AS qx_lo FROM (
        |    SELECT x, CAST(row_number() OVER (ORDER BY x, day) AS BIGINT) AS rk
        |    FROM daily) CROSS JOIN n
        |  WHERE rk = CAST(ceil(0.05 * n::DOUBLE) AS BIGINT)),
        |qyl AS (
        |  SELECT y AS qy_lo FROM (
        |    SELECT y, CAST(row_number() OVER (ORDER BY y, day) AS BIGINT) AS rk
        |    FROM daily) CROSS JOIN n
        |  WHERE rk = CAST(ceil(0.05 * n::DOUBLE) AS BIGINT)),
        |agg AS (
        |  SELECT max(n.n) AS n_days,
        |         CAST(sum(CASE WHEN x > qx_hi THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_x_hi,
        |         CAST(sum(CASE WHEN x > qx_hi AND y > qy_hi THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_both_hi,
        |         CAST(sum(CASE WHEN x < qx_lo THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_x_lo,
        |         CAST(sum(CASE WHEN x < qx_lo AND y < qy_lo THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_both_lo
        |  FROM daily CROSS JOIN qxh CROSS JOIN qyh CROSS JOIN qxl
        |  CROSS JOIN qyl CROSS JOIN n)
        |SELECT n_days, n_x_hi, n_both_hi, n_x_lo, n_both_lo,
        |       CASE WHEN n_x_hi > 0 THEN
        |         round(n_both_hi::DOUBLE / n_x_hi::DOUBLE, 6) END
        |         AS lambda_upper,
        |       CASE WHEN n_x_lo > 0 THEN
        |         round(n_both_lo::DOUBLE / n_x_lo::DOUBLE, 6) END
        |         AS lambda_lower
        |FROM agg""".stripMargin,
    "w_season_strength" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |         year(o_orderdate) AS yr
        |  FROM orders GROUP BY 1, 3),
        |tr AS (
        |  SELECT day, rev, yr,
        |         CASE WHEN count(*) OVER w7 = 7 THEN
        |           CAST(SUM(rev) OVER w7 AS DOUBLE) / 7.0 END AS trend
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY yr ORDER BY day
        |    ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |de AS (
        |  SELECT day, rev, CAST(rev AS DOUBLE) - trend AS detr
        |  FROM tr WHERE trend IS NOT NULL),
        |dowm AS (
        |  SELECT dayofweek(day) + 1 AS dow, count(*) AS n,
        |         list_sum(list(detr ORDER BY day)) AS sd
        |  FROM de GROUP BY 1),
        |dm AS (SELECT dow, sd / n AS m FROM dowm),
        |grand AS (
        |  SELECT list_sum(list(m ORDER BY dow)) / count(*) AS gm FROM dm),
        |comp AS (
        |  SELECT d.day, d.detr,
        |         d.detr - (m.m - g.gm) AS resid,
        |         CAST(d.rev AS DOUBLE) - (m.m - g.gm) AS deseas
        |  FROM de d
        |  LEFT JOIN dm m ON m.dow = dayofweek(d.day) + 1
        |  CROSS JOIN grand g),
        |v AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days_used,
        |         (list_sum(list(resid * resid ORDER BY day))
        |           - list_sum(list(resid ORDER BY day))
        |             * list_sum(list(resid ORDER BY day))
        |             / CAST(count(*) AS DOUBLE))
        |           / CAST(count(*) AS DOUBLE) AS var_r,
        |         (list_sum(list(detr * detr ORDER BY day))
        |           - list_sum(list(detr ORDER BY day))
        |             * list_sum(list(detr ORDER BY day))
        |             / CAST(count(*) AS DOUBLE))
        |           / CAST(count(*) AS DOUBLE) AS var_sr,
        |         (list_sum(list(deseas * deseas ORDER BY day))
        |           - list_sum(list(deseas ORDER BY day))
        |             * list_sum(list(deseas ORDER BY day))
        |             / CAST(count(*) AS DOUBLE))
        |           / CAST(count(*) AS DOUBLE) AS var_tr
        |  FROM comp)
        |SELECT n_days_used,
        |       round(greatest(0.0, 1.0 - var_r / var_sr), 6) AS f_seasonal,
        |       round(greatest(0.0, 1.0 - var_r / var_tr), 6) AS f_trend
        |FROM v""".stripMargin,
    "g_rich_club" -> {
      val ks = RichKs.mkString(", ")
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT dst, src FROM edges),
         |deg AS (
         |  SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |  FROM und GROUP BY 1),
         |kk AS (SELECT unnest([$ks]) AS k),
         |nrich AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS n_rich
         |  FROM deg CROSS JOIN kk WHERE deg > k GROUP BY 1),
         |erich AS (
         |  SELECT k, CAST(count(*) AS BIGINT) AS e_rich
         |  FROM und u
         |  JOIN deg ds ON ds.id = u.src
         |  JOIN deg dd ON dd.id = u.dst
         |  CROSS JOIN kk
         |  WHERE ds.deg > k AND dd.deg > k
         |  GROUP BY 1)
         |SELECT CAST(n.k AS BIGINT) AS k, n.n_rich,
         |       coalesce(e.e_rich, 0) // 2 AS n_und_edges,
         |       CASE WHEN n.n_rich > 1 THEN
         |         round(coalesce(e.e_rich, 0)::DOUBLE
         |           / (n.n_rich::DOUBLE * (n.n_rich::DOUBLE - 1.0)), 6)
         |       END AS phi
         |FROM nrich n LEFT JOIN erich e ON e.k = n.k
         |ORDER BY k""".stripMargin
    })
}
