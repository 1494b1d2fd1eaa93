package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 80: sequence alignment on the calendar grid,
  * sampled graph centrality, warehouse referential integrity, and a
  * QQ normality probe.
  *
  *  - w_dtw_brand_demand — dynamic-time-warping distance between two
  *    brands' monthly demand curves. The DP is INTEGER-exact end to
  *    end (costs are |Δquantity| longs), so engine and oracle agree
  *    bit-for-bit with no float-fold machinery; the corpus reduces
  *    to a months² (≈84²) DP that is calendar-bounded at any fact
  *    scale.
  *  - g_harmonic_centrality — harmonic centrality (Σ 1/d) of 4
  *    md5-sampled roots on the k-NN similarity graph via multi-root
  *    BFS — the sampled form of the exact-all-pairs computation
  *    that is infeasible at scale.
  *  - q_referential_integrity — orphan-FK audit across the four
  *    warehouse edges (lineitem→orders/part/supplier,
  *    orders→customer): the DQ check every ingest gate runs first.
  *  - a_qq_normal — QQ plot of daily revenue against the fitted
  *    normal (Acklam probit), 19-point quantile grid + the QQ
  *    correlation statistic — the visual-normality companion of
  *    a_jarque_bera's moment test.
  */
object TrainingData80 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_dtw_brand_demand — monthly quantity series for Brand#11 vs
  // Brand#12 on the union month spine (0-filled), then the full
  // n×n DP as ONE flattened row-major fold: the accumulator carries
  // (previous row, current row) as BIGINT arrays, cell k handles
  // (i, j) = (k div n, k mod n). All values are exact integers; the
  // L1 diagonal path bounds DTW from above (pinned in the spec).
  // Scale shape: the corpus reduces through one (brand, month)
  // aggregate; the DP is months²-bounded (calendar², never rows).
  // ---------------------------------------------------------------
  private val DtwBrandA = "Brand#11"
  private val DtwBrandB = "Brand#12"

  val wDtwBrandDemand: Q = (s, dir) => {
    val part = Tables.table(s, dir, "part")
      .filter(col("p_brand").isin(DtwBrandA, DtwBrandB))
      .select(col("p_partkey"), col("p_brand"))
    val bl = Tables.table(s, dir, "lineitem")
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        date_trunc("month", col("l_shipdate")).as("mon"),
        col("l_quantity").cast("long").as("q"))
      .groupBy(col("brand"), col("mon"))
      .agg(sum(col("q")).cast("long").as("q"))
      .localCheckpoint(eager = false) // spine + both series legs
    val spine = bl.select(col("mon")).distinct()
    def leg(brand: String, nm: String): DataFrame =
      spine.join(bl.filter(col("brand") === brand)
          .select(col("mon"), col("q")), Seq("mon"), "left")
        .select(col("mon"), coalesce(col("q"), lit(0L)).as(nm))
    val ser = leg(DtwBrandA, "qa").join(leg(DtwBrandB, "qb"), "mon")
      .agg(
        expr("transform(sort_array(collect_list(struct(mon, qa)))," +
          " x -> x.qa)").as("a"),
        expr("transform(sort_array(collect_list(struct(mon, qb)))," +
          " x -> x.qb)").as("b"),
        count(lit(1)).cast("int").as("n"))
    // element_at requires INT indices; `div` yields BIGINT
    val nv =
      """abs(element_at(a, CAST((k div n) + 1 AS INT))
        |     - element_at(b, CAST((k % n) + 1 AS INT))) +
        | CASE WHEN (k div n) + 1 = 1 AND (k % n) + 1 = 1
        |        THEN CAST(0 AS BIGINT)
        |      WHEN (k div n) + 1 = 1
        |        THEN element_at(st.c, CAST(k % n AS INT))
        |      WHEN (k % n) + 1 = 1 THEN element_at(st.p, 1)
        |      ELSE least(element_at(st.p, CAST((k % n) + 1 AS INT)),
        |                 element_at(st.c, CAST(k % n AS INT)),
        |                 element_at(st.p, CAST(k % n AS INT))) END"""
        .stripMargin.replaceAll("\n", " ")
    ser.select(col("n"),
        expr(s"""aggregate(
          | sequence(0, n * n - 1),
          | named_struct('p', CAST(array() AS ARRAY<BIGINT>),
          |              'c', CAST(array() AS ARRAY<BIGINT>)),
          | (st, k) -> named_struct(
          |   'p', IF((k % n) + 1 = n, concat(st.c, array($nv)), st.p),
          |   'c', IF((k % n) + 1 = n, CAST(array() AS ARRAY<BIGINT>),
          |           concat(st.c, array($nv)))),
          | st -> element_at(st.p, n))""".stripMargin.replaceAll("\n", " "))
          .as("dtw"),
        expr("aggregate(zip_with(a, b, (x, y) -> abs(x - y))," +
          " CAST(0 AS BIGINT), (s, v) -> s + v)").as("l1"))
      .select(col("n").cast("long").as("n_months"),
        col("dtw").as("dtw_distance"),
        col("l1").as("l1_distance"),
        round(d(col("dtw")) / d(col("n")), 6).as("dtw_per_month"),
        round(d(col("dtw")) / d(col("l1")), 6).as("dtw_l1_ratio"))
  }

  // ---------------------------------------------------------------
  // g_harmonic_centrality — 4 roots (smallest md5(node)), one
  // multi-root BFS: frames carry (root, node), each round is one
  // hash join + distinct + per-root anti join, localCheckpointed
  // (the g_bfs_layers loop with a root column). Harmonic = Σ_l
  // n_l/l folded layer-ascending (≤ 8 exact-count terms);
  // eccentricity = max layer reached under the cap.
  // ---------------------------------------------------------------
  val gHarmonicCentrality: Q = (s, dir) => {
    val maxHops = 8
    val edges = TrainingData5.knnUndirected(s, dir).localCheckpoint(eager = false)
    val roots = edges.select(col("src").as("node")).distinct()
      .orderBy(md5(col("node").cast("string")), col("node")).limit(4)
      .select(col("node").as("root"), col("node"))
      .localCheckpoint(eager = false)
    var frontier = roots
    var visited = roots
    val layers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var hop = 1; var done = false
    while (!done && hop <= maxHops) {
      val next = edges
        .join(frontier.select(col("root"), col("node").as("src")), Seq("src"))
        .select(col("root"), col("dst").as("node")).distinct()
        .join(visited, Seq("root", "node"), "left_anti")
        .localCheckpoint(eager = false)
      if (next.isEmpty) done = true
      else {
        layers += next.select(col("root"),
          lit(hop).cast("long").as("layer"), col("node"))
        // lazy union, no checkpoint: member frames are already
        // materialized (roots + per-hop checkpoints) — re-writing the
        // growing visited set each hop was a pure extra job per hop
        visited = visited.union(next)
        frontier = next
      }
      hop += 1
    }
    layers.reduce(_ unionAll _)
      .groupBy(col("root"), col("layer"))
      .agg(count(lit(1)).cast("long").as("nl"))
      .withColumn("term", d(col("nl")) / d(col("layer")))
      .groupBy(col("root"))
      .agg(sum(col("nl")).cast("long").as("n_reached"),
        max(col("layer")).cast("long").as("eccentricity"),
        expr("aggregate(sort_array(collect_list(struct(layer, term))), 0D," +
          " (a, q) -> a + q.term)").as("h"))
      .select(col("root"), col("n_reached"), col("eccentricity"),
        round(col("h"), 6).as("harmonic_centrality"))
      .orderBy(col("root"))
  }

  // ---------------------------------------------------------------
  // q_referential_integrity — per FK edge: child rows, orphan rows
  // (left-anti against the parent key), orphan rate. Anti joins
  // hash on the key; parents project keys only. The audit a 100 TB
  // ingest runs before anything else trusts the joins.
  // ---------------------------------------------------------------
  val qReferentialIntegrity: Q = (s, dir) => {
    def edge(child: String, ck: String, parent: String,
        pk: String): DataFrame = {
      val c = Tables.table(s, dir, child).select(col(ck).as("k"))
        .localCheckpoint(eager = false) // total + anti-join legs share one scan
      val p = Tables.table(s, dir, parent).select(col(pk).as("k"))
      val tot = c.agg(count(lit(1)).cast("long").as("n_child_rows"))
      val orp = c.join(p, Seq("k"), "left_anti")
        .agg(count(lit(1)).cast("long").as("n_orphans"))
      tot.crossJoin(orp)
        .select(lit(s"$child.$ck").as("child_key"),
          lit(s"$parent.$pk").as("parent_key"),
          col("n_child_rows"), col("n_orphans"))
    }
    edge("lineitem", "l_orderkey", "orders", "o_orderkey")
      .unionAll(edge("lineitem", "l_partkey", "part", "p_partkey"))
      .unionAll(edge("lineitem", "l_suppkey", "supplier", "s_suppkey"))
      .unionAll(edge("orders", "o_custkey", "customer", "c_custkey"))
      .select(col("child_key"), col("parent_key"),
        col("n_child_rows").cast("long").as("n_child_rows"),
        col("n_orphans").cast("long").as("n_orphans"),
        round(d(col("n_orphans")) / d(col("n_child_rows")), 6)
          .as("orphan_rate"),
        when(col("n_orphans") === 0L, "intact").otherwise(lit("broken"))
          .as("verdict"))
      .orderBy(col("child_key"))
  }

  // ---------------------------------------------------------------
  // a_qq_normal — daily revenue vs the fitted normal on a 19-point
  // quantile grid: exact order statistics off value-level
  // cumulative counts, μ/σ from exact decimal moments (variance
  // through the ÷10⁶ quantization rule — the Granger discipline),
  // z_p by Acklam probit, and the QQ correlation across the grid.
  // ---------------------------------------------------------------
  private val QqGrid: Seq[Double] = (1 to 19).map(_ * 0.05)

  val aQqNormal: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .localCheckpoint(eager = false) // moments + quantile pass
    val mo = daily.agg(count(lit(1)).cast("long").as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      // widen BEFORE multiplying: day-grain revenue cents square
      // past Long at the 10× probe scale (ANSI overflow)
      sum(col("x").cast("decimal(38,0)") * col("x"))
        .cast("decimal(38,0)").as("sxx"))
      .withColumn("mean_c",
        d(expr("CAST((sx * 1000000) div n AS BIGINT)")) / lit(1.0e6))
      .withColumn("var_c",
        d(expr("CAST(((CAST(n AS DECIMAL(38,0)) * sxx - sx * sx)" +
          " div (n * (n - 1))) div 1000000 AS BIGINT)")) * lit(1.0e6))
      .withColumn("sd_c", sqrt(col("var_c")))
    val w = Grain.bounded(col("x"))
    val cum = daily.groupBy(col("x"))
      .agg(count(lit(1)).cast("long").as("c"))
      .withColumn("cum", sum(col("c")).over(w).cast("long"))
    val grid = cum.crossJoin(broadcast(mo))
      .select(col("x"), col("cum"), col("n"), col("mean_c"), col("sd_c"),
        explode(array(QqGrid.map(lit): _*)).as("p"))
      .filter(col("cum") >= ceil(col("p") * d(col("n"))).cast("long"))
      .groupBy(col("p"), col("n"), col("mean_c"), col("sd_c"))
      .agg(min(col("x")).as("q_c"))
    val z = probitCol(col("p"))
    val pts = grid
      .select(col("p"), col("n"), col("q_c"), col("mean_c"), col("sd_c"),
        z.as("z"))
      .localCheckpoint(eager = false) // rows + the correlation fold
    val corr = pts
      .select(col("p"), d(col("q_c")).as("q"), col("z"))
      .agg(count(lit(1)).cast("long").as("k"),
        expr("aggregate(sort_array(collect_list(struct(p, q))), 0D," +
          " (a, x) -> a + x.q)").as("sq"),
        expr("aggregate(sort_array(collect_list(struct(p, z))), 0D," +
          " (a, x) -> a + x.z)").as("sz"),
        expr("aggregate(sort_array(collect_list(struct(p, q * q AS v))), 0D," +
          " (a, x) -> a + x.v)").as("sqq"),
        expr("aggregate(sort_array(collect_list(struct(p, z * z AS v))), 0D," +
          " (a, x) -> a + x.v)").as("szz"),
        expr("aggregate(sort_array(collect_list(struct(p, q * z AS v))), 0D," +
          " (a, x) -> a + x.v)").as("sqz"))
      .select(((d(col("k")) * col("sqz") - col("sq") * col("sz")) /
        (sqrt(d(col("k")) * col("sqq") - col("sq") * col("sq")) *
          sqrt(d(col("k")) * col("szz") - col("sz") * col("sz"))))
        .as("qq_corr"))
    pts.crossJoin(broadcast(corr))
      .select(round(col("p"), 2).as("p"),
        round(col("z"), 6).as("z_theoretical"),
        round(d(col("q_c")) / 100.0, 6).as("sample_usd"),
        round((col("mean_c") + col("sd_c") * col("z")) / 100.0, 6)
          .as("fitted_usd"),
        round(col("qq_corr"), 6).as("qq_corr"))
      .orderBy(col("p"))
  }

  /** Acklam's Φ⁻¹ (the a_bootstrap_bca coefficients, verbatim). */
  private def probitCol(p: Column): Column = {
    val pl = 0.02425
    def central: Column = {
      val q = p - 0.5; val r = q * q
      (((((lit(-39.69683028665376) * r + 220.9460984245205) * r +
        -275.9285104469687) * r + 138.357751867269) * r +
        -30.66479806614716) * r + 2.506628277459239) * q /
        ((((((lit(-54.47609879822406) * r + 161.5858368580409) * r +
          -155.6989798598866) * r + 66.80131188771972) * r +
          -13.28068155288572) * r) + 1.0)
    }
    def tail(pp: Column): Column = {
      val q = sqrt(lit(-2.0) * log(pp))
      (((((lit(-0.007784894002430293) * q + -0.3223964580411365) * q +
        -2.400758277161838) * q + -2.549732539343734) * q +
        4.374664141464968) * q + 2.938163982698783) /
        (((((lit(0.007784695709041462) * q + 0.3224671290700398) * q +
          2.445134137142996) * q + 3.754408661907416) * q) + 1.0)
    }
    when(p < pl, tail(p))
      .when(p > 1.0 - pl, -tail(lit(1.0) - p))
      .otherwise(central)
  }

  private def probitSql(p: String): String = {
    val central =
      s"""((((((-39.69683028665376) * (($p - 0.5) * ($p - 0.5))
         |  + 220.9460984245205) * (($p - 0.5) * ($p - 0.5))
         |  + (-275.9285104469687)) * (($p - 0.5) * ($p - 0.5))
         |  + 138.357751867269) * (($p - 0.5) * ($p - 0.5))
         |  + (-30.66479806614716)) * (($p - 0.5) * ($p - 0.5))
         |  + 2.506628277459239) * ($p - 0.5)
         |/ ((((((-54.47609879822406) * (($p - 0.5) * ($p - 0.5))
         |  + 161.5858368580409) * (($p - 0.5) * ($p - 0.5))
         |  + (-155.6989798598866)) * (($p - 0.5) * ($p - 0.5))
         |  + 66.80131188771972) * (($p - 0.5) * ($p - 0.5))
         |  + (-13.28068155288572)) * (($p - 0.5) * ($p - 0.5)) + 1.0)"""
        .stripMargin.replaceAll("\n", " ")
    def tail(pp: String) =
      s"""(((((((-0.007784894002430293) * sqrt(-2.0 * ln($pp))
         |  + (-0.3223964580411365)) * sqrt(-2.0 * ln($pp))
         |  + (-2.400758277161838)) * sqrt(-2.0 * ln($pp))
         |  + (-2.549732539343734)) * sqrt(-2.0 * ln($pp))
         |  + 4.374664141464968) * sqrt(-2.0 * ln($pp))
         |  + 2.938163982698783)
         |/ (((((0.007784695709041462 * sqrt(-2.0 * ln($pp))
         |  + 0.3224671290700398) * sqrt(-2.0 * ln($pp))
         |  + 2.445134137142996) * sqrt(-2.0 * ln($pp))
         |  + 3.754408661907416) * sqrt(-2.0 * ln($pp))) + 1.0))"""
        .stripMargin.replaceAll("\n", " ")
    s"""CASE WHEN $p < 0.02425 THEN ${tail(p)}
       |     WHEN $p > 0.97575 THEN -${tail(s"(1.0 - $p)")}
       |     ELSE $central END""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "w_dtw_brand_demand" -> wDtwBrandDemand,
    "g_harmonic_centrality" -> gHarmonicCentrality,
    "q_referential_integrity" -> qReferentialIntegrity,
    "a_qq_normal" -> aQqNormal)

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** Multi-root BFS rounds carrying the root column. */
  private def mrBfsRounds(n: Int): String =
    (1 to n).map { i =>
      s"""l$i AS MATERIALIZED (
         |  SELECT DISTINCT f.root, e.dst AS node FROM p0 e
         |  JOIN l${i - 1} f ON e.src = f.node
         |  WHERE NOT EXISTS (SELECT 1 FROM v${i - 1} x
         |                    WHERE x.root = f.root AND x.node = e.dst)),
         |v$i AS MATERIALIZED (
         |  SELECT root, node FROM v${i - 1}
         |  UNION SELECT root, node FROM l$i)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "w_dtw_brand_demand" ->
      s"""WITH RECURSIVE bl AS (
         |  SELECT p.p_brand AS brand,
         |         date_trunc('month', l.l_shipdate) AS mon,
         |         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  WHERE p.p_brand IN ('$DtwBrandA', '$DtwBrandB')
         |  GROUP BY 1, 2),
         |spine AS (SELECT DISTINCT mon FROM bl),
         |ser AS (
         |  SELECT list(coalesce(a.q, 0) ORDER BY s.mon) AS a,
         |         list(coalesce(b.q, 0) ORDER BY s.mon) AS b,
         |         CAST(count(*) AS BIGINT) AS n
         |  FROM spine s
         |  LEFT JOIN bl a ON a.mon = s.mon AND a.brand = '$DtwBrandA'
         |  LEFT JOIN bl b ON b.mon = s.mon AND b.brand = '$DtwBrandB'),
         |dp AS (
         |  SELECT CAST(0 AS BIGINT) AS k,
         |         CAST([] AS BIGINT[]) AS pr, CAST([] AS BIGINT[]) AS cr,
         |         a, b, n
         |  FROM ser
         |  UNION ALL
         |  SELECT k + 1,
         |         CASE WHEN (k % n) + 1 = n THEN list_append(cr, nv)
         |              ELSE pr END,
         |         CASE WHEN (k % n) + 1 = n THEN CAST([] AS BIGINT[])
         |              ELSE list_append(cr, nv) END,
         |         a, b, n
         |  FROM (
         |    SELECT dp.*,
         |           abs(a[CAST(k // n AS INT) + 1]
         |               - b[CAST(k % n AS INT) + 1]) +
         |           CASE WHEN k // n + 1 = 1 AND (k % n) + 1 = 1
         |                  THEN CAST(0 AS BIGINT)
         |                WHEN k // n + 1 = 1
         |                  THEN cr[CAST(k % n AS INT)]
         |                WHEN (k % n) + 1 = 1 THEN pr[1]
         |                ELSE least(pr[CAST(k % n AS INT) + 1],
         |                           cr[CAST(k % n AS INT)],
         |                           pr[CAST(k % n AS INT)]) END AS nv
         |    FROM dp WHERE k < n * n)),
         |fin AS (
         |  SELECT n, pr[CAST(n AS INT)] AS dtw FROM dp WHERE k = n * n),
         |l1_ AS (
         |  SELECT CAST(list_sum(list_transform(range(1, CAST(n AS INT) + 1),
         |    i -> abs(a[i] - b[i]))) AS BIGINT) AS l1
         |  FROM ser)
         |SELECT f.n AS n_months, CAST(f.dtw AS BIGINT) AS dtw_distance,
         |       l.l1 AS l1_distance,
         |       round(CAST(f.dtw AS DOUBLE) / CAST(f.n AS DOUBLE), 6)
         |         AS dtw_per_month,
         |       round(CAST(f.dtw AS DOUBLE) / CAST(l.l1 AS DOUBLE), 6)
         |         AS dtw_l1_ratio
         |FROM fin f CROSS JOIN l1_ l""".stripMargin,
    "g_harmonic_centrality" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |p0 AS MATERIALIZED (SELECT src, dst FROM edges UNION
         |       SELECT dst, src FROM edges),
         |roots AS MATERIALIZED (
         |  SELECT node AS root, node FROM (
         |    SELECT DISTINCT src AS node FROM p0)
         |  ORDER BY md5(CAST(node AS VARCHAR)), node LIMIT 4),
         |l0 AS (SELECT root, node FROM roots),
         |v0 AS (SELECT root, node FROM roots),
         |${mrBfsRounds(8)},
         |census AS (
         |  ${(1 to 8).map(i =>
            s"SELECT root, $i AS layer, CAST(count(*) AS BIGINT) AS nl" +
              s" FROM l$i GROUP BY root HAVING count(*) > 0")
            .mkString("\n  UNION ALL\n  ")})
         |SELECT root, CAST(sum(nl) AS BIGINT) AS n_reached,
         |       CAST(max(layer) AS BIGINT) AS eccentricity,
         |       round(list_sum(list(CAST(nl AS DOUBLE)
         |         / CAST(layer AS DOUBLE) ORDER BY layer)), 6)
         |         AS harmonic_centrality
         |FROM census GROUP BY root ORDER BY root""".stripMargin,
    "q_referential_integrity" ->
      """WITH e AS (
        |  SELECT 'lineitem.l_orderkey' AS child_key,
        |         'orders.o_orderkey' AS parent_key,
        |         (SELECT count(*) FROM lineitem) AS n_child_rows,
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                            WHERE o.o_orderkey = l.l_orderkey))
        |           AS n_orphans
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', 'part.p_partkey',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM part p
        |                            WHERE p.p_partkey = l.l_partkey))
        |  UNION ALL
        |  SELECT 'lineitem.l_suppkey', 'supplier.s_suppkey',
        |         (SELECT count(*) FROM lineitem),
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM supplier s
        |                            WHERE s.s_suppkey = l.l_suppkey))
        |  UNION ALL
        |  SELECT 'orders.o_custkey', 'customer.c_custkey',
        |         (SELECT count(*) FROM orders),
        |         (SELECT count(*) FROM orders o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey)))
        |SELECT child_key, parent_key,
        |       CAST(n_child_rows AS BIGINT) AS n_child_rows,
        |       CAST(n_orphans AS BIGINT) AS n_orphans,
        |       round(CAST(n_orphans AS DOUBLE)
        |         / CAST(n_child_rows AS DOUBLE), 6) AS orphan_rate,
        |       CASE WHEN n_orphans = 0 THEN 'intact' ELSE 'broken' END
        |         AS verdict
        |FROM e ORDER BY child_key""".stripMargin,
    "a_qq_normal" -> {
      val grid = QqGrid.mkString(", ")
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x
         |  FROM orders GROUP BY 1),
         |mo AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CAST(x AS HUGEINT)) * 1000000
         |           // count(*) AS BIGINT) / 1.0e6 AS mean_c,
         |         CAST((CAST(count(*) AS HUGEINT)
         |             * sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
         |             - CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT)
         |               * CAST(sum(CAST(x AS HUGEINT)) AS HUGEINT))
         |           // (count(*) * (count(*) - 1)) // 1000000 AS BIGINT)
         |           * 1.0e6 AS var_c
         |  FROM daily),
         |cum AS (
         |  SELECT x, CAST(sum(count(*)) OVER (ORDER BY x) AS BIGINT) AS cum
         |  FROM daily GROUP BY x),
         |g AS (SELECT CAST(unnest([$grid]) AS DOUBLE) AS p),
         |qs AS (
         |  SELECT g.p, min(c.x) AS q_c, mo.n, mo.mean_c,
         |         sqrt(mo.var_c) AS sd_c
         |  FROM g CROSS JOIN mo
         |  JOIN cum c ON c.cum >= CAST(ceil(g.p * CAST(mo.n AS DOUBLE))
         |    AS BIGINT)
         |  GROUP BY g.p, mo.n, mo.mean_c, mo.var_c),
         |pts AS (
         |  SELECT p, q_c, mean_c, sd_c, ${probitSql("p")} AS z FROM qs),
         |corr_ AS (
         |  SELECT (CAST(count(*) AS DOUBLE)
         |           * list_sum(list(CAST(q_c AS DOUBLE) * z ORDER BY p))
         |         - list_sum(list(CAST(q_c AS DOUBLE) ORDER BY p))
         |           * list_sum(list(z ORDER BY p)))
         |        / (sqrt(CAST(count(*) AS DOUBLE)
         |             * list_sum(list(CAST(q_c AS DOUBLE)
         |                 * CAST(q_c AS DOUBLE) ORDER BY p))
         |           - list_sum(list(CAST(q_c AS DOUBLE) ORDER BY p))
         |             * list_sum(list(CAST(q_c AS DOUBLE) ORDER BY p)))
         |          * sqrt(CAST(count(*) AS DOUBLE)
         |              * list_sum(list(z * z ORDER BY p))
         |            - list_sum(list(z ORDER BY p))
         |              * list_sum(list(z ORDER BY p)))) AS qq_corr
         |  FROM pts)
         |SELECT round(p, 2) AS p, round(z, 6) AS z_theoretical,
         |       round(CAST(q_c AS DOUBLE) / 100.0, 6) AS sample_usd,
         |       round((mean_c + sd_c * z) / 100.0, 6) AS fitted_usd,
         |       round(c.qq_corr, 6) AS qq_corr
         |FROM pts CROSS JOIN corr_ c
         |ORDER BY p""".stripMargin
    })
}
