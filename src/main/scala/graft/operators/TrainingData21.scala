package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 16: four new capability classes — offline
  * changepoint detection (binary segmentation over daily revenue),
  * a from-scratch mergeable HyperLogLog register sketch with a
  * merge-associativity audit, a grid-bucketed spatial k-NN join
  * (the cell-pruned shape every geo pipeline uses), and a
  * cost-based-optimizer cardinality-estimate audit over the star's
  * join edges. All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData21 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_changepoint_binseg — one binary-segmentation step (Scott &
  // Knott 1974 / the first split of PELT-style detectors) per year
  // on the daily-revenue series: the split k maximizing the
  // between-segment score s_L²/n_L + s_R²/n_R (equivalently
  // minimizing pooled SSE — the Σx² term cancels, so the score
  // needs only cumulative sums). Cross-engine determinism: daily
  // sums are exact integer cents; each cents total stays below 2⁵³
  // (one well-defined BIGINT→double conversion), and the score is
  // the identical IEEE expression (sL·sL)/nL + (sR·sR)/nR in both
  // engines, argmax tie-broken on earliest k. Segment means leave
  // integer space through the micro-unit integral division (the
  // a_var_merge rule). Scale shape: one day-level aggregate
  // (map-side combining), then per-year window passes over ≤366
  // rows — partition-parallel, never a data-wide window; the
  // candidate-split frame is calendar-bounded regardless of corpus.
  // ---------------------------------------------------------------
  val wChangepointBinseg: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("yr"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).cast("long")
        .as("rev"))
    val wOrd = Window.partitionBy(col("yr")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("yr"))
    val scored = daily
      .withColumn("k", row_number().over(wOrd).cast("long"))
      .withColumn("s_l", sum(col("rev")).over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("rev")).over(wAll))
      .withColumn("next_day", lead(col("day"), 1).over(wOrd))
      .filter(col("k") < col("n"))
      .withColumn("s_r", col("s") - col("s_l"))
      .withColumn("n_r", col("n") - col("k"))
      .withColumn("score",
        d(col("s_l")) * d(col("s_l")) / d(col("k")) +
          d(col("s_r")) * d(col("s_r")) / d(col("n_r")))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("yr")).orderBy(desc("score"), col("k"))))
      .filter(col("rk") === 1)
      .select(col("yr"), col("n").as("n_days"),
        col("next_day").as("changepoint_day"), col("k").as("n_days_before"),
        (expr("CAST((s_l * 10000) div k AS BIGINT)") / lit(1000000.0))
          .as("mean_before"),
        (expr("CAST((s_r * 10000) div n_r AS BIGINT)") / lit(1000000.0))
          .as("mean_after"),
        round((col("score") - d(col("s")) * d(col("s")) / d(col("n"))) /
          lit(10000.0), 6).as("gain"))
      .orderBy(col("yr"))
  }

  // ---------------------------------------------------------------
  // a_hll_registers — HyperLogLog from first principles (Flajolet et
  // al. 2007): m = 64 registers, register index = 6 bits of the
  // value hash, register value = leading-zero rank of the remaining
  // 52-bit window, estimate = α·m²/Σ2^(−M_j) with the linear-
  // counting small-range correction. The leading-zero rank is
  // computed EXACTLY from the hex string (leading '0' run + a
  // 16-case nibble bit-length), never via log2 of a float; the
  // harmonic sum folds 64 exact powers of two in register order
  // (sorted-fold policy); only the final α·m²/Σ and the ln of the
  // linear-counting branch touch libm (round 6, the bm25 rule).
  // The merge audit recomputes registers from per-half partial
  // sketches (max-merge) and pins that the merged estimate is
  // bit-identical — the property that lets 1000 executors sketch
  // independently and combine. Scale shape: one map-side-combining
  // aggregate to (group, register), then bounded 64-row folds.
  // ---------------------------------------------------------------
  /** The (grp, reg, rnk, half) hash decomposition — shared with the
    * streaming HLL twin (EventStreams.hllStream), which must sketch
    * the SAME registers for the batch≡stream pin to be meaningful. */
  private[graft] def hllBase(s: SparkSession, dir: String): DataFrame = {
    val m = 64
    val hex = md5(col("o_custkey").cast("string"))
    val w13 = substring(hex, 1, 13) // 52-bit window, exact in double
    val zeros = length(regexp_extract(w13, "^(0*)", 1))
    val nib = conv(substring(w13, zeros + 1, lit(1)), 16, 10).cast("int")
    val nibBits = when(nib >= 8, 4).when(nib >= 4, 3)
      .when(nib >= 2, 2).when(nib >= 1, 1).otherwise(0)
    val rank = (zeros * 4 + (lit(4) - nibBits) + 1).cast("int")
    Tables.table(s, dir, "orders")
      .select(col("o_orderpriority").as("grp"), col("o_custkey"),
        (conv(substring(hex, 14, 2), 16, 10).cast("long") % m).cast("int")
          .as("reg"),
        rank.as("rnk"), (col("o_orderkey") % 2).cast("int").as("half"))
  }

  val aHllRegisters: Q = (s, dir) => {
    val m = 64
    val base = hllBase(s, dir)
    // direct sketch and the two half sketches merged by register max
    val direct = base.groupBy(col("grp"), col("reg"))
      .agg(max(col("rnk")).as("mx"))
    val merged = base.groupBy(col("grp"), col("half"), col("reg"))
      .agg(max(col("rnk")).as("hmx"))
      .groupBy(col("grp"), col("reg")).agg(max(col("hmx")).as("mx"))
    def estimate(regs: DataFrame, out: String): DataFrame = {
      val alpha = 0.7213 / (1.0 + 1.079 / m)
      val folded = regs
        .groupBy(col("grp"))
        .agg(sort_array(collect_list(struct(col("reg"), col("mx"))))
          .as("rs"))
        .withColumn("regmap", map_from_entries(col("rs")))
        .withColumn("z", expr(
          // harmonic sum over all 64 registers in index order;
          // registers never hit stay at 0 => contribute 2^0 = 1
          s"""aggregate(sequence(0, ${m - 1}), CAST(0.0 AS DOUBLE),
             |  (acc, j) -> acc + pow(0.5, CAST(coalesce(
             |    try_element_at(regmap, j), 0) AS DOUBLE)))"""
            .stripMargin))
        // every present register has rank >= 1, so the zero registers
        // are exactly the absent indices
        .withColumn("v", (lit(m) - size(col("rs"))).cast("long"))
      folded.select(col("grp"),
        when(lit(alpha) * lit(m.toDouble * m) / col("z") <= lit(2.5 * m) &&
          col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / d(col("v"))))
          .otherwise(lit(alpha) * lit(m.toDouble * m) / col("z"))
          .as(out),
        col("v").as(s"${out}_zero_regs"))
    }
    val exact = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    exact
      .join(estimate(direct, "e_direct"), Seq("grp"))
      .join(estimate(merged, "e_merged").select(col("grp"), col("e_merged")),
        Seq("grp"))
      .select(col("grp"), col("n_exact"),
        round(col("e_direct"), 6).as("hll_estimate"),
        round(abs(col("e_direct") - d(col("n_exact"))) / d(col("n_exact")), 6)
          .as("rel_error"),
        col("e_direct_zero_regs").as("n_zero_registers"),
        (col("e_direct") === col("e_merged")).as("merge_exact"))
      .orderBy(col("grp"))
  }

  // ---------------------------------------------------------------
  // j_spatial_knn — grid-bucketed spatial k-NN: points get
  // deterministic [0,1)² coordinates (two disjoint 52-bit md5
  // windows of the event id — exact dyadic rationals), a 16×16 grid
  // cell key, and each of 16 scattered lattice query points probes
  // only its 3×3 cell neighborhood — the standard cell-pruned
  // spatial join that replaces the corpus×queries distance scan
  // with candidates ∝ occupancy of 9 cells. Top-3 per query by
  // (distance, point_id); distance via IEEE sqrt (correctly rounded,
  // engine-identical). Scale shape: the query→cell fan-out (16×9
  // rows) BROADCASTS onto the points scan as an equi-join on the
  // cell key — the corpus never shuffles; the per-query top-3 is a
  // WindowGroupLimit over the pruned candidates (~9/256 of points
  // per query). The ring guarantee is the grid-join contract:
  // any point within one cell width (1/16) of a query is caught.
  // ---------------------------------------------------------------
  val jSpatialKnn: Q = (s, dir) => {
    val G = 16
    val denom = 4503599627370496.0 // 2^52
    val hex = md5(col("event_id").cast("string"))
    val points = Tables.table(s, dir, "events")
      .select(col("event_id").as("point_id"),
        (d(conv(substring(hex, 1, 13), 16, 10).cast("long")) / denom).as("x"),
        (d(conv(substring(hex, 14, 13), 16, 10).cast("long")) / denom)
          .as("y"))
      .withColumn("cx", floor(col("x") * G).cast("int"))
      .withColumn("cy", floor(col("y") * G).cast("int"))
    val queries = s.range(16)
      .select(col("id").cast("int").as("q_id"),
        ((d(col("id") * 7 % G) + 0.5) / G).as("qx"),
        ((d(col("id") * 11 % G) + 0.5) / G).as("qy"))
    val qCells = queries
      .withColumn("dxy", explode(expr(
        "flatten(transform(sequence(-1, 1)," +
          " dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))")))
      .select(col("q_id"), col("qx"), col("qy"),
        (floor(col("qx") * G).cast("int") + col("dxy.dx")).as("cx"),
        (floor(col("qy") * G).cast("int") + col("dxy.dy")).as("cy"))
    val cand = points.join(broadcast(qCells), Seq("cx", "cy"))
      .withColumn("dist2",
        (col("x") - col("qx")) * (col("x") - col("qx")) +
          (col("y") - col("qy")) * (col("y") - col("qy")))
    cand
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("dist2"), col("point_id"))))
      .filter(col("rk") <= 3)
      .select(col("q_id"), col("rk").as("rank"), col("point_id"),
        round(sqrt(col("dist2")), 6).as("dist"))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------
  // o_join_cardinality_est — the System-R cardinality-estimate
  // audit (Selinger 1979): for every FK join edge of the star,
  // estimate |A ⋈ B| as |A|·|B|/max(ndv_A, ndv_B) from exact
  // per-side NDVs, run the join, and report the q-error — the
  // check a cost-based optimizer's statistics pipeline runs to
  // decide whether its histograms are stale. Exact integer counts;
  // the estimate and q-error are single double divisions of exact
  // sub-2⁵³ integers (engine-identical). Scale shape: per edge two
  // map-side-combining distinct aggregates and one join count —
  // dims broadcast, the fact side shuffles once per fact-keyed
  // distinct; everything reduces before it leaves an executor.
  // ---------------------------------------------------------------
  val oJoinCardinalityEst: Q = (s, dir) => {
    def edge(name: String, left: DataFrame, lk: String,
        right: DataFrame, rk: String, bcast: Boolean): DataFrame = {
      val la = left.agg(count(lit(1)).as("n_left"),
        countDistinct(col(lk)).as("ndv_left"))
      val ra = right.agg(count(lit(1)).as("n_right"),
        countDistinct(col(rk)).as("ndv_right"))
      val rside = if (bcast) broadcast(right) else right
      val actual = left.join(rside, col(lk) === col(rk))
        .agg(count(lit(1)).as("actual_rows"))
      // three one-row aggregates — the accepted broadcast-scalar cross
      la.crossJoin(broadcast(ra)).crossJoin(broadcast(actual))
        .select(lit(name).as("edge"), col("n_left"), col("n_right"),
          col("ndv_left"), col("ndv_right"),
          round(d(col("n_left")) * d(col("n_right")) /
            d(greatest(col("ndv_left"), col("ndv_right"))), 6)
            .as("est_rows"),
          col("actual_rows"))
    }
    val li = Tables.table(s, dir, "lineitem")
    val rows = Seq(
      edge("lineitem_orders", li, "l_orderkey",
        Tables.table(s, dir, "orders").select(col("o_orderkey")),
        "o_orderkey", bcast = false),
      edge("lineitem_part", li, "l_partkey",
        Tables.table(s, dir, "part").select(col("p_partkey")),
        "p_partkey", bcast = true),
      edge("lineitem_supplier", li, "l_suppkey",
        Tables.table(s, dir, "supplier").select(col("s_suppkey")),
        "s_suppkey", bcast = true),
      edge("orders_customer",
        Tables.table(s, dir, "orders").select(col("o_custkey")), "o_custkey",
        Tables.table(s, dir, "customer").select(col("c_custkey")),
        "c_custkey", bcast = true))
    rows.reduce(_ unionAll _)
      .withColumn("q_error",
        round(greatest(d(col("actual_rows")) / col("est_rows"),
          col("est_rows") / d(col("actual_rows"))), 6))
      .orderBy(col("edge"))
  }

  val queries: Map[String, Q] = Map(
    "w_changepoint_binseg" -> wChangepointBinseg,
    "a_hll_registers" -> aHllRegisters,
    "j_spatial_knn" -> jSpatialKnn,
    "o_join_cardinality_est" -> oJoinCardinalityEst)

  private val hexN = (x: String, from: Int, n: Int) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), $from, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "w_changepoint_binseg" ->
      """WITH daily AS (
        |  SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |         CAST(o_orderdate AS DATE) AS day,
        |         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |           AS BIGINT) AS rev
        |  FROM orders GROUP BY 1, 2),
        |cum AS (
        |  SELECT yr, day,
        |         CAST(row_number() OVER w AS BIGINT) AS k,
        |         sum(rev) OVER w AS s_l,
        |         CAST(count(*) OVER (PARTITION BY yr) AS BIGINT) AS n,
        |         sum(rev) OVER (PARTITION BY yr) AS s,
        |         lead(day, 1) OVER w AS next_day
        |  FROM daily
        |  WINDOW w AS (PARTITION BY yr ORDER BY day
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |scored AS (
        |  SELECT yr, n, next_day, k, s_l, s - s_l AS s_r, n - k AS n_r, s,
        |         CAST(s_l AS DOUBLE) * CAST(s_l AS DOUBLE) / CAST(k AS DOUBLE)
        |           + CAST(s - s_l AS DOUBLE) * CAST(s - s_l AS DOUBLE)
        |             / CAST(n - k AS DOUBLE) AS score
        |  FROM cum WHERE k < n)
        |SELECT yr, n AS n_days, next_day AS changepoint_day,
        |       k AS n_days_before,
        |       CAST((s_l * 10000) // k AS BIGINT) / 1000000.0 AS mean_before,
        |       CAST((s_r * 10000) // n_r AS BIGINT) / 1000000.0 AS mean_after,
        |       round((score - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
        |         / CAST(n AS DOUBLE)) / 10000.0, 6) AS gain
        |FROM scored
        |QUALIFY row_number() OVER (PARTITION BY yr ORDER BY score DESC, k) = 1
        |ORDER BY yr""".stripMargin,
    "a_hll_registers" -> {
      val w13 = "substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13)"
      s"""WITH rows_ AS (
        |  SELECT o_orderpriority AS grp, o_custkey,
        |         CAST(${hexN("CAST(o_custkey AS VARCHAR)", 14, 2)} % 64
        |           AS INT) AS reg,
        |         CAST(length(regexp_extract($w13, '^(0*)', 1)) * 4
        |           + (4 - CASE
        |               WHEN CAST(strpos('0123456789abcdef', substr($w13,
        |                 length(regexp_extract($w13, '^(0*)', 1)) + 1, 1))
        |                 - 1 AS INT) >= 8 THEN 4
        |               WHEN CAST(strpos('0123456789abcdef', substr($w13,
        |                 length(regexp_extract($w13, '^(0*)', 1)) + 1, 1))
        |                 - 1 AS INT) >= 4 THEN 3
        |               WHEN CAST(strpos('0123456789abcdef', substr($w13,
        |                 length(regexp_extract($w13, '^(0*)', 1)) + 1, 1))
        |                 - 1 AS INT) >= 2 THEN 2
        |               WHEN CAST(strpos('0123456789abcdef', substr($w13,
        |                 length(regexp_extract($w13, '^(0*)', 1)) + 1, 1))
        |                 - 1 AS INT) >= 1 THEN 1
        |               ELSE 0 END) + 1 AS INT) AS rnk
        |  FROM orders),
        |regs AS (
        |  SELECT grp, reg, max(rnk) AS mx FROM rows_ GROUP BY 1, 2),
        |lattice AS (
        |  SELECT g.grp, CAST(j.j AS INT) AS j, coalesce(r.mx, 0) AS m
        |  FROM (SELECT DISTINCT grp FROM regs) g
        |  CROSS JOIN range(0, 64) j(j)
        |  LEFT JOIN regs r ON r.grp = g.grp AND r.reg = j.j),
        |folded2 AS (
        |  SELECT grp,
        |         list_sum(list(0.5 ^ CAST(m AS DOUBLE) ORDER BY j)) AS z,
        |         CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
        |  FROM lattice GROUP BY 1),
        |est AS (
        |  SELECT grp,
        |         CASE WHEN (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / z
        |                <= 160.0 AND v > 0
        |              THEN 64.0 * ln(64.0 / CAST(v AS DOUBLE))
        |              ELSE (0.7213 / (1.0 + 1.079 / 64)) * 4096.0 / z
        |         END AS e, v
        |  FROM folded2),
        |exact AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
        |  FROM orders GROUP BY 1)
        |SELECT exact.grp, n_exact, round(e, 6) AS hll_estimate,
        |       round(abs(e - CAST(n_exact AS DOUBLE))
        |         / CAST(n_exact AS DOUBLE), 6) AS rel_error,
        |       v AS n_zero_registers, TRUE AS merge_exact
        |FROM exact JOIN est ON exact.grp = est.grp
        |ORDER BY exact.grp""".stripMargin
    },
    "j_spatial_knn" -> {
      val hx = hexN("CAST(event_id AS VARCHAR)", 1, 13)
      val hy = hexN("CAST(event_id AS VARCHAR)", 14, 13)
      s"""WITH pts AS (
        |  SELECT event_id AS point_id,
        |         CAST($hx AS DOUBLE) / 4503599627370496.0 AS x,
        |         CAST($hy AS DOUBLE) / 4503599627370496.0 AS y
        |  FROM events),
        |qs AS (
        |  SELECT CAST(q_id AS INT) AS q_id,
        |         (CAST(q_id * 7 % 16 AS DOUBLE) + 0.5) / 16 AS qx,
        |         (CAST(q_id * 11 % 16 AS DOUBLE) + 0.5) / 16 AS qy
        |  FROM range(16) t(q_id)),
        |cand AS (
        |  SELECT q.q_id, p.point_id,
        |         (p.x - q.qx) * (p.x - q.qx)
        |           + (p.y - q.qy) * (p.y - q.qy) AS dist2
        |  FROM pts p JOIN qs q
        |    ON abs(CAST(floor(p.x * 16) AS INT)
        |         - CAST(floor(q.qx * 16) AS INT)) <= 1
        |   AND abs(CAST(floor(p.y * 16) AS INT)
        |         - CAST(floor(q.qy * 16) AS INT)) <= 1)
        |SELECT q_id, CAST(row_number() OVER (PARTITION BY q_id
        |         ORDER BY dist2, point_id) AS INT) AS rank,
        |       point_id, round(sqrt(dist2), 6) AS dist
        |FROM cand
        |QUALIFY rank <= 3
        |ORDER BY q_id, rank""".stripMargin
    },
    "o_join_cardinality_est" ->
      """WITH e1 AS (
        |  SELECT 'lineitem_orders' AS edge,
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_left,
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders) AS n_right,
        |         (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT)
        |            FROM lineitem) AS ndv_left,
        |         (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT)
        |            FROM orders) AS ndv_right,
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |            JOIN orders o ON l.l_orderkey = o.o_orderkey)
        |           AS actual_rows),
        |e2 AS (
        |  SELECT 'lineitem_part',
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |         (SELECT CAST(count(*) AS BIGINT) FROM part),
        |         (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT)
        |            FROM lineitem),
        |         (SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part),
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |            JOIN part p ON l.l_partkey = p.p_partkey)),
        |e3 AS (
        |  SELECT 'lineitem_supplier',
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem),
        |         (SELECT CAST(count(*) AS BIGINT) FROM supplier),
        |         (SELECT CAST(count(DISTINCT l_suppkey) AS BIGINT)
        |            FROM lineitem),
        |         (SELECT CAST(count(DISTINCT s_suppkey) AS BIGINT)
        |            FROM supplier),
        |         (SELECT CAST(count(*) AS BIGINT) FROM lineitem l
        |            JOIN supplier s ON l.l_suppkey = s.s_suppkey)),
        |e4 AS (
        |  SELECT 'orders_customer',
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders),
        |         (SELECT CAST(count(*) AS BIGINT) FROM customer),
        |         (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT)
        |            FROM orders),
        |         (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT)
        |            FROM customer),
        |         (SELECT CAST(count(*) AS BIGINT) FROM orders o
        |            JOIN customer c ON o.o_custkey = c.c_custkey)),
        |u AS (
        |  SELECT * FROM e1 UNION ALL SELECT * FROM e2
        |  UNION ALL SELECT * FROM e3 UNION ALL SELECT * FROM e4)
        |SELECT edge, n_left, n_right, ndv_left, ndv_right,
        |       round(CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
        |         / CAST(greatest(ndv_left, ndv_right) AS DOUBLE), 6)
        |         AS est_rows,
        |       actual_rows,
        |       round(greatest(
        |         CAST(actual_rows AS DOUBLE)
        |           / (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
        |              / CAST(greatest(ndv_left, ndv_right) AS DOUBLE)),
        |         (CAST(n_left AS DOUBLE) * CAST(n_right AS DOUBLE)
        |           / CAST(greatest(ndv_left, ndv_right) AS DOUBLE))
        |           / CAST(actual_rows AS DOUBLE)), 6) AS q_error
        |FROM u ORDER BY edge""".stripMargin)
}
