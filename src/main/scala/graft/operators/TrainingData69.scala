package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 69: lexical-diversity, intermittent-demand,
  * rank-test and link-prediction operators.
  *
  *  - t_mattr — moving-average type-token ratio (Covington & McFall
  *    2010) over a W=25 sliding token window, per language. The
  *    sliding DISTINCT count is computed with a difference array
  *    (each repeated token contributes +1/−1 interval endpoints;
  *    a per-doc cumulative sum recovers the per-window duplicate
  *    count) — one pass, no per-window rescans, exact integers
  *    until the final division.
  *  - w_croston — Croston (1972) intermittent-demand smoothing +
  *    the Syntetos–Boylan approximation, per part brand on the
  *    zero-filled daily demand spine.
  *  - a_mann_whitney — Mann–Whitney U with midrank tie handling,
  *    tie-corrected normal z, Cliff's delta and the Romano
  *    magnitude bands, URGENT vs LOW order totals.
  *  - g_jaccard_links — neighbor-Jaccard link prediction over the
  *    same k-NN graph as g_adamic_adar.
  */
object TrainingData69 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_mattr — MATTR(W=25): mean over all full windows of
  // distinct(window)/W, falling back to plain TTR for docs shorter
  // than W. The trick that keeps it one-pass: distinct(q) =
  // W − dup(q) where dup(q) counts positions in the window whose
  // PREVIOUS occurrence is also inside it; each position p with
  // gap = p − prev ≤ W−1 contributes dup to exactly the windows
  // q ∈ [p, prev+W−1], so scattering +1 at p and −1 at prev+W and
  // cumulative-summing per doc yields every dup(q) in one sweep.
  // Window counts stay EXACT LONGS; per-doc MATTR is one division;
  // the per-lang mean folds in doc_id order (sorted-fold float
  // policy). Scale shape: the heavy frames are token-linear
  // (positions, lag per (doc, token), difference events); the only
  // windows are per-doc cumsums — partitioned by doc_id, bounded
  // by doc length, never a global single-partition sort.
  // ---------------------------------------------------------------
  private val MattrW = 25

  val tMattr: Q = (s, dir) =>
    mattrOf(Tables.table(s, dir, "documents"))

  /** The full MATTR dataflow over any (doc_id, lang, text) frame —
    * split out so the property spec can drive it with random
    * corpora (doc lengths straddling the W boundary, tiny alphabets
    * forcing dense repetition) against a naive per-window scan. */
  private[graft] def mattrOf(docs: DataFrame): DataFrame = {
    val W = MattrW
    val toks = docs
      .select(col("doc_id"), col("lang"),
        posexplode(split(col("text"), " ")).as(Seq("p0", "tok")))
      .select(col("doc_id"), col("lang"),
        (col("p0") + 1).cast("long").as("p"), col("tok"))
    val prv = toks.withColumn("prev",
      lag(col("p"), 1).over(
        Window.partitionBy(col("doc_id"), col("tok")).orderBy(col("p"))))
    val dupSpans = prv
      .filter(col("prev").isNotNull && col("p") - col("prev") <= W - 1)
      .select(col("doc_id"), explode(array(
        struct(col("p").as("q"), lit(1L).as("delta")),
        struct((col("prev") + W).as("q"), lit(-1L).as("delta"))))
        .as("e"))
      .groupBy(col("doc_id"), col("e.q").as("q"))
      .agg(sum(col("e.delta")).cast("long").as("delta"))
    val dup = toks.alias("t")
      .join(dupSpans.alias("s"), col("t.doc_id") === col("s.doc_id") &&
        col("t.p") === col("s.q"), "left")
      .select(col("t.doc_id"), col("t.lang"), col("t.p"), col("t.tok"),
        coalesce(col("s.delta"), lit(0L)).as("delta"))
      .withColumn("dup", sum(col("delta")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("p"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perDoc = dup.groupBy(col("doc_id"))
      .agg(first(col("lang")).as("lang"),
        max(col("p")).cast("long").as("n"),
        countDistinct(col("tok")).cast("long").as("ndist"),
        sum(when(col("p") >= W, col("dup")).otherwise(0L))
          .cast("long").as("sumdup"))
      .withColumn("mattr",
        when(col("n") >= W,
          d(lit(W) * (col("n") - W + 1) - col("sumdup")) /
            d(lit(W) * (col("n") - W + 1)))
          .otherwise(d(col("ndist")) / d(col("n"))))
      .withColumn("short", col("n") < W)
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(when(col("short"), 1L).otherwise(0L)).cast("long")
          .as("n_short_docs"),
        expr("aggregate(sort_array(collect_list(struct(doc_id, mattr))), 0D," +
          " (a, x) -> a + x.mattr)").as("sm"))
      .select(col("lang"), col("n_docs"), col("n_short_docs"),
        round(col("sm") / d(col("n_docs")), 6).as("mean_mattr"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // w_croston — intermittent-demand forecast per part brand:
  // demand = Σ l_quantity (exact long) per (brand, ship-day) on the
  // zero-filled calendar spine (25 brands × calendar days, ~39% of
  // cells zero at test SF — genuinely intermittent). Croston state
  // (z = demand level, p = inter-demand interval, both SES at
  // α=0.1) folds day-ascending as a DOUBLE[4] array state
  // [z, p, gap, started]; init pins z to the first demand and p to
  // its 1-based position. Forecast = z/p; SBA multiplies by
  // (1 − α/2) (Syntetos & Boylan 2005). Scale shape: the fact scan
  // reduces map-side to the (brand, day) grid; the spine is
  // calendar-bounded; each fold runs on ONE ≤calendar-length array
  // per brand — never a corpus-length window.
  // ---------------------------------------------------------------
  private val CrostonAlpha = 0.1

  val wCroston: Q = (s, dir) => {
    val a = CrostonAlpha
    val part = Tables.table(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val daily = Tables.table(s, dir, "lineitem")
      .select(col("l_partkey"), to_date(col("l_shipdate")).as("day"),
        col("l_quantity").cast("long").as("qty"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("day"))
      .agg(sum(col("qty")).cast("long").as("q"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    // ONE-ROW scalar cross (the allowlisted BNLJ class), THEN the
    // per-brand explode — never a spine-frame broadcast
    val spine = part.select(col("p_brand")).distinct()
      .crossJoin(broadcast(bounds))
      .select(col("p_brand"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      .join(daily, Seq("p_brand", "day"), "left")
      .select(col("p_brand"), col("day"),
        d(coalesce(col("q"), lit(0L))).as("x"))
    spine.groupBy(col("p_brand"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(when(col("x") > 0, 1L).otherwise(0L)).cast("long")
          .as("n_demand_days"),
        expr("transform(sort_array(collect_list(struct(day, x)))," +
          " e -> e.x)").as("xs"))
      .withColumn("st", expr(
        s"""aggregate(xs,
           |  array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
           |        CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
           |  (a, x) -> CASE
           |    WHEN x > 0D AND element_at(a, 4) = 0D THEN
           |      array(x, element_at(a, 3) + 1.0D,
           |            CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
           |    WHEN x > 0D THEN
           |      array(element_at(a, 1)
           |              + ${a}D * (x - element_at(a, 1)),
           |            element_at(a, 2) + ${a}D
           |              * (element_at(a, 3) + 1.0D - element_at(a, 2)),
           |            CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE))
           |    ELSE array(element_at(a, 1), element_at(a, 2),
           |               element_at(a, 3) + 1.0D, element_at(a, 4))
           |  END)""".stripMargin))
      .select(col("p_brand"), col("n_days"), col("n_demand_days"),
        round(d(col("n_demand_days")) / d(col("n_days")), 6)
          .as("demand_rate"),
        round(element_at(col("st"), 1), 6).as("level"),
        round(element_at(col("st"), 2), 6).as("interval"),
        round(element_at(col("st"), 1) / element_at(col("st"), 2), 6)
          .as("croston_forecast"),
        round(lit(1.0 - a / 2) * element_at(col("st"), 1) /
          element_at(col("st"), 2), 6).as("sba_forecast"))
      .orderBy(col("p_brand"))
  }

  // ---------------------------------------------------------------
  // a_mann_whitney — the nonparametric two-sample location test the
  // Welch t (a_welch_ttest) shouldn't be trusted for on skewed
  // revenue: URGENT vs LOW order totals in exact cents. Ranks never
  // materialize per row — the value-level contingency (v, n_a, n_b)
  // plus an exclusive two-phase cumulative count give every midrank
  // as the EXACT integer 2·midrank = 2·C(v) + cnt + 1, so
  // 2·R_A = Σ n_a(v)·(2C+cnt+1) and 2·U_A stay longs; ties feed the
  // classic Σ(t³−t) variance correction. Cliff's δ = 2U/(nm) − 1
  // with Romano et al. magnitude bands. Scale shape: one map-side
  // value aggregate, the Ranking two-phase cumsum over distinct
  // values (never a single-partition sort), one scalar row out.
  // ---------------------------------------------------------------
  val aMannWhitney: Q = (s, dir) => {
    val base = Tables.table(s, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long").as("v"),
        (col("o_orderpriority") === "1-URGENT").as("ga"))
    val byv = base.groupBy(col("v"))
      .agg(sum(when(col("ga"), 1L).otherwise(0L)).cast("long").as("ca"),
        sum(when(!col("ga"), 1L).otherwise(0L)).cast("long").as("cb"),
        count(lit(1)).cast("long").as("c"))
    val cum = Ranking.withGlobalCumSums(byv, Seq("c" -> "cumc"), col("v"))
      .withColumn("cb4", col("cumc") - col("c"))
    val st = cum.agg(
      sum(col("ca")).cast("long").as("n_a"),
      sum(col("cb")).cast("long").as("n_b"),
      sum(col("ca") * (lit(2L) * col("cb4") + col("c") + 1L))
        .cast("long").as("two_r_a"),
      sum(col("c") * col("c") * col("c") - col("c")).cast("long").as("tie_t"))
    val u2a = col("two_r_a") - col("n_a") * (col("n_a") + 1L)
    val n = col("n_a") + col("n_b")
    val sigma = sqrt(d(col("n_a")) * d(col("n_b")) / 12.0 *
      (d(n + 1L) - d(col("tie_t")) / (d(n) * d(n - 1L))))
    val delta = d(u2a) / (d(col("n_a")) * d(col("n_b"))) - 1.0
    st.select(col("n_a"), col("n_b"),
      (d(u2a) / 2.0).as("u_a"),
      round((d(u2a) - d(col("n_a")) * d(col("n_b"))) / (lit(2.0) * sigma), 6)
        .as("z"),
      round(delta, 6).as("cliffs_delta"),
      when(abs(delta) < 0.147, "negligible")
        .when(abs(delta) < 0.33, "small")
        .when(abs(delta) < 0.474, "medium")
        .otherwise("large").as("magnitude"))
  }

  // ---------------------------------------------------------------
  // g_jaccard_links — the set-overlap companion of g_adamic_adar on
  // the SAME symmetrized cell-blocked k-NN graph: for non-adjacent
  // 2-hop pairs, J = |N(u)∩N(v)| / (deg(u)+deg(v)−|N(u)∩N(v)|) —
  // exact integers, ONE division at the edge (no per-neighbor float
  // fold at all, unlike AA's 1/ln(deg) sum). Top-100 on the
  // 6-dp-rounded score with the (u, v) tiebreak (rounded-rank
  // policy). Scale shape inherited: pair work is Σ_w deg(w)²,
  // cell-occupancy-bounded, never corpus².
  // ---------------------------------------------------------------
  val gJaccardLinks: Q = (s, dir) => {
    val und = TrainingData5.knnUndirected(s, dir)
      .localCheckpoint(eager = false) // deg, both hop sides, anti join
    val deg = und.groupBy(col("src").as("node")).agg(
      count(lit(1)).cast("long").as("deg"))
    val a = und.alias("a"); val b = und.alias("b")
    val common = a.join(b, col("a.dst") === col("b.src") &&
        col("a.src") < col("b.dst") && col("a.src") =!= col("b.dst"))
      .select(col("a.src").as("u"), col("b.dst").as("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).cast("long").as("n_common"))
      .join(und, col("u") === col("src") && col("v") === col("dst"),
        "left_anti")
    common
      .join(deg.select(col("node"), col("deg").as("deg_u")),
        col("u") === col("node")).drop("node")
      .join(deg.select(col("node"), col("deg").as("deg_v")),
        col("v") === col("node")).drop("node")
      .select(col("u"), col("v"), col("n_common"), col("deg_u"), col("deg_v"),
        round(d(col("n_common")) /
          d(col("deg_u") + col("deg_v") - col("n_common")), 6).as("jaccard"))
      .orderBy(desc("jaccard"), col("u"), col("v"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "t_mattr" -> tMattr,
    "w_croston" -> wCroston,
    "a_mann_whitney" -> aMannWhitney,
    "g_jaccard_links" -> gJaccardLinks)

  val oracles: Map[String, String] = Map(
    "t_mattr" -> {
      val W = MattrW
      s"""WITH tk AS (
         |  SELECT doc_id, lang, string_split(text, ' ') AS ts FROM documents),
         |pos0 AS (
         |  SELECT doc_id, lang, unnest(range(1, len(ts) + 1)) AS p, ts
         |  FROM tk),
         |tok AS (
         |  SELECT doc_id, lang, CAST(p AS BIGINT) AS p, ts[p] AS tok
         |  FROM pos0),
         |prv AS (
         |  SELECT *, lag(p) OVER (PARTITION BY doc_id, tok ORDER BY p)
         |    AS prev
         |  FROM tok),
         |ev AS (
         |  SELECT doc_id, p AS q, CAST(1 AS BIGINT) AS delta FROM prv
         |  WHERE prev IS NOT NULL AND p - prev <= $W - 1
         |  UNION ALL
         |  SELECT doc_id, prev + $W, CAST(-1 AS BIGINT) FROM prv
         |  WHERE prev IS NOT NULL AND p - prev <= $W - 1),
         |dl AS (
         |  SELECT doc_id, q, CAST(sum(delta) AS BIGINT) AS delta
         |  FROM ev GROUP BY 1, 2),
         |cum AS (
         |  SELECT t.doc_id, t.lang, t.p, t.tok,
         |         CAST(sum(coalesce(dl.delta, 0))
         |           OVER (PARTITION BY t.doc_id ORDER BY t.p) AS BIGINT)
         |           AS dup
         |  FROM tok t LEFT JOIN dl ON dl.doc_id = t.doc_id AND dl.q = t.p),
         |perdoc AS (
         |  SELECT doc_id, any_value(lang) AS lang,
         |         CAST(max(p) AS BIGINT) AS n,
         |         CAST(count(DISTINCT tok) AS BIGINT) AS ndist,
         |         CAST(sum(CASE WHEN p >= $W THEN dup ELSE 0 END) AS BIGINT)
         |           AS sumdup
         |  FROM cum GROUP BY 1),
         |m AS (
         |  SELECT doc_id, lang, n < $W AS short,
         |         CASE WHEN n >= $W
         |              THEN CAST($W * (n - $W + 1) - sumdup AS DOUBLE)
         |                   / CAST($W * (n - $W + 1) AS DOUBLE)
         |              ELSE CAST(ndist AS DOUBLE) / CAST(n AS DOUBLE) END
         |           AS mattr
         |  FROM perdoc)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN short THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_short_docs,
         |       round(list_sum(list(mattr ORDER BY doc_id))
         |         / CAST(count(*) AS DOUBLE), 6) AS mean_mattr
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "w_croston" -> {
      val a = CrostonAlpha
      s"""WITH daily AS (
         |  SELECT p.p_brand, CAST(l.l_shipdate AS DATE) AS day,
         |         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
         |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         |  GROUP BY 1, 2),
         |span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         |spine AS (
         |  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE
         |    AS day
         |  FROM span),
         |dense AS (
         |  SELECT b.p_brand, s.day,
         |         CAST(coalesce(d.q, 0) AS DOUBLE) AS x
         |  FROM (SELECT DISTINCT p_brand FROM part) b
         |  CROSS JOIN spine s
         |  LEFT JOIN daily d ON d.p_brand = b.p_brand AND d.day = s.day),
         |folded AS (
         |  SELECT p_brand, CAST(count(*) AS BIGINT) AS n_days,
         |         CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_demand_days,
         |         list_reduce(
         |           list_concat([[0.0, 0.0, 0.0, 0.0]],
         |             list_transform(list(x ORDER BY day),
         |               v -> [v, 0.0, 0.0, 0.0])),
         |           (a, e) -> CASE
         |             WHEN e[1] > 0 AND a[4] = 0 THEN
         |               [e[1], a[3] + 1.0, 0.0, 1.0]
         |             WHEN e[1] > 0 THEN
         |               [a[1] + $a * (e[1] - a[1]),
         |                a[2] + $a * (a[3] + 1.0 - a[2]), 0.0, 1.0]
         |             ELSE [a[1], a[2], a[3] + 1.0, a[4]] END) AS st
         |  FROM dense GROUP BY 1)
         |SELECT p_brand, n_days, n_demand_days,
         |       round(CAST(n_demand_days AS DOUBLE)
         |         / CAST(n_days AS DOUBLE), 6) AS demand_rate,
         |       round(st[1], 6) AS level,
         |       round(st[2], 6) AS "interval",
         |       round(st[1] / st[2], 6) AS croston_forecast,
         |       round(${1.0 - a / 2} * st[1] / st[2], 6) AS sba_forecast
         |FROM folded ORDER BY p_brand""".stripMargin
    },
    "a_mann_whitney" ->
      """WITH base AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS v,
        |         o_orderpriority = '1-URGENT' AS ga
        |  FROM orders
        |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        |byv AS (
        |  SELECT v,
        |         CAST(sum(CASE WHEN ga THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |         CAST(sum(CASE WHEN NOT ga THEN 1 ELSE 0 END) AS BIGINT)
        |           AS cb,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM base GROUP BY 1),
        |cum AS (
        |  SELECT *, CAST(sum(c) OVER (ORDER BY v) AS BIGINT) - c AS cb4
        |  FROM byv),
        |st AS (
        |  SELECT CAST(sum(ca) AS BIGINT) AS n_a,
        |         CAST(sum(cb) AS BIGINT) AS n_b,
        |         CAST(sum(ca * (2 * cb4 + c + 1)) AS BIGINT) AS two_r_a,
        |         CAST(sum(c * c * c - c) AS BIGINT) AS tie_t
        |  FROM cum),
        |calc AS (
        |  SELECT n_a, n_b,
        |         two_r_a - n_a * (n_a + 1) AS u2a,
        |         n_a + n_b AS n,
        |         sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0
        |           * (CAST(n_a + n_b + 1 AS DOUBLE)
        |              - CAST(tie_t AS DOUBLE)
        |                / (CAST(n_a + n_b AS DOUBLE)
        |                   * CAST(n_a + n_b - 1 AS DOUBLE)))) AS sigma,
        |         CAST(two_r_a - n_a * (n_a + 1) AS DOUBLE)
        |           / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) - 1.0
        |           AS delta
        |  FROM st)
        |SELECT n_a, n_b, CAST(u2a AS DOUBLE) / 2.0 AS u_a,
        |       round((CAST(u2a AS DOUBLE)
        |         - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
        |         / (2.0 * sigma), 6) AS z,
        |       round(delta, 6) AS cliffs_delta,
        |       CASE WHEN abs(delta) < 0.147 THEN 'negligible'
        |            WHEN abs(delta) < 0.33 THEN 'small'
        |            WHEN abs(delta) < 0.474 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM calc""".stripMargin,
    "g_jaccard_links" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |und AS (SELECT src, dst FROM edges UNION
         |        SELECT dst, src FROM edges),
         |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
         |        FROM und GROUP BY 1),
         |hop AS (
         |  SELECT a.src AS u, b.dst AS v
         |  FROM und a JOIN und b ON a.dst = b.src
         |  WHERE a.src < b.dst AND a.src <> b.dst),
         |nc AS (
         |  SELECT u, v, CAST(count(*) AS BIGINT) AS n_common
         |  FROM hop GROUP BY 1, 2),
         |nl AS (
         |  SELECT nc.* FROM nc LEFT JOIN und e2
         |    ON nc.u = e2.src AND nc.v = e2.dst
         |  WHERE e2.src IS NULL)
         |SELECT nl.u, nl.v, nl.n_common,
         |       du.deg AS deg_u, dv.deg AS deg_v,
         |       round(CAST(nl.n_common AS DOUBLE)
         |         / CAST(du.deg + dv.deg - nl.n_common AS DOUBLE), 6)
         |         AS jaccard
         |FROM nl JOIN deg du ON nl.u = du.node
         |        JOIN deg dv ON nl.v = dv.node
         |ORDER BY jaccard DESC, nl.u, nl.v LIMIT 100""".stripMargin)
}
