package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 70: association, sampling-design, diversity and
  * sketch-compression operators.
  *
  *  - a_cramers_v — χ² association + Cramér's V with the Bergsma
  *    (2013) bias correction over three categorical pairs.
  *  - a_hoeffding_sample — sample-size advisor: the
  *    distribution-free Hoeffding bound vs the CLT prescription for
  *    estimating mean order value, over an (ε, δ) grid.
  *  - t_hill_diversity — Hill numbers N0/N1/N2 of the per-language
  *    token distribution off the count-of-counts profile (the
  *    Good–Turing frame), never a vocab-length float fold.
  *  - dedup_bbit_minhash — 1-bit minhash (Li & König 2010): Jaccard
  *    from signature LSBs at 64× less signature storage, audited
  *    against the full 64-hash estimate and the exact Jaccard on
  *    the SAME LSH candidate pairs as dedup_minhash_lsh.
  */
object TrainingData70 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_cramers_v — for each categorical pair: χ², V = √(χ²/(n·(k−1)))
  // and the bias-corrected V (Bergsma 2013: φ²⁺ = max(0, φ² −
  // (r−1)(c−1)/(n−1)) with shrunken r̃, c̃). Zero cells are handled
  // WITHOUT densifying the grid: Σ_full (O−E)²/E = n + Σ_observed
  // ((O−E)²/E − E), because expected mass over the full grid sums
  // to n — so the fold touches only observed cells. Counts and
  // margins are exact longs; the fold runs (x, y)-ascending over
  // ≤ r·c cells (sorted-fold float policy). Scale shape: one
  // map-side count aggregate per pair, margins re-aggregate the
  // ≤ r·c cell frame, one scalar row out per pair.
  // ---------------------------------------------------------------
  private def cramer(cells0: DataFrame, label: String): DataFrame = {
    val cells = cells0.groupBy(col("x"), col("y"))
      .agg(count(lit(1)).cast("long").as("o"))
    val rm = cells.groupBy(col("x")).agg(sum(col("o")).cast("long").as("rx"))
    val cm = cells.groupBy(col("y")).agg(sum(col("o")).cast("long").as("cy"))
    val tot = cells.agg(sum(col("o")).cast("long").as("n"),
      countDistinct(col("x")).cast("long").as("r"),
      countDistinct(col("y")).cast("long").as("c"))
    val chi = cells.join(rm, "x").join(cm, "y").crossJoin(broadcast(tot))
      .withColumn("e", d(col("rx")) * d(col("cy")) / d(col("n")))
      .withColumn("contrib",
        (d(col("o")) - col("e")) * (d(col("o")) - col("e")) / col("e")
          - col("e"))
      .groupBy(col("n"), col("r"), col("c"))
      .agg(expr("aggregate(sort_array(collect_list(struct(x, y, contrib)))," +
        " 0D, (a, q) -> a + q.contrib)").as("cs"))
      .withColumn("chi2", d(col("n")) + col("cs"))
    val phi2 = col("chi2") / d(col("n"))
    val phi2c = greatest(lit(0.0),
      phi2 - d((col("r") - 1L) * (col("c") - 1L)) / d(col("n") - 1L))
    val rt = d(col("r")) - d((col("r") - 1L) * (col("r") - 1L)) /
      d(col("n") - 1L)
    val ct = d(col("c")) - d((col("c") - 1L) * (col("c") - 1L)) /
      d(col("n") - 1L)
    chi.select(lit(label).as("pair"), col("n"), col("r"), col("c"),
      round(col("chi2"), 6).as("chi2"),
      round(sqrt(col("chi2") / (d(col("n")) *
        d(least(col("r"), col("c")) - 1L))), 6).as("v"),
      round(sqrt(phi2c / (least(rt, ct) - 1.0)), 6).as("v_corrected"))
  }

  val aCramersV: Q = (s, dir) => {
    val orders = Tables.table(s, dir, "orders")
      .select(col("o_orderpriority").as("x"), col("o_orderstatus").as("y"))
    val li = Tables.table(s, dir, "lineitem")
      .select(col("l_returnflag").as("x"), col("l_linestatus").as("y"))
    val ev = Tables.table(s, dir, "events")
      .select(col("event_type").as("x"),
        hour(col("ts")).cast("string").as("y"))
    cramer(orders, "orders_priority_x_status")
      .unionAll(cramer(li, "lineitem_returnflag_x_linestatus"))
      .unionAll(cramer(ev, "events_type_x_hour"))
      .orderBy(col("pair"))
  }

  // ---------------------------------------------------------------
  // a_hoeffding_sample — how many orders must a profiling job sample
  // to pin mean order value within ±ε·mean at confidence 1−δ?
  // Distribution-free: n ≥ (max−min)²·ln(2/δ) / (2ε²) (Hoeffding
  // 1963); CLT: n ≥ z²σ²/ε². Moments are EXACT through decimal(38)
  // cents sums with the micro-unit integral division (the a_var_merge
  // portability discipline); the (ε, δ) grid is a 6-row literal.
  // The ratio column is the price of distribution-freeness — the
  // advisor a 100 TB pipeline consults before choosing between a
  // blind sample and a pilot-variance two-phase design.
  // ---------------------------------------------------------------
  private val HoeffGrid: Seq[(Double, Double, Double)] = Seq(
    // (eps_rel, delta, z_{delta/2})
    (0.01, 0.05, 1.959963984540054), (0.01, 0.01, 2.5758293035489004),
    (0.02, 0.05, 1.959963984540054), (0.02, 0.01, 2.5758293035489004),
    (0.05, 0.05, 1.959963984540054), (0.05, 0.01, 2.5758293035489004))

  val aHoeffdingSample: Q = (s, dir) => {
    val base = Tables.table(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
    val st = base.agg(count(lit(1)).cast("long").as("n"),
      min(col("cents")).as("mn"), max(col("cents")).as("mx"),
      sum(col("cents")).cast("decimal(38,0)").as("s"),
      sum((col("cents") * col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").as("ss"))
      .withColumn("num",
        col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s"))
      // dollars via exact micro-unit integral division, ONE
      // bigint→double conversion each (the a_var_merge discipline)
      .withColumn("mean_usd",
        expr("CAST((s * 10000) div n AS BIGINT)") / lit(1000000.0))
      .withColumn("var_usd2",
        expr("CAST((num * 100) div (n * (n - 1)) AS BIGINT)") /
          lit(1000000.0))
      .withColumn("range_usd", d(col("mx") - col("mn")) / lit(100.0))
    val grid = HoeffGrid.map { case (e, dl, z) =>
      struct(lit(e).as("eps_rel"), lit(dl).as("delta"), lit(z).as("z"))
    }
    st.select(col("*"), explode(array(grid: _*)).as("g"))
      .withColumn("eps_abs", col("g.eps_rel") * col("mean_usd"))
      .select(col("g.eps_rel").as("eps_rel"), col("g.delta").as("delta"),
        round(col("eps_abs"), 6).as("eps_abs_usd"),
        ceil(col("range_usd") * col("range_usd") *
          log(lit(2.0) / col("g.delta")) /
          (lit(2.0) * col("eps_abs") * col("eps_abs"))).cast("long")
          .as("n_hoeffding"),
        ceil(col("g.z") * col("g.z") * col("var_usd2") /
          (col("eps_abs") * col("eps_abs"))).cast("long").as("n_clt"),
        round(ceil(col("range_usd") * col("range_usd") *
          log(lit(2.0) / col("g.delta")) /
          (lit(2.0) * col("eps_abs") * col("eps_abs"))) /
          ceil(col("g.z") * col("g.z") * col("var_usd2") /
            (col("eps_abs") * col("eps_abs"))), 6).as("hoeffding_penalty"),
        (ceil(col("g.z") * col("g.z") * col("var_usd2") /
          (col("eps_abs") * col("eps_abs"))).cast("long") <= col("n"))
          .as("clt_feasible"))
      .orderBy(col("eps_rel"), col("delta"))
  }

  // ---------------------------------------------------------------
  // t_hill_diversity — the Hill-number family over each language's
  // token distribution: N0 = richness, N1 = exp(Shannon H),
  // N2 = 1/Simpson = T²/Σc² — "effective vocabulary sizes" at
  // increasing dominance weighting (the diversity ladder a corpus
  // card reports; N1/N2 ≪ N0 ⇒ head-heavy vocabulary). Everything
  // reduces through the count-of-counts profile first (the
  // Good–Turing frame): Σc², Σc are exact longs over profile rows;
  // the only float fold is Σ m_c·c·ln c over DISTINCT multiplicity
  // values (≤ hundreds by Zipf, c-ascending) — never a vocab-length
  // list. Scale shape: token scan → (lang, token) count → (lang, c)
  // profile, all map-combining.
  // ---------------------------------------------------------------
  val tHillDiversity: Q = (s, dir) => {
    val prof = Tables.table(s, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("lang"), col("c"))
      .agg(count(lit(1)).cast("long").as("m"))
    prof.groupBy(col("lang"))
      .agg(sum(col("m")).cast("long").as("richness"),
        sum(col("m") * col("c")).cast("long").as("t"),
        sum(col("m") * col("c") * col("c")).cast("long").as("sc2"),
        expr("aggregate(sort_array(collect_list(struct(c, m))), 0D," +
          " (a, q) -> a + CAST(q.m AS DOUBLE) * CAST(q.c AS DOUBLE)" +
          " * ln(CAST(q.c AS DOUBLE)))").as("sclnc"))
      .withColumn("h", log(d(col("t"))) - col("sclnc") / d(col("t")))
      .select(col("lang"), col("richness"), col("t").as("total_tokens"),
        round(exp(col("h")), 6).as("hill1"),
        round(d(col("t")) * d(col("t")) / d(col("sc2")), 6).as("hill2"),
        round(col("h") / log(d(col("richness"))), 6).as("evenness"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // dedup_bbit_minhash — compress each 64-hash minhash signature to
  // its 64 LSBs (one long instead of 64 — the 100 TB signature
  // store shrinks 64×) and estimate Jaccard from bit agreement:
  // E[match] = J + (1−J)/2, so Ĵ = max(0, 2·match − 1) (Li & König
  // 2010, b=1 with large-universe collision ≈ 1/2). Audited on the
  // SAME banding candidates as dedup_minhash_lsh against both the
  // full-signature estimate and the exact shingle Jaccard — the
  // recall/storage trade is measured, not assumed. Scale shape
  // inherited from the banding pipeline: pair work stays
  // band-bounded; the bit compare is a 64-term lambda per pair.
  // ---------------------------------------------------------------
  val dedupBbitMinhash: Q = (s, dir) => {
    val sigs = Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 64, 3, portableHashes = true)
          .as("sig"))
    val pairs = Dedup.minhashLshPairs(s, dir, portableHashes = true)
    pairs
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .withColumn("est64",
        expr("aggregate(zip_with(s1, s2, (a, b) -> IF(a = b, 1, 0)), 0," +
          " (a, x) -> a + x)").cast("double") / 64.0)
      .withColumn("match1",
        expr("aggregate(zip_with(s1, s2, (a, b) -> IF(a % 2 = b % 2, 1, 0))," +
          " 0, (a, x) -> a + x)").cast("double") / 64.0)
      .withColumn("est1", greatest(lit(2.0) * col("match1") - 1.0, lit(0.0)))
      .select(col("d1"), col("d2"), round(col("jaccard"), 6).as("j_exact"),
        round(col("est64"), 6).as("est_k64"),
        round(col("est1"), 6).as("est_b1"),
        round(abs(col("est64") - col("jaccard")), 6).as("err_k64"),
        round(abs(col("est1") - col("jaccard")), 6).as("err_b1"))
      .orderBy(col("d1"), col("d2"))
  }

  val queries: Map[String, Q] = Map(
    "a_cramers_v" -> aCramersV,
    "a_hoeffding_sample" -> aHoeffdingSample,
    "t_hill_diversity" -> tHillDiversity,
    "dedup_bbit_minhash" -> dedupBbitMinhash)

  private def cramerSql(src: String, label: String): String =
    s"""SELECT '$label' AS pair, n, r, c, round(chi2, 6) AS chi2,
       |       round(sqrt(chi2 / (CAST(n AS DOUBLE)
       |         * CAST(least(r, c) - 1 AS DOUBLE))), 6) AS v,
       |       round(sqrt(
       |         greatest(0.0, chi2 / CAST(n AS DOUBLE)
       |           - CAST((r - 1) * (c - 1) AS DOUBLE)
       |             / CAST(n - 1 AS DOUBLE))
       |         / (least(
       |             CAST(r AS DOUBLE) - CAST((r - 1) * (r - 1) AS DOUBLE)
       |               / CAST(n - 1 AS DOUBLE),
       |             CAST(c AS DOUBLE) - CAST((c - 1) * (c - 1) AS DOUBLE)
       |               / CAST(n - 1 AS DOUBLE)) - 1.0)), 6) AS v_corrected
       |FROM (
       |  SELECT n, r, c, CAST(n AS DOUBLE) + list_sum(list(
       |           (CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e) / e - e
       |           ORDER BY x, y)) AS chi2
       |  FROM (
       |    SELECT cl.x, cl.y, cl.o, t.n, t.r, t.c,
       |           CAST(rm.rx AS DOUBLE) * CAST(cm.cy AS DOUBLE)
       |             / CAST(t.n AS DOUBLE) AS e
       |    FROM (SELECT x, y, CAST(count(*) AS BIGINT) AS o
       |          FROM ($src) GROUP BY 1, 2) cl
       |    JOIN (SELECT x, CAST(sum(o) AS BIGINT) AS rx FROM
       |          (SELECT x, y, count(*) AS o FROM ($src) GROUP BY 1, 2)
       |          GROUP BY 1) rm ON cl.x = rm.x
       |    JOIN (SELECT y, CAST(sum(o) AS BIGINT) AS cy FROM
       |          (SELECT x, y, count(*) AS o FROM ($src) GROUP BY 1, 2)
       |          GROUP BY 1) cm ON cl.y = cm.y
       |    CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n,
       |                CAST(count(DISTINCT x) AS BIGINT) AS r,
       |                CAST(count(DISTINCT y) AS BIGINT) AS c
       |                FROM ($src)) t)
       |  GROUP BY n, r, c)""".stripMargin

  val oracles: Map[String, String] = Map(
    "a_cramers_v" -> {
      val o = "SELECT o_orderpriority AS x, o_orderstatus AS y FROM orders"
      val l = "SELECT l_returnflag AS x, l_linestatus AS y FROM lineitem"
      val e = "SELECT event_type AS x, CAST(hour(ts) AS VARCHAR) AS y" +
        " FROM events"
      s"""SELECT * FROM (
         |${cramerSql(o, "orders_priority_x_status")}
         |UNION ALL
         |${cramerSql(l, "lineitem_returnflag_x_linestatus")}
         |UNION ALL
         |${cramerSql(e, "events_type_x_hour")})
         |ORDER BY pair""".stripMargin
    },
    "a_hoeffding_sample" -> {
      val grid = HoeffGrid.map { case (e, dl, z) => s"($e, $dl, $z)" }
        .mkString(", ")
      s"""WITH base AS (
         |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |st AS (
         |  -- HUGEINT, not DECIMAL(38): DuckDB promotes wide decimal
         |  -- products to DOUBLE (the a_bootstrap_bca 10x lesson);
         |  -- HUGEINT keeps n*ss - s*s exact 128-bit
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         min(cents) AS mn, max(cents) AS mx,
         |         CAST(sum(CAST(cents AS HUGEINT)) AS HUGEINT) AS s,
         |         CAST(sum(CAST(cents AS HUGEINT)
         |           * CAST(cents AS HUGEINT)) AS HUGEINT) AS ss
         |  FROM base),
         |mo AS (
         |  SELECT n,
         |         CAST((s * 10000) // n AS BIGINT) / 1000000.0 AS mean_usd,
         |         CAST(((CAST(n AS HUGEINT) * ss - s * s) * 100)
         |           // (n * (n - 1)) AS BIGINT) / 1000000.0 AS var_usd2,
         |         CAST(mx - mn AS DOUBLE) / 100.0 AS range_usd
         |  FROM st),
         |g AS (SELECT * FROM (VALUES $grid) AS t(eps_rel, delta, z))
         |SELECT g.eps_rel, g.delta,
         |       round(g.eps_rel * mo.mean_usd, 6) AS eps_abs_usd,
         |       CAST(ceil(mo.range_usd * mo.range_usd * ln(2.0 / g.delta)
         |         / (2.0 * (g.eps_rel * mo.mean_usd)
         |                 * (g.eps_rel * mo.mean_usd))) AS BIGINT)
         |         AS n_hoeffding,
         |       CAST(ceil(g.z * g.z * mo.var_usd2
         |         / ((g.eps_rel * mo.mean_usd) * (g.eps_rel * mo.mean_usd)))
         |         AS BIGINT) AS n_clt,
         |       round(ceil(mo.range_usd * mo.range_usd * ln(2.0 / g.delta)
         |           / (2.0 * (g.eps_rel * mo.mean_usd)
         |                   * (g.eps_rel * mo.mean_usd)))
         |         / ceil(g.z * g.z * mo.var_usd2
         |           / ((g.eps_rel * mo.mean_usd)
         |              * (g.eps_rel * mo.mean_usd))), 6)
         |         AS hoeffding_penalty,
         |       CAST(ceil(g.z * g.z * mo.var_usd2
         |         / ((g.eps_rel * mo.mean_usd) * (g.eps_rel * mo.mean_usd)))
         |         AS BIGINT) <= mo.n AS clt_feasible
         |FROM mo CROSS JOIN g
         |ORDER BY g.eps_rel, g.delta""".stripMargin
    },
    "t_hill_diversity" ->
      """WITH tc AS (
        |  SELECT lang, tok, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2),
        |prof AS (
        |  SELECT lang, c, CAST(count(*) AS BIGINT) AS m
        |  FROM tc GROUP BY 1, 2),
        |agg AS (
        |  SELECT lang, CAST(sum(m) AS BIGINT) AS richness,
        |         CAST(sum(m * c) AS BIGINT) AS t,
        |         CAST(sum(m * c * c) AS BIGINT) AS sc2,
        |         list_sum(list(CAST(m AS DOUBLE) * CAST(c AS DOUBLE)
        |           * ln(CAST(c AS DOUBLE)) ORDER BY c)) AS sclnc
        |  FROM prof GROUP BY 1)
        |SELECT lang, richness, t AS total_tokens,
        |       round(exp(ln(CAST(t AS DOUBLE)) - sclnc / CAST(t AS DOUBLE)),
        |         6) AS hill1,
        |       round(CAST(t AS DOUBLE) * CAST(t AS DOUBLE)
        |         / CAST(sc2 AS DOUBLE), 6) AS hill2,
        |       round((ln(CAST(t AS DOUBLE)) - sclnc / CAST(t AS DOUBLE))
        |         / ln(CAST(richness AS DOUBLE)), 6) AS evenness
        |FROM agg ORDER BY lang""".stripMargin,
    "dedup_bbit_minhash" ->
      s"""WITH ${TrainingData.minhashCtes},
         |est AS (
         |  SELECT p.d1, p.d2, p.jaccard,
         |         CAST(len(list_filter(range(1, 65),
         |             i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 64.0 AS e64,
         |         CAST(len(list_filter(range(1, 65),
         |             i -> s1.sig[i] % 2 = s2.sig[i] % 2)) AS DOUBLE) / 64.0
         |           AS m1
         |  FROM lshp p JOIN sig s1 ON p.d1 = s1.doc_id
         |              JOIN sig s2 ON p.d2 = s2.doc_id)
         |SELECT d1, d2, round(jaccard, 6) AS j_exact,
         |       round(e64, 6) AS est_k64,
         |       round(greatest(2.0 * m1 - 1.0, 0.0), 6) AS est_b1,
         |       round(abs(e64 - jaccard), 6) AS err_k64,
         |       round(abs(greatest(2.0 * m1 - 1.0, 0.0) - jaccard), 6)
         |         AS err_b1
         |FROM est ORDER BY d1, d2""".stripMargin)
}
