package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-11 batch 79: sequential drift detection, the cumulative-
  * hazard companion of the survival family, a binary corruption
  * gate for the multimodal path, and a Bloom-filter sizing advisor.
  *
  *  - w_page_hinkley — Page–Hinkley mean-shift monitor on daily
  *    revenue, per-year reset (the sequential-decision sibling of
  *    w_cusum_drift, which tracks deviation from a FIXED mean; PH
  *    tracks deviation from the RUNNING mean, so it needs no
  *    training period).
  *  - ev_nelson_aalen — Nelson–Aalen cumulative hazard + the
  *    Fleming–Harrington survival estimate on the registered
  *    signup→purchase duration ledger (ev_survival_km's KM product
  *    estimator is biased high in small risk sets; NA/FH is the
  *    standard cross-check).
  *  - mm_byte_entropy — per-media byte-histogram Shannon entropy
  *    through the PORTABLE hex encoding (both engines hex the blob
  *    identically, so the audit needs no decoder): flags
  *    encrypted/compressed-looking payloads (≥ 7.5 bits) and
  *    degenerate fills (< 2 bits) before they reach a trainer.
  *  - o_bloom_advisor — m/k sizing of the per-key Bloom runtime
  *    filters (a_bloom_prune's contract) from exact key counts over
  *    an fpp grid — the layout advisor a 100 TB join plan consults.
  *
  * Float policy: every cumulative quantity that crosses a window is
  * INTEGER (micro-unit integral divisions before the cumsum — a
  * float running sum would inherit the engine's window-aggregation
  * association); per-row doubles are fixed formulas; outputs
  * round-6.
  */
object TrainingData79 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_page_hinkley — per year: m_t = Σ_{i≤t}(x_i − x̄_i), with x̄_i
  // the running mean so far that year; PH_t = m_t − min_{i≤t} m_i;
  // alarm when PH exceeds λ = $50k. All sequential state is exact:
  // x̄ enters as the micro-cent integral division of the running
  // (exact long) sum, each per-day term is an exact long, and the
  // running m / min(m) are integer window aggregates — associative,
  // so the engine's window evaluation order cannot perturb them.
  // One summary row per year: the peak-PH day and the verdict.
  // ---------------------------------------------------------------
  private val PhLambdaMicroCents = BigDecimal(5e12).toLongExact // $50k

  val wPageHinkley: Q = (s, dir) => {
    val wy = org.apache.spark.sql.expressions.Window
      .partitionBy(col("yr")).orderBy(col("day"))
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("x"))
      .withColumn("yr", year(col("day")).cast("long"))
    val terms = daily
      .withColumn("cnt", count(lit(1)).over(wy).cast("long"))
      .withColumn("csum", sum(col("x")).over(wy).cast("long"))
      // term_q = 10⁶·(x − running mean), exact micro-cents. csum is
      // a running LONG of yearly cents: widen BOTH terms to
      // decimal(38,0) BEFORE the ×10⁶ (silent Long overflow past
      // ~$92B of daily/yearly cents, where DuckDB's BIGINT would
      // instead error — a divergence); `div` on the decimal product
      // still yields an exact BIGINT, and the decimal difference
      // casts back to long exactly while |term_q| < 2⁶³.
      .withColumn("term_q",
        (expr("CAST(x AS DECIMAL(38,0)) * 1000000") -
          expr("(CAST(csum AS DECIMAL(38,0)) * 1000000) div cnt"))
          .cast("long"))
      .withColumn("m_q", sum(col("term_q")).over(wy).cast("long"))
      .withColumn("mmin_q", min(col("m_q")).over(wy).cast("long"))
      .withColumn("ph_q", (col("m_q") - col("mmin_q")).cast("long"))
    terms.groupBy(col("yr"))
      .agg(count(lit(1)).cast("long").as("n_days"),
        // peak day: max PH, earliest day on ties (max struct over
        // (ph, -epoch) would need a date negation — use min over
        // (-ph, day))
        min(struct((-col("ph_q")).as("neg"), col("day").as("day"))).as("top"))
      .select(col("yr").as("year"), col("n_days"),
        col("top.day").as("peak_day"),
        round(d(-col("top.neg")) / 1e6 / 100.0, 6).as("peak_ph_usd"),
        (-col("top.neg") > PhLambdaMicroCents).as("drift_alarm"))
      .orderBy(col("year"))
  }

  // ---------------------------------------------------------------
  // ev_nelson_aalen — durations from the ev_survival_km ledger
  // (first signup → first subsequent purchase, right-censored at
  // the corpus horizon). Per event day t: H(t) = Σ d_i/n_i and
  // Var = Σ d_i/n_i², both accumulated as exact pico-unit integral
  // divisions (d·10¹² div n) so the running sums are integer window
  // aggregates. S_FH = exp(−H). The risk set comes from the exact
  // exclusive cumsum of leavers — integer throughout.
  // ---------------------------------------------------------------
  val evNelsonAalen: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("s0"))
    val hz = ev.agg(max(col("ts")).as("hzts"))
    val p0 = ev.filter(col("event_type") === "purchase")
      .join(su, "user_id").filter(col("ts") >= col("s0"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("p0"))
    val durs = su.join(p0, Seq("user_id"), "left").crossJoin(broadcast(hz))
      .select(col("user_id"),
        when(col("p0").isNotNull, 1L).otherwise(0L).as("ev"),
        expr("(unix_micros(coalesce(p0, hzts)) - unix_micros(s0))" +
          " div 86400000000").as("t_days"))
    val nUsers = durs.agg(count(lit(1)).cast("long").as("n_users"))
    val wt = Grain.bounded(col("t_days"))
    val byT = durs.groupBy(col("t_days"))
      .agg(sum(col("ev")).cast("long").as("dd"),
        count(lit(1)).cast("long").as("cc"))
      .crossJoin(broadcast(nUsers))
      .withColumn("left_before",
        coalesce(sum(col("cc")).over(
          wt.rowsBetween(Long.MinValue, -1)), lit(0L)).cast("long"))
      .withColumn("n_risk", (col("n_users") - col("left_before")).cast("long"))
      // pico-unit exact hazard increments
      .withColumn("h_q", expr("(dd * 1000000000000) div n_risk"))
      .withColumn("v_q", expr("(dd * 1000000000000) div (n_risk * n_risk)"))
      .withColumn("h_cum", sum(col("h_q")).over(wt).cast("long"))
      .withColumn("v_cum", sum(col("v_q")).over(wt).cast("long"))
    byT.filter(col("dd") > 0L)
      .select(col("t_days"), col("n_risk"), col("dd").as("n_events"),
        round(d(col("h_cum")) / 1e12, 6).as("h_na"),
        round(sqrt(d(col("v_cum")) / 1e12), 6).as("se_na"),
        round(exp(-d(col("h_cum")) / 1e12), 6).as("s_fh"))
      .orderBy(col("t_days"))
  }

  // ---------------------------------------------------------------
  // mm_byte_entropy — media blobs (the mm_binary_features table:
  // text bytes as the opaque payload) → uppercase hex → per-byte
  // counts → Shannon entropy in bits. The hex path makes the byte
  // histogram A PORTABLE SQL computation — no UDF, no decoder, and
  // the oracle replays it verbatim. Gates: ≥ 7.5 bits looks
  // encrypted/compressed (a corrupt or mislabeled payload on a text
  // corpus), < 2.0 bits is a degenerate fill. Scale shape: the
  // explode is output-linear in total bytes (a scan-shaped pass),
  // the per-doc fold is ≤ 256 sorted terms.
  // ---------------------------------------------------------------
  val mmByteEntropy: Q = (s, dir) => {
    // shuffle the COMPACT payload once, explode locally (guide §8):
    // repartitioning the ~n_docs hex rows by doc_id up front makes
    // both aggregations below partition-local — HashPartitioning on
    // doc_id satisfies the (doc_id, b) clustering too — so the
    // exploded per-byte frame and the per-doc byte counts never
    // cross the network (before: the (doc, byte) frame was
    // exchanged for the count agg, AGAIN for the totals agg, and a
    // third time through the join back).
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), hex(col("text").cast("binary")).as("hx"))
      .filter(length(col("hx")) > 0)
      .repartition(col("doc_id"))
    val bytes = docs
      .select(col("doc_id"),
        explode(expr("sequence(0, CAST(length(hx) / 2 AS INT) - 1)"))
          .as("i"), col("hx"))
      .select(col("doc_id"), expr("substr(hx, i * 2 + 1, 2)").as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(count(lit(1)).cast("long").as("c"))
    // one per-doc aggregate replaces the totals agg + join back: n
    // folds from the same ≤256 (b, c) entries, and the entropy terms
    // fold in the SAME b-sorted order as before → identical doubles
    bytes
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("b"), col("c")))).as("bc"))
      .select(col("doc_id"),
        expr("aggregate(bc, CAST(0 AS BIGINT), (a, q) -> a + q.c)").as("n"),
        col("bc"))
      .select(col("doc_id"), col("n"),
        size(col("bc")).cast("long").as("n_distinct_bytes"),
        expr("aggregate(bc, 0D, (a, q) -> a + (-(CAST(q.c AS DOUBLE)" +
          " / CAST(n AS DOUBLE)) * ln(CAST(q.c AS DOUBLE)" +
          " / CAST(n AS DOUBLE))))").as("h_nats"))
      .select(col("doc_id"), col("n").as("n_bytes"),
        col("n_distinct_bytes"),
        round(col("h_nats") / lit(math.log(2.0)), 6).as("entropy_bits"),
        when(col("h_nats") / lit(math.log(2.0)) >= 7.5, "high_entropy_suspect")
          .when(col("h_nats") / lit(math.log(2.0)) < 2.0, "degenerate")
          .otherwise(lit("ok")).as("verdict"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // o_bloom_advisor — for each join key a runtime filter would
  // guard (customer, part, supplier, orders keys): exact NDV n,
  // then over fpp ∈ {1%, 0.1%}: optimal bits m = ⌈−n·ln p / ln²2⌉,
  // hashes k = max(1, round((m/n)·ln 2)), bytes and bits/key. Pure
  // closed forms over exact counts — the sizing table that decides
  // whether a_bloom_prune's sketch fits the broadcast budget.
  // ---------------------------------------------------------------
  private val BloomFpp = Seq(0.01, 0.001)

  val oBloomAdvisor: Q = (s, dir) => {
    val keys = Seq(
      ("customer", "c_custkey"), ("part", "p_partkey"),
      ("supplier", "s_suppkey"), ("orders", "o_orderkey"))
    val counts = keys.map { case (t, k) =>
      Tables.table(s, dir, t)
        .agg(countDistinct(col(k)).cast("long").as("n"))
        .select(lit(t).as("table_name"), lit(k).as("key_col"), col("n"))
    }.reduce(_ unionAll _)
    val grid = array(BloomFpp.map(lit): _*)
    val ln2 = math.log(2.0)
    counts.select(col("table_name"), col("key_col"), col("n"),
        explode(grid).as("fpp"))
      .withColumn("m_bits",
        ceil(-d(col("n")) * log(col("fpp")) / lit(ln2 * ln2)).cast("long"))
      .withColumn("k_hashes",
        greatest(lit(1L),
          round(d(col("m_bits")) / d(col("n")) * lit(ln2)).cast("long")))
      .select(col("table_name"), col("key_col"), col("n").as("n_keys"),
        col("fpp"), col("m_bits"),
        expr("CAST((m_bits + 7) div 8 AS BIGINT)").as("n_bytes"),
        col("k_hashes"),
        round(d(col("m_bits")) / d(col("n")), 6).as("bits_per_key"))
      .orderBy(col("table_name"), col("fpp"))
  }

  val queries: Map[String, Q] = Map(
    "w_page_hinkley" -> wPageHinkley,
    "ev_nelson_aalen" -> evNelsonAalen,
    "mm_byte_entropy" -> mmByteEntropy,
    "o_bloom_advisor" -> oBloomAdvisor)

  private val centsX =
    "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"

  val oracles: Map[String, String] = Map(
    "w_page_hinkley" ->
      s"""WITH daily AS (
         |  SELECT o_orderdate AS day, CAST(sum($centsX) AS BIGINT) AS x,
         |         CAST(year(o_orderdate) AS BIGINT) AS yr
         |  FROM orders GROUP BY 1),
         |terms AS (
         |  SELECT yr, day, x,
         |         CAST(CAST(x AS HUGEINT) * 1000000
         |             - (CAST(sum(x) OVER w AS HUGEINT) * 1000000)
         |           // CAST(count(*) OVER w AS HUGEINT) AS BIGINT) AS term_q
         |  FROM daily
         |  WINDOW w AS (PARTITION BY yr ORDER BY day)),
         |mrun AS (
         |  SELECT yr, day,
         |         CAST(sum(term_q) OVER (PARTITION BY yr ORDER BY day)
         |           AS BIGINT) AS m_q
         |  FROM terms),
         |ph AS (
         |  SELECT yr, day,
         |         m_q - CAST(min(m_q) OVER (PARTITION BY yr ORDER BY day)
         |           AS BIGINT) AS ph_q
         |  FROM mrun),
         |ranked AS (
         |  SELECT yr, day, ph_q,
         |         row_number() OVER (PARTITION BY yr
         |           ORDER BY ph_q DESC, day) AS rk,
         |         CAST(count(*) OVER (PARTITION BY yr) AS BIGINT) AS nd
         |  FROM ph)
         |SELECT yr AS year, nd AS n_days, day AS peak_day,
         |       round(CAST(ph_q AS DOUBLE) / 1e6 / 100.0, 6)
         |         AS peak_ph_usd,
         |       ph_q > 5000000000000 AS drift_alarm
         |FROM ranked WHERE rk = 1 ORDER BY year""".stripMargin,
    "ev_nelson_aalen" ->
      """WITH hz AS (SELECT max(ts) AS hzts FROM events),
        |su AS (SELECT user_id, min(ts) AS s0 FROM events
        |       WHERE event_type = 'signup' GROUP BY 1),
        |p0 AS (
        |  SELECT e.user_id, min(e.ts) AS p0 FROM events e
        |  JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= su.s0 GROUP BY 1),
        |durs AS (
        |  SELECT su.user_id,
        |         CASE WHEN p0.p0 IS NOT NULL THEN 1 ELSE 0 END AS ev,
        |         (epoch_us(coalesce(p0.p0, hz.hzts)) - epoch_us(su.s0))
        |           // 86400000000 AS t_days
        |  FROM su LEFT JOIN p0 ON su.user_id = p0.user_id CROSS JOIN hz),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n_users FROM durs),
        |byt AS (
        |  SELECT t_days, CAST(sum(ev) AS BIGINT) AS dd,
        |         CAST(count(*) AS BIGINT) AS cc
        |  FROM durs GROUP BY 1),
        |risk AS (
        |  SELECT t_days, dd, cc,
        |         nn.n_users - CAST(coalesce(sum(cc) OVER
        |           (ORDER BY t_days ROWS BETWEEN UNBOUNDED PRECEDING
        |            AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
        |  FROM byt CROSS JOIN nn),
        |incs AS (
        |  SELECT t_days, dd, n_risk,
        |         CAST((dd * 1000000000000) // n_risk AS BIGINT) AS h_q,
        |         CAST((dd * 1000000000000) // (n_risk * n_risk) AS BIGINT)
        |           AS v_q
        |  FROM risk),
        |cum AS (
        |  SELECT t_days, dd, n_risk,
        |         CAST(sum(h_q) OVER (ORDER BY t_days) AS BIGINT) AS h_cum,
        |         CAST(sum(v_q) OVER (ORDER BY t_days) AS BIGINT) AS v_cum
        |  FROM incs)
        |SELECT t_days, n_risk, dd AS n_events,
        |       round(CAST(h_cum AS DOUBLE) / 1e12, 6) AS h_na,
        |       round(sqrt(CAST(v_cum AS DOUBLE) / 1e12), 6) AS se_na,
        |       round(exp(-CAST(h_cum AS DOUBLE) / 1e12), 6) AS s_fh
        |FROM cum WHERE dd > 0 ORDER BY t_days""".stripMargin,
    "mm_byte_entropy" ->
      """WITH docs AS (
        |  SELECT doc_id, hex(CAST(text AS BLOB)) AS hx FROM documents
        |  WHERE length(hex(CAST(text AS BLOB))) > 0),
        |bytes AS (
        |  SELECT doc_id, substr(hx, i * 2 + 1, 2) AS b,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT doc_id, hx,
        |          unnest(range(0, CAST(length(hx) / 2 AS INT))) AS i
        |        FROM docs)
        |  GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
        |        FROM bytes GROUP BY 1)
        |SELECT b.doc_id, t.n AS n_bytes,
        |       CAST(count(*) AS BIGINT) AS n_distinct_bytes,
        |       round(list_sum(list(
        |           -(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |           * ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |           ORDER BY b.b)) / ln(2.0), 6) AS entropy_bits,
        |       CASE WHEN list_sum(list(
        |              -(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |              * ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |              ORDER BY b.b)) / ln(2.0) >= 7.5
        |              THEN 'high_entropy_suspect'
        |            WHEN list_sum(list(
        |              -(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |              * ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
        |              ORDER BY b.b)) / ln(2.0) < 2.0 THEN 'degenerate'
        |            ELSE 'ok' END AS verdict
        |FROM bytes b JOIN tot t ON b.doc_id = t.doc_id
        |GROUP BY b.doc_id, t.n ORDER BY b.doc_id""".stripMargin,
    "o_bloom_advisor" -> {
      val grid = BloomFpp.mkString(", ")
      s"""WITH counts AS (
         |  SELECT 'customer' AS table_name, 'c_custkey' AS key_col,
         |         CAST(count(DISTINCT c_custkey) AS BIGINT) AS n
         |  FROM customer
         |  UNION ALL
         |  SELECT 'part', 'p_partkey',
         |         CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part
         |  UNION ALL
         |  SELECT 'supplier', 's_suppkey',
         |         CAST(count(DISTINCT s_suppkey) AS BIGINT) FROM supplier
         |  UNION ALL
         |  SELECT 'orders', 'o_orderkey',
         |         CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders),
         |g AS (SELECT unnest([$grid]) AS fpp),
         |sized AS (
         |  SELECT table_name, key_col, n, fpp,
         |         CAST(ceil(-CAST(n AS DOUBLE) * ln(fpp)
         |           / (ln(2.0) * ln(2.0))) AS BIGINT) AS m_bits
         |  FROM counts CROSS JOIN g)
         |SELECT table_name, key_col, n AS n_keys,
         |       CAST(fpp AS DOUBLE) AS fpp, m_bits,
         |       CAST((m_bits + 7) // 8 AS BIGINT) AS n_bytes,
         |       greatest(1, CAST(round(CAST(m_bits AS DOUBLE)
         |         / CAST(n AS DOUBLE) * ln(2.0)) AS BIGINT)) AS k_hashes,
         |       round(CAST(m_bits AS DOUBLE) / CAST(n AS DOUBLE), 6)
         |         AS bits_per_key
         |FROM sized ORDER BY table_name, fpp""".stripMargin
    })
}
