package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 15: pipeline-infrastructure audits — algebraic
  * partial-aggregate mergeability (the incremental-view-maintenance
  * / streaming-state foundation), a referential-integrity +
  * expectation data-quality audit over the star schema, a per-user
  * event-time out-of-orderness audit (the measurement that picks a
  * streaming watermark delay), and an l-diversity audit completing
  * the privacy triple next to t_k_anonymity and t_dp_histogram.
  * All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData20 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_var_merge — algebraic aggregation-state merge audit: monthly
  // mean/variance of order value computed BY MERGING per-day partial
  // states (n, Σcents, Σcents²) — the Chan/Golub/LeVeque parallel
  // form every incremental view, streaming state store, and
  // re-aggregation-without-rescan pipeline relies on — checked
  // exactly against the direct one-pass month aggregate. The states
  // are exact integers (cents BIGINT, Σcents² DECIMAL(38,0) — a
  // single cents² fits a long, the corpus sum does not), so
  // merged ≡ direct is bit-exact equality, not a float tolerance;
  // the mean/variance leave integer space only at the final
  // micro-unit integral division (exact), then one BIGINT→double
  // conversion. Scale shape: two stacked
  // map-side-combining aggregates (day ≪ corpus, month ≪ day) plus
  // one month-keyed join of two ≤|months|-row frames — the corpus
  // scans twice only because the audit needs an independent direct
  // leg; the production path is the partial leg alone.
  // ---------------------------------------------------------------
  val aVarMerge: Q = (s, dir) => {
    val base = Tables.table(s, dir, "orders")
      .select(to_date(date_trunc("month", col("o_orderdate"))).as("month"),
        to_date(col("o_orderdate")).as("day"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    def state(df: DataFrame, keys: Seq[Column],
        n: Column, sum1: Column, sum2: Column): DataFrame =
      df.groupBy(keys: _*)
        .agg(sum(n).cast("long").as("n"),
          sum(sum1).cast("decimal(38,0)").as("s"),
          sum(sum2).cast("decimal(38,0)").as("ss"))
    val dayPart = state(base, Seq(col("month"), col("day")),
      lit(1L), col("cents"), (col("cents") * col("cents")).cast("decimal(38,0)"))
    val merged = dayPart.groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).cast("long").as("n"),
        sum(col("s")).cast("decimal(38,0)").as("s"),
        sum(col("ss")).cast("decimal(38,0)").as("ss"))
    val direct = state(base, Seq(col("month")),
      lit(1L), col("cents"), (col("cents") * col("cents")).cast("decimal(38,0)"))
      .select(col("month"), col("n").as("dn"), col("s").as("ds"),
        col("ss").as("dss"))
    // mean/variance leave integer space through an INTEGRAL division
    // to micro-unit resolution (exact in both engines; a direct
    // decimal(38,0)->double conversion of the ~1e19 variance
    // numerator rounds differently in Spark vs DuckDB's two-limb
    // HUGEINT path), then one BIGINT->double conversion, which is a
    // single well-defined IEEE rounding everywhere.
    merged.join(direct, Seq("month"))
      .withColumn("num",
        col("n").cast("decimal(38,0)") * col("ss") - col("s") * col("s"))
      .select(col("month"), col("n_days"), col("n").as("n_orders"),
        (expr("CAST((s * 10000) div n AS BIGINT)") / lit(1000000.0))
          .as("mean_price"),
        when(col("n") > 1,
          expr("CAST((num * 100) div (n * (n - 1)) AS BIGINT)") /
            lit(1000000.0)).as("var_price"),
        (col("n") === col("dn") && col("s") === col("ds") &&
          col("ss") === col("dss")).as("partials_match"))
      .orderBy(col("month"))
  }

  // ---------------------------------------------------------------
  // q_dq_referential — the data-quality gate a warehouse runs before
  // publishing a snapshot: referential-integrity orphan counts for
  // every foreign key of the star (lineitem→orders/part/supplier,
  // orders→customer) plus row-level expectation checks (quantity in
  // its domain, discount in its domain, positive order value). Scale
  // shape: ONE pass over each fact table — the three lineitem FK
  // probes ride a single scan (part and supplier key sets broadcast;
  // the orders key set is the one genuinely shuffled leg at fact
  // scale), all expectation predicates fold into the same aggregate,
  // and `stack` unpivots the one-row summary into the per-check
  // contract. Integer counts — exact.
  // ---------------------------------------------------------------
  val qDqReferential: Q = (s, dir) => {
    val li = Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_discount"))
    val okeys = Tables.table(s, dir, "orders")
      .select(col("o_orderkey").as("__ok"))
    val pkeys = Tables.table(s, dir, "part")
      .select(col("p_partkey").as("__pk"))
    val skeys = Tables.table(s, dir, "supplier")
      .select(col("s_suppkey").as("__sk"))
    val liAgg = li
      .join(okeys, col("l_orderkey") === col("__ok"), "left")
      .join(broadcast(pkeys), col("l_partkey") === col("__pk"), "left")
      .join(broadcast(skeys), col("l_suppkey") === col("__sk"), "left")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__ok").isNull, 1L).otherwise(0L)).cast("long").as("v_ord"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).cast("long").as("v_part"),
        sum(when(col("__sk").isNull, 1L).otherwise(0L)).cast("long").as("v_supp"),
        sum(when(!col("l_quantity").between(1.0, 50.0), 1L).otherwise(0L))
          .cast("long").as("v_qty"),
        sum(when(!col("l_discount").between(0.0, 0.1), 1L).otherwise(0L))
          .cast("long").as("v_disc"))
    val liRows = liAgg.selectExpr(
      "stack(5, 'fk_lineitem_orders', v_ord, 'fk_lineitem_part', v_part," +
        " 'fk_lineitem_supplier', v_supp, 'chk_quantity_domain', v_qty," +
        " 'chk_discount_domain', v_disc) AS (check_name, n_violations)",
      "n_total")
    val ckeys = Tables.table(s, dir, "customer")
      .select(col("c_custkey").as("__ck"))
    val oAgg = Tables.table(s, dir, "orders")
      .select(col("o_custkey"), col("o_totalprice"))
      .join(broadcast(ckeys), col("o_custkey") === col("__ck"), "left")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("__ck").isNull, 1L).otherwise(0L)).cast("long").as("v_cust"),
        sum(when(col("o_totalprice") <= 0.0, 1L).otherwise(0L))
          .cast("long").as("v_price"))
    val oRows = oAgg.selectExpr(
      "stack(2, 'fk_orders_customer', v_cust," +
        " 'chk_positive_totalprice', v_price) AS (check_name, n_violations)",
      "n_total")
    liRows.unionAll(oRows)
      .select(col("check_name"), col("n_violations"), col("n_total"),
        (col("n_violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
  }

  // ---------------------------------------------------------------
  // ev_watermark_lateness — event-time out-of-orderness audit: for
  // each event, lateness = how far its event time sits behind the
  // per-user high-watermark of everything that ARRIVED before it
  // (arrival order = the monotone ingest id). The lateness histogram
  // (on-time / ≤1 min / ≤5 min / ≤1 h / >1 h, plus the per-bucket
  // maximum) is exactly the measurement that sizes a Structured
  // Streaming `withWatermark` delay: the bucket where the mass stops
  // is the delay that bounds dropped-late rows. Scale shape: one
  // per-user window pass (the sessionize shape — partition-parallel,
  // one shuffle on user_id), then a 5-row bucket aggregate; the
  // share division is the only double. The final share/ordering
  // window runs on ≤5 rows (documented low-cardinality class).
  // ---------------------------------------------------------------
  val evWatermarkLateness: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val late = Tables.table(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .select(greatest(lit(0L),
        coalesce(max(col("us")).over(w), col("us")) - col("us")).as("late_us"))
    val bucketed = late.select(
      when(col("late_us") === 0L, struct(lit(1).as("r"), lit("on_time").as("b")))
        .when(col("late_us") <= 60L * 1000000L,
          struct(lit(2).as("r"), lit("le_1m").as("b")))
        .when(col("late_us") <= 300L * 1000000L,
          struct(lit(3).as("r"), lit("le_5m").as("b")))
        .when(col("late_us") <= 3600L * 1000000L,
          struct(lit(4).as("r"), lit("le_1h").as("b")))
        .otherwise(struct(lit(5).as("r"), lit("gt_1h").as("b"))).as("bk"),
      col("late_us"))
    bucketed.groupBy(col("bk.r").as("bucket_rank"), col("bk.b").as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(col("late_us")).as("max_late_us"))
      .select(col("bucket_rank"), col("bucket"), col("n_events"),
        round(d(col("n_events")) /
          d(sum(col("n_events")).over(Grain.whole)), 6).as("share"),
        round(d(col("max_late_us")) / lit(1000000.0), 6).as("max_late_s"))
      .orderBy(col("bucket_rank"))
  }

  // ---------------------------------------------------------------
  // t_l_diversity — l-diversity audit (Machanavajjhala et al. 2007):
  // k-anonymity bounds group SIZE, but a uniform group still leaks
  // its sensitive attribute; l-diversity requires ≥ l distinct
  // sensitive values per quasi-identifier group. Same QI tuple as
  // t_k_anonymity (lang, source, 100-char length bucket); the
  // sensitive attribute is the doc's 16-way content topic proxy
  // (first md5 hex digit of text — deterministic, data-derived).
  // Reported per (lang, source): bucket count, the minimum diversity
  // across buckets, buckets below l = 3, and documents in those
  // buckets — the rollup, never the low-diversity groups themselves.
  // Scale shape: exact distinct via two stacked map-side-combining
  // aggregates (QI × sensitive cardinality ≪ corpus), then the same
  // bounded rollup as the k-anonymity audit. Integer counts — exact.
  // ---------------------------------------------------------------
  val tLDiversity: Q = (s, dir) => {
    val l = 3
    val cells = Tables.table(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        expr("CAST(n_chars AS BIGINT) div 100").as("len_bucket"),
        substring(md5(col("text")), 1, 1).as("sens"))
      .agg(count(lit(1)).as("n"))
    val buckets = cells
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(sum(col("n")).cast("long").as("n_docs"),
        count(lit(1)).as("diversity"))
    buckets.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_buckets"),
        min(col("diversity")).as("min_diversity"),
        sum(when(col("diversity") < l, 1L).otherwise(0L)).cast("long")
          .as("n_low_buckets"),
        sum(when(col("diversity") < l, col("n_docs")).otherwise(0L))
          .cast("long").as("n_docs_at_risk"))
      .orderBy(col("lang"), col("source"))
  }

  val queries: Map[String, Q] = Map(
    "a_var_merge" -> aVarMerge,
    "q_dq_referential" -> qDqReferential,
    "ev_watermark_lateness" -> evWatermarkLateness,
    "t_l_diversity" -> tLDiversity)

  val oracles: Map[String, String] = Map(
    "a_var_merge" ->
      """WITH base AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(o_orderdate AS DATE) AS day,
        |         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |dp AS (
        |  SELECT month, day, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(cents) AS HUGEINT) AS s,
        |         sum(CAST(cents AS HUGEINT) * cents) AS ss
        |  FROM base GROUP BY 1, 2),
        |m AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(n) AS BIGINT) AS n,
        |         CAST(sum(s) AS HUGEINT) AS s,
        |         CAST(sum(ss) AS HUGEINT) AS ss
        |  FROM dp GROUP BY 1),
        |dct AS (
        |  SELECT month, CAST(count(*) AS BIGINT) AS dn,
        |         CAST(sum(cents) AS HUGEINT) AS ds,
        |         sum(CAST(cents AS HUGEINT) * cents) AS dss
        |  FROM base GROUP BY 1)
        |SELECT m.month, m.n_days, m.n AS n_orders,
        |       CAST((m.s * 10000) // m.n AS BIGINT) / 1000000.0
        |         AS mean_price,
        |       CASE WHEN m.n > 1 THEN
        |         CAST((m.n * m.ss - m.s * m.s) * 100 // (m.n * (m.n - 1))
        |           AS BIGINT) / 1000000.0
        |       END AS var_price,
        |       (m.n = dct.dn AND m.s = dct.ds AND m.ss = dct.dss)
        |         AS partials_match
        |FROM m JOIN dct USING (month)
        |ORDER BY month""".stripMargin,
    "q_dq_referential" ->
      """WITH li AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_ord,
        |         CAST(sum(CASE WHEN p.p_partkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_part,
        |         CAST(sum(CASE WHEN su.s_suppkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_supp,
        |         CAST(sum(CASE WHEN NOT (l.l_quantity BETWEEN 1.0 AND 50.0)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS v_qty,
        |         CAST(sum(CASE WHEN NOT (l.l_discount BETWEEN 0.0 AND 0.1)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS v_disc
        |  FROM lineitem l
        |  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |  LEFT JOIN supplier su ON l.l_suppkey = su.s_suppkey),
        |oa AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_total,
        |         CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_cust,
        |         CAST(sum(CASE WHEN o.o_totalprice <= 0.0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_price
        |  FROM orders o
        |  LEFT JOIN customer c ON o.o_custkey = c.c_custkey),
        |rows_ AS (
        |  SELECT 'fk_lineitem_orders' AS check_name, v_ord AS n_violations,
        |         n_total FROM li
        |  UNION ALL SELECT 'fk_lineitem_part', v_part, n_total FROM li
        |  UNION ALL SELECT 'fk_lineitem_supplier', v_supp, n_total FROM li
        |  UNION ALL SELECT 'chk_quantity_domain', v_qty, n_total FROM li
        |  UNION ALL SELECT 'chk_discount_domain', v_disc, n_total FROM li
        |  UNION ALL SELECT 'fk_orders_customer', v_cust, n_total FROM oa
        |  UNION ALL SELECT 'chk_positive_totalprice', v_price, n_total FROM oa)
        |SELECT check_name, n_violations, n_total,
        |       n_violations = 0 AS passed
        |FROM rows_ ORDER BY check_name""".stripMargin,
    "ev_watermark_lateness" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
        |late AS (
        |  SELECT greatest(0, coalesce(max(us) OVER (
        |           PARTITION BY user_id ORDER BY event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us)
        |         - us) AS late_us
        |  FROM e),
        |b AS (
        |  SELECT CASE WHEN late_us = 0 THEN 1
        |              WHEN late_us <= 60000000 THEN 2
        |              WHEN late_us <= 300000000 THEN 3
        |              WHEN late_us <= 3600000000 THEN 4
        |              ELSE 5 END AS bucket_rank,
        |         CASE WHEN late_us = 0 THEN 'on_time'
        |              WHEN late_us <= 60000000 THEN 'le_1m'
        |              WHEN late_us <= 300000000 THEN 'le_5m'
        |              WHEN late_us <= 3600000000 THEN 'le_1h'
        |              ELSE 'gt_1h' END AS bucket,
        |         late_us
        |  FROM late),
        |g AS (
        |  SELECT bucket_rank, bucket, CAST(count(*) AS BIGINT) AS n_events,
        |         max(late_us) AS max_late_us
        |  FROM b GROUP BY 1, 2)
        |SELECT bucket_rank, bucket, n_events,
        |       round(CAST(n_events AS DOUBLE)
        |         / CAST(sum(n_events) OVER () AS DOUBLE), 6) AS share,
        |       round(CAST(max_late_us AS DOUBLE) / 1000000.0, 6) AS max_late_s
        |FROM g ORDER BY bucket_rank""".stripMargin,
    "t_l_diversity" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(n_chars AS BIGINT) // 100 AS len_bucket,
        |         substr(md5(text), 1, 1) AS sens,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2, 3, 4),
        |buckets AS (
        |  SELECT lang, source, len_bucket,
        |         CAST(sum(n) AS BIGINT) AS n_docs,
        |         CAST(count(*) AS BIGINT) AS diversity
        |  FROM cells GROUP BY 1, 2, 3)
        |SELECT lang, source, CAST(count(*) AS BIGINT) AS n_buckets,
        |       min(diversity) AS min_diversity,
        |       CAST(sum(CASE WHEN diversity < 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_low_buckets,
        |       CAST(sum(CASE WHEN diversity < 3 THEN n_docs ELSE 0 END)
        |         AS BIGINT) AS n_docs_at_risk
        |FROM buckets GROUP BY 1, 2
        |ORDER BY lang, source""".stripMargin)
}
