package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Relational operator corpus over the TPC-H-ish testdata — the
  * engine surface beyond the reference's own shapes (SURVEY §2.3
  * note: expose Spark's full join/agg/window/set-op surface).
  *
  * Scale design notes (100 TB):
  *  - money sums go through DECIMAL(18,2): exact, order-independent
  *    → safe under any shuffle/AQE re-partitioning AND oracle-stable;
  *  - small dims (region/nation/part at fact-relative scale) are
  *    `broadcast()` so fact tables never shuffle for those joins;
  *  - aggregations are partial (map-side combine) by construction of
  *    groupBy.agg; windows partition by bounded keys.
  */
object Relational {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))
  private def d(c: Column): Column = c.cast("double")

  // TPC-H Q1-shaped pricing summary: filter → wide agg (A-family at scale)
  val q1Agg: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")) <= lit("1998-09-02").cast("date"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        (d(sum(col("l_quantity").cast("long"))) / count(lit(1))).as("avg_qty"),
        (d(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // 5-way star join: region ⋈ nation ⋈ customer ⋈ orders ⋈ lineitem.
  // Aggregate-below-join: lineitem collapses to one exact-decimal
  // revenue row per order BEFORE meeting orders, so the fact-fact
  // join (the only non-broadcast exchange) moves |orders| rows
  // instead of |lineitem| (4× fewer at TPC-H shape), and the
  // downstream countDistinct(o_orderkey) degenerates to count(*)
  // (no Expand). Result is bit-identical: decimal sums re-associate
  // exactly.
  val q3RevenueByNation: Q = (s, dir) => {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val n = broadcast(t(s, dir, "nation"))
    val r = broadcast(t(s, dir, "region"))
    val orderRev = t(s, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .as("order_rev"))
    orderRev.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        sum(col("order_rev")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  // TPC-H Q5 shape (6-way): local-supplier volume — lineitem ⋈ orders
  // ⋈ customer ⋈ supplier with the customer and supplier in the SAME
  // nation, region-filtered. The only shuffled joins are the two
  // fact-fact edges (lineitem⋈orders, ⋈customer); supplier/nation/
  // region broadcast, and the region filter prunes through the
  // broadcast before the fact shuffle.
  val q5SupplierVolume: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
      .filter(to_date(col("o_orderdate")).between("1996-01-01", "1997-12-31"))
    val c = t(s, dir, "customer")
    // resolve supplier → ASIA nation as ONE broadcast dimension and
    // apply it to lineitem FIRST: Catalyst keeps the written join
    // order (no CBO stats here), so putting the most selective
    // broadcast at the bottom means the fact side enters the
    // fact-fact shuffles already pruned to ASIA-supplier lines
    // (~1/5 of rows) — the written-order equivalent of what a
    // cost-based reorder would pick at 100 TB.
    val asiaSup = broadcast(t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name")))
    li.join(asiaSup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  // TPC-H Q7 shape: bilateral trade volume — supplier nation ×
  // customer nation (both directions of one pair), yearly exact
  // revenue. The nation dimension joins twice under different roles
  // (broadcast both); the pair filter prunes through the broadcasts
  // before the fact-fact shuffles.
  val q7TradeVolume: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    // supplier side of the pair filter resolves through broadcasts
    // alone — apply it to lineitem BEFORE the fact-fact shuffles, so
    // only FRANCE/GERMANY-supplier lines (2/25 of rows) ride the
    // orderkey exchange; the customer side of the pair prunes at the
    // customer join (same bottom-up ordering rationale as q5)
    val pairSup = broadcast(t(s, dir, "supplier")
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name").isin("FRANCE", "GERMANY"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation")))
    val n2 = broadcast(t(s, dir, "nation")
      .filter(col("n_name").isin("FRANCE", "GERMANY"))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    li.join(pairSup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "FRANCE" && col("cust_nation") === "GERMANY") ||
        (col("supp_nation") === "GERMANY" && col("cust_nation") === "FRANCE"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // TPC-H Q6 shape: pure scan-side filter + global agg — the
  // pushdown showcase (all three predicates reach the parquet scan;
  // no shuffle beyond the final single-row reduce)
  val q6RevenueForecast: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .filter(to_date(col("l_shipdate")).between("1996-01-01", "1996-12-31") &&
        col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  // Left-semi: customers with ≥1 finished order, per segment
  val jSemiActiveCustomers: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val fOrders = t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
    c.join(fOrders, c("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_mktsegment"))
  }

  // Left-anti: customers with no orders at all, per nation
  val jAntiNoOrders: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("c_nationkey"))
  }

  // Left-outer join preserving empty nations
  val jOuterNationCustomerCounts: Q = (s, dir) => {
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    n.join(c, n("n_nationkey") === c("c_nationkey"), "left_outer")
      .groupBy(col("n_name")).agg(count(col("c_custkey")).as("n_customers"))
      .orderBy(col("n_name"))
  }

  // Broadcast-hash dim join: fact never shuffles
  val jBroadcastBrandVolume: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("p_brand"))

  // Ranking window: top-3 orders per priority.
  // DELIBERATE window demo: o_orderpriority has 5 values, so this
  // sorts all orders across 5 tasks. The scale-safe form of "top-k
  // per low-cardinality key" is TopKAggBy (map-side per-group heap —
  // see tMixtureSample/simKnnGraph), which this repo uses wherever
  // the operator is the point rather than the window function itself.
  val wRankOrdersPerPriority: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(desc("o_totalprice"), col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  // Running-total window over exact decimal daily revenue
  val wRunningDailyRevenue: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev_dec"))
    val w = Grain.bounded(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_revenue", sum(col("rev_dec")).over(w).cast("double"))
      .select(col("day"), col("rev_dec").cast("double").as("daily_revenue"),
        col("running_revenue"))
      .orderBy(col("day"))
  }

  // Dim-dim join over the remaining table: supplier balances by nation
  val jSupplierNation: Q = (s, dir) =>
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(dec(col("s_acctbal"))).cast("double").as("total_acctbal"),
        max(col("s_acctbal")).as("max_acctbal"))
      .orderBy(col("n_name"))

  // Decorrelated "above group average" (window scalar vs row):
  // exact decimal window sum / count → one double division per row
  val wAboveAvgOrders: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority"))
    t(s, dir, "orders")
      .withColumn("avg_p",
        sum(dec(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w))
      .filter(col("o_totalprice") > col("avg_p"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_above"))
      .orderBy(col("o_orderpriority"))
  }

  // Window distribution functions: percent_rank / cume_dist /
  // nth_value. Doubles are single divisions of exact partition-count
  // ints ((rank-1)/(n-1)), so they hash-match across engines; output
  // is thinned to every 997th key so the result stays small while the
  // windows still compute over full partitions. Same deliberate
  // low-cardinality-window caveat as wRankOrdersPerPriority: at
  // 100 TB distribution stats over a 5-value key would go through
  // two-phase ranking (Ranking.scala) instead of one task per key.
  val wDistSuite: Q = (s, dir) => {
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("pr", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(w))
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("pr"),
        col("cd"), col("third_key"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  // Approximate median (quantile sketch) with the same contract as
  // a_approx_distinct: sketches differ per engine, so the
  // cross-engine-checkable columns are the EXACT median plus a
  // tolerance boolean on each engine's own sketch. Prices are
  // converted to integer cents first — linear interpolation between
  // ints lands on .0/.5 exactly, so the exact median is bit-stable
  // across engines.
  val aApproxPercentile: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .withColumn("cents", round(col("l_extendedprice") * 100).cast("long"))
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(cents, 0.5D)").as("exact_median_cents"),
        expr("approx_percentile(cents, 0.5D, 1000)").as("am"))
      .select(col("l_returnflag"),
        col("exact_median_cents"),
        (abs(col("am") - col("exact_median_cents")).cast("double") /
          col("exact_median_cents") <= lit(0.05)).as("median_within_5pct"))
      .orderBy(col("l_returnflag"))

  // Set operations: INTERSECT / EXCEPT / UNION ALL
  val setOpsCustomerOrders: Q = (s, dir) => {
    val custKeys = t(s, dir, "customer").select(col("c_custkey"))
    val orderCust = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    val withOrders = custKeys.intersect(orderCust)
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("with_orders"))
    val noOrders = custKeys.except(orderCust)
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("no_orders"))
    noOrders.unionByName(withOrders).select(col("tag"), col("n")).orderBy(col("tag"))
  }

  // Tumbling 1-day windows over the event stream table (batch twin of
  // the Structured Streaming job in graft.streaming)
  val evTumblingDaily: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("value"))).cast("double").as("total_value"))
      .orderBy(col("day"), col("event_type"))

  // GROUPING SETS — the explicit-combination sibling of CUBE/ROLLUP
  // (both elsewhere in the surface), with a grouping() flag so
  // subtotal rows are distinguishable from genuine NULL keys.
  val aGroupingSets: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderpriority"), col("o_orderstatus")),
          Seq(col("o_orderpriority")), Seq.empty),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        grouping(col("o_orderstatus")).cast("long").as("is_status_total"))
      .orderBy(col("o_orderpriority").asc_nulls_first,
        col("o_orderstatus").asc_nulls_first)

  // FULL OUTER join of two deliberately-sparse per-nation aggregates
  // (nations can appear on either side alone), coalesced to a dense
  // result — completes the outer-join family next to the left-outer
  // and anti variants.
  val jFullOuterSegments: Q = (s, dir) => {
    val c = t(s, dir, "customer")
    val hi = c.filter(col("c_acctbal") > 9000)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_high"))
    val lo = c.filter(col("c_acctbal") < -900)
      .groupBy(col("c_nationkey").as("nk2")).agg(count(lit(1)).as("n_low"))
    hi.join(lo, col("nk") === col("nk2"), "full_outer")
      .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
        coalesce(col("n_high"), lit(0L)).as("n_high"),
        coalesce(col("n_low"), lit(0L)).as("n_low"))
      .orderBy(col("nationkey"))
  }

  // Salted two-phase aggregation exposed in the checked surface:
  // result must equal the plain groupBy sum (the oracle is the
  // UNSALTED SQL), proving the skew-mitigation path is exact. Sum
  // runs in DECIMAL(18,2), so the three-phase reduction (partial →
  // salt-group → final) is order-independent and hash-stable.
  val aSaltedRevenue: Q = (s, dir) =>
    Skew.saltedSum(
      t(s, dir, "lineitem").withColumn("__dec", dec(col("l_extendedprice"))),
      Seq("l_returnflag"), col("__dec"), n = 8, saltSrc = col("l_orderkey"),
      as = "revenue")
      .select(col("l_returnflag"), col("revenue").cast("double").as("revenue"))
      .orderBy(col("l_returnflag"))

  // Hopping (sliding) windows: 2-day windows advancing 1 day, so
  // each event lands in exactly two windows — the streaming-native
  // generalization of the tumbling agg (streaming twin:
  // graft.streaming.EventStreams.hoppingDailyAgg).
  //
  // Written aggregate-then-expand rather than the naive
  // `window(ts, "2 days", "1 day")`: that form Expands every FACT row
  // into 2 window copies before the partial aggregate, doubling the
  // scan-stage output — at 100 TB the dominant cost. Since the slide
  // (1 day) divides the width (2 days), every hop window is the
  // disjoint union of two 1-day tumbling windows: aggregate per
  // tumbling day first (partial count + exact decimal sum), then
  // expand only the |days × types| partials into the 2 hop windows
  // covering each day and re-aggregate. Counts and decimal sums
  // re-associate exactly, so the result is bit-identical.
  val evHoppingDaily: Q = (s, dir) => {
    val daily = t(s, dir, "events")
      .groupBy(window(col("ts"), "1 day").as("d"), col("event_type"))
      .agg(count(lit(1)).as("pn"), sum(dec(col("value"))).as("pv"))
    daily
      .select(explode(array(col("d.start") - expr("INTERVAL 1 DAY"),
        col("d.start"))).as("win_start"),
        col("event_type"), col("pn"), col("pv"))
      .groupBy(col("win_start"), col("event_type"))
      .agg(sum(col("pn")).as("n"),
        sum(col("pv")).cast("double").as("total_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  // Native JSON parsing (schema'd from_json) — companion to the
  // regex variant below
  val evJsonStruct: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("parsed", from_json(col("props"), lit("k BIGINT")))
      .groupBy(col("event_type"))
      .agg(sum(col("parsed.k")).as("sum_k"),
        count(col("parsed.k")).as("n_parsed"))
      .orderBy(col("event_type"))

  // Semi-structured extraction from the JSON props column
  val evJsonExtractSum: Q = (s, dir) =>
    t(s, dir, "events")
      .withColumn("k", regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("long"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  // As-of join: each purchase event paired with the user's latest
  // prior (inclusive) 'view' event — checked against DuckDB's native
  // ASOF JOIN. View side deduped per (user, ts) for determinism.
  val jAsofPurchaseView: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    AsOf.asOfJoin(purchases, views, "user_id", "ts", Seq("view_id"))
      .select(col("purchase_id"), col("user_id"),
        col("asof.view_id").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.__rts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  // Bounded-staleness as-of (ASOF ... TOLERANCE): same purchase→view
  // attribution, but a view older than 24 h does not count — the
  // feature-store freshness contract. The bound is a post-carry
  // scalar predicate (AsOf.asOfJoinTolerance), so the plan is
  // identical to jAsofPurchaseView's one-shuffle carry; the oracle
  // is DuckDB's native ASOF with the staleness CASE applied on top.
  // On this corpus the 24 h bound expires roughly half the matches —
  // both branches exercised.
  val jAsofTolerance: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    AsOf.asOfJoinTolerance(purchases, views, "user_id", "ts", Seq("view_id"),
        toleranceSec = 86400L)
      .select(col("purchase_id"), col("user_id"),
        col("asof.view_id").as("view_id"),
        (unix_micros(col("ts")) - unix_micros(col("asof.__rts"))).as("gap_us"))
      .orderBy(col("purchase_id"))
  }

  // Forward as-of: each (deduped) view event paired with the user's
  // EARLIEST following (inclusive) purchase — next-purchase
  // attribution, the mirror of jAsofPurchaseView. Purchase side
  // deduped per (user, ts) for determinism.
  val jAsofNextPurchase: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("view_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(min(col("event_id")).as("purchase_id"))
    AsOf.asOfJoinForward(views, purchases, "user_id", "ts", Seq("purchase_id"))
      .select(col("view_id"), col("user_id"),
        col("asof.purchase_id").as("purchase_id"),
        (unix_micros(col("asof.__rts")) - unix_micros(col("ts"))).as("gap_us"))
      .orderBy(col("view_id"))
  }

  // Range (interval) join: events within 1h after each purchase by
  // the same user. Equality on user_id keys the shuffle; the range
  // predicate filters within the sorted partition.
  val jRangeFollowOn: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        unix_micros(col("ts")).as("pus"))
    val e = ev.select(col("user_id"), col("event_id").as("follow_id"),
      unix_micros(col("ts")).as("eus"))
    p.join(e, p("user_id") === e("user_id") &&
        col("eus") > col("pus") && col("eus") - col("pus") <= 3600000000L)
      .groupBy(col("purchase_id")).agg(count(lit(1)).as("n_follow_on"))
      .orderBy(col("purchase_id"))
  }

  // Funnel: signup → first purchase conversion. Single-pass
  // conditional-min aggregation — one scan and one shuffle where the
  // join formulation (two scans + two shuffles + join) computed the
  // same thing; the isin filter pushes to the parquet scan. The
  // post-agg isNotNull filter reproduces the left join's "signup
  // users only" domain exactly.
  val evFunnel: Q = (s, dir) =>
    t(s, dir, "events")
      .filter(col("event_type").isin("signup", "purchase"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("ts")))
          .as("first_signup"),
        min(when(col("event_type") === "purchase", col("ts")))
          .as("first_purchase"))
      .filter(col("first_signup").isNotNull)
      .agg(count(lit(1)).as("n_signup_users"),
        count(when(col("first_purchase") >= col("first_signup"), 1))
          .as("n_converted"))
      .withColumn("conversion", d(col("n_converted")) / d(col("n_signup_users")))

  // Cohort retention: users grouped by first-seen week, distinct
  // active users per weeks-since-cohort offset — the product-
  // analytics matrix next to funnel/sessionize. Two shuffles (first-
  // seen reduce, cohort-cell distinct); the first-seen join
  // broadcasts at dim scale and hash-joins at fact scale.
  val evCohortRetention: Q = (s, dir) => {
    val ev = t(s, dir, "events")
    val firstSeen = ev.groupBy(col("user_id"))
      .agg(min(to_date(date_trunc("week", col("ts")))).as("cohort_week"))
    ev.select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("wk"))
      .join(firstSeen, "user_id")
      .withColumn("week_offset",
        (datediff(col("wk"), col("cohort_week")) / 7).cast("long"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  // Event-type transition counts (first-order Markov prep): lag pairs
  // per user ordered by time, corpus-wide transition matrix with a
  // row-conditional probability of exact counts.
  val evTransitions: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = t(s, dir, "events")
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type").as("next"))
      .agg(count(lit(1)).as("c"))
    val totals = pairs.groupBy(col("prev")).agg(sum(col("c")).as("row_total"))
    pairs.join(totals, "prev")
      .select(col("prev"), col("next"), col("c"),
        (col("c").cast("double") / col("row_total").cast("double")).as("p_next"))
      .orderBy(col("prev"), col("next"))
  }

  // HAVING shape: post-aggregation predicate (heavy customers by
  // order count), re-aggregated per segment — filter-on-agg is its
  // own plan form (no pushdown past the aggregate is possible).
  val aHavingHeavyCustomers: Q = (s, dir) => {
    val heavy = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders") >= 30)
    t(s, dir, "customer")
      .join(heavy, col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_heavy"),
        sum(col("n_orders")).as("total_orders"))
      .orderBy(col("c_mktsegment"))
  }

  // Month-over-month revenue change: monthly exact-decimal revenue,
  // lag window, one double division of exact values — the monthly
  // sibling of w_day_over_day.
  val wMonthOverMonth: Q = (s, dir) => {
    val monthly = t(s, dir, "orders")
      .groupBy(to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
      .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev"))
    val w = Grain.bounded(col("mo"))
    monthly
      .withColumn("prev", lag(col("rev"), 1).over(w))
      .select(col("mo"), col("rev").cast("double").as("revenue"),
        ((col("rev").cast("double") - col("prev").cast("double")) /
          col("prev").cast("double") * 100.0).as("pct_change"))
      .orderBy(col("mo"))
  }

  // min_by / max_by argmin-argmax aggregates, made deterministic by
  // ordering on a UNIQUE composite (value, key) struct — bare
  // min_by/max_by tie-breaking is unspecified in both engines, so
  // the composite is the only hash-stable form.
  val aMinmaxBy: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("priciest_order"),
        min_by(col("o_orderkey"),
          struct(col("o_totalprice"), col("o_orderkey"))).as("cheapest_order"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"))

  // Weighted statistics from exact decimal sums (weights=quantity,
  // x=discount): weighted mean and weighted variance with the
  // identical double formula on both engines — same determinism
  // pattern as a_corr_regr.
  val aWeightedStats: Q = (s, dir) => {
    val wq = dec(col("l_quantity")); val x = dec(col("l_discount"))
    val sw = d(col("sw")); val swx = d(col("swx")); val swx2 = d(col("swx2"))
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(sum(wq).as("sw"), sum(wq * x).as("swx"),
        // narrow the first product so the triple stays inside both
        // engines' 38-digit decimal cap (w·x ≤ 5000.0000 — exact at
        // scale 4)
        sum((wq * x).cast(DecimalType(18, 4)) * x).as("swx2"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("n"),
        (swx / sw).as("w_mean_disc"),
        (swx2 / sw - (swx / sw) * (swx / sw)).as("w_var_disc"))
      .orderBy(col("l_returnflag"))
  }

  // Bloom-filter semi-join pruning — the sketch behind runtime filter
  // pushdown at 100 TB: build a bloom over the orders' customer keys
  // (driver-built, broadcast — exactly what AQE's InjectRuntimeFilter
  // ships to the fact scan), probe every customer plus a shifted
  // guaranteed-non-member key set. Contract columns (like the HLL and
  // MinHash entries): zero false negatives (a bloom guarantee) and a
  // shifted-probe false-positive rate within 5× the configured 1% fpp.
  val aBloomPrune: Q = (s, dir) => {
    val orders = t(s, dir, "orders")
    val expected = math.max(orders.count(), 1000L)
    // n bits for the 1% target fpp: m = -n·ln(p)/ln(2)² (the same
    // sizing BloomFilter.create(n, fpp) uses)
    val numBits = math.ceil(
      -expected * math.log(0.01) / (math.log(2) * math.log(2))).toLong
    // native BloomFilterAggregate / BloomFilterMightContain expressions
    // (executor-built two-phase aggregate + codegen'd probe) — the
    // exact pair AQE's runtime-filter injection plans at 100 TB;
    // replaces a per-row Scala UDF probing a driver-built sketch.
    // They are not in the public FunctionRegistry, so they go through
    // the ColumnBridge like the repo's own custom expressions.
    // might_contain requires a CONSTANT bloom input, so the sketch
    // (bounded: numBits/8 bytes, ~18 KB here) is collected once and
    // inlined as a binary literal — exactly what the runtime-filter
    // rule does when it broadcasts the build-side sketch to the scan.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val bloomBytes = orders.agg(
      ColumnBridge.column(new BloomFilterAggregate(
        ColumnBridge.expression(col("o_custkey")),
        Literal(expected), Literal(numBits)).toAggregateExpression())
        .as("bloom")).head().getAs[Array[Byte]](0)
    def mightContain(v: Column): Column =
      ColumnBridge.column(BloomFilterMightContain(
        Literal(bloomBytes), ColumnBridge.expression(v)))
    val actual = orders.select(col("o_custkey").as("c_custkey")).distinct()
      .withColumn("has_orders", lit(true))
    t(s, dir, "customer")
      .join(actual, Seq("c_custkey"), "left_outer")
      .withColumn("has_orders", coalesce(col("has_orders"), lit(false)))
      .withColumn("pos", mightContain(col("c_custkey")))
      .withColumn("shifted_pos", mightContain(col("c_custkey") + 10000000L))
      .agg(count(lit(1)).as("n_customers"),
        count(when(col("has_orders"), 1)).as("n_with_orders"),
        count(when(col("has_orders") && !col("pos"), 1)).as("fn"),
        count(when(col("shifted_pos"), 1)).as("shifted_fp"))
      .select(col("n_customers"), col("n_with_orders"),
        (col("fn") === 0).as("no_false_negatives"),
        (col("shifted_fp").cast("double") <=
          col("n_customers").cast("double") * 0.05).as("fp_rate_ok"))
  }

  // Daily-volume anomaly flags: z-score of each day's event count
  // against the corpus mean/stddev, both derived from exact integer
  // moments (Σc, Σc² over daily counts) with the identical double
  // formula on both engines — the monitoring query pattern, fully
  // deterministic under re-partitioning.
  val evAnomalyDays: Q = (s, dir) => {
    val daily = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val wAll = Grain.whole
    val nd = count(lit(1)).over(wAll).cast("double")
    val s1 = sum(col("c")).over(wAll).cast("double")
    val s2 = sum(col("c") * col("c")).over(wAll).cast("double")
    val mean = s1 / nd
    val sd = sqrt(s2 / nd - (s1 / nd) * (s1 / nd))
    daily
      .withColumn("z", (col("c").cast("double") - mean) / sd)
      .filter(abs(col("z")) > 1.5)
      .select(col("day"), col("c"), col("z"))
      .orderBy(col("day"))
  }

  // Calendar spine gap-fill: generate the full day range (sequence +
  // explode), left-join actual daily revenue, surface missing /
  // present day accounting — the "did every partition arrive"
  // completeness check every ingest pipeline needs.
  val oDateSpine: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"))
    val spine = daily
      .agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(expr("sequence(lo, hi, interval 1 day)")).as("day"))
    spine.join(daily, Seq("day"), "left_outer")
      .groupBy(month(col("day")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_days"),
        count(when(col("rev").isNull, 1)).as("n_missing"),
        count(col("rev")).as("n_present"))
      .orderBy(col("mo"))
  }

  // SCD type-2 interval build: each per-user event becomes a
  // [ts, next_ts) validity version via lead(); per-type version
  // counts, open (current) versions, and exact total validity
  // duration — the slowly-changing-dimension construction every
  // warehouse needs, as one window pass.
  val wScd2Intervals: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("dur_us",
        unix_micros(col("valid_to")) - unix_micros(col("ts")))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_versions"),
        count(when(col("valid_to").isNull, 1)).as("n_current"),
        sum(col("dur_us")).as("total_dur_us"))
      .orderBy(col("event_type"))
  }

  // Native session_window (the streaming-native session operator) in
  // the checked surface: per-user 30-min-gap sessions → session-size
  // histogram. The oracle replays with the lag-based islands form —
  // equivalent on this data (semantics differ only at EXACT-gap
  // boundaries, and the events table has no exact-1800s gap; the
  // StreamingSpec equivalence test pins the same).
  val evSessionWindow: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("n_events")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_events"))

  // Gap-based sessionization via lag window → per-user session counts
  val wSessionizeUsers: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(s, dir, "events")
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1).otherwise(0))
      .groupBy(col("user_id")).agg(sum(col("new_session")).as("sessions"))
      .groupBy(col("sessions")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("sessions"))
  }

  // Approximate aggregates (HLL++): the 100 TB answer to exact
  // countDistinct's full shuffle; the HLL++ estimate itself is
  // engine-specific, so the oracle-checked columns are the exact
  // counts plus within-5%-tolerance booleans (both engines' HLLs at
  // rsd=0.01 sit far inside 5%); absolute error additionally
  // tolerance-tested in ApproxSpec
  val aApproxDistinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact_orders"),
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"),
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"))
      // sketch values are engine-specific; the cross-engine-checkable
      // contract is the tolerance: |approx - exact| / exact <= 5%
      .select(col("l_returnflag"), col("exact_orders"), col("exact_parts"),
        (abs(col("ao") - col("exact_orders")).cast("double") / col("exact_orders")
          <= 0.05).as("orders_within_5pct"),
        (abs(col("ap") - col("exact_parts")).cast("double") / col("exact_parts")
          <= 0.05).as("parts_within_5pct"))
      .orderBy(col("l_returnflag"))

  // Correlation / linear-regression aggregates computed from EXACT
  // decimal moment sums (n, Σx, Σy, Σxy, Σx², Σy²) — the built-in
  // corr/regr_* accumulate doubles in partition order and would not
  // hash-match any oracle; moments in DECIMAL are order-independent
  // under any shuffle, and the final formulas are single double
  // expressions of exact inputs (bit-identical across engines given
  // the same parenthesization). Same two-phase shape a 1000-executor
  // agg takes: partial moments map-side, one reduce.
  val aCorrRegr: Q = (s, dir) => {
    val x = dec(col("l_quantity"))
    val y = dec(col("l_discount"))
    val n = d(col("n")); val sx = d(col("sx")); val sy = d(col("sy"))
    val sxy = d(col("sxy")); val sxx = d(col("sxx")); val syy = d(col("syy"))
    val cov = n * sxy - sx * sy
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"), sum(x * y).as("sxy"),
        sum(x * x).as("sxx"), sum(y * y).as("syy"))
      .select(col("l_returnflag"), col("n"),
        (cov / (sqrt(varx) * sqrt(vary))).as("corr_qty_disc"),
        (cov / varx).as("slope"),
        ((sy - (cov / varx) * sx) / n).as("intercept"),
        ((cov * cov) / (varx * vary)).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  // Ordered string aggregation (listagg shape) — collect_set +
  // sort_array + concat_ws keeps the result order-independent under
  // any partitioning (a bare listagg would be shuffle-order-dependent)
  val aListaggStatuses: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(concat_ws(",", sort_array(collect_set(col("o_orderstatus"))))
          .as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .orderBy(col("o_orderpriority"))

  // Bitwise + boolean aggregate family (bit_and/or/xor, bool_and/or,
  // count_if) — all order-independent reductions
  val aBoolBitSuite: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("bit_and(user_id)").as("uid_and"),
        expr("bit_or(user_id)").as("uid_or"),
        expr("bit_xor(user_id)").as("uid_xor"),
        expr("bool_and(value >= 0)").as("all_nonneg"),
        expr("bool_or(value > 400)").as("any_large"),
        expr("count_if(value < 1)").as("n_small"))
      .orderBy(col("event_type"))

  // RANGE-frame window: 3-day moving revenue over the (gappy) daily
  // series — RANGE over an epoch-day key spans calendar gaps that a
  // ROWS frame would silently skip. Exact decimal window sums.
  val wMovingRevenue: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast(DecimalType(18, 2)).as("rev_dec"))
      .withColumn("dayn", datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val w = Grain.bounded(col("dayn")).rangeBetween(-2, 0)
    daily
      .withColumn("mov3_revenue", sum(col("rev_dec")).over(w).cast("double"))
      .select(col("day"), col("rev_dec").cast("double").as("daily_revenue"),
        col("mov3_revenue"))
      .orderBy(col("day"))
  }

  // Datetime kitchen sink: truncations, field extraction, calendar
  // arithmetic — thinned to every 997th key so the per-row surface
  // stays oracle-comparable without bulk. ISO day-of-week is pinned
  // via weekday()+1 (Mon=1..Sun=7) — the only cross-engine-stable
  // convention.
  val cDatetimeSuite: Q = (s, dir) =>
    t(s, dir, "orders")
      .filter(col("o_orderkey") % 997 === 0)
      .select(col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"),
        to_date(date_trunc("week", col("o_orderdate"))).as("wk_start"),
        to_date(date_trunc("quarter", col("o_orderdate"))).as("qtr_start"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        (weekday(col("o_orderdate")) + 1).cast("long").as("iso_dow"),
        dayofyear(col("o_orderdate")).cast("long").as("doy"),
        weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
        last_day(col("o_orderdate")).as("month_end"),
        add_months(to_date(col("o_orderdate")), 2).as("plus_2mo"),
        date_add(to_date(col("o_orderdate")), 10).as("plus_10d"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  // UNION BY NAME with missing-column fill — schema-evolution union
  // across differently-shaped inputs (position-based union would
  // misalign or reject)
  val jUnionByName: Q = (s, dir) => {
    val cust = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_acctbal").as("bal"),
        col("c_mktsegment").as("seg"))
      .withColumn("src", lit("cust"))
    val supp = t(s, dir, "supplier")
      .select(col("s_acctbal").as("bal"), col("s_suppkey").as("k"))
      .withColumn("src", lit("supp"))
    cust.unionByName(supp, allowMissingColumns = true)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n"),
        count(when(col("seg").isNull, 1)).as("n_null_seg"),
        sum(dec(col("bal"))).cast("double").as("total_bal"))
      .orderBy(col("src"))
  }

  // SQL-parser surface: scalar subquery (decorrelated to a broadcast
  // single-row join) + correlated EXISTS (planned as a left-semi
  // join) through spark.sql — the threshold is an exact-decimal
  // average so the predicate is deterministic cross-engine.
  val sqlSubqueries: Q = (s, dir) => {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_mktsegment, count(*) AS n_rich_active
        |FROM customer_v c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                          / count(*) FROM customer_v)
        |  AND EXISTS (SELECT 1 FROM orders_v o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
  }

  // Gaps-and-islands: longest streaks of consecutive days with
  // above-average revenue (dayn − row_number group trick). The
  // unpartitioned windows run over the DAILY series — bounded at any
  // fact scale (one row per calendar day), so the single-partition
  // window is safe by construction.
  val wRevenueStreaks: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("rev"))
      .withColumn("dayn",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long"))
    val wAll = Grain.whole
    val flagged = daily
      .withColumn("thr",
        sum(col("rev")).over(wAll).cast("double") / count(lit(1)).over(wAll))
      .filter(d(col("rev")) > col("thr"))
    val wOrd = Grain.bounded(col("dayn"))
    flagged
      .withColumn("grp", col("dayn") - row_number().over(wOrd))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("streak_len"),
        min(col("day")).as("start_day"), max(col("day")).as("end_day"))
      .select(col("streak_len"), col("start_day"), col("end_day"))
      .orderBy(desc("streak_len"), col("start_day"))
      .limit(5)
  }

  // Shannon entropy of the priority mix per order status —
  // deterministic float reduction: per-group counts are exact longs,
  // sorted into a list, and the -Σ p·ln p fold runs over that sorted
  // list with a fixed evaluation order (aggregate HOF), so the double
  // result is bit-stable under any shuffle/partitioning — the pattern
  // for ANY order-sensitive float aggregate at scale (a plain
  // sum(p*ln(p)) would hash differently run to run).
  val aEntropyPriority: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_groups"),
        sort_array(collect_list(col("c"))).as("cs"))
      .withColumn("entropy",
        expr("aggregate(cs, 0D, (a, x) -> a - (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))" +
          " * ln(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))"))
      .select(col("o_orderstatus"), col("n"), col("n_groups"), col("entropy"))
      .orderBy(col("o_orderstatus"))

  // Histogram via width_bucket over a fixed [0, 500k)×25 grid —
  // exact-integer bucket keys (the double division lands on exact
  // 20000-steps, identical IEEE both engines), counts + per-bucket
  // decimal revenue
  val aWidthBucket: Q = (s, dir) =>
    t(s, dir, "orders")
      .withColumn("bkt", expr("width_bucket(o_totalprice, 0D, 500000D, 25)"))
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("bucket_revenue"))
      .orderBy(col("bkt"))

  val queries: Map[String, Q] = Map(
    "a_approx_distinct" -> aApproxDistinct,
    "a_entropy_priority" -> aEntropyPriority,
    "a_width_bucket" -> aWidthBucket,
    "sql_subqueries" -> sqlSubqueries,
    "w_revenue_streaks" -> wRevenueStreaks,
    "q5_supplier_volume" -> q5SupplierVolume,
    "q7_trade_volume" -> q7TradeVolume,
    "q6_revenue_forecast" -> q6RevenueForecast,
    "a_corr_regr" -> aCorrRegr,
    "a_listagg_statuses" -> aListaggStatuses,
    "a_bool_bit_suite" -> aBoolBitSuite,
    "w_moving_revenue" -> wMovingRevenue,
    "c_datetime_suite" -> cDatetimeSuite,
    "j_union_by_name" -> jUnionByName,
    "q1_agg" -> q1Agg,
    "q3_revenue_by_nation" -> q3RevenueByNation,
    "j_semi_active_customers" -> jSemiActiveCustomers,
    "j_anti_no_orders" -> jAntiNoOrders,
    "j_outer_nation_customer_counts" -> jOuterNationCustomerCounts,
    "j_broadcast_brand_volume" -> jBroadcastBrandVolume,
    "j_supplier_nation" -> jSupplierNation,
    "w_rank_orders_per_priority" -> wRankOrdersPerPriority,
    "w_running_daily_revenue" -> wRunningDailyRevenue,
    "w_above_avg_orders" -> wAboveAvgOrders,
    "w_dist_suite" -> wDistSuite,
    "a_approx_percentile" -> aApproxPercentile,
    "set_ops_customer_orders" -> setOpsCustomerOrders,
    "a_salted_revenue" -> aSaltedRevenue,
    "a_grouping_sets" -> aGroupingSets,
    "j_full_outer_segments" -> jFullOuterSegments,
    "ev_tumbling_daily" -> evTumblingDaily,
    "ev_hopping_daily" -> evHoppingDaily,
    "ev_json_extract_sum" -> evJsonExtractSum,
    "ev_json_struct" -> evJsonStruct,
    "j_asof_purchase_view" -> jAsofPurchaseView,
    "j_asof_next_purchase" -> jAsofNextPurchase,
    "j_asof_tolerance" -> jAsofTolerance,
    "ev_funnel" -> evFunnel,
    "ev_cohort_retention" -> evCohortRetention,
    "ev_transitions" -> evTransitions,
    "ev_anomaly_days" -> evAnomalyDays,
    "o_date_spine" -> oDateSpine,
    "a_bloom_prune" -> aBloomPrune,
    "a_weighted_stats" -> aWeightedStats,
    "a_minmax_by" -> aMinmaxBy,
    "w_month_over_month" -> wMonthOverMonth,
    "a_having_heavy_customers" -> aHavingHeavyCustomers,
    "w_scd2_intervals" -> wScd2Intervals,
    "ev_session_window" -> evSessionWindow,
    "j_range_follow_on" -> jRangeFollowOn,
    "w_sessionize_users" -> wSessionizeUsers)

  val oracles: Map[String, String] = Map(
    // width_bucket emulated with Spark's exact formula:
    // floor((v - lo) / ((hi - lo) / n)) + 1, bounds to 0 / n+1
    "a_width_bucket" ->
      """SELECT bkt, count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_revenue
        |FROM (SELECT CASE WHEN o_totalprice >= 500000 THEN 26
        |                  WHEN o_totalprice < 0 THEN 0
        |                  ELSE CAST(floor((o_totalprice - 0) / ((500000 - 0) / 25)) AS BIGINT) + 1
        |             END AS bkt, o_totalprice
        |      FROM orders)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same fold, same order: terms over the SORTED count list,
    // ((0 − t₁) − t₂)… via list_prepend + list_reduce
    "a_entropy_priority" ->
      """SELECT o_orderstatus, n, n_groups,
        |       list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |         list_transform(cs, x -> (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
        |                               * ln(CAST(x AS DOUBLE) / CAST(n AS DOUBLE)))),
        |         (a, b) -> a - b) AS entropy
        |FROM (SELECT o_orderstatus, CAST(SUM(c) AS BIGINT) AS n,
        |             count(*) AS n_groups, list_sort(list(c)) AS cs
        |      FROM (SELECT o_orderstatus, o_orderpriority, count(*) AS c
        |            FROM orders GROUP BY 1, 2)
        |      GROUP BY 1)
        |ORDER BY o_orderstatus""".stripMargin,
    "sql_subqueries" ->
      """SELECT c_mktsegment, count(*) AS n_rich_active
        |FROM customer c
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |                          / count(*) FROM customer)
        |  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "w_revenue_streaks" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
        |         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayn
        |  FROM orders GROUP BY 1, 3),
        |flagged AS (
        |  SELECT day, dayn FROM (
        |    SELECT day, dayn, rev,
        |           CAST(SUM(rev) OVER () AS DOUBLE) / COUNT(*) OVER () AS thr
        |    FROM daily)
        |  WHERE CAST(rev AS DOUBLE) > thr),
        |grp AS (
        |  SELECT day, dayn - row_number() OVER (ORDER BY dayn) AS grp
        |  FROM flagged)
        |SELECT count(*) AS streak_len, min(day) AS start_day, max(day) AS end_day
        |FROM grp GROUP BY grp
        |ORDER BY streak_len DESC, start_day LIMIT 5""".stripMargin,
    "q5_supplier_volume" ->
      """SELECT n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND CAST(o_orderdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_trade_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
        |   OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE')
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q6_revenue_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24""".stripMargin,
    // moments in DECIMAL (exact) → named double intermediates → the
    // same formula text as the Spark side, so every double op matches
    // bit for bit
    "a_corr_regr" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
        |         SUM(CAST(l_discount AS DECIMAL(18,2))) AS sy,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS sxy,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS sxx,
        |         SUM(CAST(l_discount AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS syy
        |  FROM lineitem GROUP BY 1),
        |d AS (
        |  SELECT l_returnflag, n, CAST(n AS DOUBLE) AS nd,
        |         CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
        |         CAST(sxy AS DOUBLE) AS sxyd, CAST(sxx AS DOUBLE) AS sxxd,
        |         CAST(syy AS DOUBLE) AS syyd
        |  FROM m),
        |e AS (
        |  SELECT l_returnflag, n, nd, sxd, syd,
        |         nd * sxyd - sxd * syd AS cov,
        |         nd * sxxd - sxd * sxd AS varx,
        |         nd * syyd - syd * syd AS vary
        |  FROM d)
        |SELECT l_returnflag, n,
        |       cov / (sqrt(varx) * sqrt(vary)) AS corr_qty_disc,
        |       cov / varx AS slope,
        |       (syd - (cov / varx) * sxd) / nd AS intercept,
        |       (cov * cov) / (varx * vary) AS r2
        |FROM e ORDER BY l_returnflag""".stripMargin,
    "a_listagg_statuses" ->
      """SELECT o_orderpriority,
        |       array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS statuses,
        |       count(DISTINCT o_orderstatus) AS n_statuses
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_bool_bit_suite" ->
      """SELECT event_type,
        |       bit_and(user_id) AS uid_and, bit_or(user_id) AS uid_or,
        |       bit_xor(user_id) AS uid_xor,
        |       bool_and(value >= 0) AS all_nonneg,
        |       bool_or(value > 400) AS any_large,
        |       count(*) FILTER (WHERE value < 1) AS n_small
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_moving_revenue" ->
      """SELECT day, CAST(rev_dec AS DOUBLE) AS daily_revenue,
        |       CAST(SUM(rev_dec) OVER (ORDER BY dayn
        |         RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_revenue
        |FROM (SELECT CAST(o_orderdate AS DATE) AS day,
        |             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS dayn,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev_dec
        |      FROM orders GROUP BY 1, 2)
        |ORDER BY day""".stripMargin,
    "c_datetime_suite" ->
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS d,
        |       CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_start,
        |       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr_start,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
        |       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
        |       CAST(week(o_orderdate) AS BIGINT) AS iso_week,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus_2mo,
        |       CAST(o_orderdate AS DATE) + 10 AS plus_10d,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
        |FROM orders WHERE o_orderkey % 997 = 0 ORDER BY o_orderkey""".stripMargin,
    "j_union_by_name" ->
      """SELECT src, count(*) AS n,
        |       count(*) FILTER (WHERE seg IS NULL) AS n_null_seg,
        |       CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
        |FROM (SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg,
        |             'cust' AS src
        |      FROM customer
        |      UNION ALL BY NAME
        |      SELECT s_acctbal AS bal, s_suppkey AS k, 'supp' AS src
        |      FROM supplier)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_dist_suite" ->
      """SELECT o_orderpriority, o_orderkey, pr, cd, third_key FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |         percent_rank() OVER w AS pr,
        |         cume_dist() OVER w AS cd,
        |         nth_value(o_orderkey, 3) OVER w AS third_key
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
        |) WHERE o_orderkey % 997 = 0
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,
    "a_approx_percentile" ->
      """SELECT l_returnflag,
        |       quantile_cont(cents, 0.5) AS exact_median_cents,
        |       CAST(abs(approx_quantile(cents, 0.5) - quantile_cont(cents, 0.5)) AS DOUBLE)
        |         / quantile_cont(cents, 0.5) <= 0.05 AS median_within_5pct
        |FROM (SELECT l_returnflag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |      FROM lineitem)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_approx_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS exact_orders,
        |       count(DISTINCT l_partkey) AS exact_parts,
        |       CAST(abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey)) AS DOUBLE)
        |         / count(DISTINCT l_orderkey) <= 0.05 AS orders_within_5pct,
        |       CAST(abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey)) AS DOUBLE)
        |         / count(DISTINCT l_partkey) <= 0.05 AS parts_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "j_semi_active_customers" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_anti_no_orders" ->
      """SELECT c_nationkey, count(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_outer_nation_customer_counts" ->
      """SELECT n_name, count(c_custkey) AS n_customers
        |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_broadcast_brand_volume" ->
      """SELECT p_brand, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_supplier_nation" ->
      """SELECT n_name, count(*) AS n_suppliers,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
        |       max(s_acctbal) AS max_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_rank_orders_per_priority" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn
        |FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |             row_number() OVER (PARTITION BY o_orderpriority
        |                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "w_running_daily_revenue" ->
      """SELECT day, CAST(rev_dec AS DOUBLE) AS daily_revenue,
        |       CAST(SUM(rev_dec) OVER (ORDER BY day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue
        |FROM (SELECT CAST(o_orderdate AS DATE) AS day,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev_dec
        |      FROM orders GROUP BY 1)
        |ORDER BY day""".stripMargin,
    "w_above_avg_orders" ->
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM (SELECT o_orderpriority, o_totalprice,
        |             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |                    OVER (PARTITION BY o_orderpriority) AS DOUBLE)
        |               / COUNT(*) OVER (PARTITION BY o_orderpriority) AS avg_p
        |      FROM orders)
        |WHERE o_totalprice > avg_p
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "set_ops_customer_orders" ->
      """SELECT 'no_orders' AS tag, count(*) AS n
        |FROM (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'with_orders', count(*)
        |FROM (SELECT c_custkey FROM customer INTERSECT SELECT o_custkey FROM orders)
        |ORDER BY tag""".stripMargin,
    "ev_tumbling_daily" ->
      """SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "a_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS is_status_total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST""".stripMargin,
    "j_full_outer_segments" ->
      """SELECT COALESCE(h.nk, l.nk) AS nationkey,
        |       COALESCE(n_high, 0) AS n_high, COALESCE(n_low, 0) AS n_low
        |FROM (SELECT c_nationkey AS nk, count(*) AS n_high
        |      FROM customer WHERE c_acctbal > 9000 GROUP BY 1) h
        |FULL OUTER JOIN
        |     (SELECT c_nationkey AS nk, count(*) AS n_low
        |      FROM customer WHERE c_acctbal < -900 GROUP BY 1) l
        |  ON h.nk = l.nk
        |ORDER BY nationkey""".stripMargin,
    "a_salted_revenue" ->
      // deliberately UNSALTED: the salted three-phase reduction must
      // equal the plain grouped sum exactly
      """SELECT l_returnflag,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_hopping_daily" ->
      // replay: a 2-day/1-day hop assigns each event to the windows
      // starting at its day and the day before
      """SELECT date_trunc('day', ts) - to_days(CAST(k AS INTEGER)) AS win_start,
        |       event_type, count(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM events, (VALUES (0), (1)) t(k)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_json_struct" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_parsed
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_json_extract_sum" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "j_range_follow_on" ->
      """SELECT p.purchase_id, count(*) AS n_follow_on
        |FROM (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS pus
        |      FROM events WHERE event_type = 'purchase') p
        |JOIN (SELECT user_id, event_id AS follow_id, epoch_us(ts) AS eus
        |      FROM events) e
        |  ON p.user_id = e.user_id
        | AND e.eus > p.pus AND e.eus - p.pus <= 3600000000
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "a_having_heavy_customers" ->
      """SELECT c_mktsegment, count(*) AS n_heavy,
        |       CAST(SUM(n_orders) AS BIGINT) AS total_orders
        |FROM customer
        |JOIN (SELECT o_custkey, count(*) AS n_orders
        |      FROM orders GROUP BY 1 HAVING count(*) >= 30) h
        |  ON c_custkey = h.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_month_over_month" ->
      """SELECT mo, CAST(rev AS DOUBLE) AS revenue,
        |       (CAST(rev AS DOUBLE) - CAST(prev AS DOUBLE))
        |         / CAST(prev AS DOUBLE) * 100.0 AS pct_change
        |FROM (SELECT mo, rev, lag(rev) OVER (ORDER BY mo) AS prev
        |      FROM (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
        |                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |            FROM orders GROUP BY 1))
        |ORDER BY mo""".stripMargin,
    // max_by(x, struct(v, x)) ≡ row_number over (v DESC, x DESC);
    // min_by ≡ (v ASC, x ASC) — the lexicographic struct order
    "a_minmax_by" ->
      """WITH r AS (
        |  SELECT o_orderpriority, o_orderkey,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |           ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT p.o_orderpriority, mx.o_orderkey AS priciest_order,
        |       mn.o_orderkey AS cheapest_order, p.max_price
        |FROM (SELECT o_orderpriority, max(o_totalprice) AS max_price
        |      FROM orders GROUP BY 1) p
        |JOIN (SELECT o_orderpriority, o_orderkey FROM r WHERE rmax = 1) mx USING (o_orderpriority)
        |JOIN (SELECT o_orderpriority, o_orderkey FROM r WHERE rmin = 1) mn USING (o_orderpriority)
        |ORDER BY o_orderpriority""".stripMargin,
    "a_weighted_stats" ->
      """SELECT l_returnflag, n,
        |       swx / sw AS w_mean_disc,
        |       swx2 / sw - (swx / sw) * (swx / sw) AS w_var_disc
        |FROM (SELECT l_returnflag,
        |             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sw,
        |             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS swx,
        |             CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS swx2,
        |             count(*) AS n
        |      FROM lineitem GROUP BY 1)
        |ORDER BY l_returnflag""".stripMargin,
    "w_scd2_intervals" ->
      """SELECT event_type, count(*) AS n_versions,
        |       count(CASE WHEN valid_to IS NULL THEN 1 END) AS n_current,
        |       CAST(SUM(epoch_us(valid_to) - epoch_us(ts)) AS BIGINT) AS total_dur_us
        |FROM (SELECT event_type, ts,
        |             lead(ts) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS valid_to
        |      FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // sketch contract: exact counts + pinned TRUE booleans (a bloom
    // with false negatives or a blown fp rate hash-mismatches)
    "a_bloom_prune" ->
      """SELECT count(*) AS n_customers,
        |       count(CASE WHEN EXISTS (SELECT 1 FROM orders o
        |                               WHERE o.o_custkey = c.c_custkey)
        |                  THEN 1 END) AS n_with_orders,
        |       TRUE AS no_false_negatives,
        |       TRUE AS fp_rate_ok
        |FROM customer c""".stripMargin,
    // identical double formula text both sides: mean = s1/nd inlined
    // everywhere it appears, sd from the raw second moment
    "ev_anomaly_days" ->
      """SELECT day, c, z FROM (
        |  SELECT day, c,
        |         (CAST(c AS DOUBLE) - s1 / nd)
        |           / sqrt(s2 / nd - (s1 / nd) * (s1 / nd)) AS z
        |  FROM (SELECT day, c,
        |               CAST(COUNT(*) OVER () AS DOUBLE) AS nd,
        |               CAST(SUM(c) OVER () AS DOUBLE) AS s1,
        |               CAST(SUM(c * c) OVER () AS DOUBLE) AS s2
        |        FROM (SELECT CAST(ts AS DATE) AS day, count(*) AS c
        |              FROM events GROUP BY 1)))
        |WHERE abs(z) > 1.5 ORDER BY day""".stripMargin,
    "o_date_spine" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series((SELECT min(day) FROM daily),
        |                                     (SELECT max(day) FROM daily),
        |                                     INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT CAST(month(s.day) AS BIGINT) AS mo, count(*) AS n_days,
        |       count(CASE WHEN d.rev IS NULL THEN 1 END) AS n_missing,
        |       count(d.rev) AS n_present
        |FROM spine s LEFT JOIN daily d USING (day)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_cohort_retention" ->
      """WITH fs AS (
        |  SELECT user_id,
        |         min(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
        |  FROM events GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(datediff('day', cohort_week,
        |              CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN fs USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "ev_transitions" ->
      """WITH pairs AS (
        |  SELECT prev, event_type AS next, count(*) AS c
        |  FROM (SELECT user_id, event_type,
        |               lag(event_type) OVER (PARTITION BY user_id
        |                                     ORDER BY ts, event_id) AS prev
        |        FROM events)
        |  WHERE prev IS NOT NULL
        |  GROUP BY 1, 2),
        |totals AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS row_total
        |           FROM pairs GROUP BY 1)
        |SELECT prev, next, c,
        |       CAST(c AS DOUBLE) / CAST(row_total AS DOUBLE) AS p_next
        |FROM pairs JOIN totals USING (prev)
        |ORDER BY prev, next""".stripMargin,
    "ev_funnel" ->
      """WITH su AS (SELECT user_id, min(ts) AS first_signup
        |            FROM events WHERE event_type = 'signup' GROUP BY 1),
        |pu AS (SELECT user_id, min(ts) AS first_purchase
        |       FROM events WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT count(*) AS n_signup_users,
        |       count(CASE WHEN first_purchase >= first_signup THEN 1 END) AS n_converted,
        |       CAST(count(CASE WHEN first_purchase >= first_signup THEN 1 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS conversion
        |FROM su LEFT JOIN pu USING (user_id)""".stripMargin,
    "j_asof_purchase_view" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id AS purchase_id
        |      FROM events WHERE event_type = 'purchase')
        |SELECT p.purchase_id, p.user_id, v.view_id,
        |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY purchase_id""".stripMargin,
    "j_asof_tolerance" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, event_id AS purchase_id
        |      FROM events WHERE event_type = 'purchase'),
        |m AS (
        |  SELECT p.purchase_id, p.user_id, v.view_id,
        |         epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |  FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts)
        |SELECT purchase_id, user_id,
        |       CASE WHEN gap_us <= 86400000000 THEN view_id END AS view_id,
        |       CASE WHEN gap_us <= 86400000000 THEN gap_us END AS gap_us
        |FROM m ORDER BY purchase_id""".stripMargin,
    "j_asof_next_purchase" ->
      """WITH v AS (SELECT user_id, ts, max(event_id) AS view_id
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT user_id, ts, min(event_id) AS purchase_id
        |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT v.view_id, v.user_id, p.purchase_id,
        |       epoch_us(p.ts) - epoch_us(v.ts) AS gap_us
        |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts <= p.ts
        |ORDER BY view_id""".stripMargin,
    "ev_session_window" ->
      """SELECT n_events, count(*) AS n_sessions FROM (
        |  SELECT user_id, sess, count(*) AS n_events FROM (
        |    SELECT user_id,
        |           SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |    FROM (SELECT user_id, ts, event_id,
        |                 CASE WHEN prev_us IS NULL
        |                        OR epoch_us(ts) - prev_us > 1800000000 THEN 1
        |                      ELSE 0 END AS ns
        |          FROM (SELECT user_id, ts, event_id,
        |                       lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                                               ORDER BY ts, event_id) AS prev_us
        |                FROM events)))
        |  GROUP BY 1, 2)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_sessionize_users" ->
      """SELECT CAST(sessions AS BIGINT) AS sessions, count(*) AS n_users FROM (
        |  SELECT user_id, SUM(new_session) AS sessions FROM (
        |    SELECT user_id,
        |           CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END AS new_session
        |    FROM (SELECT user_id, ts,
        |                 lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |          FROM events))
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
