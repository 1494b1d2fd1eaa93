package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 23: three classic large-corpus operators —
  * a distributed 2-D Pareto frontier (skyline) via the new two-phase
  * global running-min sweep, Apriori-pruned frequent item-pair
  * mining (the SON/market-basket shape), and a RefinedWeb-style
  * per-domain document cap. All Spark-first with full-replay DuckDB
  * oracles.
  */
object TrainingData28 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // o_pareto_frontier — 2-D skyline over part (Börzsönyi et al.
  // 2001): the set of parts where no other part is both cheaper and
  // larger — minimize price, maximize size. The naive formulation is
  // the quadratic NOT-EXISTS dominance self-join; in 2-D the skyline
  // is a LINEAR sweep: reduce to one best-size row per distinct
  // price, then a running max of size over ascending price — a point
  // survives iff it strictly beats every cheaper point's best size.
  // The sweep runs through Ranking.withGlobalCumMinExclusive (on
  // negated size), the same two-phase range-partition + P-row-carry
  // machinery as the global ranks — never a single-partition window.
  // The frontier itself is tiny (O(log n) expected for independent
  // dims), so the tie-collecting join back to part broadcasts it.
  // The oracle replays the identical per-price reduce + running-max
  // sweep; the quadratic dominance definition is differential-pinned
  // in the spec instead, where n is small.
  // ---------------------------------------------------------------
  val oParetoFrontier: Q = (s, dir) => {
    val p = Tables.table(s, dir, "part")
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("price_c"),
        col("p_size"))
    val perPrice = p.groupBy(col("price_c"))
      .agg(max(col("p_size")).as("best_size"))
      .withColumn("negbest", -col("best_size").cast("long"))
    val frontier = Ranking
      .withGlobalCumMinExclusive(perPrice, "negbest", "prevmin",
        col("price_c"))
      .filter(col("negbest") < col("prevmin"))
      .select(col("price_c").as("f_price_c"),
        col("best_size").as("f_best_size"))
      .localCheckpoint(eager = false) // tiny; also severs the self-join lineage
    p.join(broadcast(frontier),
        col("price_c") === col("f_price_c") &&
          col("p_size") === col("f_best_size"))
      .groupBy(col("f_price_c"), col("f_best_size"))
      .agg(count(lit(1)).as("n_tied"),
        min(col("p_partkey")).as("sample_partkey"))
      .select(
        (expr("CAST(f_price_c * 10000 AS BIGINT)") / lit(1000000.0))
          .as("price"),
        col("f_best_size").as("best_size"), col("n_tied"),
        col("sample_partkey"), col("f_price_c"))
      .orderBy(col("f_price_c"))
      .drop("f_price_c")
  }

  // ---------------------------------------------------------------
  // q_basket_pairs — frequent brand-pair mining over order baskets
  // (Agrawal–Srikant Apriori / the SON two-pass shape): baskets are
  // orders, items are the distinct part brands in each order. The
  // Apriori prune runs first — only items with support ≥ 5% of
  // baskets generate candidates (monotonicity: no pair can beat its
  // rarer member) — then pairs come from an ordered self-join of the
  // pruned per-basket postings on the basket key: pair work is
  // Σ per-basket items², bounded by basket size (≤ the order's line
  // count), never corpus². Support thresholds are integer
  // cross-multiplications (supp·20 ≥ n — no float shares); lift is
  // the one rounded libm-touched output. The frequent-item set and
  // the one-row basket count broadcast; top-20 on the total
  // (supp desc, brand_a, brand_b) order plans as TakeOrdered.
  // ---------------------------------------------------------------
  val qBasketPairs: Q = (s, dir) => {
    val items = Tables.table(s, dir, "lineitem")
      .join(Tables.table(s, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
      .distinct()
      .localCheckpoint(eager = false) // three consumers: count, supports, postings
    val nb = items.agg(countDistinct(col("ok")).as("n_baskets"))
    val itemSupp = items.groupBy(col("brand"))
      .agg(count(lit(1)).as("supp_item"))
    val freq = itemSupp.crossJoin(broadcast(nb))
      .filter(col("supp_item") * 20 >= col("n_baskets"))
      .select(col("brand"), col("supp_item"))
    val fi = items.join(broadcast(freq), Seq("brand"))
      .select(col("ok"), col("brand"))
    val pairs = fi.as("a")
      .join(fi.as("b"),
        col("a.ok") === col("b.ok") && col("a.brand") < col("b.brand"))
      .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
      .agg(count(lit(1)).as("supp_pair"))
    pairs.crossJoin(broadcast(nb))
      .filter(col("supp_pair") * 100 >= col("n_baskets"))
      .join(broadcast(freq.select(col("brand").as("brand_a"),
        col("supp_item").as("supp_a"))), Seq("brand_a"))
      .join(broadcast(freq.select(col("brand").as("brand_b"),
        col("supp_item").as("supp_b"))), Seq("brand_b"))
      .select(col("brand_a"), col("brand_b"), col("supp_pair"),
        round(d(col("supp_pair")) * d(col("n_baskets")) /
          (d(col("supp_a")) * d(col("supp_b"))), 6).as("lift"))
      .orderBy(desc("supp_pair"), col("brand_a"), col("brand_b"))
      .limit(20)
  }

  // ---------------------------------------------------------------
  // t_domain_cap — per-domain document cap (the RefinedWeb /
  // Common-Crawl curation rule: no single domain may contribute more
  // than K documents, survivors chosen by a deterministic hash
  // order so the cap is a uniform sample within the domain). K = 18.
  // The rank filter over (source, md5 order) plans as
  // WindowGroupLimit — Spark pushes the ≤K cut into a group-local
  // top-k BEFORE the sort, so a mega-domain never materializes its
  // full posting under the window. Output is the per-domain audit:
  // doc counts, kept/dropped, the effective hash cutoff (the "quota
  // price" of the domain), and the post-cap corpus share in exact
  // micro-units. One scan + two bounded aggregates.
  // ---------------------------------------------------------------
  val tDomainCap: Q = (s, dir) => {
    val k = 18
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        md5(concat(lit("cap:"), col("doc_id").cast("string"))).as("h"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    val kept = docs.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("cutoff_hash"))
    val all = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val tot = kept.agg(sum(col("n_kept")).cast("long").as("kept_total"))
    all.join(kept, Seq("source"))
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("cutoff_hash"),
        (expr("CAST(n_kept * 1000000 div kept_total AS BIGINT)") /
          lit(1000000.0)).as("share_after"))
      .orderBy(col("source"))
  }

  val queries: Map[String, Q] = Map(
    "o_pareto_frontier" -> oParetoFrontier,
    "q_basket_pairs" -> qBasketPairs,
    "t_domain_cap" -> tDomainCap)

  val oracles: Map[String, String] = Map(
    "o_pareto_frontier" ->
      """WITH p AS (
        |  SELECT p_partkey,
        |         CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
        |         p_size
        |  FROM part),
        |perx AS (
        |  SELECT price_c, max(p_size) AS best_size FROM p GROUP BY 1),
        |fr AS (
        |  SELECT price_c, best_size FROM (
        |    SELECT price_c, best_size,
        |           max(best_size) OVER (ORDER BY price_c
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |             AS prevmax
        |    FROM perx) t
        |  WHERE prevmax IS NULL OR best_size > prevmax)
        |SELECT CAST(f.price_c * 10000 AS BIGINT) / 1000000.0 AS price,
        |       f.best_size,
        |       CAST(count(*) AS BIGINT) AS n_tied,
        |       CAST(min(p.p_partkey) AS BIGINT) AS sample_partkey
        |FROM fr f
        |JOIN p ON p.price_c = f.price_c AND p.p_size = f.best_size
        |GROUP BY f.price_c, f.best_size
        |ORDER BY f.price_c""".stripMargin,
    "q_basket_pairs" ->
      """WITH items AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS brand
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
        |nb AS (
        |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_baskets
        |  FROM items),
        |isupp AS (
        |  SELECT brand, CAST(count(*) AS BIGINT) AS supp_item
        |  FROM items GROUP BY 1),
        |freq AS (
        |  SELECT i.brand, i.supp_item
        |  FROM isupp i CROSS JOIN nb
        |  WHERE i.supp_item * 20 >= nb.n_baskets),
        |fi AS (
        |  SELECT it.ok, it.brand
        |  FROM items it JOIN freq f ON it.brand = f.brand),
        |pairs AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b,
        |         CAST(count(*) AS BIGINT) AS supp_pair
        |  FROM fi a JOIN fi b ON a.ok = b.ok AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT p.brand_a, p.brand_b, p.supp_pair,
        |       round(CAST(p.supp_pair AS DOUBLE)
        |           * CAST(nb.n_baskets AS DOUBLE)
        |         / (CAST(fa.supp_item AS DOUBLE)
        |           * CAST(fb.supp_item AS DOUBLE)), 6) AS lift
        |FROM pairs p
        |CROSS JOIN nb
        |JOIN freq fa ON fa.brand = p.brand_a
        |JOIN freq fb ON fb.brand = p.brand_b
        |WHERE p.supp_pair * 100 >= nb.n_baskets
        |ORDER BY p.supp_pair DESC, p.brand_a, p.brand_b
        |LIMIT 20""".stripMargin,
    "t_domain_cap" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         md5('cap:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |rk AS (
        |  SELECT source, h,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY h, doc_id) AS rk
        |  FROM d),
        |kept AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |         max(h) AS cutoff_hash
        |  FROM rk WHERE rk <= 18 GROUP BY 1),
        |alln AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n_kept) AS BIGINT) AS kept_total FROM kept)
        |SELECT a.source, a.n_docs, k.n_kept,
        |       a.n_docs - k.n_kept AS n_dropped, k.cutoff_hash,
        |       CAST(k.n_kept * 1000000 // t.kept_total AS BIGINT)
        |         / 1000000.0 AS share_after
        |FROM alln a
        |JOIN kept k ON a.source = k.source
        |CROSS JOIN tot t
        |ORDER BY a.source""".stripMargin)
}
