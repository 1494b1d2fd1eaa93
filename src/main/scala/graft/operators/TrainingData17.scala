package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 14: storage-layout and privacy-release auditing —
  * a zone-map file-skipping audit (the quantitative "why sorted
  * layout matters" check next to o_zorder_layout), and a
  * deterministic-noise differentially-private histogram release
  * (the ε-accounted publication step after t_k_anonymity). Both
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData17 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // o_zonemap_prune — zone-map (min/max statistics) file-skipping
  // audit: lineitem is laid out into 64 equal row-groups under two
  // layouts — arrival order (l_orderkey, l_linenumber) and
  // price-sorted — zone maps (per-group min/max of the exact
  // DECIMAL price) are computed for each, and the audit reports how
  // many groups a `price BETWEEN 40000 AND 50000` scan can skip
  // under each layout plus the rows it still reads. This is the
  // measurement behind every clustering decision at 100 TB: the
  // same predicate reads ~all arrival-order groups but prunes a
  // sorted layout to the value range. Group assignment is the
  // integer two-phase-rank bucket rule (the o_histogram_equiheight
  // shape — never a single-partition sort); min/max and counts are
  // exact; skip tests are exact DECIMAL comparisons.
  // ---------------------------------------------------------------
  val oZonemapPrune: Q = (s, dir) => {
    val rows = Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"))
      .localCheckpoint(eager = false) // count + both layout rank passes
    val n = rows.count()
    val lo = lit("40000.00").cast("decimal(18,2)")
    val hi = lit("50000.00").cast("decimal(18,2)")
    def layout(name: String, sort: Seq[Column]): DataFrame =
      Ranking.withGlobalRank(rows, "rk", sort: _*)
        .withColumn("grp", expr(s"CAST(((rk - 1) * 64) div $n AS INT)"))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n_rows"), min(col("price")).as("mn"),
          max(col("price")).as("mx"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("mx") < lo || col("mn") > hi, 1L).otherwise(0L))
            .as("n_skipped"),
          sum(when(col("mx") < lo || col("mn") > hi, 0L)
            .otherwise(col("n_rows"))).cast("long").as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_groups"), col("n_skipped"),
          round(d(col("n_skipped")) / d(col("n_groups")), 6).as("skip_rate"),
          col("rows_scanned"))
    layout("arrival", Seq(col("l_orderkey"), col("l_linenumber")))
      .unionAll(layout("price_sorted",
        Seq(col("price"), col("l_orderkey"), col("l_linenumber"))))
      .orderBy(col("layout"))
  }

  // ---------------------------------------------------------------
  // t_dp_histogram — ε-differentially-private histogram release of
  // per-language doc counts via the Laplace mechanism (Dwork et al.
  // 2006; sensitivity 1, ε = 0.5 ⇒ noise scale b = 2): the
  // publication step a privacy-reviewed corpus report runs after
  // t_k_anonymity's suppression audit. Noise is DETERMINISTIC for
  // testability — the uniform draw is the key's own portable 60-bit
  // md5 mapped to (0,1) (u = (h + 0.5)/2⁶⁰, an exact dyadic
  // rational), pushed through the inverse-CDF
  // noise = −b·sign(u−½)·ln(1 − 2|u−½|). A REAL release would draw
  // fresh randomness per publication; the mechanism, sensitivity
  // accounting and ε ledger are what this operator carries. True
  // counts are exact; ln sits on the 1-ulp libm floor so the noisy
  // release rounds to 6 dp (repo policy). One tiny-key aggregate,
  // map-side noise — no extra shuffle.
  // ---------------------------------------------------------------
  val tDpHistogram: Q = (s, dir) => {
    val b = 2.0 // 1/epsilon with epsilon = 0.5, sensitivity 1
    val h = conv(substring(md5(col("lang")), 1, 15), 16, 10).cast("long")
    val u = (d(h) + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    Tables.table(s, dir, "documents")
      .groupBy(col("lang")).agg(count(lit(1)).as("true_n"))
      .select(col("lang"), col("true_n"),
        round(d(col("true_n")) + noise, 6).as("released_n"),
        round(noise, 6).as("noise"),
        lit(0.5).as("epsilon"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "o_zonemap_prune" -> oZonemapPrune,
    "t_dp_histogram" -> tDpHistogram)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "o_zonemap_prune" ->
      """WITH rows_ AS (
        |  SELECT l_orderkey, l_linenumber,
        |         CAST(l_extendedprice AS DECIMAL(18,2)) AS price
        |  FROM lineitem),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM rows_),
        |a AS (
        |  SELECT CAST(((row_number() OVER (ORDER BY l_orderkey,
        |           l_linenumber) - 1) * 64) // n.n AS INT) AS grp, price
        |  FROM rows_ CROSS JOIN n),
        |ag AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
        |         min(price) AS mn, max(price) AS mx
        |  FROM a GROUP BY 1),
        |astats AS (
        |  SELECT 'arrival' AS layout, CAST(count(*) AS BIGINT) AS n_groups,
        |         CAST(sum(CASE WHEN mx < 40000.00 OR mn > 50000.00
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |         CAST(sum(CASE WHEN mx < 40000.00 OR mn > 50000.00
        |           THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned
        |  FROM ag),
        |s_ AS (
        |  SELECT CAST(((row_number() OVER (ORDER BY price, l_orderkey,
        |           l_linenumber) - 1) * 64) // n.n AS INT) AS grp, price
        |  FROM rows_ CROSS JOIN n),
        |sg AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
        |         min(price) AS mn, max(price) AS mx
        |  FROM s_ GROUP BY 1),
        |sstats AS (
        |  SELECT 'price_sorted' AS layout, CAST(count(*) AS BIGINT)
        |           AS n_groups,
        |         CAST(sum(CASE WHEN mx < 40000.00 OR mn > 50000.00
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_skipped,
        |         CAST(sum(CASE WHEN mx < 40000.00 OR mn > 50000.00
        |           THEN 0 ELSE n_rows END) AS BIGINT) AS rows_scanned
        |  FROM sg)
        |SELECT layout, n_groups, n_skipped,
        |       round(CAST(n_skipped AS DOUBLE) / CAST(n_groups AS DOUBLE), 6)
        |         AS skip_rate,
        |       rows_scanned
        |FROM (SELECT * FROM astats UNION ALL SELECT * FROM sstats)
        |ORDER BY layout""".stripMargin,
    "t_dp_histogram" ->
      s"""WITH g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS true_n FROM documents
        |  GROUP BY 1),
        |u AS (
        |  SELECT lang, true_n,
        |         (CAST(${hex15("lang")} AS DOUBLE) + 0.5)
        |           / 1152921504606846976.0 - 0.5 AS c
        |  FROM g)
        |SELECT lang, true_n,
        |       round(CAST(true_n AS DOUBLE)
        |         + (-2.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 6)
        |         AS released_n,
        |       round((-2.0) * sign(c) * ln(1.0 - 2.0 * abs(c)), 6) AS noise,
        |       0.5 AS epsilon
        |FROM u ORDER BY lang""".stripMargin)
}
