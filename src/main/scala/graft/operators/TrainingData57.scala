package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 57: ε-DP top-k token release via the one-shot
  * Gumbel mechanism (the SELECTION member the privacy family was
  * missing next to t_dp_histogram's Laplace counts and t_dp_median's
  * exponential mechanism), the cross-source duplication matrix (who
  * copies from whom — the provenance rollup of the registered LSH
  * pair set), and robust anomaly days via the modified z-score
  * (Iglewicz–Hoaglin): two two-phase global medians, never a
  * single-partition sort. Full-replay DuckDB oracles for all three.
  */
object TrainingData57 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_dp_topk — ε-differentially-private top-5 token release via
  // one-shot Gumbel noise (Durfee & Rogers 2019: adding Gumbel(2Δ/ε)
  // to each utility and taking the top k is equivalent to k peeled
  // exponential mechanisms; counting utility ⇒ Δ = 1, ε = 1).
  // Noise is DETERMINISTIC for testability, the t_dp_histogram
  // convention: u = (md5₆₀(token) + ½)/2⁶⁰ (exact dyadic), g =
  // −ln(−ln u). A real release draws fresh randomness; the
  // mechanism, sensitivity accounting and ε ledger are what the
  // operator carries. Scale shape: token counts are a vocab-bounded
  // map-combining aggregate; noise is map-side arithmetic; the top-5
  // is a TakeOrdered over the vocab — no corpus-sized sort.
  // ---------------------------------------------------------------
  private val DpTopK = 5
  private val DpEps = 1.0

  val tDpTopk: Q = (s, dir) => {
    val cnt = Tables.table(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("long").as("true_count"))
    val h = conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long")
    val u = (d(h) + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val g = -log(-log(u))
    cnt
      .withColumn("dp_score",
        lit(DpEps) * d(col("true_count")) / lit(2.0) + g)
      .withColumn("rank", row_number().over(
        Grain.bounded(desc("dp_score"), col("token"))).cast("long"))
      .filter(col("rank") <= DpTopK)
      .select(col("rank"), col("token"), col("true_count"),
        round(col("dp_score"), 6).as("dp_score"),
        lit(DpEps).as("epsilon"))
      .orderBy(col("rank"))
  }

  // ---------------------------------------------------------------
  // dedup_source_matrix — provenance rollup of the registered
  // MinHash-LSH near-dup pair set: pairs bucketed by the UNORDERED
  // (source, source) cell, with each cell's share of all near-dup
  // pairs. Off-diagonal mass = cross-source copying (mirror sites,
  // syndication); diagonal mass = within-source re-posts — the
  // matrix that decides which source to de-prioritize in the crawl.
  // Scale shape: the pair set is the registered banded machinery
  // (linear-ish); the rollup is two FK joins on doc_id plus a
  // source²-bounded aggregate.
  // ---------------------------------------------------------------
  val dedupSourceMatrix: Q = (s, dir) => {
    val pairs = Dedup.minhashLshPairs(s, dir, portableHashes = true)
      .select(col("d1"), col("d2"))
    val src = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val cells = pairs
      .join(src.select(col("doc_id").as("d1"), col("source").as("s1")), "d1")
      .join(src.select(col("doc_id").as("d2"), col("source").as("s2")), "d2")
      .select(least(col("s1"), col("s2")).as("source_a"),
        greatest(col("s1"), col("s2")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast("long").as("n_pairs"))
    val total = cells.agg(sum(col("n_pairs")).cast("long").as("total"))
    cells.crossJoin(broadcast(total))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") =!= col("source_b")).as("cross_source"),
        round(d(col("n_pairs")) / d(col("total")), 6).as("pair_share"))
      .orderBy(col("source_a"), col("source_b"))
  }

  // ---------------------------------------------------------------
  // w_mad_anomalies — robust anomaly days on daily revenue via the
  // modified z-score (Iglewicz & Hoaglin 1993): z = (x − med) /
  // (1.4826·MAD), |z| > 3.5 flags. Median and MAD both run through
  // Ranking.withGlobalRank (range partition + P carry rows — the
  // two-phase discipline, never a single-partition sort of the day
  // stream); revenue is exact integer cents until the final
  // divisions, and both medians are dyadic (sum of ≤2 middle values
  // over their count). The robust counterpart of w_cusum_drift's
  // mean-shift alarm: heavy-tailed order days can't drag the
  // threshold the way they drag a mean/stddev z-score.
  // ---------------------------------------------------------------
  val wMadAnomalies: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
      .localCheckpoint(eager = false) // two rank passes + the output rows
    val bounds = daily.agg(count(lit(1)).cast("long").as("n"))
      .withColumn("lo", expr("(n + 1) div 2"))
      .withColumn("hi", expr("(n + 2) div 2"))
    val med = Ranking.withGlobalRank(daily, "rk", col("m"), col("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("rk") >= col("lo") && col("rk") <= col("hi"))
      .agg((sum(d(col("m"))) / d(count(lit(1)))).as("med"))
    val devs = daily.crossJoin(broadcast(med))
      .withColumn("dev", abs(d(col("m")) - col("med")))
    val mad = Ranking.withGlobalRank(devs.select(col("day"), col("dev")),
        "rk", col("dev"), col("day"))
      .crossJoin(broadcast(bounds))
      .filter(col("rk") >= col("lo") && col("rk") <= col("hi"))
      .agg((sum(col("dev")) / d(count(lit(1)))).as("mad"))
    val z = (d(col("m")) - col("med")) / (lit(1.4826) * col("mad"))
    devs.crossJoin(broadcast(mad))
      .select(col("day"), (d(col("m")) / lit(100.0)).as("revenue"),
        when(col("mad") > 0.0, round(z, 6)).as("robust_z"),
        when(col("mad") > 0.0, abs(z) > 3.5).as("is_anomaly"))
      .orderBy(col("day"))
  }

  val queries: Map[String, Q] = Map(
    "t_dp_topk" -> tDpTopk,
    "dedup_source_matrix" -> dedupSourceMatrix,
    "w_mad_anomalies" -> wMadAnomalies)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "t_dp_topk" ->
      s"""WITH cnt AS (
         |  SELECT token, CAST(count(*) AS BIGINT) AS true_count
         |  FROM (SELECT unnest(string_split(text, ' ')) AS token
         |        FROM documents)
         |  GROUP BY 1),
         |scored AS (
         |  SELECT token, true_count,
         |         $DpEps * true_count::DOUBLE / 2.0
         |           + (-ln(-ln((${hex15("token")}::DOUBLE + 0.5)
         |               / 1152921504606846976.0))) AS dp_score
         |  FROM cnt),
         |rk AS (
         |  SELECT *, row_number() OVER (ORDER BY dp_score DESC, token)
         |    AS rank
         |  FROM scored)
         |SELECT CAST(rank AS BIGINT) AS rank, token, true_count,
         |       round(dp_score, 6) AS dp_score, $DpEps AS epsilon
         |FROM rk WHERE rank <= $DpTopK ORDER BY rank""".stripMargin,
    "dedup_source_matrix" ->
      s"""WITH ${TrainingData.minhashCtes},
         |dd AS (SELECT doc_id, source FROM documents),
         |cells AS (
         |  SELECT least(a.source, b.source) AS source_a,
         |         greatest(a.source, b.source) AS source_b,
         |         CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM lshp
         |  JOIN dd a ON lshp.d1 = a.doc_id
         |  JOIN dd b ON lshp.d2 = b.doc_id
         |  GROUP BY 1, 2),
         |tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS total FROM cells)
         |SELECT source_a, source_b, n_pairs,
         |       source_a <> source_b AS cross_source,
         |       round(n_pairs::DOUBLE / total::DOUBLE, 6) AS pair_share
         |FROM cells CROSS JOIN tot
         |ORDER BY source_a, source_b""".stripMargin,
    "w_mad_anomalies" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |st AS (
        |  SELECT count(*) AS n, (count(*) + 1) // 2 AS lo,
        |         (count(*) + 2) // 2 AS hi
        |  FROM daily),
        |r1 AS (
        |  SELECT m, row_number() OVER (ORDER BY m, day) AS rk FROM daily),
        |med AS (
        |  SELECT sum(m::DOUBLE) / CAST(count(*) AS DOUBLE) AS med
        |  FROM r1 CROSS JOIN st WHERE rk >= lo AND rk <= hi),
        |dv AS (
        |  SELECT day, m, med, abs(m::DOUBLE - med) AS dev
        |  FROM daily CROSS JOIN med),
        |r2 AS (
        |  SELECT dev, row_number() OVER (ORDER BY dev, day) AS rk FROM dv),
        |mad AS (
        |  SELECT sum(dev) / CAST(count(*) AS DOUBLE) AS mad
        |  FROM r2 CROSS JOIN st WHERE rk >= lo AND rk <= hi)
        |SELECT day, m::DOUBLE / 100.0 AS revenue,
        |       CASE WHEN mad > 0.0 THEN
        |         round((m::DOUBLE - med) / (1.4826 * mad), 6) END AS robust_z,
        |       CASE WHEN mad > 0.0 THEN
        |         abs((m::DOUBLE - med) / (1.4826 * mad)) > 3.5 END
        |         AS is_anomaly
        |FROM dv CROSS JOIN mad
        |ORDER BY day""".stripMargin)
}
