package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 30: peaks-over-threshold GPD tail fit (Pickands
  * 1975; Hosking & Wallis 1987 method of moments), greedy
  * submodular vocabulary-coverage selection (the coreset /
  * data-selection staple, Nemhauser et al. 1978), and a k-NN
  * hubness audit (Radovanović et al. 2010). All Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData35 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_pot_gpd — peaks-over-threshold tail fit of daily revenue
  // (EVT: exceedances over a high threshold are ~GPD; Pickands
  // 1975). Threshold u = the type-1 95th percentile of the daily
  // series (value at rank ⌈0.95·n⌉, day tiebreak — integer-exact,
  // no interpolation); the Hosking–Wallis (1987) moment estimators
  // on the exceedances y = x − u:
  //   k̂ = ½(ē²/v − 1),  σ̂ = ½ē(ē²/v + 1)   (k = −ξ)
  // — the disaster-sizing complement of the Hill index (a_tail_index
  // fits the power-law SLOPE; POT-GPD sizes the exceedance law
  // itself). Scale shape: the order stream reduces through one
  // exact-decimal daily aggregate; the rank window runs over the
  // bounded day series (documented low-cardinality family);
  // moments are exact (long Σy, DECIMAL(38,0) Σy²) into a fixed
  // double DAG.
  // ---------------------------------------------------------------
  val wPotGpd: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")).cast("long").as("m"))
      .localCheckpoint(eager = false) // consumed by the rank scan AND the excess scan
    val n = daily.agg(count(lit(1)).as("n"))
    val u = daily
      .withColumn("rk", row_number().over(Grain.bounded(col("m"), col("day")))
        .cast("long"))
      .crossJoin(broadcast(n))
      .filter(col("rk") === ceil(lit(0.95) * d(col("n"))).cast("long"))
      .select(col("m").as("u"), col("n"))
    val ex = daily.crossJoin(broadcast(u))
      .filter(col("m") > col("u"))
      .select(col("u"), col("n"), (col("m") - col("u")).as("y"))
    ex.groupBy(col("u"), col("n"))
      .agg(count(lit(1)).as("n_exceed"),
        sum(col("y")).cast("long").as("s1"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("s2"))
      .withColumn("ne", d(col("n_exceed")))
      .withColumn("e", d(col("s1")) / col("ne"))
      .withColumn("v", (d(col("s2")) - d(col("s1")) * d(col("s1")) / col("ne"))
        / (col("ne") - 1.0))
      .select(col("n").as("n_days"),
        (d(col("u")) / 100.0).as("threshold"),
        col("n_exceed"),
        round(col("e") / 100.0, 6).as("mean_excess"),
        round((col("e") * col("e") / col("v") - 1.0) / 2.0, 6).as("k_hat"),
        round(col("e") * (col("e") * col("e") / col("v") + 1.0) / 2.0
          / 100.0, 6).as("sigma_hat"))
  }

  // ---------------------------------------------------------------
  // t_submodular_coverage — greedy maximum vocabulary coverage
  // (Nemhauser et al. 1978: the greedy (1−1/e) guarantee): pick 8
  // documents, each round choosing the doc covering the most
  // still-uncovered distinct tokens (doc_id tiebreak) — the coreset
  // selection that seeds dedup-aware sampling and eval-set picks.
  // Spark runs the greedy as a driver-bounded 8-round loop
  // (early-exit when nothing new is coverable — the g_kcore
  // convention): each round is ONE anti join (postings vs covered)
  // + one count aggregate + TakeOrdered(1); the covered set only
  // ever holds distinct tokens. The oracle unrolls the same 8
  // rounds (an empty winner stays empty, so early-exit ≡ full
  // unroll). Gains are integers — no float anywhere.
  // ---------------------------------------------------------------
  val tSubmodularCoverage: Q = (s, dir) => {
    val post = Tables.table(s, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .distinct()
      .localCheckpoint(eager = false) // scanned once per round (8 rounds)
    var covered = post.select(col("tok")).limit(0)
    val rounds = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var stop = false
    for (i <- 1 to 8 if !stop) {
      val gains = post.join(covered, Seq("tok"), "left_anti")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("gain"))
      val winner = gains.orderBy(desc("gain"), col("doc_id")).limit(1)
        .localCheckpoint(eager = false) // consumed by output, covered update
      if (winner.isEmpty) stop = true
      else {
        covered = covered
          .union(post.join(broadcast(winner.select(col("doc_id"))),
            Seq("doc_id")).select(col("tok")))
          .distinct()
          .localCheckpoint(eager = false) // next round's anti side + the count
        val total = covered.count()
        rounds += winner.select(lit(i.toLong).as("round"), col("doc_id"),
          col("gain"), lit(total).as("covered_total"))
      }
    }
    rounds.reduce(_ unionAll _).orderBy(col("round"))
  }

  // ---------------------------------------------------------------
  // sim_hubness — k-occurrence (in-degree) histogram of the
  // directed k-NN graph (Radovanović et al. 2010): in high
  // dimensions a few points become "hubs" that appear in many
  // nearest-neighbor lists while antihubs appear in none — the
  // audit that predicts where ANN recall and kNN-graph dedup go
  // wrong. Zero-in-degree nodes are folded in via a left join from
  // the full vector set (never materialized per-edge). Output is
  // the exact integer histogram (in_degree → n_nodes). Scale
  // shape: one count aggregate over the cell-blocked top-3 edge
  // set, one broadcast-size left join, one 2-key histogram
  // aggregate — all map-combinable.
  // ---------------------------------------------------------------
  /** The directed (cell-blocked top-3) k-NN edges — public so the
    * spec can verify the in/out-degree identities on the same set. */
  def knnDirectedEdges(s: SparkSession, dir: String): DataFrame = {
    val (edges, _) = TrainingData2.knnEdgesWithAssigned(s, dir)
    edges
  }

  val simHubness: Q = (s, dir) => {
    val edges = knnDirectedEdges(s, dir)
    val indeg = edges.groupBy(col("dst").as("vec_id"))
      .agg(count(lit(1)).cast("long").as("in_degree"))
    Tables.table(s, dir, "embeddings").select(col("vec_id"))
      .join(indeg, Seq("vec_id"), "left")
      .select(coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .groupBy(col("in_degree"))
      .agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("in_degree"))
  }

  val queries: Map[String, Q] = Map(
    "w_pot_gpd" -> wPotGpd,
    "t_submodular_coverage" -> tSubmodularCoverage,
    "sim_hubness" -> simHubness)

  /** One unrolled greedy-coverage round. */
  private def coverageRounds(n: Int): String =
    (1 to n).map { i =>
      s"""g$i AS (
         |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS gain
         |  FROM post p
         |  WHERE NOT EXISTS (SELECT 1 FROM cov${i - 1} c WHERE c.tok = p.tok)
         |  GROUP BY 1),
         |w$i AS MATERIALIZED (
         |  SELECT CAST($i AS BIGINT) AS round, doc_id, gain FROM g$i
         |  ORDER BY gain DESC, doc_id LIMIT 1),
         |cov$i AS MATERIALIZED (
         |  SELECT tok FROM cov${i - 1}
         |  UNION
         |  SELECT p.tok FROM post p JOIN w$i w ON p.doc_id = w.doc_id),
         |ct$i AS (SELECT CAST(count(*) AS BIGINT) AS covered_total
         |         FROM cov$i)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "w_pot_gpd" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM daily),
        |u AS (
        |  SELECT m AS u, n FROM (
        |    SELECT m, CAST(row_number() OVER (ORDER BY m, day) AS BIGINT)
        |      AS rk
        |    FROM daily) CROSS JOIN n
        |  WHERE rk = CAST(ceil(0.95 * n::DOUBLE) AS BIGINT)),
        |ex AS (
        |  SELECT u.u, u.n, d.m - u.u AS y
        |  FROM daily d CROSS JOIN u WHERE d.m > u.u),
        |mo AS (
        |  SELECT u, n, CAST(count(*) AS BIGINT) AS n_exceed,
        |         CAST(sum(y) AS BIGINT) AS s1,
        |         sum(CAST(y AS DECIMAL(38,0)) * y) AS s2
        |  FROM ex GROUP BY 1, 2),
        |mv AS (
        |  SELECT n, u, n_exceed,
        |         s1::DOUBLE / n_exceed::DOUBLE AS e,
        |         (s2::DOUBLE - s1::DOUBLE * s1::DOUBLE / n_exceed::DOUBLE)
        |           / (n_exceed::DOUBLE - 1.0) AS v
        |  FROM mo)
        |SELECT n AS n_days, u::DOUBLE / 100.0 AS threshold, n_exceed,
        |       round(e / 100.0, 6) AS mean_excess,
        |       round((e * e / v - 1.0) / 2.0, 6) AS k_hat,
        |       round(e * (e * e / v + 1.0) / 2.0 / 100.0, 6) AS sigma_hat
        |FROM mv""".stripMargin,
    "t_submodular_coverage" ->
      s"""WITH post AS MATERIALIZED (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |    FROM documents)),
         |cov0 AS (SELECT tok FROM post WHERE 1 = 0),
         |${coverageRounds(8)}
         |SELECT round, doc_id, gain, covered_total FROM (
         |${(1 to 8).map(i =>
             s"  SELECT w$i.round, w$i.doc_id, w$i.gain, ct$i.covered_total" +
               s" FROM w$i CROSS JOIN ct$i")
             .mkString("\n  UNION ALL\n")})
         |ORDER BY round""".stripMargin,
    "sim_hubness" ->
      s"""WITH ${TrainingData2.knnEdgeCtes},
         |indeg AS (
         |  SELECT dst AS vec_id, CAST(count(*) AS BIGINT) AS in_degree
         |  FROM edges GROUP BY 1)
         |SELECT in_degree, CAST(count(*) AS BIGINT) AS n_nodes FROM (
         |  SELECT coalesce(i.in_degree, 0) AS in_degree
         |  FROM embeddings v LEFT JOIN indeg i ON i.vec_id = v.vec_id)
         |GROUP BY in_degree ORDER BY in_degree""".stripMargin)
}
