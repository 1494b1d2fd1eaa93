package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 8: classifier/corpus evaluation statistics — ROC
  * AUC for the quality classifier (rank-based Mann–Whitney form,
  * integer-exact numerator), mutual information / NMI of the
  * lang×source composition (the information-theoretic companion of
  * a_chi_square), and Good–Turing frequency smoothing over the token
  * stream (Gale & Sampson 1995 "simple GT" table shape — the
  * unseen-mass estimate an LM data pipeline reports next to
  * t_perplexity). All three re-expressed Spark-first with full-replay
  * DuckDB oracles.
  */
object TrainingData11 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // t_roc_auc — ROC AUC of the fixed-weight linear quality
  // classifier (t_calibration_ece's model) against the independent
  // heuristic ground truth (quality ≥ 0.42). AUC is computed in the
  // rank form AUC = (Σ_pairs [m⁺ > m⁻] + ½[m⁺ = m⁻]) / (P·N),
  // evaluated WITHOUT materializing pairs: group docs by margin,
  // run the two-phase global cumulative negative count up the
  // margin order (Ranking.withGlobalCumSums — range partition +
  // driver carries, never a single-partition window), and fold
  // Σ np·(2·cumneg_excl + nn) = Σ np·(2·cum − nn) as ONE exact
  // integer. The ranking statistic uses the raw LOGIT margin, not
  // the sigmoid: AUC is rank-invariant under monotone maps, and the
  // margin is pure +/×/÷ arithmetic — IEEE-identical on both
  // engines, so tie groups match bit-for-bit (the sigmoid's exp()
  // would sit on the 1-ulp libm floor and could shear a tie).
  // Scale shape: one scan → margin-keyed aggregate → range exchange
  // for the cumsum → one-row reduce. No joins at all.
  // ---------------------------------------------------------------
  val tRocAuc: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val margin = lit(-0.7) +
      lit(0.8) * (size(toks).cast("double") / lit(100.0)) +
      lit(2.0) * TF.stopwordRatio(col("text")) +
      lit(-1.2) * (TF.avgWordLen(col("text")) / lit(10.0)) +
      lit(1.5) * (size(array_distinct(toks)).cast("double") /
        size(toks).cast("double"))
    val f = docs(s, dir).select(margin.as("m"),
      when(TF.qualityScore(col("text")) >= 0.42, 1L).otherwise(0L).as("pos"))
    val byScore = f.groupBy(col("m"))
      .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
    Ranking.withGlobalCumSums(byScore, Seq("nn" -> "cum_nn"), col("m"))
      .agg(sum(col("np")).as("p"), sum(col("nn")).as("n"),
        sum(col("np") * (lit(2L) * col("cum_nn") - col("nn"))).as("num2"))
      .select(col("p").cast("long").as("n_pos"),
        col("n").cast("long").as("n_neg"),
        round(d(col("num2")) / (lit(2.0) * d(col("p")) * d(col("n"))), 6)
          .as("auc"),
        round(d(col("num2")) / (d(col("p")) * d(col("n"))) - lit(1.0), 6)
          .as("gini_coef"))
  }

  // ---------------------------------------------------------------
  // a_mutual_info — mutual information of the (lang × source)
  // contingency table in nats, with the marginal entropies and the
  // sqrt-normalized NMI (Strehl & Ghosh 2002) — the
  // information-theoretic "how language-specialized are my sources"
  // audit next to a_chi_square's significance test. Counts and
  // margins are exact integers off ONE tiny cell aggregate; each of
  // the three float folds (MI over cells, H over each margin) runs
  // in a pinned sort order per the repo float policy. ln() sits on
  // the documented 1-ulp libm floor → outputs round to 6 dp.
  // Scale shape: one count aggregate on the tiny pair key; margins
  // re-aggregate from it; everything after is one-row broadcast
  // arithmetic (the a_chi_square shape).
  // ---------------------------------------------------------------
  val aMutualInfo: Q = (s, dir) => {
    val cells = docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(eager = false) // consumed by both margins and the MI fold
    val rowT = cells.groupBy(col("lang")).agg(sum(col("o")).as("rt"))
    val colT = cells.groupBy(col("source")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    val mi = cells.join(broadcast(rowT), "lang")
      .join(broadcast(colT), "source")
      .crossJoin(broadcast(n))
      .withColumn("contrib", d(col("o")) / d(col("n")) *
        log(d(col("o")) * d(col("n")) / (d(col("rt")) * d(col("ct")))))
      .groupBy(col("n"))
      .agg(expr("aggregate(sort_array(collect_list(struct(lang, source," +
        " contrib))), 0D, (a, x) -> a + x.contrib)").as("mi"))
    val hl = rowT.crossJoin(broadcast(n))
      .withColumn("h", -(d(col("rt")) / d(col("n"))) *
        log(d(col("rt")) / d(col("n"))))
      .agg(expr("aggregate(sort_array(collect_list(struct(lang, h)))," +
        " 0D, (a, x) -> a + x.h)").as("h_lang"))
    val hs = colT.crossJoin(broadcast(n))
      .withColumn("h", -(d(col("ct")) / d(col("n"))) *
        log(d(col("ct")) / d(col("n"))))
      .agg(expr("aggregate(sort_array(collect_list(struct(source, h)))," +
        " 0D, (a, x) -> a + x.h)").as("h_source"))
    mi.crossJoin(broadcast(hl)).crossJoin(broadcast(hs))
      .select(col("n").cast("long").as("n_docs"),
        round(col("mi"), 6).as("mi_nats"),
        round(col("h_lang"), 6).as("h_lang"),
        round(col("h_source"), 6).as("h_source"),
        round(col("mi") / sqrt(col("h_lang") * col("h_source")), 6).as("nmi"))
  }

  // ---------------------------------------------------------------
  // t_good_turing — Good–Turing frequency-of-frequency table over
  // the whitespace token stream: for each observed term frequency
  // r ≤ 10, the count-of-counts N_r, the smoothed frequency
  // r* = (r+1)·N_{r+1}/N_r (Good 1953), that class's share of all
  // tokens, and the unseen-probability mass p₀ = N₁/T — the
  // smoothing table an LM pipeline derives before estimating
  // held-out likelihoods. Term counts, counts-of-counts and totals
  // are exact integers; divisions are fixed-order doubles at the
  // edge. N_{r+1} comes from a hash self-join on r+1 over the TINY
  // frequency-of-frequency frame (≤ max term frequency rows), not a
  // lead() window — no global sort anywhere; the totals cross is
  // the documented one-row broadcast-scalar shape. The report keeps
  // the 10 SMALLEST observed frequency classes (TakeOrdered on the
  // tiny ff frame) — GT smoothing is about the low-count classes,
  // and a fixed `r ≤ 10` cut can be empty on a corpus whose every
  // term is frequent.
  // ---------------------------------------------------------------
  val tGoodTuring: Q = (s, dir) => {
    val tf = docs(s, dir)
      .select(explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("r"))
    val ff = tf.groupBy(col("r")).agg(count(lit(1)).as("n_terms"))
      .localCheckpoint(eager = false) // consumed by the self-join (both sides) + totals
    val tot = ff.agg(sum(col("r") * col("n_terms")).as("t_tokens"),
      sum(when(col("r") === 1, col("n_terms"))).as("n1"))
    ff.orderBy(col("r")).limit(10).alias("a")
      .join(ff.select(col("r").as("r1"), col("n_terms").as("nt1")),
        col("r1") === col("a.r") + 1, "left")
      .crossJoin(broadcast(tot))
      .select(col("a.r").as("r"), col("a.n_terms").as("n_terms"),
        round((d(col("a.r")) + lit(1.0)) * d(col("nt1")) /
          d(col("a.n_terms")), 6).as("r_star"),
        round(d(col("a.r")) * d(col("a.n_terms")) / d(col("t_tokens")), 6)
          .as("token_share"),
        round(d(col("n1")) / d(col("t_tokens")), 6).as("p0_unseen"))
      .orderBy(col("r"))
  }

  val queries: Map[String, Q] = Map(
    "t_roc_auc" -> tRocAuc,
    "a_mutual_info" -> aMutualInfo,
    "t_good_turing" -> tGoodTuring)

  val oracles: Map[String, String] = Map(
    "t_roc_auc" ->
      """WITH f AS (
        |  SELECT (-0.7 + 0.8 * (CAST(len(toks) AS DOUBLE) / 100.0)
        |          + 2.0 * (CAST(n_stops AS DOUBLE) / CAST(len(toks) AS DOUBLE))
        |          + (-1.2) * ((CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE)) / 10.0)
        |          + 1.5 * (CAST(len(list_distinct(toks)) AS DOUBLE)
        |              / CAST(len(toks) AS DOUBLE))) AS m,
        |         (CASE WHEN (1.0 - CAST(n_stops AS DOUBLE)
        |             / CAST(len(toks) AS DOUBLE))
        |             * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE), 10.0) / 10.0 >= 0.42
        |          THEN 1 ELSE 0 END) AS pos
        |  FROM (SELECT text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |g AS (
        |  SELECT m, CAST(sum(pos) AS BIGINT) AS np,
        |         CAST(sum(1 - pos) AS BIGINT) AS nn
        |  FROM f GROUP BY 1),
        |c AS (
        |  SELECT np, nn,
        |         CAST(sum(nn) OVER (ORDER BY m) AS BIGINT) AS cum_nn
        |  FROM g)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |       CAST(sum(nn) AS BIGINT) AS n_neg,
        |       round(CAST(sum(np * (2 * cum_nn - nn)) AS DOUBLE)
        |         / (2.0 * CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE)),
        |         6) AS auc,
        |       round(CAST(sum(np * (2 * cum_nn - nn)) AS DOUBLE)
        |         / (CAST(sum(np) AS DOUBLE) * CAST(sum(nn) AS DOUBLE)) - 1.0,
        |         6) AS gini_coef
        |FROM c""".stripMargin,
    "a_mutual_info" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT source, sum(o) AS ct FROM cells GROUP BY 1),
        |nn AS (SELECT sum(o) AS n FROM cells),
        |k AS (
        |  SELECT cells.lang, cells.source,
        |         CAST(o AS DOUBLE) / CAST(nn.n AS DOUBLE)
        |           * ln(CAST(o AS DOUBLE) * CAST(nn.n AS DOUBLE)
        |               / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)))
        |           AS contrib
        |  FROM cells JOIN rt USING (lang) JOIN ct USING (source)
        |  CROSS JOIN nn),
        |mi AS (
        |  SELECT list_sum(list(contrib ORDER BY lang, source)) AS mi FROM k),
        |hl AS (
        |  SELECT list_sum(list(
        |           -(CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |             * ln(CAST(rt AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |           ORDER BY lang)) AS h_lang
        |  FROM rt CROSS JOIN nn),
        |hs AS (
        |  SELECT list_sum(list(
        |           -(CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |             * ln(CAST(ct AS DOUBLE) / CAST(nn.n AS DOUBLE))
        |           ORDER BY source)) AS h_source
        |  FROM ct CROSS JOIN nn)
        |SELECT CAST(nn.n AS BIGINT) AS n_docs,
        |       round(mi.mi, 6) AS mi_nats,
        |       round(hl.h_lang, 6) AS h_lang,
        |       round(hs.h_source, 6) AS h_source,
        |       round(mi.mi / sqrt(hl.h_lang * hs.h_source), 6) AS nmi
        |FROM mi CROSS JOIN hl CROSS JOIN hs CROSS JOIN nn""".stripMargin,
    "t_good_turing" ->
      """WITH tf AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS r
        |  FROM (SELECT unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1),
        |ff AS (
        |  SELECT r, CAST(count(*) AS BIGINT) AS n_terms FROM tf GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(r * n_terms) AS BIGINT) AS t_tokens,
        |         CAST(sum(CASE WHEN r = 1 THEN n_terms END) AS BIGINT) AS n1
        |  FROM ff)
        |SELECT a.r, a.n_terms,
        |       round((CAST(a.r AS DOUBLE) + 1.0) * CAST(b.n_terms AS DOUBLE)
        |         / CAST(a.n_terms AS DOUBLE), 6) AS r_star,
        |       round(CAST(a.r AS DOUBLE) * CAST(a.n_terms AS DOUBLE)
        |         / CAST(t_tokens AS DOUBLE), 6) AS token_share,
        |       round(CAST(n1 AS DOUBLE) / CAST(t_tokens AS DOUBLE), 6)
        |         AS p0_unseen
        |FROM (SELECT * FROM ff ORDER BY r LIMIT 10) a
        |LEFT JOIN ff b ON b.r = a.r + 1 CROSS JOIN tot
        |ORDER BY a.r""".stripMargin)
}
