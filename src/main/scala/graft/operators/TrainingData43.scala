package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 38: the empirical entropy rate of the per-user
  * event chain (how predictable is the next action given the last —
  * the sessionization/compression dual of ev_markov_stationary),
  * per-term burstiness (Church & Gale 1995 variance-to-mean — the
  * content/function-word separator TF-IDF approximates), and a
  * Beta-posterior incidence estimate with the Jeffreys prior (the
  * small-count-safe rate the raw share overstates). All Spark-first
  * with full-replay DuckDB oracles.
  */
object TrainingData43 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // ev_entropy_rate — empirical conditional entropy of the event
  // chain: H(X_t | X_{t−1}) = −Σ_ij (c_ij/C) ln(c_ij / c_i·) over
  // per-user consecutive pairs, against the marginal H(X) over the
  // same successor stream; predictability_gain = H(X) − H(X|prev)
  // is the information the previous action carries. Scale shape:
  // ONE per-user lag window (user-parallel), one bounded ≤25-cell
  // aggregate; ln terms fold in (i, j) cell order (the a_chi_square
  // sorted-fold rule); outputs round-6.
  // ---------------------------------------------------------------
  val evEntropyRate: Q = (s, dir) => {
    val pairs = Tables.table(s, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .withColumn("prev", expr("lag(event_type, 1) OVER (PARTITION BY user_id" +
        " ORDER BY us, event_id)"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("c"))
      .localCheckpoint(eager = false) // row margins, totals, both entropy folds
    val rowm = pairs.groupBy(col("prev")).agg(sum(col("c")).cast("long").as("ci"))
    val colm = pairs.groupBy(col("event_type"))
      .agg(sum(col("c")).cast("long").as("cj"))
    val tot = pairs.agg(sum(col("c")).cast("long").as("n"))
    val hCond = pairs.join(rowm, Seq("prev")).crossJoin(broadcast(tot))
      .select(col("prev"), col("event_type"),
        (-(d(col("c")) / d(col("n"))) * log(d(col("c")) / d(col("ci"))))
          .as("term"))
      .agg(expr("aggregate(sort_array(collect_list(struct(prev, event_type," +
        " term))), 0D, (a, x) -> a + x.term)").as("h_cond"))
    val hMarg = colm.crossJoin(broadcast(tot))
      .select(col("event_type"),
        (-(d(col("cj")) / d(col("n"))) * log(d(col("cj")) / d(col("n"))))
          .as("term"))
      .agg(expr("aggregate(sort_array(collect_list(struct(event_type, term)))," +
        " 0D, (a, x) -> a + x.term)").as("h_marg"))
    tot.crossJoin(broadcast(hCond)).crossJoin(broadcast(hMarg))
      .select(col("n").as("n_transitions"),
        round(col("h_marg"), 6).as("h_marginal"),
        round(col("h_cond"), 6).as("h_conditional"),
        round(col("h_marg") - col("h_cond"), 6).as("predictability_gain"))
  }

  // ---------------------------------------------------------------
  // t_term_burstiness — Church–Gale burstiness b = Var(tf)/E(tf)
  // per term over ALL documents (zeros included): b ≈ 1 is Poisson
  // scatter (function words), b ≫ 1 is topical clumping (content
  // words) — the lexical statistic that justifies df-based filters.
  // Top-20 by the 6-dp-rounded b (term tiebreak, the bm25
  // rounded-rank rule) among terms with df ≥ 5. Scale shape: tf is
  // one (doc, term) aggregate, per-term moments are map-combinable
  // integer sums (zeros enter via the closed form — the absent docs
  // contribute nothing to Σtf, Σtf²), the corpus doc count is a
  // ONE-ROW broadcast, top-k is TakeOrderedAndProject.
  // ---------------------------------------------------------------
  val tTermBurstiness: Q = (s, dir) => {
    val tf = Tables.table(s, dir, "documents")
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).cast("long").as("tf"))
    val n = Tables.table(s, dir, "documents")
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val mom = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("tf")).cast("long").as("st"),
        sum(col("tf") * col("tf")).cast("long").as("stt"))
      .filter(col("df") >= 5)
      .crossJoin(broadcast(n))
    val mean = d(col("st")) / d(col("n_docs"))
    val vr = d(col("stt")) / d(col("n_docs")) - mean * mean
    mom.select(col("term"), col("df"), col("st").as("total_tf"),
        round(vr / mean, 6).as("burstiness"))
      .orderBy(desc("burstiness"), col("term"))
      .limit(20)
  }

  // ---------------------------------------------------------------
  // a_beta_posterior — per-event-type user-incidence estimate under
  // the Jeffreys Beta(½, ½) prior: posterior mean (k+½)/(n+1) with
  // a normal-approximation 95% interval — the shrunk rate that
  // doesn't scream 100% off one user (the small-sample guardrail
  // for incidence dashboards). k = distinct users with the event,
  // n = all users. Scale shape: one distinct-pair aggregate per
  // type, the ONE-ROW user total broadcasts; arithmetic is exact
  // ints into a fixed double DAG (sqrt is correctly rounded —
  // engine-identical); round-6.
  // ---------------------------------------------------------------
  val aBetaPosterior: Q = (s, dir) => {
    val k = Tables.table(s, dir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).cast("long").as("k"))
    val n = Tables.table(s, dir, "events")
      .agg(countDistinct(col("user_id")).cast("long").as("n"))
    val mean = (d(col("k")) + lit(0.5)) / (d(col("n")) + lit(1.0))
    val se = sqrt(mean * (lit(1.0) - mean) / (d(col("n")) + lit(1.0)))
    k.crossJoin(broadcast(n))
      .select(col("event_type"), col("k").as("n_users_with"),
        col("n").as("n_users"),
        round(d(col("k")) / d(col("n")), 6).as("raw_share"),
        round(mean, 6).as("posterior_mean"),
        round(mean - lit(1.96) * se, 6).as("ci_lo"),
        round(mean + lit(1.96) * se, 6).as("ci_hi"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "ev_entropy_rate" -> evEntropyRate,
    "t_term_burstiness" -> tTermBurstiness,
    "a_beta_posterior" -> aBetaPosterior)

  val oracles: Map[String, String] = Map(
    "ev_entropy_rate" ->
      """WITH pairs AS (
        |  SELECT prev, event_type, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT user_id, event_type,
        |               lag(event_type, 1) OVER (PARTITION BY user_id
        |                 ORDER BY epoch_us(ts), event_id) AS prev
        |        FROM events)
        |  WHERE prev IS NOT NULL
        |  GROUP BY 1, 2),
        |rowm AS (
        |  SELECT prev, CAST(sum(c) AS BIGINT) AS ci FROM pairs GROUP BY 1),
        |colm AS (
        |  SELECT event_type, CAST(sum(c) AS BIGINT) AS cj
        |  FROM pairs GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM pairs),
        |hc AS (
        |  SELECT list_sum(list(
        |           -(c::DOUBLE / n::DOUBLE) * ln(c::DOUBLE / ci::DOUBLE)
        |           ORDER BY prev, event_type)) AS h_cond
        |  FROM pairs JOIN rowm USING (prev) CROSS JOIN tot),
        |hm AS (
        |  SELECT list_sum(list(
        |           -(cj::DOUBLE / n::DOUBLE) * ln(cj::DOUBLE / n::DOUBLE)
        |           ORDER BY event_type)) AS h_marg
        |  FROM colm CROSS JOIN tot)
        |SELECT n AS n_transitions,
        |       round(h_marg, 6) AS h_marginal,
        |       round(h_cond, 6) AS h_conditional,
        |       round(h_marg - h_cond, 6) AS predictability_gain
        |FROM tot CROSS JOIN hc CROSS JOIN hm""".stripMargin,
    "t_term_burstiness" ->
      """WITH tf AS (
        |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |        FROM documents)
        |  GROUP BY 1, 2),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
        |mom AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS df,
        |         CAST(sum(tf) AS BIGINT) AS st,
        |         CAST(sum(tf * tf) AS BIGINT) AS stt
        |  FROM tf GROUP BY 1 HAVING count(*) >= 5)
        |SELECT term, df, st AS total_tf,
        |       round((stt::DOUBLE / n_docs::DOUBLE
        |           - (st::DOUBLE / n_docs::DOUBLE)
        |             * (st::DOUBLE / n_docs::DOUBLE))
        |         / (st::DOUBLE / n_docs::DOUBLE), 6) AS burstiness
        |FROM mom CROSS JOIN n
        |ORDER BY burstiness DESC, term LIMIT 20""".stripMargin,
    "a_beta_posterior" ->
      """WITH k AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS k
        |  FROM (SELECT DISTINCT event_type, user_id FROM events)
        |  GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n FROM events),
        |m AS (
        |  SELECT event_type, k, n,
        |         (k::DOUBLE + 0.5) / (n::DOUBLE + 1.0) AS mean,
        |         sqrt((k::DOUBLE + 0.5) / (n::DOUBLE + 1.0)
        |           * (1.0 - (k::DOUBLE + 0.5) / (n::DOUBLE + 1.0))
        |           / (n::DOUBLE + 1.0)) AS se
        |  FROM k CROSS JOIN n)
        |SELECT event_type, k AS n_users_with, n AS n_users,
        |       round(k::DOUBLE / n::DOUBLE, 6) AS raw_share,
        |       round(mean, 6) AS posterior_mean,
        |       round(mean - 1.96 * se, 6) AS ci_lo,
        |       round(mean + 1.96 * se, 6) AS ci_hi
        |FROM m ORDER BY event_type""".stripMargin)
}
