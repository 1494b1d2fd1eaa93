package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 48: the MinHash-LSH banding recall curve (empirical
  * catch rate per exact-Jaccard bucket vs the 1−(1−J^r)^b theory —
  * the measurement that justifies a banding configuration), cohort
  * retention decay (exponential fit + half-life over the pooled
  * k-day return rates), and Cohen's h effect size for the
  * weekend/weekday purchase-mix contrast (the magnitude language a
  * bare p-value lacks). All Spark-first with full-replay DuckDB
  * oracles.
  */
object TrainingData53 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_lsh_recall_curve — banding recall audit at the operating
  // threshold: ground truth = the registered exact 3-gram-Jaccard
  // pairs (dedup_ngram_jaccard's t=0.5 set), restricted to J ≥ 0.7
  // (the LSH verify threshold); per 0.05-wide J bucket, the fraction
  // caught by the registered MinHash-LSH pipeline vs the theoretical
  // s-curve 1−(1−m⁴)¹⁶ at the bucket midpoint (k=64, b=16, r=4).
  // Empirical ≪ theory = banding bug or hash skew; ≈ theory = the
  // configuration does what the math promises. Scale shape: both
  // legs are the registered linear machineries; the comparison is
  // one left join on the (already small) pair sets + a ≤6-bucket
  // aggregate.
  // ---------------------------------------------------------------
  val dedupLshRecallCurve: Q = (s, dir) => {
    val truth = Dedup.ngramJaccardPairs(s, dir, 3, 0.5)
      .filter(col("jaccard") >= 0.7)
    val caught = Dedup.minhashLshPairs(s, dir, portableHashes = true)
      .select(col("d1"), col("d2"), lit(1L).as("hit"))
    val bucketed = truth.join(caught, Seq("d1", "d2"), "left")
      .withColumn("bucket", floor(col("jaccard") * 20.0) / 20.0)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_caught"))
    val mid = col("bucket") + lit(0.025)
    bucketed.select(col("bucket"), col("n_pairs"), col("n_caught"),
        round(d(col("n_caught")) / d(col("n_pairs")), 6).as("empirical_recall"),
        round(lit(1.0) - pow(lit(1.0) - pow(mid, lit(4.0)), lit(16.0)), 6)
          .as("theory_recall"))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------
  // ev_retention_decay — pooled k-day return rates and their
  // exponential fit: p_k = P(user active on d+k | active on d),
  // pooled over all anchor days with d+k inside the window; the
  // ln p_k ~ k regression gives the decay rate and half-life
  // ln2/(−slope) — the single number a retention curve compresses
  // to. Scale shape: activity dedups per (user, day); the k-grid
  // join is an EQUI join on (user, day+k) — never a cross product;
  // the 14-point regression folds in k order; round-6 (libm ln).
  // ---------------------------------------------------------------
  private val RetentionMaxK = 14

  val evRetentionDecay: Q = (s, dir) => {
    val act = Tables.table(s, dir, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .localCheckpoint(eager = false) // anchor side, return side, max-day
    val maxd = act.agg(max(col("day")).as("maxd"))
    val anchors = act.crossJoin(broadcast(maxd))
      .select(col("user_id"), col("day"),
        explode(sequence(lit(1L), lit(RetentionMaxK.toLong))).as("k"),
        col("maxd"))
      .filter(datediff(col("maxd"), col("day")) >= col("k"))
      .withColumn("ret_day", expr("date_add(day, CAST(k AS INT))"))
    val joined = anchors.join(
        act.select(col("user_id"), col("day").as("ret_day"),
          lit(1L).as("hit")),
        Seq("user_id", "ret_day"), "left")
      .groupBy(col("k"))
      .agg(count(lit(1)).cast("long").as("n_base"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_returned"))
      .withColumn("p", d(col("n_returned")) / d(col("n_base")))
      .localCheckpoint(eager = false) // regression AND the output rows
    def fold(v: String): Column =
      expr(s"aggregate(sort_array(collect_list(struct(k, $v))), 0D," +
        s" (a, q) -> a + q.$v)")
    val reg = joined
      .select(col("k"), d(col("k")).as("x"), log(col("p")).as("y"),
        (d(col("k")) * log(col("p"))).as("xy"),
        (d(col("k")) * d(col("k"))).as("xx"))
      .agg(count(lit(1)).cast("long").as("m"), fold("x").as("sx"),
        fold("y").as("sy"), fold("xy").as("sxy"), fold("xx").as("sxx"))
      .select(((d(col("m")) * col("sxy") - col("sx") * col("sy")) /
        (d(col("m")) * col("sxx") - col("sx") * col("sx"))).as("slope"))
    joined.crossJoin(broadcast(reg))
      .select(col("k"), col("n_base"), col("n_returned"),
        round(col("p"), 6).as("p_return"),
        round(col("slope"), 6).as("decay_slope"),
        when(col("slope") < 0.0,
          round(lit(math.log(2.0)) / -col("slope"), 6)).as("half_life_days"))
      .orderBy(col("k"))
  }

  // ---------------------------------------------------------------
  // a_cohens_h — effect size for the weekend/weekday purchase-mix
  // difference: h = 2·asin(√p₁) − 2·asin(√p₂) over the arcsine-
  // stabilized proportions (Cohen 1988; |h| ≈ 0.2/0.5/0.8 = small/
  // medium/large). The magnitude companion to a_permutation_test's
  // significance answer. Scale shape: one scan to four exact counts;
  // asin/sqrt are the only libm touches (round-6).
  // ---------------------------------------------------------------
  val aCohensH: Q = (s, dir) => {
    val cells = Tables.table(s, dir, "events")
      .select(dayofweek(col("ts")).isin(1, 7).as("we"),
        (col("event_type") === "purchase").as("buy"))
      .agg(sum(when(col("we") && col("buy"), 1L).otherwise(0L))
          .cast("long").as("k1"),
        sum(when(col("we"), 1L).otherwise(0L)).cast("long").as("n1"),
        sum(when(!col("we") && col("buy"), 1L).otherwise(0L))
          .cast("long").as("k2"),
        sum(when(!col("we"), 1L).otherwise(0L)).cast("long").as("n2"))
    val p1 = d(col("k1")) / d(col("n1"))
    val p2 = d(col("k2")) / d(col("n2"))
    val h = lit(2.0) * asin(sqrt(p1)) - lit(2.0) * asin(sqrt(p2))
    cells.select(col("k1").as("n_weekend_purchases"),
      col("n1").as("n_weekend_events"),
      col("k2").as("n_weekday_purchases"),
      col("n2").as("n_weekday_events"),
      round(p1, 6).as("p_weekend"), round(p2, 6).as("p_weekday"),
      round(h, 6).as("cohens_h"),
      when(abs(h) < 0.2, "negligible").when(abs(h) < 0.5, "small")
        .when(abs(h) < 0.8, "medium").otherwise(lit("large")).as("magnitude"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_lsh_recall_curve" -> dedupLshRecallCurve,
    "ev_retention_decay" -> evRetentionDecay,
    "a_cohens_h" -> aCohensH)

  val oracles: Map[String, String] = Map(
    "dedup_lsh_recall_curve" ->
      s"""WITH ${TrainingData.minhashCtes},
         |tsh AS (
         |  SELECT doc_id, lang, source, unnest(list_distinct(shingles)) AS sh
         |  FROM (SELECT doc_id, lang, source,
         |               CASE WHEN len(toks) < 3 THEN [text]
         |                    ELSE list_transform(range(1, len(toks) - 1),
         |                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         |               END AS shingles
         |        FROM (SELECT doc_id, lang, source, text,
         |                     string_split(text, ' ') AS toks
         |              FROM documents))),
         |tsizes AS (SELECT doc_id, count(*) AS n FROM tsh GROUP BY 1),
         |tinter AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM tsh a JOIN tsh b
         |    ON a.sh = b.sh AND a.lang = b.lang AND a.source = b.source
         |   AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT d1, d2,
         |         CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
         |  FROM tinter
         |  JOIN tsizes sa ON d1 = sa.doc_id
         |  JOIN tsizes sb ON d2 = sb.doc_id
         |  WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.7),
         |bk AS (
         |  SELECT floor(t.jaccard * 20.0) / 20.0 AS bucket,
         |         CAST(count(*) AS BIGINT) AS n_pairs,
         |         CAST(sum(CASE WHEN l.d1 IS NOT NULL THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_caught
         |  FROM truth t LEFT JOIN lshp l ON l.d1 = t.d1 AND l.d2 = t.d2
         |  GROUP BY 1)
         |SELECT bucket, n_pairs, n_caught,
         |       round(n_caught::DOUBLE / n_pairs::DOUBLE, 6)
         |         AS empirical_recall,
         |       round(1.0 - pow(1.0 - pow(bucket + 0.025, 4.0), 16.0), 6)
         |         AS theory_recall
         |FROM bk ORDER BY bucket""".stripMargin,
    "ev_retention_decay" ->
      s"""WITH act AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         |maxd AS (SELECT max(day) AS maxd FROM act),
         |anchors AS (
         |  SELECT a.user_id, a.day, kk.k, a.day + CAST(kk.k AS INTEGER) AS ret_day
         |  FROM act a
         |  CROSS JOIN (SELECT unnest(range(1, ${RetentionMaxK + 1})) AS k) kk
         |  CROSS JOIN maxd
         |  WHERE datediff('day', a.day, maxd) >= kk.k),
         |joined AS (
         |  SELECT an.k, CAST(count(*) AS BIGINT) AS n_base,
         |         CAST(sum(CASE WHEN r.user_id IS NOT NULL THEN 1 ELSE 0 END)
         |           AS BIGINT) AS n_returned
         |  FROM anchors an
         |  LEFT JOIN act r ON r.user_id = an.user_id AND r.day = an.ret_day
         |  GROUP BY 1),
         |pts AS (
         |  SELECT k, n_base, n_returned,
         |         n_returned::DOUBLE / n_base::DOUBLE AS p
         |  FROM joined),
         |reg AS (
         |  SELECT (CAST(count(*) AS BIGINT)::DOUBLE
         |             * list_sum(list(k::DOUBLE * ln(p) ORDER BY k))
         |           - list_sum(list(k::DOUBLE ORDER BY k))
         |             * list_sum(list(ln(p) ORDER BY k)))
         |         / (CAST(count(*) AS BIGINT)::DOUBLE
         |             * list_sum(list(k::DOUBLE * k::DOUBLE ORDER BY k))
         |           - list_sum(list(k::DOUBLE ORDER BY k))
         |             * list_sum(list(k::DOUBLE ORDER BY k))) AS slope
         |  FROM pts)
         |SELECT CAST(k AS BIGINT) AS k, n_base, n_returned,
         |       round(p, 6) AS p_return,
         |       round(slope, 6) AS decay_slope,
         |       CASE WHEN slope < 0.0 THEN round(ln(2.0) / -slope, 6) END
         |         AS half_life_days
         |FROM pts CROSS JOIN reg
         |ORDER BY k""".stripMargin,
    "a_cohens_h" ->
      """WITH cells AS (
        |  SELECT CAST(sum(CASE WHEN we AND buy THEN 1 ELSE 0 END) AS BIGINT)
        |           AS k1,
        |         CAST(sum(CASE WHEN we THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |         CAST(sum(CASE WHEN NOT we AND buy THEN 1 ELSE 0 END)
        |           AS BIGINT) AS k2,
        |         CAST(sum(CASE WHEN NOT we THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |  FROM (SELECT dayofweek(ts) + 1 IN (1, 7) AS we,
        |               event_type = 'purchase' AS buy
        |        FROM events)),
        |f AS (
        |  SELECT k1, n1, k2, n2,
        |         k1::DOUBLE / n1::DOUBLE AS p1,
        |         k2::DOUBLE / n2::DOUBLE AS p2,
        |         2.0 * asin(sqrt(k1::DOUBLE / n1::DOUBLE))
        |           - 2.0 * asin(sqrt(k2::DOUBLE / n2::DOUBLE)) AS h
        |  FROM cells)
        |SELECT k1 AS n_weekend_purchases, n1 AS n_weekend_events,
        |       k2 AS n_weekday_purchases, n2 AS n_weekday_events,
        |       round(p1, 6) AS p_weekend, round(p2, 6) AS p_weekday,
        |       round(h, 6) AS cohens_h,
        |       CASE WHEN abs(h) < 0.2 THEN 'negligible'
        |            WHEN abs(h) < 0.5 THEN 'small'
        |            WHEN abs(h) < 0.8 THEN 'medium'
        |            ELSE 'large' END AS magnitude
        |FROM f""".stripMargin)
}
