package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-10 batch 58: the corpus DATA CARD (a one-row datasheet —
  * Gebru et al. 2021's "Datasheets for Datasets" reduced to the
  * exactly-replayable columns every release ships: sizes, token
  * budget, duplication, quality-gate pass rate), and a bot-traffic
  * triage over the event stream (rate + burst heuristics against a
  * corpus-relative baseline — the pollution filter upstream of every
  * behavioral dataset). Full-replay DuckDB oracles for both.
  */
object TrainingData58 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_data_card — single-row corpus datasheet: doc/lang/source
  // counts, token budget (total/mean/median), exact-duplicate rate,
  // and the registered C4 gate's keep rate — the whole-corpus
  // roll-up ABOVE t_dataset_card's per-(lang, source) sheets, adding
  // the columns that only exist at corpus grain (lang/source
  // cardinalities, the C4 pass rate, the two-phase global token
  // median). Every column is an exact
  // count, a dyadic median, or one final division — the numbers a
  // release README quotes, pinned to the same oracle gate as the
  // operators that produce them. Scale shape: two corpus aggregates
  // (map-side combining), one two-phase global rank for the median
  // (range partition + P carries — never a single-partition sort),
  // and the C4 pass reusing the registered filter; all joined as
  // broadcast one-row frames.
  // ---------------------------------------------------------------
  val tDataCard: Q = (s, dir) => {
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .localCheckpoint(eager = false) // aggregate, rank, and dup passes share it
    val agg = docs.agg(
      count(lit(1)).cast("long").as("n_docs"),
      countDistinct(col("lang")).cast("long").as("n_langs"),
      countDistinct(col("source")).cast("long").as("n_sources"),
      sum(col("nt")).cast("long").as("n_tokens"),
      countDistinct(col("text")).cast("long").as("n_unique_texts"))
    val bounds = docs.agg(count(lit(1)).cast("long").as("n"))
      .withColumn("lo", expr("(n + 1) div 2"))
      .withColumn("hi", expr("(n + 2) div 2"))
    val med = Ranking.withGlobalRank(docs.select(col("doc_id"), col("nt")),
        "rk", col("nt"), col("doc_id"))
      .crossJoin(broadcast(bounds))
      .filter(col("rk") >= col("lo") && col("rk") <= col("hi"))
      .agg((sum(d(col("nt"))) / d(count(lit(1)))).as("median_tokens"))
    val c4 = TrainingData2.tC4Filters(s, dir)
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).cast("long").as("n_keep"),
        count(lit(1)).cast("long").as("n_gated"))
    agg.crossJoin(broadcast(med)).crossJoin(broadcast(c4))
      .select(col("n_docs"), col("n_langs"), col("n_sources"),
        col("n_tokens"),
        round(d(col("n_tokens")) / d(col("n_docs")), 6).as("mean_tokens"),
        col("median_tokens"),
        (col("n_docs") - col("n_unique_texts")).as("n_exact_dup_docs"),
        round(d(col("n_docs") - col("n_unique_texts")) / d(col("n_docs")), 6)
          .as("exact_dup_rate"),
        round(d(col("n_keep")) / d(col("n_gated")), 6).as("c4_keep_rate"))
  }

  // ---------------------------------------------------------------
  // ev_bot_flags — bot-traffic triage per user (complements
  // TrainingData40's ev_bot_flag, which screens on absolute rate +
  // interarrival CV; this one uses a CORPUS-RELATIVE rate threshold
  // and a per-minute burst rule — the two screens catch different
  // bot shapes and ship together in practice): sustained rate
  // (events per active day above 1.15× the corpus MEDIAN rate — a
  // corpus-relative threshold, so the audit ports across scales) and
  // burstiness (≥ 2 events inside one minute — scripted clients
  // fire faster than humans navigate). Flagged users only, with the
  // evidence columns; the upstream cleaning step every behavioral /
  // preference dataset applies before training. Scale shape: two
  // user-keyed aggregates (events → per-minute counts → per-user
  // max), the median rate via the two-phase global rank over the
  // USER list (not the event stream), flags map-side.
  // ---------------------------------------------------------------
  private val BotRateFactor = 1.15
  private val BotBurstMin = 2L

  val evBotFlags: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
      .select(col("user_id"), col("ts"),
        date_trunc("minute", col("ts")).as("mi"),
        to_date(col("ts")).as("day"))
    val per = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        countDistinct(col("day")).cast("long").as("active_days"))
      .withColumn("epd", d(col("n_events")) / d(col("active_days")))
      .localCheckpoint(eager = false) // rank pass + the flag join share it
    val burst = ev.groupBy(col("user_id"), col("mi"))
      .agg(count(lit(1)).cast("long").as("c"))
      .groupBy(col("user_id"))
      .agg(max(col("c")).cast("long").as("max_per_minute"))
    val bounds = per.agg(count(lit(1)).cast("long").as("n"))
      .withColumn("lo", expr("(n + 1) div 2"))
      .withColumn("hi", expr("(n + 2) div 2"))
    val med = Ranking.withGlobalRank(per.select(col("user_id"), col("epd")),
        "rk", col("epd"), col("user_id"))
      .crossJoin(broadcast(bounds))
      .filter(col("rk") >= col("lo") && col("rk") <= col("hi"))
      .agg((sum(col("epd")) / d(count(lit(1)))).as("med_epd"))
    per.join(burst, "user_id").crossJoin(broadcast(med))
      .withColumn("flag_rate", col("epd") > lit(BotRateFactor) * col("med_epd"))
      .withColumn("flag_burst", col("max_per_minute") >= BotBurstMin)
      .filter(col("flag_rate") || col("flag_burst"))
      .select(col("user_id"), col("n_events"), col("active_days"),
        round(col("epd"), 6).as("events_per_day"),
        col("max_per_minute"), round(col("med_epd"), 6).as("median_rate"),
        col("flag_rate"), col("flag_burst"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "t_data_card" -> tDataCard,
    "ev_bot_flags" -> evBotFlags)

  val oracles: Map[String, String] = Map(
    "t_data_card" ->
      s"""WITH dcs AS (
         |  SELECT doc_id, lang, source, text,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
         |  FROM documents),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         |         CAST(sum(nt) AS BIGINT) AS n_tokens,
         |         CAST(count(DISTINCT text) AS BIGINT) AS n_unique_texts
         |  FROM dcs),
         |st AS (
         |  SELECT (count(*) + 1) // 2 AS lo, (count(*) + 2) // 2 AS hi
         |  FROM dcs),
         |r1 AS (
         |  SELECT nt, row_number() OVER (ORDER BY nt, doc_id) AS rk
         |  FROM dcs),
         |med AS (
         |  SELECT sum(nt::DOUBLE) / CAST(count(*) AS DOUBLE)
         |    AS median_tokens
         |  FROM r1 CROSS JOIN st WHERE rk >= lo AND rk <= hi),
         |c4 AS (
         |  SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_keep,
         |         CAST(count(*) AS BIGINT) AS n_gated
         |  FROM (
         |${TrainingData2.oracles("t_c4_filters")}
         |  ))
         |SELECT n_docs, n_langs, n_sources, n_tokens,
         |       round(n_tokens::DOUBLE / n_docs::DOUBLE, 6) AS mean_tokens,
         |       median_tokens,
         |       n_docs - n_unique_texts AS n_exact_dup_docs,
         |       round((n_docs - n_unique_texts)::DOUBLE / n_docs::DOUBLE, 6)
         |         AS exact_dup_rate,
         |       round(n_keep::DOUBLE / n_gated::DOUBLE, 6) AS c4_keep_rate
         |FROM agg CROSS JOIN med CROSS JOIN c4""".stripMargin,
    "ev_bot_flags" ->
      s"""WITH e AS (
         |  SELECT user_id, ts, date_trunc('minute', ts) AS mi,
         |         CAST(ts AS DATE) AS day
         |  FROM events),
         |per AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |         CAST(count(DISTINCT day) AS BIGINT) AS active_days,
         |         count(*)::DOUBLE / count(DISTINCT day)::DOUBLE AS epd
         |  FROM e GROUP BY 1),
         |burst AS (
         |  SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_minute
         |  FROM (SELECT user_id, mi, count(*) AS c FROM e GROUP BY 1, 2)
         |  GROUP BY 1),
         |st AS (
         |  SELECT (count(*) + 1) // 2 AS lo, (count(*) + 2) // 2 AS hi
         |  FROM per),
         |r1 AS (
         |  SELECT epd, row_number() OVER (ORDER BY epd, user_id) AS rk
         |  FROM per),
         |med AS (
         |  SELECT sum(epd) / CAST(count(*) AS DOUBLE) AS med_epd
         |  FROM r1 CROSS JOIN st WHERE rk >= lo AND rk <= hi)
         |SELECT p.user_id, p.n_events, p.active_days,
         |       round(p.epd, 6) AS events_per_day,
         |       b.max_per_minute,
         |       round(m.med_epd, 6) AS median_rate,
         |       p.epd > $BotRateFactor * m.med_epd AS flag_rate,
         |       b.max_per_minute >= $BotBurstMin AS flag_burst
         |FROM per p JOIN burst b USING (user_id) CROSS JOIN med m
         |WHERE p.epd > $BotRateFactor * m.med_epd
         |   OR b.max_per_minute >= $BotBurstMin
         |ORDER BY p.user_id""".stripMargin)
}
