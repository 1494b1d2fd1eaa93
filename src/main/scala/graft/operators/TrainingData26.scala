package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 21: serving-cache and hash-infrastructure audits —
  * a KV-cache prefix-sharing audit (how many prompt tokens a
  * shared-prefix cache saves), a χ² hash-uniformity guardrail (the
  * sample-ratio-mismatch check for every md5-keyed split/sample in
  * this engine), and an inter-arrival Poisson-ness audit over the
  * event stream. All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData26 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_prefix_sharing — KV-cache prefix-sharing audit: documents that
  // share their first 8 tokens can share a prefix cache entry (the
  // vLLM/SGLang radix-cache economics); per language the audit
  // reports prefix-group counts and the token savings
  // Σ (group_size − 1) · prefix_len — the KV slots a radix cache
  // avoids recomputing — plus the savings rate against total prompt
  // tokens. Grouping key is the exact 8-token prefix string (md5'd
  // only for display), so the group is the real shareable prefix.
  // Scale shape: one map-side projection to (lang, prefix, n_toks),
  // two stacked map-side-combining aggregates — prefix cardinality
  // ≤ corpus, output bounded by lang. Integer counts and savings;
  // the rate is one micro-unit integral division.
  // ---------------------------------------------------------------
  val tPrefixSharing: Q = (s, dir) => {
    import graft.functions.{TextFunctions => TF}
    val p = 8
    val docs = Tables.table(s, dir, "documents")
      .select(col("lang"), TF.tokens(col("text")).as("toks"))
      .select(col("lang"), size(col("toks")).cast("long").as("n_toks"),
        array_join(slice(col("toks"), 1, p), " ").as("prefix"),
        least(size(col("toks")).cast("long"), lit(p.toLong)).as("plen"))
    val groups = docs.groupBy(col("lang"), col("prefix"), col("plen"))
      .agg(count(lit(1)).as("g"), sum(col("n_toks")).cast("long").as("toks"))
    groups.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_prefix_groups"),
        sum(col("g")).cast("long").as("n_docs"),
        sum(col("toks")).cast("long").as("n_tokens"),
        sum(when(col("g") > 1, (col("g") - 1) * col("plen")).otherwise(0L))
          .cast("long").as("saved_tokens"),
        sum(when(col("g") > 1, col("g")).otherwise(0L)).cast("long")
          .as("n_docs_sharing"))
      .select(col("lang"), col("n_prefix_groups"), col("n_docs"),
        col("n_docs_sharing"), col("saved_tokens"),
        (expr("CAST((saved_tokens * 1000000) div n_tokens AS BIGINT)") /
          lit(1000000.0)).as("savings_rate"))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // o_hash_uniformity — χ² uniformity guardrail over the engine's
  // own hash-routing primitive: md5(doc_id) routed to 64 buckets
  // must be uniform, or every split/sample/shard built on it (split
  // assignment, systematic sampling, shard manifests, LSH banding)
  // inherits the bias — the same statistic an A/B platform runs as
  // the sample-ratio-mismatch (SRM) alarm. χ² = Σ (o − e)²/e over
  // 64 buckets with e = n/64; the audit publishes the statistic and
  // the decision against the χ²₆₃ 99th-percentile literal (92.01,
  // Wilson–Hilferty-free — a fixed table constant, not a libm CDF).
  // Exactness: counts are integers; χ² folds the 64 (o·64 − n)²
  // integer numerators and leaves integer space in one double
  // division per bucket folded in bucket order (sorted-fold policy).
  // Scale shape: one map-side-combining 64-bucket aggregate, then a
  // bounded fold.
  // ---------------------------------------------------------------
  val oHashUniformity: Q = (s, dir) => {
    val b = 64
    val buckets = Tables.table(s, dir, "documents")
      .select((conv(substring(md5(col("doc_id").cast("string")), 1, 15),
        16, 10).cast("long") % b).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("o"))
    buckets
      .agg(sum(col("o")).cast("long").as("n"),
        count(lit(1)).as("n_buckets"),
        min(col("o")).as("min_bucket"), max(col("o")).as("max_bucket"),
        sort_array(collect_list(struct(col("bucket"), col("o")))).as("bs"))
      .select(col("n"), col("n_buckets"), col("min_bucket"),
        col("max_bucket"),
        expr(
          // chi2 = sum (o - n/64)^2 / (n/64)
          //      = (64/n) * sum (o - n/64)^2 ; fold integer (64*o - n)^2
          //      then one division by (64*n) — exact ints until the edge
          s"""round(CAST(aggregate(bs, CAST(0 AS DECIMAL(38,0)),
             |  (acc, x) -> acc + CAST(($b * x.o - n) AS DECIMAL(19,0))
             |    * CAST(($b * x.o - n) AS DECIMAL(19,0)))
             |  AS DOUBLE) / (CAST($b AS DOUBLE) * CAST(n AS DOUBLE)), 6)"""
            .stripMargin).as("chi2"),
        lit(92.01).as("crit_99"))
      .withColumn("uniform", col("chi2") <= col("crit_99"))
  }

  // ---------------------------------------------------------------
  // ev_interarrival — inter-arrival Poisson-ness audit: per event
  // type, the gaps between consecutive occurrences (global event-
  // time order with event_id tiebreak) are summarized as mean and
  // coefficient of variation — CV ≈ 1 is the Poisson signature, CV
  // ≫ 1 bursty, CV ≪ 1 metronomic; the audit that justifies (or
  // refutes) exponential-arrival assumptions in capacity planning.
  // Gaps quantize to whole seconds (exact integral µs division), so
  // n, Σg, Σg² stay in exact longs; mean leaves integer space via
  // the micro-unit division, and CV = √(n·Σg² − (Σg)²) / Σg touches
  // libm only at the final sqrt (round 6). Scale shape: one lag
  // window per event type (5 partitions here; a high-cardinality
  // key at 100 TB — the partition-parallel sessionize shape), then
  // a 5-row aggregate.
  // ---------------------------------------------------------------
  val evInterarrival: Q = (s, dir) => {
    val gaps = Tables.table(s, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .withColumn("gap_s",
        expr("CAST((us - lag(us, 1) OVER (PARTITION BY event_type" +
          " ORDER BY us, event_id)) div 1000000 AS BIGINT)"))
      .filter(col("gap_s").isNotNull)
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        sum(col("gap_s")).cast("long").as("sg"),
        sum(col("gap_s") * col("gap_s")).cast("long").as("sgg"))
      .select(col("event_type"), col("n_gaps"),
        (expr("CAST((sg * 1000000) div n_gaps AS BIGINT)") /
          lit(1000000.0)).as("mean_gap_s"),
        round(sqrt(d(col("n_gaps") * col("sgg") - col("sg") * col("sg"))) /
          d(col("sg")), 6).as("cv"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "t_prefix_sharing" -> tPrefixSharing,
    "o_hash_uniformity" -> oHashUniformity,
    "ev_interarrival" -> evInterarrival)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "t_prefix_sharing" ->
      """WITH docs AS (
        |  SELECT lang,
        |         CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
        |           AS n_toks,
        |         array_to_string(string_split_regex(text, '\s+')[1:8], ' ')
        |           AS prefix,
        |         least(CAST(len(string_split_regex(text, '\s+')) AS BIGINT),
        |           8) AS plen
        |  FROM documents),
        |groups AS (
        |  SELECT lang, prefix, plen, CAST(count(*) AS BIGINT) AS g,
        |         CAST(sum(n_toks) AS BIGINT) AS toks
        |  FROM docs GROUP BY 1, 2, 3)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_prefix_groups,
        |       CAST(sum(g) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN g > 1 THEN g ELSE 0 END) AS BIGINT)
        |         AS n_docs_sharing,
        |       CAST(sum(CASE WHEN g > 1 THEN (g - 1) * plen ELSE 0 END)
        |         AS BIGINT) AS saved_tokens,
        |       CAST((sum(CASE WHEN g > 1 THEN (g - 1) * plen ELSE 0 END)
        |         * 1000000) // sum(toks) AS BIGINT) / 1000000.0
        |         AS savings_rate
        |FROM groups GROUP BY 1 ORDER BY lang""".stripMargin,
    "o_hash_uniformity" -> {
      s"""WITH buckets AS (
        |  SELECT CAST(${hex15("CAST(doc_id AS VARCHAR)")} % 64 AS BIGINT)
        |           AS bucket,
        |         CAST(count(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(o) AS BIGINT) AS n,
        |         CAST(count(*) AS BIGINT) AS n_buckets,
        |         min(o) AS min_bucket, max(o) AS max_bucket,
        |         list({'bucket': bucket, 'o': o} ORDER BY bucket) AS bs
        |  FROM buckets)
        |SELECT n, n_buckets, min_bucket, max_bucket,
        |       round(CAST(list_sum(list_transform(bs,
        |           x -> CAST((64 * x.o - n) AS HUGEINT)
        |             * CAST((64 * x.o - n) AS HUGEINT))) AS DOUBLE)
        |         / (CAST(64 AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS chi2,
        |       92.01 AS crit_99,
        |       round(CAST(list_sum(list_transform(bs,
        |           x -> CAST((64 * x.o - n) AS HUGEINT)
        |             * CAST((64 * x.o - n) AS HUGEINT))) AS DOUBLE)
        |         / (CAST(64 AS DOUBLE) * CAST(n AS DOUBLE)), 6) <= 92.01
        |         AS uniform
        |FROM tot""".stripMargin
    },
    "ev_interarrival" ->
      """WITH gaps AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
        |            PARTITION BY event_type ORDER BY ts, event_id))
        |           // 1000000 AS gap_s
        |  FROM events),
        |g AS (SELECT event_type, gap_s FROM gaps WHERE gap_s IS NOT NULL),
        |agg AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |         CAST(sum(gap_s) AS BIGINT) AS sg,
        |         CAST(sum(gap_s * gap_s) AS BIGINT) AS sgg
        |  FROM g GROUP BY 1)
        |SELECT event_type, n_gaps,
        |       CAST((sg * 1000000) // n_gaps AS BIGINT) / 1000000.0
        |         AS mean_gap_s,
        |       round(sqrt(CAST(n_gaps * sgg - sg * sg AS DOUBLE))
        |         / CAST(sg AS DOUBLE), 6) AS cv
        |FROM agg ORDER BY event_type""".stripMargin)
}
