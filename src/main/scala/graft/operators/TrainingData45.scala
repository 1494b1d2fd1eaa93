package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 40: normalization-invariant exact dedup (casefold +
  * whitespace/punctuation canonicalization before hashing — the
  * cheap tier between byte-exact and MinHash that catches
  * re-encodes), embedding anisotropy (Ethayarajh 2019 — the "common
  * direction" audit: expected random-pair cosine = ‖mean(x̂)‖², high
  * means cosine similarity is measuring the corpus, not the pair),
  * and a dup/quality selection-bias audit (are near-duplicates
  * systematically higher-quality than singletons? if yes, dedup
  * silently shifts the quality distribution). All Spark-first with
  * full-replay DuckDB oracles.
  */
object TrainingData45 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // dedup_normalized — exact dedup on the CANONICALIZED text:
  // lowercase, strip non-alphanumerics to spaces, collapse runs,
  // trim — the normalization under which "Foo,  bar!" ≡ "foo bar".
  // Reports per-group survivors (min doc_id) for groups of size > 1
  // — exactly the rows byte-exact dedup (dedup_exact) misses.
  // Scale shape: the canonical key is one codegen'd expression
  // (scan-local), one hash aggregate on the md5 key; no joins.
  // ---------------------------------------------------------------
  val dedupNormalized: Q = (s, dir) => {
    val canon = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), " +", " "))
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), md5(canon).as("ckey"))
      .groupBy(col("ckey"))
      .agg(count(lit(1)).cast("long").as("n_members"),
        min(col("doc_id")).as("survivor"),
        max(col("doc_id")).as("max_member"))
      .filter(col("n_members") > 1)
      .select(col("ckey"), col("n_members"), col("survivor"), col("max_member"))
      .orderBy(col("ckey"))
  }

  // ---------------------------------------------------------------
  // e_anisotropy — expected cosine between random vector pairs:
  // E[cos(x, y)] = ‖m‖² with m = mean of the L2-normalized vectors
  // (the cross terms of the pair expectation collapse to the mean's
  // squared norm). Near 0 = directions spread; large = a common
  // direction dominates and raw cosine thresholds are inflated —
  // recalibrate or center before ANN. Reported globally and per
  // label. Scale shape: one scan explodes to (label, dim) partial
  // sums — map-combinable; the member fold pins vec_id order for
  // the oracle (plain avg at real scale, the sim_kmeans deviation
  // class); the squared norm is a bounded per-label fold.
  // ---------------------------------------------------------------
  val eAnisotropy: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Similarity.toDoubleArr(col("embedding")).as("e0"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e0"), col("e0"))))
      .select(col("vec_id"), col("label"),
        transform(col("e0"), x => x / col("nrm")).as("e"))
      .localCheckpoint(eager = false) // global leg AND per-label leg
    def meanNormSq(df: DataFrame, key: Column, keyName: String): DataFrame =
      df.select(key.as(keyName), col("vec_id"),
          posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy(col(keyName), col("pos"))
        .agg(expr("aggregate(sort_array(collect_list(struct(vec_id, v))), 0D," +
          " (a, x) -> a + x.v)").as("sv"), count(lit(1)).as("n"))
        .withColumn("m", col("sv") / d(col("n")))
        .groupBy(col(keyName))
        .agg(max(col("n")).cast("long").as("n_vectors"),
          expr("aggregate(sort_array(collect_list(struct(pos, m * m))), 0D," +
            " (a, x) -> a + x.col2)").as("a"))
    val global = meanNormSq(emb, lit(-1L), "label")
    val perLabel = meanNormSq(emb, col("label"), "label")
    global.unionAll(perLabel)
      .select(col("label"), col("n_vectors"), round(col("a"), 6).as("anisotropy"))
      .orderBy(col("label"))
  }

  // ---------------------------------------------------------------
  // t_dup_quality_bias — does near-duplication correlate with
  // quality? Docs in any MinHash-LSH near-dup pair vs singletons:
  // group sizes, mean quality (exact micro-units — the
  // t_dataset_card rule), and the Welch t statistic on the
  // difference. A big |t| means dedup is not quality-neutral and
  // the survivor policy (dedup_resolve_best) matters. Scale shape:
  // composes the registered LSH pair machinery (banding, linear in
  // corpus); membership is one distinct projection broadcast-anti
  // against the corpus scan; moments are exact integer sums.
  // ---------------------------------------------------------------
  val tDupQualityBias: Q = (s, dir) => {
    val pairs = Dedup.minhashLshPairs(s, dir, portableHashes = true)
    val dupDocs = pairs.select(explode(array(col("d1"), col("d2"))).as("doc_id"))
      .distinct()
    val docs = Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).as("q"))
    val flagged = docs.join(dupDocs.withColumn("is_dup", lit(true)),
        Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    val m = flagged.groupBy(col("is_dup"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("q")).cast("long").as("sq"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"))
      .withColumn("mean", d(col("sq")) / d(col("n")) / lit(1000000.0))
      .withColumn("vr",
        (d(col("sqq")) - d(col("sq")) * d(col("sq")) / d(col("n"))) /
          (d(col("n")) - lit(1.0)) / lit(1e12))
      .localCheckpoint(eager = false) // both sides of the Welch contrast
    val dup = m.filter(col("is_dup"))
      .select(col("n").as("n_dup"), col("mean").as("mean_dup"),
        col("vr").as("v_dup"))
    val sing = m.filter(!col("is_dup"))
      .select(col("n").as("n_single"), col("mean").as("mean_single"),
        col("vr").as("v_single"))
    dup.crossJoin(broadcast(sing))
      .select(col("n_dup"), col("n_single"),
        round(col("mean_dup"), 6).as("mean_quality_dup"),
        round(col("mean_single"), 6).as("mean_quality_single"),
        round((col("mean_dup") - col("mean_single")) /
          sqrt(col("v_dup") / d(col("n_dup")) +
            col("v_single") / d(col("n_single"))), 6).as("welch_t"))
  }

  val queries: Map[String, Q] = Map(
    "dedup_normalized" -> dedupNormalized,
    "e_anisotropy" -> eAnisotropy,
    "t_dup_quality_bias" -> tDupQualityBias)

  val oracles: Map[String, String] = Map(
    "dedup_normalized" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         md5(trim(regexp_replace(regexp_replace(lower(text),
        |           '[^a-z0-9]+', ' ', 'g'), ' +', ' ', 'g'))) AS ckey
        |  FROM documents)
        |SELECT ckey, CAST(count(*) AS BIGINT) AS n_members,
        |       min(doc_id) AS survivor, max(doc_id) AS max_member
        |FROM c GROUP BY 1 HAVING count(*) > 1
        |ORDER BY ckey""".stripMargin,
    "e_anisotropy" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         list_transform(emb, x -> x / sqrt(list_sum(
        |           list_transform(range(1, len(emb) + 1),
        |             i -> emb[i] * emb[i])))) AS e
        |  FROM (SELECT vec_id, label,
        |               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |        FROM embeddings)),
        |ex AS (
        |  SELECT label, vec_id, unnest(e) AS v,
        |         unnest(range(1, len(e) + 1)) AS pos
        |  FROM e),
        |uni AS (
        |  SELECT CAST(-1 AS BIGINT) AS label, vec_id, v, pos FROM ex
        |  UNION ALL
        |  SELECT label, vec_id, v, pos FROM ex),
        |md AS (
        |  SELECT label, pos,
        |         list_sum(list(v ORDER BY vec_id)) / count(*) AS m,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM uni GROUP BY 1, 2)
        |SELECT label, CAST(max(n) AS BIGINT) AS n_vectors,
        |       round(list_sum(list(m * m ORDER BY pos)), 6) AS anisotropy
        |FROM md GROUP BY 1 ORDER BY label""".stripMargin,
    "t_dup_quality_bias" -> {
      // quality micro-units: the t_dataset_card twin of TF.qualityScore
      val qual =
        """qual AS (
          |  SELECT doc_id,
          |         CAST(floor(
          |           (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
          |             * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
          |                     / CAST(n_tokens AS DOUBLE), 10.0) / 10.0
          |           * 1000000.0) AS BIGINT) AS q
          |  FROM (SELECT doc_id, text,
          |               len(string_split(text, ' ')) AS n_tokens,
          |               len(list_filter(string_split(text, ' '),
          |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
          |        FROM documents))""".stripMargin
      s"""WITH ${TrainingData.minhashCtes},
         |$qual,
         |dup AS (
         |  SELECT DISTINCT doc FROM (
         |    SELECT d1 AS doc FROM lshp UNION ALL SELECT d2 FROM lshp)),
         |flagged AS (
         |  SELECT q.doc_id, q.q,
         |         CASE WHEN dup.doc IS NOT NULL THEN TRUE ELSE FALSE END
         |           AS is_dup
         |  FROM qual q LEFT JOIN dup ON dup.doc = q.doc_id),
         |m AS (
         |  SELECT is_dup, CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(q) AS BIGINT) AS sq,
         |         sum(CAST(q AS DECIMAL(38,0)) * q) AS sqq
         |  FROM flagged GROUP BY 1),
         |mm AS (
         |  SELECT is_dup, n,
         |         sq::DOUBLE / n::DOUBLE / 1000000.0 AS mean,
         |         (sqq::DOUBLE - sq::DOUBLE * sq::DOUBLE / n::DOUBLE)
         |           / (n::DOUBLE - 1.0) / 1e12 AS vr
         |  FROM m)
         |SELECT dup.n AS n_dup, sing.n AS n_single,
         |       round(dup.mean, 6) AS mean_quality_dup,
         |       round(sing.mean, 6) AS mean_quality_single,
         |       round((dup.mean - sing.mean)
         |         / sqrt(dup.vr / dup.n::DOUBLE
         |             + sing.vr / sing.n::DOUBLE), 6) AS welch_t
         |FROM (SELECT * FROM mm WHERE is_dup) dup
         |CROSS JOIN (SELECT * FROM mm WHERE NOT is_dup) sing""".stripMargin
    })
}
