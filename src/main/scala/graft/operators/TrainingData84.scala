package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-12 batch 84: three training-data preparation operators —
  * fill-in-the-middle splits, masked-LM corruption accounting, and
  * a k-center coreset.
  *
  *  - t_fim_split — FIM (fill-in-the-middle) document splits:
  *    deterministic md5-dyadic cut points partition each document
  *    into prefix/middle/suffix with exact char conservation — the
  *    preprocessing behind FIM pretraining objectives.
  *  - t_mlm_masking — BERT-style 15% masking census with the
  *    80/10/10 [MASK]/random/keep rule, every decision a
  *    deterministic md5-dyadic uniform per (doc, position, token) —
  *    the corruption-budget audit run before an MLM data release.
  *  - sim_kcenter_coreset — greedy farthest-point (k-center, Gonzalez
  *    1985) coreset of the embedding corpus at k = 8 under cosine
  *    distance: the diversity-sampling shape behind coreset
  *    selection, with the final coverage radius as the quality
  *    certificate.
  *
  * Float policy: the md5₆₀ dyadic-uniform convention
  * (u = (h + ½)/2⁶⁰ — the t_dp_histogram/t_dp_topk rule) makes every
  * sampling decision exactly replayable; k-center distances are the
  * Similarity.dot doubles (bit-identical across engines, the repo's
  * pinned claim) compared/min-ed only (order-free).
  */
object TrainingData84 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  /** md5₆₀ as exact dyadic uniform in [0, 1). */
  private def u60(c: Column): Column =
    (d(conv(substring(md5(c), 1, 15), 16, 10).cast("long")) + lit(0.5)) /
      lit(1152921504606846976.0) // 2^60

  private val u60Sql = (x: String) =>
    s"""((CAST(list_reduce(list_transform(
       |    string_split(substr(md5($x), 1, 15), ''),
       |    c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
       |  (a, b) -> a * 16 + b) AS DOUBLE) + 0.5)
       |  / 1152921504606846976.0)""".stripMargin.replaceAll("\n", " ")

  // ---------------------------------------------------------------
  // t_fim_split — cut1 = ⌊len·(0.1 + 0.4·u₁)⌋,
  // cut2 = cut1 + ⌊(len − cut1)·(0.3 + 0.4·u₂)⌋ with u₁/u₂ the
  // doc-keyed dyadic uniforms: prefix ∈ [10%, 50%), middle 30-70% of
  // the remainder, suffix the rest — char counts conserve exactly by
  // construction. One row per document; corpus-level budget shares
  // are one aggregate away. Scale shape: a pure per-row map over the
  // documents scan.
  // ---------------------------------------------------------------
  val tFimSplit: Q = (s, dir) => {
    Tables.table(s, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
      .filter(col("len") >= 10L)
      .withColumn("u1", u60(concat(col("doc_id").cast("string"),
        lit(":fim1"))))
      .withColumn("u2", u60(concat(col("doc_id").cast("string"),
        lit(":fim2"))))
      .withColumn("cut1",
        floor(d(col("len")) * (lit(0.1) + lit(0.4) * col("u1")))
          .cast("long"))
      .withColumn("cut2", (col("cut1") +
        floor(d(col("len") - col("cut1")) *
          (lit(0.3) + lit(0.4) * col("u2"))).cast("long")).cast("long"))
      .select(col("doc_id"), col("len").as("len_chars"),
        col("cut1").as("prefix_len"),
        (col("cut2") - col("cut1")).as("middle_len"),
        (col("len") - col("cut2")).as("suffix_len"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // t_mlm_masking — per token position: u = md5₆₀(doc:pos:token)
  // masks at u < 0.15; masked positions draw a second uniform for
  // the 80/10/10 action split ([MASK] / random replacement / keep
  // original). Census per document: exact integer counts + the
  // realized mask rate. Scale shape: one posexplode scan, one
  // doc-grain aggregate — map-combining all the way.
  // ---------------------------------------------------------------
  val tMlmMasking: Q = (s, dir) => {
    val toks = Tables.table(s, dir, "documents")
      .select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val key = concat(col("doc_id").cast("string"), lit(":"),
      col("pos").cast("string"), lit(":"), col("tok"))
    val act = concat(col("doc_id").cast("string"), lit(":"),
      col("pos").cast("string"), lit(":act"))
    toks
      .withColumn("u", u60(key))
      .withColumn("masked", (col("u") < 0.15).cast("long"))
      .withColumn("v", u60(act))
      .withColumn("a_mask",
        (col("masked") === 1L && col("v") < 0.8).cast("long"))
      .withColumn("a_rand",
        (col("masked") === 1L && col("v") >= 0.8 && col("v") < 0.9)
          .cast("long"))
      .withColumn("a_keep",
        (col("masked") === 1L && col("v") >= 0.9).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        sum(col("masked")).cast("long").as("n_masked"),
        sum(col("a_mask")).cast("long").as("n_mask_token"),
        sum(col("a_rand")).cast("long").as("n_random_replace"),
        sum(col("a_keep")).cast("long").as("n_kept_original"))
      .withColumn("mask_rate",
        round(d(col("n_masked")) / d(col("n_tokens")), 6))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // sim_kcenter_coreset — Gonzalez greedy k-center, k = 8: seed at
  // the md5-min vector (the sim_kmeans seed convention), then 7
  // farthest-point steps — next center = argmax over the corpus of
  // the min cosine distance to the selected set (ties by vec_id).
  // Driver-stepped ≤8 bounded jobs (the documented k-means family);
  // each step is one broadcast-1-center scan updating the running
  // min-distance column, so the corpus never shuffles. Output: the
  // 8 centers in selection order with their selection distance and
  // the final coverage radius (max remaining min-distance — the
  // 2-approximation certificate).
  // ---------------------------------------------------------------
  val simKcenterCoreset: Q = (s, dir) => {
    val k = 8
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding"))
        .as("e"))
      .localCheckpoint(eager = false) // scanned once per greedy step
    val seed = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(1)
      .select(col("vec_id"), col("e")).localCheckpoint(eager = false)
    val seedRow = seed.collect().head
    var selected = Seq((1, seedRow.getLong(0), 0.0))
    var minD = emb.crossJoin(broadcast(
        seed.select(col("e").as("ce"))))
      .select(col("vec_id"), col("e"),
        (lit(1.0) - Similarity.cosine(col("e"), col("ce"))).as("dm"))
      .localCheckpoint(eager = false)
    for (i <- 2 to k) {
      val nxt = minD.orderBy(desc("dm"), col("vec_id")).limit(1)
        .localCheckpoint(eager = false)
      val r = nxt.collect().head
      selected = selected :+ ((i, r.getAs[Long]("vec_id"),
        r.getAs[Double]("dm")))
      minD = minD.crossJoin(broadcast(nxt.select(col("e").as("ce"))))
        .select(col("vec_id"), col("e"),
          least(col("dm"),
            lit(1.0) - Similarity.cosine(col("e"), col("ce"))).as("dm"))
        .localCheckpoint(eager = false)
    }
    val radius = minD.agg(max(col("dm"))).collect().head.getDouble(0)
    import s.implicits._
    selected.toDF("sel_order", "vec_id", "dm")
      .select(col("sel_order").cast("int").as("sel_order"),
        col("vec_id"),
        round(col("dm"), 6).as("sel_dist"),
        round(lit(radius), 6).as("coverage_radius"))
      .orderBy(col("sel_order"))
  }

  val queries: Map[String, Q] = Map(
    "t_fim_split" -> tFimSplit,
    "t_mlm_masking" -> tMlmMasking,
    "sim_kcenter_coreset" -> simKcenterCoreset)

  /** One k-center greedy stage: sN = argmax of mN−1, mN = least. */
  private def kcenterStages(k: Int): String = {
    val dist = (a: String, b: String) =>
      s"""(1.0 - list_sum(list_transform(range(1, 65),
         |    i -> $a[i] * $b[i]))
         |  / (sqrt(list_sum(list_transform(range(1, 65),
         |       i -> $a[i] * $a[i])))
         |     * sqrt(list_sum(list_transform(range(1, 65),
         |       i -> $b[i] * $b[i])))))""".stripMargin
        .replaceAll("\n", " ")
    (2 to k).map { i =>
      s"""s$i AS MATERIALIZED (
         |  SELECT vec_id, e, dm FROM m${i - 1}
         |  ORDER BY dm DESC, vec_id LIMIT 1),
         |m$i AS MATERIALIZED (
         |  SELECT m.vec_id, m.e,
         |         least(m.dm, ${dist("m.e", "s.e")}) AS dm
         |  FROM m${i - 1} m CROSS JOIN s$i s)"""
        .stripMargin
    }.mkString(",\n")
  }

  val oracles: Map[String, String] = Map(
    "t_fim_split" ->
      s"""WITH docs AS (
         |  SELECT doc_id, CAST(length(text) AS BIGINT) AS len
         |  FROM documents WHERE length(text) >= 10),
         |cuts AS (
         |  SELECT doc_id, len,
         |         CAST(floor(CAST(len AS DOUBLE) * (0.1 + 0.4 *
         |           ${u60Sql("CAST(doc_id AS VARCHAR) || ':fim1'")}))
         |           AS BIGINT) AS cut1,
         |         ${u60Sql("CAST(doc_id AS VARCHAR) || ':fim2'")} AS u2
         |  FROM docs),
         |c2 AS (
         |  SELECT doc_id, len, cut1,
         |         cut1 + CAST(floor(CAST(len - cut1 AS DOUBLE)
         |           * (0.3 + 0.4 * u2)) AS BIGINT) AS cut2
         |  FROM cuts)
         |SELECT doc_id, len AS len_chars, cut1 AS prefix_len,
         |       cut2 - cut1 AS middle_len, len - cut2 AS suffix_len
         |FROM c2 ORDER BY doc_id""".stripMargin,
    "t_mlm_masking" ->
      s"""WITH toks AS (
         |  SELECT doc_id, i - 1 AS pos, string_split(text, ' ')[i] AS tok
         |  FROM documents,
         |       unnest(range(1, len(string_split(text, ' ')) + 1))
         |         AS u(i)),
         |dec AS (
         |  SELECT doc_id,
         |         ${u60Sql("CAST(doc_id AS VARCHAR) || ':' ||" +
                  " CAST(pos AS VARCHAR) || ':' || tok")} AS u,
         |         ${u60Sql("CAST(doc_id AS VARCHAR) || ':' ||" +
                  " CAST(pos AS VARCHAR) || ':act'")} AS v
         |  FROM toks),
         |fl AS (
         |  SELECT doc_id,
         |         CASE WHEN u < 0.15 THEN 1 ELSE 0 END AS masked,
         |         CASE WHEN u < 0.15 AND v < 0.8 THEN 1 ELSE 0 END
         |           AS a_mask,
         |         CASE WHEN u < 0.15 AND v >= 0.8 AND v < 0.9 THEN 1
         |              ELSE 0 END AS a_rand,
         |         CASE WHEN u < 0.15 AND v >= 0.9 THEN 1 ELSE 0 END
         |           AS a_keep
         |  FROM dec)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |       CAST(sum(masked) AS BIGINT) AS n_masked,
         |       CAST(sum(a_mask) AS BIGINT) AS n_mask_token,
         |       CAST(sum(a_rand) AS BIGINT) AS n_random_replace,
         |       CAST(sum(a_keep) AS BIGINT) AS n_kept_original,
         |       round(CAST(sum(masked) AS DOUBLE)
         |         / CAST(count(*) AS DOUBLE), 6) AS mask_rate
         |FROM fl GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "sim_kcenter_coreset" ->
      s"""WITH emb AS MATERIALIZED (
         |  SELECT vec_id,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |s1 AS MATERIALIZED (
         |  SELECT vec_id, e FROM emb
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 1),
         |m1 AS MATERIALIZED (
         |  SELECT m.vec_id, m.e,
         |         (1.0 - list_sum(list_transform(range(1, 65),
         |             i -> m.e[i] * s.e[i]))
         |           / (sqrt(list_sum(list_transform(range(1, 65),
         |                i -> m.e[i] * m.e[i])))
         |              * sqrt(list_sum(list_transform(range(1, 65),
         |                i -> s.e[i] * s.e[i]))))) AS dm
         |  FROM emb m CROSS JOIN s1 s),
         |${kcenterStages(8)},
         |rad AS (SELECT max(dm) AS radius FROM m8),
         |sel AS (
         |  SELECT 1 AS sel_order, vec_id, 0.0 AS dm FROM s1
         |  ${(2 to 8).map(i =>
            s"UNION ALL SELECT $i, s$i.vec_id," +
              s" (SELECT dm FROM m${i - 1} x" +
              s"  WHERE x.vec_id = s$i.vec_id) FROM s$i")
            .mkString("\n  ")})
         |SELECT CAST(sel_order AS INTEGER) AS sel_order, vec_id,
         |       round(dm, 6) AS sel_dist,
         |       round(rad.radius, 6) AS coverage_radius
         |FROM sel CROSS JOIN rad ORDER BY sel_order""".stripMargin)
}
