package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Round-9 batch 18: corpus-diversity and release auditing —
  * Self-BLEU neighbor diversity (Zhu et al. 2018, the texygen
  * diversity metric), a differentially-private median via the
  * exponential mechanism (McSherry & Talwar 2007), and the
  * multimodal quality gate over the decoder-trait feature path.
  * All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData23 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // t_self_bleu — neighbor Self-BLEU diversity audit: within each
  // (lang, source) shard, every document is scored against its
  // doc_id-successor as the reference — modified (clipped) unigram
  // and bigram precision, the Self-BLEU estimator a generation-
  // diversity report runs (high Self-BLEU = the shard repeats
  // itself). Neighbor pairing keeps the metric LINEAR: a corpus×
  // sample reference set multiplies work by the sample size, the
  // successor pairing is one window pass — the same downsampling
  // every production Self-BLEU harness applies. Exactness: clipped
  // overlaps are integer Σ min(count_a, count_b) from a (pair,
  // token) join; per-pair precision and the per-shard average both
  // leave integer space through micro-unit integral division (the
  // a_var_merge rule). Scale shape: pairing shuffles once per shard
  // window (shard-parallel); each n-gram leg is explode → map-side-
  // combining count → one equi-join on (pair, gram) — token-linear;
  // the output is bounded by lang × source.
  // ---------------------------------------------------------------
  val tSelfBleu: Q = (s, dir) => {
    import graft.functions.{TextFunctions => TF}
    val w = Window.partitionBy(col("lang"), col("source"))
      .orderBy(col("doc_id"))
    val paired = Tables.table(s, dir, "documents")
      .select(col("lang"), col("source"), col("doc_id"),
        TF.tokens(col("text")).as("toks"))
      .withColumn("b_toks", lead(col("toks"), 1).over(w))
      .filter(col("b_toks").isNotNull)
    def leg(aGrams: Column, bGrams: Column, out: String): DataFrame = {
      val lenA = paired.select(col("lang"), col("source"), col("doc_id"),
        size(aGrams).cast("long").as("len_a"))
      val ca = paired
        .select(col("lang"), col("source"), col("doc_id"),
          explode(aGrams).as("gram"))
        .groupBy(col("lang"), col("source"), col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("ca"))
      val cb = paired
        .select(col("lang"), col("source"), col("doc_id"),
          explode(bGrams).as("gram"))
        .groupBy(col("lang"), col("source"), col("doc_id"), col("gram"))
        .agg(count(lit(1)).as("cb"))
      val clip = ca.join(cb,
          Seq("lang", "source", "doc_id", "gram"))
        .groupBy(col("lang"), col("source"), col("doc_id"))
        .agg(sum(least(col("ca"), col("cb"))).cast("long").as("clipped"))
      lenA.join(clip, Seq("lang", "source", "doc_id"), "left")
        .select(col("lang"), col("source"),
          expr("CAST((coalesce(clipped, 0L) * 1000000) div len_a AS BIGINT)")
            .as("micro"))
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as(s"n_pairs_$out"),
          expr("CAST(sum(micro) div count(1) AS BIGINT)").as(s"m_$out"))
    }
    val uni = leg(col("toks"), col("b_toks"), "1")
    val bi = leg(graft.plans.HashExpressions.tokenShingles(col("toks"), 2),
      graft.plans.HashExpressions.tokenShingles(col("b_toks"), 2), "2")
    uni.join(bi, Seq("lang", "source"))
      .select(col("lang"), col("source"),
        col("n_pairs_1").as("n_pairs"),
        (col("m_1") / lit(1000000.0)).as("self_bleu1"),
        (col("m_2") / lit(1000000.0)).as("self_bleu2"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // t_dp_median — ε-differentially-private median of order value via
  // the exponential mechanism over 64 equal-width price bins:
  // utility u(b) = −|2·cum(b) − n| (rank distance to the median,
  // sensitivity 1 under add/remove), selection probability
  // ∝ exp(ε·u/2) realized through the Gumbel-max trick with
  // DETERMINISTIC per-bin noise (the bin key's own 60-bit md5 mapped
  // to (0,1) — the t_dp_histogram convention; a real release draws
  // fresh randomness, the mechanism and the ε ledger are what the
  // operator carries). Bin assignment is exact integer cents
  // division; the utilities and cumulative counts are exact
  // integers; only the final ε·u/2 + Gumbel score is double (the
  // identical IEEE expression in both engines, argmax tie-broken on
  // bin index). Scale shape: one map-side-combining 64-bin
  // aggregate; everything after runs on the bounded 64-row frame
  // (documented low-cardinality window class).
  // ---------------------------------------------------------------
  val tDpMedian: Q = (s, dir) => {
    val eps = 1.0
    val binned = Tables.table(s, dir, "orders")
      .select(round(col("o_totalprice") * 100).cast("long").as("cents"))
      .select(least(lit(63L), expr("CAST(cents * 64 div 50000000 AS BIGINT)"))
        .as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
    val wCum = Grain.bounded(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Grain.whole
    val h = conv(substring(md5(concat(lit("median_"),
      col("bin").cast("string"))), 1, 15), 16, 10).cast("long")
    val u01 = (d(h) + lit(0.5)) / lit(1152921504606846976.0) // 2^60
    val scoredCols = binned
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("u", -abs(lit(2L) * col("cum") - col("n")))
      .withColumn("score",
        lit(eps) * d(col("u")) / lit(2.0) - log(-log(u01)))
    scoredCols
      .withColumn("rk", row_number().over(
        Grain.bounded(desc("score"), col("bin"))))
      .withColumn("true_bin", min(when(lit(2L) * col("cum") >= col("n"),
        col("bin"))).over(wAll))
      .filter(col("rk") === 1)
      .select(col("bin").as("released_bin"),
        (d(col("bin")) * lit(500000.0 / 64)).as("bin_lo"),
        ((d(col("bin")) + 1.0) * lit(500000.0 / 64)).as("bin_hi"),
        col("true_bin"), col("n").as("n_orders"), lit(eps).as("epsilon"))
  }

  // ---------------------------------------------------------------
  // mm_quality_gate — the per-modality quality filter a multimodal
  // ingest runs after decode: payloads route to image/audio/video by
  // the mm_modality_route rule, decode-derived features (width,
  // height, frame count — the FakeDecoder stub behind the Decoder
  // trait; a real codec swaps in without touching this operator)
  // check modality-specific floors (image/video ≥ 200×200, audio ≥
  // 10 frames, video ≥ 15 frames, everything ≥ 64 bytes), and the
  // audit reports per-modality totals, failure counts per reason,
  // and the pass rate. Scale shape: the decoder's mapPartitions
  // feature pass is embarrassingly parallel (one decoder instance
  // per partition — the expensive-init codec pattern), then one
  // map-side-combining 3-group aggregate. Integer counts; the pass
  // rate is one micro-unit integral division.
  // ---------------------------------------------------------------
  val mmQualityGate: Q = (s, dir) => {
    val feats = graft.multimodal.Multimodal.binaryFeatures(s, dir)
      .withColumn("modality",
        when(col("n_bytes") % 3 === 0, "image")
          .when(col("n_bytes") % 3 === 1, "audio")
          .otherwise("video"))
    val checked = feats.select(col("modality"),
      (col("n_bytes") < 64L).as("f_payload"),
      (col("modality").isin("image", "video") &&
        (col("width") < 200L || col("height") < 200L)).as("f_res"),
      (col("modality") === "audio" && col("n_frames") < 10L ||
        col("modality") === "video" && col("n_frames") < 15L)
        .as("f_dur"))
    checked.groupBy(col("modality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("f_payload"), 1L).otherwise(0L)).cast("long")
          .as("n_small_payload"),
        sum(when(col("f_res"), 1L).otherwise(0L)).cast("long")
          .as("n_low_res"),
        sum(when(col("f_dur"), 1L).otherwise(0L)).cast("long")
          .as("n_short"),
        sum(when(!col("f_payload") && !col("f_res") && !col("f_dur"), 1L)
          .otherwise(0L)).cast("long").as("n_passed"))
      .select(col("modality"), col("n_docs"), col("n_small_payload"),
        col("n_low_res"), col("n_short"), col("n_passed"),
        (expr("CAST((n_passed * 1000000) div n_docs AS BIGINT)") /
          lit(1000000.0)).as("pass_rate"))
      .orderBy(col("modality"))
  }

  val queries: Map[String, Q] = Map(
    "t_self_bleu" -> tSelfBleu,
    "t_dp_median" -> tDpMedian,
    "mm_quality_gate" -> mmQualityGate)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "t_self_bleu" ->
      """WITH docs AS (
        |  SELECT lang, source, doc_id,
        |         string_split_regex(text, '\s+') AS toks,
        |         lead(string_split_regex(text, '\s+'), 1) OVER (
        |           PARTITION BY lang, source ORDER BY doc_id) AS b_toks
        |  FROM documents),
        |paired AS (SELECT * FROM docs WHERE b_toks IS NOT NULL),
        |sh AS (
        |  SELECT lang, source, doc_id, toks, b_toks,
        |         list_transform(range(1, len(toks)),
        |           i -> toks[i] || ' ' || toks[i + 1]) AS g2a,
        |         list_transform(range(1, len(b_toks)),
        |           i -> b_toks[i] || ' ' || b_toks[i + 1]) AS g2b
        |  FROM paired),
        |ca1 AS (
        |  SELECT lang, source, doc_id, unnest(toks) AS gram
        |  FROM sh),
        |cb1 AS (
        |  SELECT lang, source, doc_id, unnest(b_toks) AS gram
        |  FROM sh),
        |ca2 AS (
        |  SELECT lang, source, doc_id, unnest(g2a) AS gram FROM sh),
        |cb2 AS (
        |  SELECT lang, source, doc_id, unnest(g2b) AS gram FROM sh),
        |clip1 AS (
        |  SELECT a.lang, a.source, a.doc_id,
        |         CAST(sum(least(a.c, b.c)) AS BIGINT) AS clipped
        |  FROM (SELECT lang, source, doc_id, gram,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM ca1 GROUP BY 1, 2, 3, 4) a
        |  JOIN (SELECT lang, source, doc_id, gram,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM cb1 GROUP BY 1, 2, 3, 4) b
        |    USING (lang, source, doc_id, gram)
        |  GROUP BY 1, 2, 3),
        |clip2 AS (
        |  SELECT a.lang, a.source, a.doc_id,
        |         CAST(sum(least(a.c, b.c)) AS BIGINT) AS clipped
        |  FROM (SELECT lang, source, doc_id, gram,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM ca2 GROUP BY 1, 2, 3, 4) a
        |  JOIN (SELECT lang, source, doc_id, gram,
        |          CAST(count(*) AS BIGINT) AS c
        |        FROM cb2 GROUP BY 1, 2, 3, 4) b
        |    USING (lang, source, doc_id, gram)
        |  GROUP BY 1, 2, 3),
        |m1 AS (
        |  SELECT sh.lang, sh.source,
        |         CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CAST(coalesce(c.clipped, 0) * 1000000
        |             AS BIGINT) // CAST(len(sh.toks) AS BIGINT))
        |           // count(*) AS BIGINT) AS m
        |  FROM sh LEFT JOIN clip1 c USING (lang, source, doc_id)
        |  GROUP BY 1, 2),
        |m2 AS (
        |  SELECT sh.lang, sh.source,
        |         CAST(sum(CAST(coalesce(c.clipped, 0) * 1000000
        |             AS BIGINT) // CAST(len(sh.g2a) AS BIGINT))
        |           // count(*) AS BIGINT) AS m
        |  FROM sh LEFT JOIN clip2 c USING (lang, source, doc_id)
        |  GROUP BY 1, 2)
        |SELECT m1.lang, m1.source, m1.n_pairs,
        |       m1.m / 1000000.0 AS self_bleu1,
        |       m2.m / 1000000.0 AS self_bleu2
        |FROM m1 JOIN m2 USING (lang, source)
        |ORDER BY m1.lang, m1.source""".stripMargin,
    "t_dp_median" -> {
      s"""WITH binned AS (
        |  SELECT least(63, CAST(round(o_totalprice * 100) AS BIGINT) * 64
        |           // 50000000) AS bin,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders GROUP BY 1),
        |cum AS (
        |  SELECT bin, cnt,
        |         sum(cnt) OVER (ORDER BY bin
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |         sum(cnt) OVER () AS n
        |  FROM binned),
        |scored AS (
        |  SELECT bin, cum, n, -abs(2 * cum - n) AS u,
        |         1.0 * CAST(-abs(2 * cum - n) AS DOUBLE) / 2.0
        |           - ln(-ln((CAST(${hex15("'median_' || CAST(bin AS VARCHAR)")}
        |               AS DOUBLE) + 0.5) / 1152921504606846976.0)) AS score,
        |         min(CASE WHEN 2 * cum >= n THEN bin END) OVER () AS true_bin
        |  FROM cum)
        |SELECT bin AS released_bin,
        |       CAST(bin AS DOUBLE) * (500000.0 / 64) AS bin_lo,
        |       (CAST(bin AS DOUBLE) + 1.0) * (500000.0 / 64) AS bin_hi,
        |       true_bin, CAST(n AS BIGINT) AS n_orders, 1.0 AS epsilon
        |FROM scored
        |QUALIFY row_number() OVER (ORDER BY score DESC, bin) = 1""".stripMargin
    },
    "mm_quality_gate" ->
      """WITH feats AS (
        |  SELECT doc_id,
        |         CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |         64 + (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 7)
        |           % 513 AS width,
        |         64 + (CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) * 13)
        |           % 513 AS height,
        |         1 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 30
        |           AS n_frames
        |  FROM documents),
        |routed AS (
        |  SELECT *, CASE WHEN n_bytes % 3 = 0 THEN 'image'
        |                 WHEN n_bytes % 3 = 1 THEN 'audio'
        |                 ELSE 'video' END AS modality
        |  FROM feats),
        |checked AS (
        |  SELECT modality,
        |         n_bytes < 64 AS f_payload,
        |         modality IN ('image', 'video')
        |           AND (width < 200 OR height < 200) AS f_res,
        |         (modality = 'audio' AND n_frames < 10)
        |           OR (modality = 'video' AND n_frames < 15) AS f_dur
        |  FROM routed)
        |SELECT modality, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN f_payload THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_small_payload,
        |       CAST(sum(CASE WHEN f_res THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_low_res,
        |       CAST(sum(CASE WHEN f_dur THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_short,
        |       CAST(sum(CASE WHEN NOT f_payload AND NOT f_res AND NOT f_dur
        |         THEN 1 ELSE 0 END) AS BIGINT) AS n_passed,
        |       CAST(sum(CASE WHEN NOT f_payload AND NOT f_res AND NOT f_dur
        |           THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT)
        |         / 1000000.0 AS pass_rate
        |FROM checked GROUP BY 1 ORDER BY modality""".stripMargin)
}
