package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 9: robust outlier auditing (median/MAD on exact
  * integer micro-unit histograms), exact largest-remainder sample
  * allocation (the Hare quota rule), and 1-bit binary embedding
  * quantization with Hamming-distance retrieval + recall audit (the
  * 32×-compression ANN path next to e_quantize_int8 / e_pq_codes).
  * All Spark-first with full-replay DuckDB oracles.
  */
object TrainingData12 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // a_mad_outliers — robust outlier audit of the quality score via
  // median + MAD (median absolute deviation), the
  // breakdown-point-0.5 alternative to a_iqr_outliers' fences: a doc
  // is an outlier when |q − med| > 3.5 · 1.4826 · MAD (Iglewicz &
  // Hoaglin's modified-z rule; 1.4826 ≈ 1/Φ⁻¹(¾) makes MAD
  // σ-consistent). EVERYTHING is exact integer arithmetic on the
  // micro-unit grid: scores quantize to floor(q·10⁶) (pure-
  // arithmetic score — no libm anywhere), medians are order
  // statistics over the VALUE HISTOGRAM (≤10⁶ distinct cells no
  // matter the corpus size) walked by the two-phase global cumsum —
  // never a row-level sort; the even-n average-of-middles stays
  // integer by carrying 2·median and 4·MAD; and the outlier test
  // |2q − med₂|·20000 > 51891·mad₄ is an exact integer comparison
  // (20000·x > 51891·y ⟺ x > 3.5·1.4826·y/2). Scale shape: one
  // scan → bounded histogram → two histogram cumsums (the heavy
  // lifting is on ≤10⁶-row frames) → one per-source aggregate.
  // ---------------------------------------------------------------
  val aMadOutliers: Q = (s, dir) => {
    val v = docs(s, dir)
      .select(col("source"),
        floor(TF.qualityScore(col("text")) * lit(1000000.0)).cast("long")
          .as("q"))
      .localCheckpoint(eager = false) // histogram pass + final per-source pass
    val hist = v.groupBy(col("q")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // carries + both median selections
    val n = hist.agg(sum(col("c"))).head().getLong(0)
    val k1 = (n + 1) / 2; val k2 = (n + 2) / 2
    def middle2(h: DataFrame, vc: String): Long = {
      val r = Ranking.withGlobalCumSums(h, Seq("c" -> "cum"), col(vc))
        .agg(
          min(when(col("cum") >= k1 && col("cum") - col("c") < k1, col(vc)))
            .as("m1"),
          min(when(col("cum") >= k2 && col("cum") - col("c") < k2, col(vc)))
            .as("m2")).head()
      r.getLong(0) + r.getLong(1) // 2×the (possibly averaged) median
    }
    val med2 = middle2(hist, "q")
    val dh = hist.groupBy(abs(col("q") * 2 - med2).as("d2"))
      .agg(sum(col("c")).as("c"))
      .localCheckpoint(eager = false) // same two-phase walk as the value histogram
    val mad4 = middle2(dh, "d2") // 2×(2×MAD) in micro units
    v.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(abs(col("q") * 2 - med2) * lit(20000L) >
          lit(51891L) * mad4, 1L).otherwise(0L)).as("n_outliers"))
      .select(col("source"), col("n_docs"), col("n_outliers"),
        round(d(col("n_outliers")) / d(col("n_docs")), 6).as("outlier_rate"),
        round(lit(med2.toDouble / 2000000.0), 6).as("median_q"),
        round(lit(mad4.toDouble / 4000000.0), 6).as("mad_q"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------
  // o_quota_allocation — exact largest-remainder (Hare quota)
  // allocation of a fixed sample budget across (lang, source) cells:
  // floor(B·nᵢ/N) seats first, then the B − Σfloor leftovers go to
  // the largest remainders (ties → lang, source order) — the
  // standard way to draw an EXACTLY-B-row stratified sample whose
  // strata shares are within one row of proportional (what
  // t_stratified_sample's per-stratum rates cannot guarantee).
  // Floors and remainders are exact integer div/mod; the remainder
  // ranking runs through the two-phase global rank on the tiny cell
  // frame. Σ allocated = B by construction (pinned in the spec).
  // ---------------------------------------------------------------
  val oQuotaAllocation: Q = (s, dir) => {
    val budget = 1000L
    val cells = docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // totals + rank pass
    val tot = cells.agg(sum(col("c"))).head().getLong(0)
    val base = cells
      .withColumn("fl", expr(s"CAST((c * $budget) div $tot AS BIGINT)"))
      .withColumn("rem", expr(s"CAST((c * $budget) % $tot AS BIGINT)"))
      .localCheckpoint(eager = false) // floor total + rank pass
    val leftover = budget - base.agg(sum(col("fl"))).head().getLong(0)
    Ranking
      .withGlobalRank(base, "rk", -col("rem"), col("lang"), col("source"))
      .select(col("lang"), col("source"), col("c").as("n_docs"),
        round(d(col("c")) / lit(tot.toDouble), 6).as("exact_share"),
        col("fl").as("floor_alloc"),
        (col("fl") + when(col("rk") <= leftover, 1L).otherwise(0L))
          .as("allocated"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // e_binary_hamming_recall — 1-bit binary embedding quantization
  // (the 32×-compression rerank index: sign bits against the
  // per-dimension mean) + Hamming-distance top-5 retrieval for the
  // 10 standard query vectors, audited as recall@5 against the
  // exact cosine ground truth (sim_cosine_topk's contract). The
  // mean threshold is EXACT: values quantize to floor(v·2²⁰) longs,
  // and bit_d = [q_d·n > Σq_d] is an integer cross-multiplication —
  // no float mean anywhere, so the codes are bit-identical on both
  // engines. Codes pack into two longs via integer shifts
  // (dims 0–31 → lo, 32–63 → hi); distance is
  // bit_count(xor) + bit_count(xor). Scale shape: per-dim sums are
  // one partial-agg scan (64 groups); the code pass maps against
  // the broadcast 64-row stats; search scans codes once against the
  // 10 broadcast query codes (16 bytes/vector — the whole point);
  // the per-query top-5 is a 10-partition window over ≤corpus rows
  // pre-trimmed by nothing but the scan. The recall join composes
  // the deliberate brute-force baseline (PlanSpec-allowlisted).
  // ---------------------------------------------------------------
  val eBinaryHammingRecall: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
    val ex = emb
      .select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "v")))
      .withColumn("q", floor(col("v") * lit(1048576.0)).cast("long"))
      .localCheckpoint(eager = false) // stats pass + code pass
    val stats = ex.groupBy(col("pos"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("n"))
    val codes = ex.join(broadcast(stats), "pos")
      .withColumn("bit",
        when(col("q") * col("n") > col("sq"), 1L).otherwise(0L))
      .groupBy(col("vec_id"))
      .agg(
        sum(when(col("pos") < 32,
          expr("shiftleft(bit, CAST(pos AS INT))"))).as("lo"),
        sum(when(col("pos") >= 32,
          expr("shiftleft(bit, CAST(pos AS INT) - 32)"))).as("hi"))
      .localCheckpoint(eager = false) // query side + corpus side of the search
    val q = broadcast(codes.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("lo").as("qlo"),
        col("hi").as("qhi")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("ham"), col("neighbor_id"))
    val top5 = q
      .join(codes.select(col("vec_id").as("neighbor_id"), col("lo"),
        col("hi")), col("neighbor_id") =!= col("query_id"))
      .withColumn("ham", expr(
        "bit_count(qlo ^ lo) + bit_count(qhi ^ hi)").cast("long"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
    val truth = Similarity.bruteForceTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    top5.join(truth, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hits"),
        sum(col("ham")).as("ham_sum"))
      .select(col("query_id"), col("n_hits"),
        round(d(col("n_hits")) / lit(5.0), 6).as("recall_at_5"),
        col("ham_sum"))
      .orderBy(col("query_id"))
  }

  val queries: Map[String, Q] = Map(
    "a_mad_outliers" -> aMadOutliers,
    "o_quota_allocation" -> oQuotaAllocation,
    "e_binary_hamming_recall" -> eBinaryHammingRecall)

  val oracles: Map[String, String] = Map(
    "a_mad_outliers" ->
      """WITH v AS (
        |  SELECT source,
        |         CAST(floor((1.0 - CAST(n_stops AS DOUBLE)
        |             / CAST(len(toks) AS DOUBLE))
        |             * least(CAST(length(text) - len(toks) + 1 AS DOUBLE)
        |                 / CAST(len(toks) AS DOUBLE), 10.0) / 10.0
        |             * 1000000.0) AS BIGINT) AS q
        |  FROM (SELECT source, text, string_split(text, ' ') AS toks,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |hist AS (SELECT q, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM hist),
        |hc AS (SELECT q, c, CAST(sum(c) OVER (ORDER BY q) AS BIGINT) AS cum
        |       FROM hist),
        |med AS (
        |  SELECT CAST(min(CASE WHEN cum >= (n.n + 1) // 2
        |                        AND cum - c < (n.n + 1) // 2 THEN q END)
        |            + min(CASE WHEN cum >= (n.n + 2) // 2
        |                        AND cum - c < (n.n + 2) // 2 THEN q END)
        |         AS BIGINT) AS med2
        |  FROM hc CROSS JOIN n),
        |dh AS (
        |  SELECT abs(q * 2 - med.med2) AS d2, CAST(sum(c) AS BIGINT) AS c
        |  FROM hist CROSS JOIN med GROUP BY 1),
        |dhc AS (SELECT d2, c, CAST(sum(c) OVER (ORDER BY d2) AS BIGINT) AS cum
        |        FROM dh),
        |mad AS (
        |  SELECT CAST(min(CASE WHEN cum >= (n.n + 1) // 2
        |                        AND cum - c < (n.n + 1) // 2 THEN d2 END)
        |            + min(CASE WHEN cum >= (n.n + 2) // 2
        |                        AND cum - c < (n.n + 2) // 2 THEN d2 END)
        |         AS BIGINT) AS mad4
        |  FROM dhc CROSS JOIN n)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN abs(q * 2 - med.med2) * 20000
        |                       > 51891 * mad.mad4
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |       round(CAST(sum(CASE WHEN abs(q * 2 - med.med2) * 20000
        |                            > 51891 * mad.mad4
        |                     THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE), 6) AS outlier_rate,
        |       round(CAST(med.med2 AS DOUBLE) / 2000000.0, 6) AS median_q,
        |       round(CAST(mad.mad4 AS DOUBLE) / 4000000.0, 6) AS mad_q
        |FROM v CROSS JOIN med CROSS JOIN mad
        |GROUP BY source, med.med2, mad.mad4
        |ORDER BY source""".stripMargin,
    "o_quota_allocation" ->
      """WITH cells AS (
        |  SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |base AS (
        |  SELECT lang, source, c,
        |         CAST((c * 1000) // n.n AS BIGINT) AS fl,
        |         CAST((c * 1000) % n.n AS BIGINT) AS rem,
        |         n.n AS n
        |  FROM cells CROSS JOIN n),
        |lo AS (SELECT CAST(1000 - sum(fl) AS BIGINT) AS leftover FROM base),
        |rk AS (
        |  SELECT *, row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
        |  FROM base)
        |SELECT lang, source, c AS n_docs,
        |       round(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS exact_share,
        |       fl AS floor_alloc,
        |       CAST(fl + (CASE WHEN rk <= lo.leftover THEN 1 ELSE 0 END)
        |         AS BIGINT) AS allocated
        |FROM rk CROSS JOIN lo
        |ORDER BY lang, source""".stripMargin,
    "e_binary_hamming_recall" ->
      """WITH e0 AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, unnest(range(0, len(e))) AS pos,
        |         CAST(floor(unnest(e) * 1048576.0) AS BIGINT) AS q
        |  FROM e0),
        |stats AS (
        |  SELECT pos, CAST(sum(q) AS BIGINT) AS sq,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1),
        |bits AS (
        |  SELECT vec_id, ex.pos,
        |         CAST(CASE WHEN q * n > sq THEN 1 ELSE 0 END AS BIGINT) AS bit
        |  FROM ex JOIN stats USING (pos)),
        |codes AS (
        |  SELECT vec_id,
        |         CAST(sum(CASE WHEN pos < 32 THEN bit << pos END)
        |           AS BIGINT) AS lo,
        |         CAST(sum(CASE WHEN pos >= 32 THEN bit << (pos - 32) END)
        |           AS BIGINT) AS hi
        |  FROM bits GROUP BY 1),
        |ham AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         CAST(bit_count(xor(q.lo, c.lo))
        |            + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS ham
        |  FROM codes q JOIN codes c ON c.vec_id <> q.vec_id
        |  WHERE q.vec_id < 10),
        |top5 AS (
        |  SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY query_id
        |             ORDER BY ham, neighbor_id) AS rk
        |    FROM ham) WHERE rk <= 5),
        |truth AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_sum(list_transform(range(1, len(q.e) + 1),
        |               i -> q.e[i] * e.e[i]))
        |             / (sqrt(list_sum(list_transform(range(1, len(q.e) + 1),
        |                 i -> q.e[i] * q.e[i])))
        |                * sqrt(list_sum(list_transform(range(1, len(e.e) + 1),
        |                    i -> e.e[i] * e.e[i])))) DESC, e.vec_id) AS rk
        |    FROM e0 q, e0 e
        |    WHERE q.vec_id < 10 AND e.vec_id <> q.vec_id)
        |  WHERE rk <= 5)
        |SELECT t.query_id,
        |       CAST(count(g.neighbor_id) AS BIGINT) AS n_hits,
        |       round(CAST(count(g.neighbor_id) AS DOUBLE) / 5.0, 6)
        |         AS recall_at_5,
        |       CAST(sum(t.ham) AS BIGINT) AS ham_sum
        |FROM top5 t LEFT JOIN truth g
        |  ON g.query_id = t.query_id AND g.neighbor_id = t.neighbor_id
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
