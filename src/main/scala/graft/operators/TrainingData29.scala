package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 24: clustering-stability scoring (Adjusted Rand
  * Index, Hubert–Arabie 1985), RAKE keyword extraction (Rose et al.
  * 2010), and time-weighted averaging over irregular event series
  * (the TWAP shape). All Spark-first with full-replay DuckDB
  * oracles; float reductions use the repo's sorted-fold policy.
  */
object TrainingData29 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  /** L2-normalized embeddings (the TrainingData4 shape; checkpoint
    * barrier keeps the interpreted normalize from re-inlining). */
  private def normalized(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Similarity.toDoubleArr(col("embedding")).as("e0"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e0"), col("e0"))))
      .select(col("vec_id"), col("label"),
        transform(col("e0"), x => x / col("nrm")).as("e"))
      .localCheckpoint(eager = false)

  // ---------------------------------------------------------------
  // sim_ari — Adjusted Rand Index between clusterings: the standard
  // clustering-stability / label-agreement audit (Hubert–Arabie
  // 1985) a SemDeDup-style pipeline runs before trusting its cluster
  // stage. Three comparisons in one output: two deterministic IVF
  // assignments from DIFFERENT md5 seeds against the gold label
  // column and against each other (seed-perturbation stability).
  // Scale shape: each assignment is a broadcast-16×d argmax scan of
  // the corpus (no shuffle); each comparison is ONE hash join of two
  // assignment frames on vec_id followed by a ≤16×16-cell
  // contingency aggregate with map-side partials — every pair count
  // (Σ C(nij,2), marginal C(ai,2)) is integer-exact off that tiny
  // table, and only the final ARI ratio touches doubles (round 6).
  // ---------------------------------------------------------------
  val simAri: Q = (s, dir) => {
    val emb = normalized(s, dir)
    def cells(seed: String): DataFrame = {
      val cents = emb
        .orderBy(md5(concat(lit(seed), col("vec_id").cast("string"))), col("vec_id"))
        .limit(16)
        .withColumn("cid", row_number().over(Grain.bounded(
          md5(concat(lit(seed), col("vec_id").cast("string"))), col("vec_id"))))
        .select(col("cid").cast("long").as("cid"), col("e").as("ce"))
      emb.crossJoin(broadcast(cents))
        .withColumn("cos", Similarity.dot(col("e"), col("ce")))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(desc("cos"), col("cid"))))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("cid"))
    }
    val a = cells("ariA:").localCheckpoint(eager = false) // reused in 2 comparisons
    val b = cells("ariB:").localCheckpoint(eager = false)
    val lbl = emb.select(col("vec_id"), col("label").as("cid"))
    def ari(name: String, u: DataFrame, v: DataFrame): DataFrame = {
      val cont = u.select(col("vec_id"), col("cid").as("u"))
        .join(v.select(col("vec_id"), col("cid").as("v")), "vec_id")
        .groupBy(col("u"), col("v")).agg(count(lit(1)).as("nij"))
        .localCheckpoint(eager = false) // ≤ 16×16 rows; 3 consumers below
      // pair counts stay in INTEGER arithmetic ((x·(x−1)) div 2 — the
      // product is always even) rather than Spark's double-returning
      // `/` operator, so they are exact at any corpus size
      val aSum = cont.agg(
        expr("sum((nij * (nij - 1)) div 2)").cast("long").as("pairs_in_both"),
        sum(col("nij")).cast("long").as("n"))
      val b1 = cont.groupBy(col("u")).agg(sum(col("nij")).as("ai"))
        .agg(expr("sum((ai * (ai - 1)) div 2)").cast("long").as("pairs_u"))
      val b2 = cont.groupBy(col("v")).agg(sum(col("nij")).as("bj"))
        .agg(expr("sum((bj * (bj - 1)) div 2)").cast("long").as("pairs_v"))
      aSum.crossJoin(b1).crossJoin(b2)
        .select(lit(name).as("comparison"), col("n"), col("pairs_in_both"),
          col("pairs_u"), col("pairs_v"),
          (d(col("pairs_u")) * d(col("pairs_v")) /
            (d(col("n")) * d(col("n") - 1) / lit(2.0))).as("expected"))
        .select(col("comparison"), col("n"), col("pairs_in_both"),
          col("pairs_u"), col("pairs_v"),
          when((d(col("pairs_u")) + d(col("pairs_v"))) / lit(2.0) === col("expected"),
            lit(1.0))
            .otherwise(round((d(col("pairs_in_both")) - col("expected")) /
              ((d(col("pairs_u")) + d(col("pairs_v"))) / lit(2.0) - col("expected")), 6))
            .as("ari"))
    }
    ari("cellsA_vs_label", a, lbl)
      .unionAll(ari("cellsA_vs_cellsB", a, b))
      .unionAll(ari("cellsB_vs_label", b, lbl))
      .orderBy(col("comparison"))
  }

  // ---------------------------------------------------------------
  // t_rake_keywords — RAKE keyword extraction (Rose et al. 2010):
  // candidate phrases are maximal stopword-free token runs (length
  // ≤ 4); each word scores deg(w)/freq(w) over the candidate
  // occurrences (deg = Σ phrase length over phrases containing the
  // word, freq = occurrence count), and a phrase scores the sum of
  // its word scores. Corpus-wide top-25 phrases. Scale shape: the
  // phrase segmentation is a per-doc window (partitioned by doc_id —
  // bounded by doc length, never global); word stats are one
  // token-keyed aggregate; the per-occurrence score re-join hashes
  // on the token key and folds in phrase position order (bit-stable
  // doubles); final top-25 plans as TakeOrdered. deg/freq and the
  // ≤4-term score sums are small-integer ratios — exact in double —
  // so only the presentation round(6) touches float policy.
  // ---------------------------------------------------------------
  val tRakeKeywords: Q = (s, dir) => {
    val toks = Tables.table(s, dir, "documents")
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))).as(Seq("pos", "tok")))
      .withColumn("stop", col("tok").isin(TF.stopwords: _*))
    val seg = toks.withColumn("phrase_id",
        sum(when(col("stop"), 1L).otherwise(0L)).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .filter(!col("stop"))
      .localCheckpoint(eager = false) // consumed by occurrences AND word stats
    val occ = seg.groupBy(col("doc_id"), col("phrase_id"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, tok)))," +
          " x -> x.tok)").as("words"),
        count(lit(1)).as("len"))
      .filter(col("len") <= 4)
      .localCheckpoint(eager = false) // word stats + scoring both read it
    val members = occ.select(col("doc_id"), col("phrase_id"), col("len"),
      posexplode(col("words")).as(Seq("wpos", "tok")))
    val wordScore = members.groupBy(col("tok"))
      .agg(sum(col("len")).cast("long").as("deg"),
        count(lit(1)).cast("long").as("freq"))
      .withColumn("wscore", d(col("deg")) / d(col("freq")))
    val scored = members.join(wordScore.select(col("tok"), col("wscore")), "tok")
      .groupBy(col("doc_id"), col("phrase_id"))
      .agg(expr("aggregate(sort_array(collect_list(struct(wpos, wscore))), 0D," +
        " (a, x) -> a + x.wscore)").as("score"))
    occ.join(scored, Seq("doc_id", "phrase_id"))
      .withColumn("phrase", array_join(col("words"), " "))
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("len")).as("n_words"),
        max(round(col("score"), 6)).as("score"))
      .orderBy(desc("score"), col("phrase"))
      .limit(25)
  }

  // ---------------------------------------------------------------
  // w_twap — time-weighted average value per user over the irregular
  // event series (the TWAP/feature-store shape: a reading holds
  // until the next one; simple means over-weight bursts). Per-user
  // lead window (partitioned — bounded by per-user activity, never
  // global), integer-exact microsecond durations, and the Σ value·dur
  // numerator folds in event order (bit-stable double); one rounded
  // output column. Single-event users have no held interval and are
  // excluded by the n_events ≥ 2 contract.
  // ---------------------------------------------------------------
  val wTwap: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val terms = Tables.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("next_us", unix_micros(lead(col("ts"), 1).over(w)))
      .filter(col("next_us").isNotNull)
      .withColumn("dur_us", col("next_us") - unix_micros(col("ts")))
      .withColumn("term", col("value") * d(col("dur_us")))
    terms.groupBy(col("user_id"))
      .agg((count(lit(1)) + 1).as("n_events"),
        sum(col("dur_us")).cast("long").as("span_us"),
        expr("aggregate(sort_array(collect_list(struct(ts, event_id, term)))," +
          " 0D, (a, x) -> a + x.term)").as("num"))
      .select(col("user_id"), col("n_events"), col("span_us"),
        round(col("num") / d(col("span_us")), 6).as("twap"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, Q] = Map(
    "sim_ari" -> simAri,
    "t_rake_keywords" -> tRakeKeywords,
    "w_twap" -> wTwap)

  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  private def ariCmp(name: String): String =
    s"""SELECT '$name' AS comparison, t.n, t.pairs_in_both,
       |       mu.pairs_u, mv.pairs_v,
       |       CASE WHEN (CAST(mu.pairs_u AS DOUBLE) + mv.pairs_v) / 2.0
       |                 = CAST(mu.pairs_u AS DOUBLE) * mv.pairs_v
       |                   / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2.0)
       |            THEN 1.0
       |            ELSE round((t.pairs_in_both
       |                   - CAST(mu.pairs_u AS DOUBLE) * mv.pairs_v
       |                     / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2.0))
       |                 / ((CAST(mu.pairs_u AS DOUBLE) + mv.pairs_v) / 2.0
       |                   - CAST(mu.pairs_u AS DOUBLE) * mv.pairs_v
       |                     / (CAST(t.n AS DOUBLE) * (t.n - 1) / 2.0)), 6)
       |       END AS ari
       |FROM (SELECT CAST(sum(nij * (nij - 1) // 2) AS BIGINT) AS pairs_in_both,
       |             CAST(sum(nij) AS BIGINT) AS n
       |      FROM cont_${name}) t
       |CROSS JOIN (SELECT CAST(sum(ai * (ai - 1) // 2) AS BIGINT) AS pairs_u
       |            FROM (SELECT sum(nij) AS ai FROM cont_${name} GROUP BY u)) mu
       |CROSS JOIN (SELECT CAST(sum(bj * (bj - 1) // 2) AS BIGINT) AS pairs_v
       |            FROM (SELECT sum(nij) AS bj FROM cont_${name} GROUP BY v)) mv""".stripMargin

  private def cellsCte(tag: String, seed: String): String =
    s"""c_$tag AS (
       |  SELECT CAST(row_number() OVER (ORDER BY md5('$seed' || CAST(vec_id AS VARCHAR)), vec_id)
       |         AS BIGINT) AS cid, e AS ce
       |  FROM e
       |  ORDER BY md5('$seed' || CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT 16),
       |asg_$tag AS (
       |  SELECT vec_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${dotSql("e.e", "c.ce")} DESC, c.cid) AS rk
       |    FROM e CROSS JOIN c_$tag c) WHERE rk = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "sim_ari" ->
      s"""WITH e0 AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |e AS (
         |  SELECT vec_id, label,
         |         list_transform(emb, x -> x / sqrt(list_sum(
         |           list_transform(range(1, len(emb) + 1), i -> emb[i] * emb[i])))) AS e
         |  FROM e0),
         |${cellsCte("a", "ariA:")},
         |${cellsCte("b", "ariB:")},
         |cont_cellsA_vs_label AS (
         |  SELECT a.cid AS u, e.label AS v, count(*) AS nij
         |  FROM asg_a a JOIN e ON a.vec_id = e.vec_id GROUP BY 1, 2),
         |cont_cellsB_vs_label AS (
         |  SELECT b.cid AS u, e.label AS v, count(*) AS nij
         |  FROM asg_b b JOIN e ON b.vec_id = e.vec_id GROUP BY 1, 2),
         |cont_cellsA_vs_cellsB AS (
         |  SELECT a.cid AS u, b.cid AS v, count(*) AS nij
         |  FROM asg_a a JOIN asg_b b ON a.vec_id = b.vec_id GROUP BY 1, 2)
         |SELECT * FROM (
         |${ariCmp("cellsA_vs_label")}
         |UNION ALL
         |${ariCmp("cellsA_vs_cellsB")}
         |UNION ALL
         |${ariCmp("cellsB_vs_label")})
         |ORDER BY comparison""".stripMargin,
    "t_rake_keywords" ->
      """WITH toks AS (
        |  SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, t.tok,
        |         t.tok IN ('the', 'a', 'of', 'and', 'to') AS stop
        |  FROM documents,
        |       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
        |                       generate_subscripts(string_split(text, ' '), 1) AS i) t),
        |seg AS (
        |  SELECT doc_id, pos, tok,
        |         sum(CASE WHEN stop THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
        |  FROM toks QUALIFY NOT stop),
        |occ AS (
        |  SELECT doc_id, phrase_id, list(tok ORDER BY pos) AS words,
        |         CAST(count(*) AS BIGINT) AS len
        |  FROM seg GROUP BY 1, 2 HAVING count(*) <= 4),
        |members AS (
        |  SELECT doc_id, phrase_id, len,
        |         CAST(w.i - 1 AS INTEGER) AS wpos, w.tok
        |  FROM occ,
        |       LATERAL (SELECT unnest(words) AS tok,
        |                       generate_subscripts(words, 1) AS i) w),
        |ws AS (
        |  SELECT tok, CAST(sum(len) AS BIGINT) AS deg,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM members GROUP BY 1),
        |scored AS (
        |  SELECT m.doc_id, m.phrase_id,
        |         list_sum(list(CAST(w.deg AS DOUBLE) / w.freq
        |           ORDER BY m.wpos)) AS score
        |  FROM members m JOIN ws w ON m.tok = w.tok
        |  GROUP BY 1, 2)
        |SELECT array_to_string(o.words, ' ') AS phrase,
        |       CAST(count(*) AS BIGINT) AS n_occ,
        |       max(o.len) AS n_words,
        |       max(round(s.score, 6)) AS score
        |FROM occ o JOIN scored s USING (doc_id, phrase_id)
        |GROUP BY 1
        |ORDER BY score DESC, phrase
        |LIMIT 25""".stripMargin,
    "w_twap" ->
      """WITH terms AS (
        |  SELECT user_id, ts, event_id,
        |         epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id)) - epoch_us(ts) AS dur_us,
        |         value * (epoch_us(lead(ts, 1) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id)) - epoch_us(ts)) AS term
        |  FROM events QUALIFY dur_us IS NOT NULL)
        |SELECT user_id, CAST(count(*) + 1 AS BIGINT) AS n_events,
        |       CAST(sum(dur_us) AS BIGINT) AS span_us,
        |       round(list_sum(list(term ORDER BY ts, event_id))
        |         / CAST(sum(dur_us) AS DOUBLE), 6) AS twap
        |FROM terms GROUP BY user_id ORDER BY user_id""".stripMargin)
}
