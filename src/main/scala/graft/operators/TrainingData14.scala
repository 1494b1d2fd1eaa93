package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 11: Kneser–Ney smoothed bigram LM evaluation (the
  * production-grade companion of t_perplexity's add-1 baseline) and
  * a consistent-hash resharding audit (the ring partitioner a
  * 100 TB corpus store uses to grow capacity without reshuffling the
  * world). Both Spark-first with full-replay DuckDB oracles.
  */
object TrainingData14 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // t_kneser_ney — held-out cross-entropy under an interpolated
  // Kneser–Ney bigram LM (Kneser & Ney 1995; Chen & Goodman 1999),
  // the smoothing that actually ships in LM data pipelines:
  //   P(w₂|w₁) = max(c₁₂ − D, 0)/c₁
  //            + (D·N₁₊(w₁·)/c₁) · (N₁₊(·w₂)/B)
  // with discount D = 0.75 (= 3/4, EXACTLY representable — the
  // discount subtraction is IEEE-exact, unlike a 0.7). Train =
  // docs whose md5 first hex digit ≠ 'f'; eval = the 'f' held-out
  // slice (the repo's split convention). A held-out bigram is
  // scored only when w₁ was seen as a bigram LHS and w₂ as a
  // continuation (otherwise P = 0 under bigram KN); skipped mass is
  // reported per doc. All counts are exact integers; P is a fixed
  // parenthesized DAG of exact divisions; the only libm is the
  // final ln, folded in bigram order and rounded to 6 dp (the
  // t_perplexity policy). Scale shape: LM tables are vocab-bounded
  // and broadcast (the documented t_perplexity trade — an
  // open-vocab corpus would prune to top-K first); the held-out
  // stream shuffles only on (doc, bigram).
  // ---------------------------------------------------------------
  val tKneserNey: Q = (s, dir) => {
    val base = docs(s, dir)
      .withColumn("held", substring(md5(col("text")), 1, 1) === "f")
    val db = base.filter(col("held"))
      .select(col("doc_id"), explode(TF.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram")).agg(count(lit(1)).as("cb"))
    val tb = base.filter(!col("held"))
      .select(explode(TF.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c12"))
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .localCheckpoint(eager = false) // consumed by 3 stat aggregates + the lookup
    val w1s = tb.groupBy(col("w1"))
      .agg(sum(col("c12")).cast("long").as("c1"),
        count(lit(1)).as("n1p_fwd"))
    val w2s = tb.groupBy(col("w2")).agg(count(lit(1)).as("n1p_bwd"))
    val btot = tb.agg(count(lit(1)).as("b"))
    db
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
      .withColumn("w2", substring_index(col("bigram"), " ", -1))
      .join(broadcast(w1s), Seq("w1"), "left")
      .join(broadcast(w2s), Seq("w2"), "left")
      .join(broadcast(tb.select(col("bigram"), col("c12"))),
        Seq("bigram"), "left")
      .crossJoin(broadcast(btot))
      .withColumn("scored",
        col("c1").isNotNull && col("n1p_bwd").isNotNull)
      .withColumn("p", when(col("scored"),
        (greatest(d(coalesce(col("c12"), lit(0L))) - lit(0.75), lit(0.0)) /
          d(col("c1"))) +
          ((lit(0.75) * d(col("n1p_fwd")) / d(col("c1"))) *
            (d(col("n1p_bwd")) / d(col("b"))))))
      .groupBy(col("doc_id"))
      .agg(sum(col("cb")).cast("long").as("n_bigrams"),
        coalesce(sum(when(col("scored"), col("cb"))), lit(0L)).cast("long")
          .as("n_scored"),
        sort_array(collect_list(when(col("scored"),
          struct(col("bigram"), col("cb"), col("p"))))).as("xs"))
      .withColumn("ll", expr(
        "aggregate(xs, 0D, (a, x) -> a + CAST(x.cb AS DOUBLE) * ln(x.p))"))
      .select(col("doc_id"), col("n_bigrams"), col("n_scored"),
        when(col("n_scored") > 0,
          round(-col("ll") / d(col("n_scored")), 6)).as("cross_entropy"))
      .orderBy(col("doc_id"))
  }

  /** The 60-bit portable md5 hash of the ring point label, computed
    * on the DRIVER (the ring is a constant of the partitioner) with
    * the exact hex-prefix rule Spark/DuckDB replay on data:
    * first 15 hex chars of md5, base-16. */
  private def ringPointHash(label: String): Long = {
    val dgst = java.security.MessageDigest.getInstance("MD5")
      .digest(label.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      dgst.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  private def ringLit(nShards: Int, vnodes: Int): Column =
    array((for (sh <- 0 until nShards; v <- 0 until vnodes) yield
      struct(lit(ringPointHash(s"shard-$sh#$v")).as("ph"),
        lit(sh.toLong).as("shard"))): _*)

  // ---------------------------------------------------------------
  // o_consistent_hash — consistent-hash ring resharding audit
  // (Karger et al. 1997; the Dynamo/Cassandra partitioner): docs
  // hash to a 60-bit portable md5 point; a ring of 8 shards × 4
  // virtual nodes assigns each doc to the first ring point
  // clockwise (smallest point ≥ key, wrapping to the ring minimum);
  // the audit then adds shard 8 and reports, per original shard,
  // how many docs move. Consistent hashing's contract — the ONLY
  // docs that move are those captured by the new shard's points —
  // is pinned in the spec and visible in the output (every move
  // lands on shard 8). The ring is a 32/36-element LITERAL array;
  // assignment is a pure map-side expression (filter → sorted head
  // → wrap fallback) — the whole operator is ONE scan + an 8-group
  // aggregate, exactly how a real ring partitioner behaves at
  // 100 TB (no join, no shuffle of the corpus beyond 8 groups).
  // All integer comparisons on md5 grids — bit-exact everywhere.
  // ---------------------------------------------------------------
  val oConsistentHash: Q = (s, dir) => {
    // get() (0-based) is null-on-out-of-bounds in BOTH ANSI modes —
    // the filter result is legitimately empty past the last ring point
    val assign = coalesce(
      expr("get(array_sort(filter(__ring, r -> r.ph >= __kh)), 0)")
        .getField("shard"),
      expr("get(array_sort(__ring), 0)").getField("shard"))
    docs(s, dir)
      .select(col("doc_id"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("long").as("__kh"))
      .withColumn("__ring", ringLit(8, 4))
      .withColumn("old_shard", assign)
      .withColumn("__ring", ringLit(9, 4))
      .withColumn("new_shard", assign)
      .groupBy(col("old_shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("new_shard") =!= col("old_shard"), 1L).otherwise(0L))
          .as("n_moved"),
        max(when(col("new_shard") =!= col("old_shard"), col("new_shard")))
          .as("moved_to"))
      .select(col("old_shard"), col("n_docs"), col("n_moved"),
        round(d(col("n_moved")) / d(col("n_docs")), 6).as("move_rate"),
        col("moved_to"))
      .orderBy(col("old_shard"))
  }

  val queries: Map[String, Q] = Map(
    "t_kneser_ney" -> tKneserNey,
    "o_consistent_hash" -> oConsistentHash)

  private val hex15 = (x: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, 15), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "t_kneser_ney" ->
      s"""WITH t AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS toks,
        |         substr(md5(text), 1, 1) = 'f' AS held
        |  FROM documents),
        |db AS (
        |  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS cb FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN [text]
        |                  ELSE list_transform(range(1, len(toks)),
        |                         i -> toks[i] || ' ' || toks[i+1]) END)
        |             AS bigram
        |    FROM t WHERE held)
        |  GROUP BY 1, 2),
        |tb AS (
        |  SELECT bigram, CAST(count(*) AS BIGINT) AS c12,
        |         split_part(bigram, ' ', 1) AS w1,
        |         split_part(bigram, ' ', -1) AS w2
        |  FROM (
        |    SELECT unnest(CASE WHEN len(toks) < 2 THEN [text]
        |                  ELSE list_transform(range(1, len(toks)),
        |                         i -> toks[i] || ' ' || toks[i+1]) END)
        |             AS bigram
        |    FROM t WHERE NOT held)
        |  GROUP BY 1),
        |w1s AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
        |               CAST(count(*) AS BIGINT) AS n1p_fwd
        |        FROM tb GROUP BY 1),
        |w2s AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_bwd
        |        FROM tb GROUP BY 1),
        |btot AS (SELECT CAST(count(*) AS BIGINT) AS b FROM tb),
        |scoredrows AS (
        |  SELECT db.doc_id, db.bigram, db.cb,
        |         (w1s.c1 IS NOT NULL AND w2s.n1p_bwd IS NOT NULL) AS scored,
        |         CASE WHEN w1s.c1 IS NOT NULL AND w2s.n1p_bwd IS NOT NULL
        |           THEN (greatest(CAST(coalesce(tb.c12, 0) AS DOUBLE) - 0.75,
        |                   0.0) / CAST(w1s.c1 AS DOUBLE))
        |              + ((0.75 * CAST(w1s.n1p_fwd AS DOUBLE)
        |                   / CAST(w1s.c1 AS DOUBLE))
        |                 * (CAST(w2s.n1p_bwd AS DOUBLE)
        |                     / CAST(btot.b AS DOUBLE)))
        |         END AS p
        |  FROM db
        |  LEFT JOIN w1s ON w1s.w1 = split_part(db.bigram, ' ', 1)
        |  LEFT JOIN w2s ON w2s.w2 = split_part(db.bigram, ' ', -1)
        |  LEFT JOIN tb ON tb.bigram = db.bigram
        |  CROSS JOIN btot),
        |folded AS (
        |  SELECT doc_id, CAST(sum(cb) AS BIGINT) AS n_bigrams,
        |         CAST(coalesce(sum(cb) FILTER (WHERE scored), 0) AS BIGINT)
        |           AS n_scored,
        |         list_sort(list(struct_pack(bigram := bigram, cb := cb,
        |             p := p)) FILTER (WHERE scored)) AS xs
        |  FROM scoredrows GROUP BY 1)
        |SELECT doc_id, n_bigrams, n_scored,
        |       CASE WHEN n_scored > 0 THEN
        |         round(-(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |             list_transform(xs, x -> CAST(x.cb AS DOUBLE) * ln(x.p))),
        |             (a, b) -> a + b)) / CAST(n_scored AS DOUBLE), 6)
        |       END AS cross_entropy
        |FROM folded ORDER BY doc_id""".stripMargin,
    "o_consistent_hash" ->
      s"""WITH ring8 AS (
        |  SELECT list(struct_pack(
        |           ph := ${hex15("'shard-' || CAST(s AS VARCHAR) || '#' || CAST(v AS VARCHAR)")},
        |           shard := CAST(s AS BIGINT))) AS ring
        |  FROM (SELECT unnest(range(0, 8)) AS s) CROSS JOIN
        |       (SELECT unnest(range(0, 4)) AS v)),
        |ring9 AS (
        |  SELECT list(struct_pack(
        |           ph := ${hex15("'shard-' || CAST(s AS VARCHAR) || '#' || CAST(v AS VARCHAR)")},
        |           shard := CAST(s AS BIGINT))) AS ring
        |  FROM (SELECT unnest(range(0, 9)) AS s) CROSS JOIN
        |       (SELECT unnest(range(0, 4)) AS v)),
        |a AS (
        |  SELECT doc_id,
        |         coalesce(list_sort(list_filter(ring8.ring,
        |             r -> r.ph >= kh))[1].shard,
        |           list_sort(ring8.ring)[1].shard) AS old_shard,
        |         coalesce(list_sort(list_filter(ring9.ring,
        |             r -> r.ph >= kh))[1].shard,
        |           list_sort(ring9.ring)[1].shard) AS new_shard
        |  FROM (SELECT doc_id,
        |               ${hex15("CAST(doc_id AS VARCHAR)")} AS kh
        |        FROM documents)
        |  CROSS JOIN ring8 CROSS JOIN ring9)
        |SELECT old_shard, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN new_shard <> old_shard THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_moved,
        |       round(CAST(sum(CASE WHEN new_shard <> old_shard
        |                     THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE), 6) AS move_rate,
        |       max(CASE WHEN new_shard <> old_shard THEN new_shard END)
        |         AS moved_to
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin)
}
