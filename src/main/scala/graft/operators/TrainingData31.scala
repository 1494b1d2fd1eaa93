package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 26: CUPED variance reduction for experiment
  * readouts (Deng et al. 2013), a from-scratch multinomial Naive
  * Bayes language classifier (train/infer on a hash split), and
  * perceptual-hash (structural) near-dup detection over the opaque
  * media column — the image-dedup shape run on the binary stand-in.
  * All Spark-first with full-replay DuckDB oracles; float policy:
  * exact integer/decimal sums into a fixed double DAG (the
  * a_welch_ttest convention), order-pinned folds for log-space.
  */
object TrainingData31 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // a_cuped — CUPED-adjusted experiment readout (Deng et al. 2013):
  // the industry-standard variance-reduction for A/B metrics. Users
  // hash-split into two arms; X = a user's event value in the PRE
  // period (before the global time midpoint), Y = in the experiment
  // period. θ = cov(X,Y)/var(X) pooled over BOTH arms (the
  // assignment-independent covariate), Ŷ = Y − θ(X − E[X]); the
  // output compares raw vs CUPED variance per arm. Scale shape: ONE
  // scan builds per-user (x, y) via conditional sums (map-side
  // combine); moments are exact — centi-unit longs for Σx/Σy,
  // DECIMAL(38,0) for Σx², Σy², Σxy (x² ≤ 10¹⁸ stays exact past
  // 10¹² users) — and θ/means/variances are a fixed double DAG over
  // those exact sums (bit-stable both engines); broadcast-scalar
  // tail, no second pass over users.
  // ---------------------------------------------------------------
  val aCuped: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
    // integer div: the micros sum (~3.5e18) exceeds double's 2⁵³
    // exact range, so a float midpoint would diverge from DuckDB's
    val mid = ev.agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .select(expr("(mn + mx) div 2").as("mid_us"))
    val perUser = ev.crossJoin(broadcast(mid))
      .select(col("user_id"),
        (unix_micros(col("ts")) < col("mid_us")).as("pre"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("m"))
      .groupBy(col("user_id"))
      .agg(sum(when(col("pre"), col("m")).otherwise(0L)).cast("long").as("x"),
        sum(when(!col("pre"), col("m")).otherwise(0L)).cast("long").as("y"))
      .withColumn("arm",
        when(conv(substring(md5(concat(lit("cuped:"),
          col("user_id").cast("string"))), 1, 2), 16, 10)
          .cast("long") % 2 === 0, "A").otherwise("B"))
      .localCheckpoint(eager = false) // consumed by the pooled AND per-arm moments
    val pooled = perUser.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"))
      .select(col("n"), col("sx"),
        ((d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))) /
          (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))))
          .as("theta"))
    val arms = perUser.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x")).cast("long").as("ax"),
        sum(col("y")).cast("long").as("ay"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("axx"),
        sum((col("y") * col("y")).cast("decimal(38,0)")).as("ayy"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("axy"))
    // per-arm sample moments; var(Ŷ) = var(Y) − 2θcov(X,Y) + θ²var(X)
    val nA = d(col("n_users"))
    val varY = (d(col("ayy")) - d(col("ay")) * d(col("ay")) / nA) / (nA - 1)
    val varX = (d(col("axx")) - d(col("ax")) * d(col("ax")) / nA) / (nA - 1)
    val covXY = (d(col("axy")) - d(col("ax")) * d(col("ay")) / nA) / (nA - 1)
    val varC = varY - lit(2.0) * col("theta") * covXY +
      col("theta") * col("theta") * varX
    arms.crossJoin(broadcast(pooled.select(col("theta"))))
      .select(col("arm"), col("n_users"),
        round(d(col("ay")) / nA / lit(100.0), 6).as("mean_y"),
        round(col("theta"), 6).as("theta"),
        round(varY / lit(10000.0), 6).as("var_raw"),
        round(varC / lit(10000.0), 6).as("var_cuped"),
        round(lit(1.0) - varC / varY, 6).as("var_reduction"))
      .orderBy(col("arm"))
  }

  // ---------------------------------------------------------------
  // t_naive_bayes — multinomial Naive Bayes language classifier,
  // trained and evaluated in one job (the from-scratch fastText
  // stand-in: train token counts on the 80% hash split, Laplace
  // α = 1, argmax posterior on the 20%): the classic "label the
  // corpus with a cheap supervised filter" stage. Scale shape:
  // training is ONE (lang, token) aggregate (map-side combine);
  // inference joins each test token to the ≤|langs| class rows of
  // the counts table (hash join on token) — work is |test tokens|
  // × |classes|, linear in the corpus. Log-probabilities are
  // doubles, so each document's Σ log p folds in (pos, lang) order
  // via the repo's sorted-fold (bit-stable); the argmax breaks
  // exact ties on lang. Output: the confusion matrix.
  // ---------------------------------------------------------------
  val tNaiveBayes: Q = (s, dir) => {
    val split = Tables.table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        (conv(substring(md5(concat(lit("nb:"),
          col("doc_id").cast("string"))), 1, 2), 16, 10)
          .cast("long") % 5 === 0).as("is_test"))
      .localCheckpoint(eager = false) // consumed by train counts AND test scoring
    val trainTok = split.filter(!col("is_test"))
      .select(col("lang"), explode(TF.tokens(col("text"))).as("tok"))
    val counts = trainTok.groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).cast("long").as("c"))
    val tot = trainTok.groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("tot"))
    val vocab = trainTok.agg(countDistinct(col("tok")).as("v"))
    val prior = split.filter(!col("is_test")).groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("nc"))
    val nTrain = split.filter(!col("is_test"))
      .agg(count(lit(1)).cast("long").as("ndocs"))
    val classes = prior.join(tot, "lang")
      .crossJoin(broadcast(vocab)).crossJoin(broadcast(nTrain))
      .select(col("lang").as("cls"), col("nc"), col("tot"), col("v"),
        col("ndocs"))
    val testTok = split.filter(col("is_test"))
      .select(col("doc_id"), col("lang").as("true_lang"),
        posexplode(TF.tokens(col("text"))).as(Seq("pos", "tok")))
    val scoredTok = testTok
      .crossJoin(broadcast(classes))
      .join(counts.select(col("lang").as("cls"), col("tok"), col("c")),
        Seq("cls", "tok"), "left")
      .withColumn("lp", log((d(coalesce(col("c"), lit(0L))) + lit(1.0)) /
        d(col("tot") + col("v"))))
    val posterior = scoredTok.groupBy(col("doc_id"), col("true_lang"),
        col("cls"), col("nc"), col("ndocs"))
      .agg(expr("aggregate(sort_array(collect_list(struct(pos, lp)))," +
        " 0D, (a, x) -> a + x.lp)").as("ll"))
      .withColumn("score", col("ll") + log(d(col("nc")) / d(col("ndocs"))))
    val pred = posterior.withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(desc("score"), col("cls"))))
      .filter(col("rk") === 1)
    pred.groupBy(col("true_lang"), col("cls").as("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("true_lang"), col("pred_lang"))
  }

  // ---------------------------------------------------------------
  // mm_phash_dedup — perceptual-hash near-dup detection over the
  // opaque media column (the image-dedup pipeline shape, run on the
  // binary stand-in): a 64-bit STRUCTURAL hash — 16 slice-nibbles,
  // nibble j = 4 bits of md5(j-th 1/16 content slice) — so
  // documents differing in one region differ in few bits, unlike
  // the avalanche md5 of dedup_exact. Banding: the hash splits into
  // 4 × 16-bit bands; by pigeonhole any pair within Hamming ≤ 3
  // shares one exact band, so the candidate set is exact, not
  // probabilistic (the dedup_simhash convention). Identical hashes
  // collapse BEFORE the band self-join (band buckets otherwise hold
  // every copy of every duplicate and go quadratic in copy count).
  // Scale shape: 4 hash-partitioned equi-joins on (band, value) —
  // never pairwise in corpus size; verify is 4 xor/bit_counts per
  // candidate.
  // ---------------------------------------------------------------
  val mmPhashDedup: Q = (s, dir) => {
    def nib(j: Int): Column = {
      val len = length(col("text"))
      val lo = floor(lit(j) * len / 16).cast("int")
      val hi = floor(lit(j + 1) * len / 16).cast("int")
      conv(substring(md5(col("text").substr(lo + 1, hi - lo)), 1, 1),
        16, 10).cast("long")
    }
    def band(b: Int): Column =
      (0 to 3).map(j => nib(4 * b + j) * (1L << (4 * (3 - j))))
        .reduce(_ + _).as(s"b$b")
    val hashed = Tables.table(s, dir, "documents")
      .select(col("doc_id") +: (0 to 3).map(band): _*)
    val base = hashed
      .groupBy(col("b0"), col("b1"), col("b2"), col("b3"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"),
        min(col("doc_id")).as("gkey"))
      .localCheckpoint(eager = false) // both band-join sides + member expansion
    val banded = base.select(col("gkey"), col("b0"), col("b1"), col("b2"),
      col("b3"), posexplode(array(col("b0"), col("b1"), col("b2"),
        col("b3"))).as(Seq("band", "key")))
    val l = banded.alias("l"); val r = banded.alias("r")
    val ham = (0 to 3).map(b =>
      bit_count(col(s"l.b$b").bitwiseXOR(col(s"r.b$b")))).reduce(_ + _)
    val repPairs = l.join(r,
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
          col("l.gkey") < col("r.gkey"))
      .select(col("l.gkey").as("g1"), col("r.gkey").as("g2"), ham.as("hamming"))
      .dropDuplicates("g1", "g2")
      .filter(col("hamming") <= 3)
    val m = base.select(col("gkey"), explode(col("members")).as("doc_id"))
    val wl = m.alias("wl"); val wr = m.alias("wr")
    val within = wl.join(wr, col("wl.gkey") === col("wr.gkey") &&
        col("wl.doc_id") < col("wr.doc_id"))
      .select(col("wl.doc_id").as("d1"), col("wr.doc_id").as("d2"),
        lit(0L).as("hamming"))
    val cross = repPairs
      .join(m.select(col("gkey").as("g1"), col("doc_id").as("m1")), "g1")
      .join(m.select(col("gkey").as("g2"), col("doc_id").as("m2")), "g2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"),
        col("hamming").cast("long").as("hamming"))
    within.unionAll(cross).orderBy(col("d1"), col("d2"))
  }

  val queries: Map[String, Q] = Map(
    "a_cuped" -> aCuped,
    "t_naive_bayes" -> tNaiveBayes,
    "mm_phash_dedup" -> mmPhashDedup)

  /** Hex md5 prefix → integer (fold twin of conv(substr(md5),16,10)). */
  private def hexSql(x: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  private val phashBandsSql: String =
    (0 to 3).map { b =>
      val nibs = (0 to 3).map { j =>
        val idx = 4 * b + j
        s"(${hexSql(s"substr(text, CAST(floor($idx * len(text) / 16) AS INTEGER) + 1, " +
          s"CAST(floor(${idx + 1} * len(text) / 16) AS INTEGER) - " +
          s"CAST(floor($idx * len(text) / 16) AS INTEGER))", 1)}) * ${1L << (4 * (3 - j))}"
      }.mkString(" + ")
      s"($nibs) AS b$b"
    }.mkString(",\n       ")

  val oracles: Map[String, String] = Map(
    "a_cuped" ->
      s"""WITH mid AS (
         |  SELECT CAST((min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS BIGINT)
         |    AS mid_us FROM events),
         |pu AS (
         |  SELECT user_id,
         |         CAST(sum(CASE WHEN epoch_us(ts) < mid_us
         |           THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |           ELSE 0 END) AS BIGINT) AS x,
         |         CAST(sum(CASE WHEN epoch_us(ts) >= mid_us
         |           THEN CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
         |           ELSE 0 END) AS BIGINT) AS y
         |  FROM events CROSS JOIN mid GROUP BY user_id),
         |pa AS (
         |  SELECT CASE WHEN ${hexSql("'cuped:' || CAST(user_id AS VARCHAR)", 2)}
         |    % 2 = 0 THEN 'A' ELSE 'B' END AS arm, x, y FROM pu),
         |pooled AS (
         |  SELECT (sum(CAST(x AS DECIMAL(38,0)) * y)::DOUBLE
         |            - sum(x)::DOUBLE * sum(y)::DOUBLE / count(*))
         |         / (sum(CAST(x AS DECIMAL(38,0)) * x)::DOUBLE
         |            - sum(x)::DOUBLE * sum(x)::DOUBLE / count(*)) AS theta
         |  FROM pa),
         |arms AS (
         |  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         |         CAST(sum(x) AS BIGINT) AS ax, CAST(sum(y) AS BIGINT) AS ay,
         |         sum(CAST(x AS DECIMAL(38,0)) * x) AS axx,
         |         sum(CAST(y AS DECIMAL(38,0)) * y) AS ayy,
         |         sum(CAST(x AS DECIMAL(38,0)) * y) AS axy
         |  FROM pa GROUP BY arm)
         |SELECT arm, n_users,
         |       round(ay::DOUBLE / n_users::DOUBLE / 100.0, 6) AS mean_y,
         |       round(theta, 6) AS theta,
         |       round((ayy::DOUBLE - ay::DOUBLE * ay::DOUBLE / n_users::DOUBLE)
         |         / (n_users::DOUBLE - 1) / 10000.0, 6) AS var_raw,
         |       round(((ayy::DOUBLE - ay::DOUBLE * ay::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1)
         |         - 2.0 * theta
         |           * (axy::DOUBLE - ax::DOUBLE * ay::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1)
         |         + theta * theta
         |           * (axx::DOUBLE - ax::DOUBLE * ax::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1)) / 10000.0, 6) AS var_cuped,
         |       round(1.0 - ((ayy::DOUBLE - ay::DOUBLE * ay::DOUBLE
         |             / n_users::DOUBLE) / (n_users::DOUBLE - 1)
         |         - 2.0 * theta
         |           * (axy::DOUBLE - ax::DOUBLE * ay::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1)
         |         + theta * theta
         |           * (axx::DOUBLE - ax::DOUBLE * ax::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1))
         |         / ((ayy::DOUBLE - ay::DOUBLE * ay::DOUBLE / n_users::DOUBLE)
         |           / (n_users::DOUBLE - 1)), 6) AS var_reduction
         |FROM arms CROSS JOIN pooled ORDER BY arm""".stripMargin,
    "t_naive_bayes" ->
      s"""WITH split AS (
         |  SELECT doc_id, lang, text,
         |         ${hexSql("'nb:' || CAST(doc_id AS VARCHAR)", 2)} % 5 = 0
         |           AS is_test
         |  FROM documents),
         |train_tok AS (
         |  SELECT lang, unnest(string_split(text, ' ')) AS tok
         |  FROM split WHERE NOT is_test),
         |counts AS (
         |  SELECT lang AS cls, tok, CAST(count(*) AS BIGINT) AS c
         |  FROM train_tok GROUP BY 1, 2),
         |tot AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS tot
         |        FROM train_tok GROUP BY 1),
         |vocab AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
         |          FROM train_tok),
         |prior AS (SELECT lang AS cls, CAST(count(*) AS BIGINT) AS nc
         |          FROM split WHERE NOT is_test GROUP BY 1),
         |ndocs AS (SELECT CAST(count(*) AS BIGINT) AS nd
         |          FROM split WHERE NOT is_test),
         |test_tok AS (
         |  SELECT doc_id, lang AS true_lang,
         |         CAST(t.i - 1 AS INTEGER) AS pos, t.tok
         |  FROM split,
         |       LATERAL (SELECT unnest(string_split(text, ' ')) AS tok,
         |                generate_subscripts(string_split(text, ' '), 1) AS i) t
         |  WHERE is_test),
         |scored AS (
         |  SELECT tt.doc_id, tt.true_lang, p.cls, tt.pos,
         |         ln((coalesce(c.c, 0)::DOUBLE + 1.0) / (t.tot + v.v)::DOUBLE)
         |           AS lp
         |  FROM test_tok tt
         |  CROSS JOIN prior p
         |  JOIN tot t ON t.cls = p.cls
         |  CROSS JOIN vocab v
         |  LEFT JOIN counts c ON c.cls = p.cls AND c.tok = tt.tok),
         |post AS (
         |  SELECT s.doc_id, s.true_lang, s.cls,
         |         list_sum(list(s.lp ORDER BY s.pos))
         |           + ln(p.nc::DOUBLE / nd.nd::DOUBLE) AS score
         |  FROM scored s JOIN prior p ON p.cls = s.cls CROSS JOIN ndocs nd
         |  GROUP BY s.doc_id, s.true_lang, s.cls, p.nc, nd.nd),
         |pred AS (
         |  SELECT doc_id, true_lang, cls FROM post
         |  QUALIFY row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, cls) = 1)
         |SELECT true_lang, cls AS pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |FROM pred GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mm_phash_dedup" ->
      s"""WITH hashed AS (
         |  SELECT doc_id,
         |       $phashBandsSql
         |  FROM documents),
         |base AS MATERIALIZED (
         |  SELECT b0, b1, b2, b3, list(doc_id ORDER BY doc_id) AS members,
         |         min(doc_id) AS gkey
         |  FROM hashed GROUP BY 1, 2, 3, 4),
         |banded AS (
         |  SELECT gkey, b0, b1, b2, b3, t.band, t.key
         |  FROM base, LATERAL (
         |    SELECT unnest([0, 1, 2, 3]) AS band,
         |           unnest([b0, b1, b2, b3]) AS key) t),
         |rep AS (
         |  SELECT * FROM (
         |    SELECT DISTINCT l.gkey AS g1, r.gkey AS g2,
         |           bit_count(xor(l.b0, r.b0)) + bit_count(xor(l.b1, r.b1))
         |             + bit_count(xor(l.b2, r.b2)) + bit_count(xor(l.b3, r.b3))
         |             AS hamming
         |    FROM banded l JOIN banded r
         |      ON l.band = r.band AND l.key = r.key AND l.gkey < r.gkey)
         |  WHERE hamming <= 3),
         |m AS (SELECT gkey, unnest(members) AS doc_id FROM base),
         |within AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(0 AS BIGINT) AS hamming
         |  FROM m a JOIN m b ON a.gkey = b.gkey AND a.doc_id < b.doc_id),
         |crossp AS (
         |  SELECT least(ma.doc_id, mb.doc_id) AS d1,
         |         greatest(ma.doc_id, mb.doc_id) AS d2,
         |         CAST(r.hamming AS BIGINT) AS hamming
         |  FROM rep r JOIN m ma ON ma.gkey = r.g1 JOIN m mb ON mb.gkey = r.g2)
         |SELECT * FROM (SELECT * FROM within UNION ALL SELECT * FROM crossp)
         |ORDER BY d1, d2""".stripMargin)
}
