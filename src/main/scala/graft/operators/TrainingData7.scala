package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 3: linear-algebra and sketch extensions — the
  * event-type Markov chain's stationary distribution (bounded power
  * iteration), KMV-sketch pairwise Jaccard between sources
  * (Bar-Yossef et al. 2002; Beyer et al. 2007 for the set-operation
  * estimate), the corpus's top principal component by power
  * iteration over an integer-exact Gram matrix (the spectral
  * embedding-health probe), and a partition-skew audit (the AQE/
  * salting companion diagnostic) — public algorithms re-expressed
  * Spark-first with full-replay DuckDB oracles.
  */
object TrainingData7 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // ev_markov_stationary — stationary distribution of the event-type
  // Markov chain: transition counts from per-user (ts, event_id)-
  // ordered streams (one window pass — the sessionize shape), exact
  // count-ratio transition probabilities, then π = lim v·Pᵏ by 20
  // power-iteration steps from the uniform start — compared against
  // the empirical state frequencies (the "is the chain's long-run
  // behavior already visible" monitoring readout). Scale shape: the
  // row stream reduces through the (states², ≤ 25-cell) count
  // aggregate FIRST; the iteration folds over a 5-vector × 25-matrix
  // — bounded by the TYPE ALPHABET, never rows. Float parity: p_ij
  // are single divisions of exact longs; each step's entries fold
  // i-ascending (the fixed-order zip_with ≡ list_sum twin); the
  // uniform start 1/S is one division.
  // ---------------------------------------------------------------
  /** The (cur, nxt, c) transition-count frame — shared with the
    * batch-81 mixing-time audit (TrainingData81). */
  private[operators] def markovTransitions(s: SparkSession,
      dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.table(s, dir, "events")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false) // consumed by states, row totals, cells, marginals
  }

  /** One-row (states, s_n, pm) row-stochastic matrix frame off the
    * transition counts — shared with TrainingData81. */
  private[operators] def markovPm(tr: DataFrame): DataFrame = {
    val statesRow = tr.agg(sort_array(array_distinct(flatten(
      collect_list(array(col("cur"), col("nxt")))))).as("states"))
      .withColumn("s_n", size(col("states")))
    val rt = tr.groupBy(col("cur")).agg(sum(col("c")).as("r"))
    val cells = tr.join(rt, "cur").crossJoin(broadcast(statesRow))
      .select(col("states"), col("s_n"),
        ((array_position(col("states"), col("cur")) - 1) * col("s_n") +
          array_position(col("states"), col("nxt"))).as("k"),
        (d(col("c")) / d(col("r"))).as("p"))
    cells.groupBy(col("states"), col("s_n"))
      .agg(map_from_entries(collect_list(struct(col("k"), col("p")))).as("mp"))
      .withColumn("pm", expr(
        "transform(sequence(1, s_n * s_n)," +
          " k -> coalesce(element_at(mp, CAST(k AS BIGINT)), CAST(0.0 AS DOUBLE)))"))
  }

  val evMarkovStationary: Q = (s, dir) => {
    val tr = markovTransitions(s, dir)
    val folded = markovPm(tr)
      .withColumn("vf", expr(
        """aggregate(
          |  sequence(1, 20),
          |  array_repeat(CAST(1.0 AS DOUBLE) / CAST(s_n AS DOUBLE), s_n),
          |  (v, it) -> transform(sequence(1, s_n),
          |    j -> aggregate(sequence(1, s_n), CAST(0.0 AS DOUBLE),
          |      (a, i) -> a + element_at(v, i)
          |        * element_at(pm, (i - 1) * s_n + j))))""".stripMargin))
      .select(explode(expr(
        "transform(sequence(1, s_n), j -> named_struct(" +
          "'state', element_at(states, j), 'pi', element_at(vf, j)))"))
        .as("o"))
      .select(col("o.state").as("state"), col("o.pi").as("pi"))
    val emp = tr.groupBy(col("cur").as("state"))
      .agg(sum(col("c")).cast("long").as("n_out"))
    val tot = emp.agg(sum(col("n_out")).as("t"))
    folded.join(emp, "state").crossJoin(broadcast(tot))
      .select(col("state"), col("n_out"),
        round(col("pi"), 6).as("p_stationary"),
        round(d(col("n_out")) / d(col("t")), 6).as("p_empirical"))
      .orderBy(col("state"))
  }

  // ---------------------------------------------------------------
  // a_kmv_jaccard — pairwise source-vocabulary similarity from KMV
  // bottom-k sketches (Beyer et al. 2007: J ≈ |K(A∪B) ∩ MinK(A) ∩
  // MinK(B)| / |K(A∪B)|, K = the k smallest union hashes), audited
  // against the EXACT token Jaccard — the "which domains share a
  // vocabulary" dedup-adjacent diagnostic, and the demonstration
  // that the sketch union/intersection algebra (what a 100 TB run
  // would ship instead of the exact join) tracks truth. Scale shape:
  // sketches pre-trim map-side to k = 16 rows per source (TopKAgg);
  // the exact side is a posting-list self-join on tok (equi,
  // token-cardinality-bounded) that exists only as the audit; the
  // pair frame joins the 20-row sketch table by key — no cross.
  // 48-bit hashes make min-k exact on any engine.
  // ---------------------------------------------------------------
  val aKmvJaccard: Q = (s, dir) => {
    val k = 16
    val toks = docs(s, dir)
      .select(col("source"), explode(array_distinct(TF.tokens(col("text"))))
        .as("tok"))
      .distinct()
      .withColumn("h", conv(substring(md5(col("tok")), 1, 12), 16, 10)
        .cast("long"))
      .localCheckpoint(eager = false) // consumed by the sketch and both pair sides
    val mink = udaf(new graft.functions.TopKAgg(k))
    val sk = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_tok"),
        mink((-col("h")).cast("double"), col("h")).as("mins"))
      .select(col("source"), col("n_tok"),
        expr("transform(mins, m -> m._2)").as("harr"))
      .localCheckpoint(eager = false) // joined twice (both pair endpoints)
    val pairs = toks.alias("x")
      .join(toks.alias("y"), col("x.tok") === col("y.tok") &&
        col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("s1"), col("y.source").as("s2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sk.select(col("source").as("s1"), col("n_tok").as("n_a"),
        col("harr").as("ha")), "s1")
      .join(sk.select(col("source").as("s2"), col("n_tok").as("n_b"),
        col("harr").as("hb")), "s2")
      .withColumn("ku",
        slice(array_sort(array_distinct(concat(col("ha"), col("hb")))), 1, k))
      .withColumn("i3", size(filter(col("ku"),
        x => array_contains(col("ha"), x) && array_contains(col("hb"), x))))
      .select(col("s1"), col("s2"), col("n_a"), col("n_b"), col("inter"),
        round(d(col("inter")) / d(col("n_a") + col("n_b") - col("inter")), 6)
          .as("j_exact"),
        round(d(col("i3")) / d(least(lit(k), size(col("ku")))), 6).as("j_est"))
      .withColumn("abs_err", round(abs(col("j_est") - col("j_exact")), 6))
      .orderBy(col("s1"), col("s2"))
  }

  // ---------------------------------------------------------------
  // e_pca_power — the corpus's top principal component (uncentered
  // PCA / leading right-singular direction) by power iteration on
  // the 64×64 Gram matrix — the embedding-health probe (anisotropy:
  // how much variance one direction eats, cf. Mu & Viswanath 2018).
  // The Gram sums are EXACT LONGS: coordinates quantize to the 2⁻²⁰
  // grid (floor(x·2²⁰) — float→double is exact, ·2²⁰ is a power of
  // two), so Σ qᵢqⱼ is an integer sum — portable to any engine, no
  // float-accumulation order to disagree on (the q²·n magnitude
  // stays < 2⁶³ through ~10⁹ vectors; beyond that the dec38 sum
  // family applies). C = Σ/(n·2⁴⁰) divides once at the edge. The
  // iteration (12 steps from the exact start 1/√64 = 0.125,
  // normalize each step) folds j-ascending — the fixed-order
  // zip_with ≡ list_sum twin; the oracle replays it as a recursive
  // CTE. Scale shape: one 64-way posexplode + 64 map-side partial
  // sums per row group (shuffle = 64 rows × 64 cols, constant);
  // the fold runs on ONE 4096-double row, never the corpus.
  // ---------------------------------------------------------------
  val ePcaPower: Q = (s, dir) => {
    val dim = 64
    val q = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0)" +
          " AS BIGINT))").as("qv"))
    val ex = q.select(col("qv"), posexplode(col("qv")).as(Seq("i0", "qi")))
    val aggExprs = (0 until dim).map(j =>
      sum(col("qi") * element_at(col("qv"), j + 1)).cast("long").as(s"s$j"))
    val sums = ex.groupBy(col("i0")).agg(aggExprs.head, aggExprs.tail: _*)
    val gram = sums
      .select(col("i0"), array((0 until dim).map(j => col(s"s$j")): _*)
        .as("sarr"))
      .agg(sort_array(collect_list(struct(col("i0"), col("sarr")))).as("rows"))
      .select(flatten(expr("transform(rows, r -> r.sarr)")).as("gflat"))
    val nVec = q.agg(count(lit(1)).as("n_vec"))
    // the matvec W(v). SQL lambdas have no let-binding, so inside the
    // iteration W is bound ONCE per step by folding over a singleton
    // array with W as the initial state — without the binding,
    // Catalyst's collapsed projections re-inline W (and, transitively,
    // the whole cm-building expression) into every element_at, which
    // turns the 12-step iteration into ~10¹² interpreted evals (the
    // bug this comment is the tombstone of)
    def matvec(v: String) =
      s"transform(sequence(1, $dim), j -> aggregate(sequence(1, $dim)," +
        s" CAST(0.0 AS DOUBLE), (a, i) -> a + element_at($v, i)" +
        s" * element_at(cm, (i - 1) * $dim + j)))"
    gram.crossJoin(broadcast(nVec))
      .withColumn("cm", expr(
        "transform(gflat, g -> CAST(g AS DOUBLE)" +
          " / (CAST(n_vec AS DOUBLE) * 1099511627776.0))"))
      // materialize the 4096-double cm row: the fold's element_at(cm)
      // must read a VALUE, not re-run the projection it collapsed into
      .localCheckpoint(eager = false)
      .withColumn("vf", expr(
        s"""aggregate(
           |  sequence(1, 12),
           |  array_repeat(CAST(0.125 AS DOUBLE), $dim),
           |  (v, it) -> aggregate(array(0), ${matvec("v")},
           |    (wv, z) -> transform(wv, x -> x / sqrt(aggregate(wv,
           |      CAST(0.0 AS DOUBLE), (a, y) -> a + y * y)))))""".stripMargin))
      // materialize vf before wf/lam reference it (same collapse trap)
      .localCheckpoint(eager = false)
      .withColumn("wf", expr(matvec("vf")))
      .withColumn("lam", expr(
        s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE)," +
          s" (a, j) -> a + element_at(vf, j) * element_at(wf, j))"))
      .withColumn("trace", expr(
        s"aggregate(sequence(1, $dim), CAST(0.0 AS DOUBLE)," +
          s" (a, j) -> a + element_at(cm, (j - 1) * $dim + j))"))
      .select(col("n_vec"), col("vf"), col("lam"), col("trace"),
        posexplode(col("vf")).as(Seq("d0", "loading")))
      .select((col("d0") + 1).cast("int").as("dim"),
        round(col("loading"), 6).as("loading"),
        round(col("lam"), 6).as("eigenvalue"),
        round(col("lam") / col("trace"), 6).as("explained_ratio"),
        col("n_vec"))
      .orderBy(col("dim"))
  }

  // ---------------------------------------------------------------
  // o_partition_skew — partition-skew audit of the (lang, source)
  // layout (the diagnostic a 100 TB writer consults before choosing
  // salting/AQE settings, and the read-side twin of
  // o_compaction_plan): per lang, cell count, max/mean skew factor,
  // Shannon entropy of the within-lang source distribution and its
  // balance ratio entropy/ln(cells) (1 = perfectly even). Scale
  // shape: the corpus reduces through the ≤ lang×source count
  // aggregate first; entropy folds source-ascending over ≤ 20
  // values (the sorted-fold float policy); skew is exact-integer
  // arithmetic with two divisions at the edge.
  // ---------------------------------------------------------------
  val oPartitionSkew: Q = (s, dir) => {
    docs(s, dir).groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_cells"), sum(col("c")).cast("long").as("n_docs"),
        max(col("c")).cast("long").as("max_cell"),
        sort_array(collect_list(struct(col("source"), col("c")))).as("cs"))
      .withColumn("entropy", expr(
        "aggregate(cs, CAST(0.0 AS DOUBLE), (a, x) ->" +
          " a - (CAST(x.c AS DOUBLE) / CAST(n_docs AS DOUBLE))" +
          " * ln(CAST(x.c AS DOUBLE) / CAST(n_docs AS DOUBLE)))"))
      .select(col("lang"), col("n_cells"), col("n_docs"), col("max_cell"),
        round(d(col("max_cell")) * d(col("n_cells")) / d(col("n_docs")), 6)
          .as("skew_factor"),
        round(col("entropy"), 6).as("entropy"),
        round(col("entropy") / log(d(col("n_cells"))), 6).as("balance"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, Q] = Map(
    "ev_markov_stationary" -> evMarkovStationary,
    "a_kmv_jaccard" -> aKmvJaccard,
    "e_pca_power" -> ePcaPower,
    "o_partition_skew" -> oPartitionSkew)

  /** Hex md5 prefix → integer (fold twin of conv(substr(md5),16,10)). */
  private def hexSql(x: String, n: Int): String =
    s"list_reduce(list_transform(string_split(substr(md5($x), 1, $n), '')," +
      s" c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))," +
      s" (a, b) -> a * 16 + b)"

  /** Shared DuckDB matrix CTEs (tr/st/rn/pmt) — the transition
    * machinery both the stationary and mixing oracles replay. */
  private[operators] val markovCtes: String =
    """tr AS (
      |  SELECT cur, nxt, count(*) AS c FROM (
      |    SELECT event_type AS cur,
      |           lead(event_type) OVER (PARTITION BY user_id
      |             ORDER BY ts, event_id) AS nxt
      |    FROM events)
      |  WHERE nxt IS NOT NULL GROUP BY 1, 2),
      |st AS (SELECT list_sort(list_distinct(flatten(list([cur, nxt]))))
      |         AS states FROM tr),
      |rn AS (SELECT len(states) AS n FROM st),
      |rt AS (SELECT cur, sum(c) AS r FROM tr GROUP BY 1),
      |ent AS (
      |  SELECT (list_position(st.states, tr.cur) - 1) * rn.n
      |           + list_position(st.states, tr.nxt) AS k,
      |         CAST(tr.c AS DOUBLE) / CAST(rt.r AS DOUBLE) AS p
      |  FROM tr JOIN rt ON tr.cur = rt.cur CROSS JOIN st CROSS JOIN rn),
      |gk AS (
      |  -- range() takes no lateral args in DuckDB: fixed 25-row
      |  -- bound (the type alphabet), filtered to the true n; the
      |  -- LEFT JOIN sits outside so it stays uncorrelated
      |  SELECT (ti.i - 1) * rn.n + tj.j AS k
      |  FROM rn, range(1, 26) ti(i), range(1, 26) tj(j)
      |  WHERE ti.i <= rn.n AND tj.j <= rn.n),
      |grid AS (
      |  SELECT gk.k, coalesce(e.p, 0.0) AS p
      |  FROM gk LEFT JOIN ent e ON e.k = gk.k),
      |pmt AS (SELECT list(p ORDER BY k) AS pm FROM grid)""".stripMargin

  val oracles: Map[String, String] = Map(
    "ev_markov_stationary" ->
      s"""WITH RECURSIVE $markovCtes,
        |it(stp, v) AS (
        |  SELECT 0, list_transform(range(1, rn.n + 1),
        |           x -> CAST(1.0 AS DOUBLE) / CAST(rn.n AS DOUBLE))
        |  FROM rn
        |  UNION ALL
        |  SELECT stp + 1,
        |         list_transform(range(1, rn.n + 1),
        |           j -> list_sum(list_transform(range(1, rn.n + 1),
        |             i -> v[i] * pm[(i - 1) * rn.n + j])))
        |  FROM it, pmt, rn WHERE stp < 20),
        |vf AS (SELECT v FROM it WHERE stp = 20),
        |emp AS (SELECT cur AS state, CAST(sum(c) AS BIGINT) AS n_out
        |        FROM tr GROUP BY 1),
        |tt AS (SELECT sum(n_out) AS t FROM emp)
        |SELECT st.states[j.j] AS state, emp.n_out,
        |       round(vf.v[j.j], 6) AS p_stationary,
        |       round(CAST(emp.n_out AS DOUBLE) / CAST(tt.t AS DOUBLE), 6)
        |         AS p_empirical
        |FROM rn, range(1, 26) j(j)
        |CROSS JOIN st CROSS JOIN vf CROSS JOIN tt
        |JOIN emp ON emp.state = st.states[j.j]
        |WHERE j.j <= rn.n
        |ORDER BY state""".stripMargin,
    "a_kmv_jaccard" ->
      s"""WITH tk AS (
         |  SELECT DISTINCT source, tok FROM (
         |    SELECT source, unnest(list_distinct(string_split(text, ' ')))
         |             AS tok
         |    FROM documents)),
         |th AS (SELECT source, tok, ${hexSql("tok", 12)} AS h FROM tk),
         |sk AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_tok,
         |         list(h ORDER BY h) FILTER (WHERE rk <= 16) AS harr
         |  FROM (SELECT source, h,
         |          row_number() OVER (PARTITION BY source ORDER BY h) AS rk
         |        FROM th)
         |  GROUP BY 1),
         |pr AS (
         |  SELECT x.source AS s1, y.source AS s2,
         |         CAST(count(*) AS BIGINT) AS inter
         |  FROM th x JOIN th y ON x.tok = y.tok AND x.source < y.source
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT pr.s1, pr.s2, a.n_tok AS n_a, b.n_tok AS n_b, pr.inter,
         |         a.harr AS ha, b.harr AS hb,
         |         list_sort(list_distinct(list_concat(a.harr, b.harr)))[1:16]
         |           AS ku
         |  FROM pr JOIN sk a ON pr.s1 = a.source
         |          JOIN sk b ON pr.s2 = b.source),
         |est AS (
         |  SELECT s1, s2, n_a, n_b, inter,
         |         round(CAST(inter AS DOUBLE)
         |           / CAST(n_a + n_b - inter AS DOUBLE), 6) AS j_exact,
         |         round(CAST(len(list_filter(ku, x -> list_contains(ha, x)
         |             AND list_contains(hb, x))) AS DOUBLE)
         |           / CAST(least(16, len(ku)) AS DOUBLE), 6) AS j_est
         |  FROM j)
         |SELECT s1, s2, n_a, n_b, inter, j_exact, j_est,
         |       round(abs(j_est - j_exact), 6) AS abs_err
         |FROM est ORDER BY s1, s2""".stripMargin,
    "e_pca_power" ->
      """WITH RECURSIVE q AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0) AS BIGINT))
        |           AS qv
        |  FROM embeddings),
        |nv AS (SELECT CAST(count(*) AS BIGINT) AS n_vec FROM q),
        |g AS (
        |  SELECT ti.i AS i, tj.j AS j,
        |         CAST(sum(qv[ti.i] * qv[tj.j]) AS BIGINT) AS s
        |  FROM q, range(1, 65) ti(i), range(1, 65) tj(j)
        |  GROUP BY 1, 2),
        |cmt AS (
        |  SELECT list(CAST(s AS DOUBLE)
        |           / (CAST(nv.n_vec AS DOUBLE) * 1099511627776.0)
        |           ORDER BY i, j) AS cm
        |  FROM g CROSS JOIN nv),
        |it(stp, v) AS (
        |  SELECT 0, list_transform(range(1, 65), x -> CAST(0.125 AS DOUBLE))
        |  UNION ALL
        |  SELECT stp + 1, list_transform(w, x -> x / nrm) FROM (
        |    SELECT stp, w,
        |           sqrt(list_sum(list_transform(w, x -> x * x))) AS nrm
        |    FROM (SELECT stp,
        |            list_transform(range(1, 65),
        |              j -> list_sum(list_transform(range(1, 65),
        |                i -> v[i] * cm[(i - 1) * 64 + j]))) AS w
        |          FROM it, cmt WHERE stp < 12))),
        |vf AS (SELECT v FROM it WHERE stp = 12),
        |fin AS (
        |  SELECT v, w,
        |         list_sum(list_transform(range(1, 65), j -> v[j] * w[j]))
        |           AS lam,
        |         list_sum(list_transform(range(1, 65),
        |           j -> cm[(j - 1) * 64 + j])) AS tr
        |  FROM (SELECT v, cm,
        |          list_transform(range(1, 65),
        |            j -> list_sum(list_transform(range(1, 65),
        |              i -> v[i] * cm[(i - 1) * 64 + j]))) AS w
        |        FROM vf, cmt))
        |SELECT CAST(t.j AS INTEGER) AS dim, round(fin.v[t.j], 6) AS loading,
        |       round(fin.lam, 6) AS eigenvalue,
        |       round(fin.lam / fin.tr, 6) AS explained_ratio, nv.n_vec
        |FROM fin, range(1, 65) t(j), nv
        |ORDER BY dim""".stripMargin,
    "o_partition_skew" ->
      """WITH cells AS (
        |  SELECT lang, source, count(*) AS c FROM documents GROUP BY 1, 2),
        |tl AS (SELECT lang, sum(c) AS t FROM cells GROUP BY 1),
        |by_lang AS (
        |  SELECT c.lang, CAST(count(*) AS BIGINT) AS n_cells,
        |         CAST(sum(c.c) AS BIGINT) AS n_docs,
        |         CAST(max(c.c) AS BIGINT) AS max_cell,
        |         list_sum(list(-(CAST(c.c AS DOUBLE) / CAST(tl.t AS DOUBLE))
        |           * ln(CAST(c.c AS DOUBLE) / CAST(tl.t AS DOUBLE))
        |           ORDER BY c.source)) AS entropy
        |  FROM cells c JOIN tl ON c.lang = tl.lang GROUP BY 1)
        |SELECT lang, n_cells, n_docs, max_cell,
        |       round(CAST(max_cell AS DOUBLE) * CAST(n_cells AS DOUBLE)
        |         / CAST(n_docs AS DOUBLE), 6) AS skew_factor,
        |       round(entropy, 6) AS entropy,
        |       round(entropy / ln(CAST(n_cells AS DOUBLE)), 6) AS balance
        |FROM by_lang ORDER BY lang""".stripMargin)
}
