package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 27: a 1-D Kalman filter over daily revenue (the
  * sensor-fusion smoother, Kalman 1960), HITS hubs & authorities on
  * the bigram term graph (Kleinberg 1999), and expected steps to
  * absorption for the event-type Markov chain (value iteration on
  * the fundamental-matrix system). All Spark-first with full-replay
  * DuckDB oracles; float policy: identical IEEE op DAGs on both
  * engines (the w_holt_winters / g_pagerank conventions).
  */
object TrainingData32 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  // ---------------------------------------------------------------
  // w_kalman_1d — 1-D Kalman filter (random-walk state, Kalman
  // 1960) over daily order revenue, restarting each year (the
  // w_holt_winters convention): Q = 2.0 process noise, R = 10.0
  // measurement noise (revenue in millions to keep the noise scale
  // meaningful),
  //   P⁻ = P_{t−1} + Q
  //   K  = P⁻ / (P⁻ + R)
  //   x̂  = x̂_{t−1} + K (z_t − x̂_{t−1})
  //   P  = (1 − K) P⁻
  // initialized x̂₁ = z₁, P₁ = R, K₁ = 1. The coupled (x̂, P)
  // recurrence runs as ONE Spark higher-order fold carrying the
  // full state struct, and the oracle replays it as a DuckDB
  // RECURSIVE CTE stepping the identical arithmetic DAG — raw
  // doubles hash-match un-rounded (the holt-winters precedent; the
  // textual duplication of K into x̂/P is pure arithmetic, every
  // copy evaluates identically). Scale shape: the fold runs over
  // DAYS per year partition (≤366), never the order stream — the
  // corpus reduces through the exact-decimal daily aggregate first.
  // ---------------------------------------------------------------
  val wKalman1d: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))" +
        " AS DOUBLE) / 1000000.0 AS DOUBLE)").as("z"))
      .withColumn("yr", year(col("day")))
      .withColumn("t", row_number().over(
        Window.partitionBy(col("yr")).orderBy(col("day"))).cast("int"))
      .localCheckpoint(eager = false) // consumed by the fold input and the join back
    val perYear = daily.groupBy(col("yr"))
      .agg(sort_array(collect_list(struct(col("t"), col("z")))).as("days"))
    // textual pieces — no let-binding in SQL lambdas, so P⁻ and K
    // are duplicated; pure arithmetic, every copy is the same double
    val PP = "(st.p + 2.0)"
    val KK = s"($PP / ($PP + 10.0))"
    val X = s"(st.x + $KK * (x.z - st.x))"
    val P = s"((1.0 - $KK) * $PP)"
    val fold =
      s"""aggregate(
         |  days,
         |  named_struct(
         |    'x', CAST(0.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE), 't', 0,
         |    'out', CAST(array() AS
         |      ARRAY<STRUCT<t: INT, x: DOUBLE, p: DOUBLE, k: DOUBLE>>)),
         |  (st, x) -> CASE WHEN st.t = 0 THEN named_struct(
         |      'x', x.z, 'p', CAST(10.0 AS DOUBLE), 't', 1,
         |      'out', concat(st.out, array(named_struct(
         |        't', x.t, 'x', x.z, 'p', CAST(10.0 AS DOUBLE),
         |        'k', CAST(1.0 AS DOUBLE)))))
         |    ELSE named_struct(
         |      'x', $X, 'p', $P, 't', st.t + 1,
         |      'out', concat(st.out, array(named_struct(
         |        't', x.t, 'x', $X, 'p', $P, 'k', $KK)))) END)""".stripMargin
    perYear.select(col("yr").as("oyr"), explode(expr(s"($fold).out")).as("o"))
      .join(daily, col("oyr") === col("yr") && col("o.t") === col("t"))
      .select(col("day"), col("z").as("revenue_m"),
        col("o.x").as("estimate"), col("o.p").as("variance"),
        col("o.k").as("gain"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // g_hits — 4 HITS iterations (Kleinberg 1999) on the weighted
  // bigram co-occurrence graph of the top-40 terms:
  //   a ← Eᵀh, normalize;  h ← E a, normalize
  // with L∞ (max) normalization — max is ORDER-FREE over doubles,
  // so the one global reduction per half-step needs no pinned fold
  // (unlike an L1/L2 sum); the per-node Σ w·score folds in sorted
  // neighbor order (the g_pagerank float policy), so four chained
  // float iterations stay bit-identical across engines. Scale
  // shape: each half-step is one edge⋈score join + one grouped
  // fold; the node set is top-k-bounded so every iteration is a
  // tiny broadcast join against the edge list.
  // ---------------------------------------------------------------
  private val hitsIters = 4
  private val hitsNodes = 40

  val gHits: Q = (s, dir) => {
    val base = Tables.table(s, dir, "documents")
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val top = uni.orderBy(desc("c"), col("w")).limit(hitsNodes)
      .select(col("w").as("term")).localCheckpoint(eager = false)
    val edges = base.filter(size(col("toks")) >= 2)
      .select(explode(expr("transform(sequence(1, size(toks) - 1), " +
        "i -> struct(element_at(toks, i) AS w1," +
        " element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("b.w1").as("src"), col("b.w2").as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(broadcast(top.select(col("term").as("src"))), Seq("src"))
      .join(broadcast(top.select(col("term").as("dst"))), Seq("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
      .localCheckpoint(eager = false) // reused by all 8 half-steps
    // the graph is top-40²-bounded at ANY corpus scale, so the 4 HITS
    // iterations run DRIVER-SIDE over the collected edge list instead
    // of 8 checkpointed half-step jobs (each was a join + grouped
    // fold + crossJoin(max) + checkpoint on a ≤40-row frame — pure
    // job floor; the ev_absorbing_markov / union-find hybrid
    // precedent). Arithmetic replays the distributed form exactly:
    // w collected as Spark's longs, contrib = w·score folded in
    // ascending-neighbor order under UTF8-BINARY string comparison
    // (what sort_array used), L∞ max is order-free, inner-join
    // domains via map membership.
    val utf8Ord: Ordering[String] = (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes("UTF-8"), y.getBytes("UTF-8"))
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val byDst = es.groupBy(_._2).map { case (t, xs) =>
      t -> xs.toSeq.map(e => (e._1, e._3)).sortBy(_._1)(utf8Ord) }
    val bySrc = es.groupBy(_._1).map { case (t, xs) =>
      t -> xs.toSeq.map(e => (e._2, e._3)).sortBy(_._1)(utf8Ord) }
    val topTerms = top.collect().map(_.getString(0))
    var hMap: Map[String, Double] = topTerms.map(_ -> 1.0).toMap
    var aMap: Map[String, Double] = Map.empty
    def sweep(adj: Map[String, Seq[(String, Long)]],
        score: Map[String, Double]): Map[String, Double] = {
      val raw = adj.flatMap { case (t, nbrs) =>
        val terms = nbrs.filter(n => score.contains(n._1))
        if (terms.isEmpty) None
        else Some(t -> terms.foldLeft(0.0) { case (acc, (n, w)) =>
          acc + w.toDouble * score(n) })
      }
      // degenerate corpus: no qualifying edges → no raw scores. The
      // distributed form degraded to empty frames / 0.0 scores, so
      // the replay must too — raw.values.max would throw here.
      if (raw.isEmpty) raw
      else {
        val mx = raw.values.max
        raw.map { case (t, v) => t -> v / mx }
      }
    }
    for (_ <- 1 to hitsIters) {
      aMap = sweep(byDst, hMap)
      hMap = sweep(bySrc, aMap)
    }
    def scoreLit(m: Map[String, Double]) =
      if (m.isEmpty) lit(null).cast("double")
      else element_at(
        map(m.toSeq.flatMap { case (t, v) => Seq(lit(t), lit(v)) }: _*),
        col("term"))
    top.select(col("term"),
        round(coalesce(scoreLit(aMap), lit(0.0)), 6).as("authority"),
        round(coalesce(scoreLit(hMap), lit(0.0)), 6).as("hub"))
      .orderBy(col("term"))
  }

  // ---------------------------------------------------------------
  // ev_absorbing_markov — expected steps to absorption ('purchase')
  // for the event-type Markov chain, by 20 value-iteration sweeps
  // of t ← 1 + P·t over transient states (the fundamental-matrix
  // system N = (I−Q)⁻¹ solved iteratively — the form that
  // distributes; 20 sweeps converge from below and the count is
  // part of the contract). Transitions are the observed per-user
  // consecutive event pairs ((ts, event_id)-ordered); states with
  // no outgoing pair are dropped (documented). Probabilities are
  // exact count ratios (one double division each); each sweep folds
  // Σ p·t_j in sorted next-state order (the g_pagerank policy) over
  // a ≤|event_types|² matrix — bit-stable and trivially bounded at
  // any corpus size, since the event stream reduces through ONE
  // pair-count aggregate first.
  // ---------------------------------------------------------------
  val evAbsorbingMarkov: Q = (s, dir) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("i"))
      .withColumn("j", lead(col("i"), 1).over(w))
      .filter(col("j").isNotNull)
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("nij"))
    val trans = pairs
      .join(pairs.groupBy(col("i")).agg(sum(col("nij")).cast("long").as("ni")),
        Seq("i"))
      .select(col("i"), col("j"), col("nij"), col("ni"),
        (d(col("nij")) / d(col("ni"))).as("p"))
      .localCheckpoint(eager = false) // reused by all 20 sweeps + the output stats
    val states = trans.select(col("i").as("st")).distinct()
      .localCheckpoint(eager = false)
    // the chain is |event_types|²-bounded at ANY corpus scale (the
    // event stream already reduced through the pair-count aggregate),
    // so the 20 value-iteration sweeps run DRIVER-SIDE over the
    // collected matrix instead of as 20 checkpointed Spark jobs (a
    // pure job-floor cost: ~20 × join+fold+checkpoint on a ~10-row
    // frame — the union-find hybrid precedent). The arithmetic
    // replays the distributed form exactly: p collected as the very
    // doubles Spark computed, contrib = p·t(j) folded in ascending-j
    // order (what sort_array(struct(j, contrib)) produced), inner-
    // join semantics via the t-map membership check.
    val tr = trans.select(col("i"), col("j"), col("p")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val stateKeys = tr.map(_._1).distinct
    // ascending-j under UTF8-BINARY order — the tie/order rule
    // sort_array(struct(j, contrib)) used in the distributed form and
    // the oracle's ORDER BY tr.j replays (DuckDB collates binary).
    // Java String compareTo is UTF-16 code-unit order, which diverges
    // for non-ASCII event types and would reorder the double fold.
    val utf8Ord: Ordering[String] = (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes("UTF-8"), y.getBytes("UTF-8"))
    val outByI = tr.groupBy(_._1).map { case (i, es) =>
      i -> es.map(e => (e._2, e._3)).sortBy(_._1)(utf8Ord)
    }
    var tMap: Map[String, Double] = stateKeys.map(_ -> 0.0).toMap
    for (_ <- 1 to 20) {
      tMap = stateKeys.map { st =>
        if (st == "purchase") st -> 0.0
        else st -> (1.0 + outByI(st).foldLeft(0.0) { case (acc, (j, p)) =>
          if (tMap.contains(j)) acc + p * tMap(j) else acc
        })
      }.toMap
    }
    val tLit =
      if (stateKeys.isEmpty) lit(null).cast("double")
      else element_at(
        map(stateKeys.flatMap(st => Seq(lit(st), lit(tMap(st)))): _*),
        col("st"))
    val p1 = trans.filter(col("j") === "purchase")
      .select(col("i").as("st"), col("p").as("p_absorb_1step"))
    states
      .join(p1, Seq("st"), "left")
      .join(trans.groupBy(col("i").as("st"))
        .agg(max(col("ni")).as("n_out")), Seq("st"))
      .select(col("st").as("event_type"), col("n_out"),
        round(coalesce(col("p_absorb_1step"), lit(0.0)), 6).as("p_absorb_1step"),
        round(tLit, 6).as("t_absorb_20"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "w_kalman_1d" -> wKalman1d,
    "g_hits" -> gHits,
    "ev_absorbing_markov" -> evAbsorbingMarkov)

  /** One unrolled HITS iteration (a then h half-steps, sorted-order
    * folds, L∞ normalization). */
  private def hitsRounds(n: Int): String =
    (1 to n).map { k =>
      s"""ar$k AS MATERIALIZED (
         |  SELECT e.dst AS term,
         |         list_sum(list(CAST(e.w AS DOUBLE) * h.score ORDER BY e.src))
         |           AS raw
         |  FROM ed e JOIN h${k - 1} h ON h.term = e.src GROUP BY 1),
         |a$k AS MATERIALIZED (
         |  SELECT term, raw / (SELECT max(raw) FROM ar$k) AS score FROM ar$k),
         |hr$k AS MATERIALIZED (
         |  SELECT e.src AS term,
         |         list_sum(list(CAST(e.w AS DOUBLE) * a.score ORDER BY e.dst))
         |           AS raw
         |  FROM ed e JOIN a$k a ON a.term = e.dst GROUP BY 1),
         |h$k AS MATERIALIZED (
         |  SELECT term, raw / (SELECT max(raw) FROM hr$k) AS score FROM hr$k)"""
        .stripMargin
    }.mkString(",\n")

  /** One unrolled value-iteration sweep of t ← 1 + P·t. */
  private def markovSweeps(n: Int): String =
    (1 to n).map { k =>
      s"""f$k AS MATERIALIZED (
         |  SELECT tr.i AS st,
         |         list_sum(list(tr.p * t.tv ORDER BY tr.j)) AS ex
         |  FROM tr JOIN t${k - 1} t ON t.st = tr.j GROUP BY 1),
         |t$k AS MATERIALIZED (
         |  SELECT s.st, CASE WHEN s.st = 'purchase' THEN 0.0
         |    ELSE 1.0 + coalesce(f.ex, 0.0) END AS tv
         |  FROM states s LEFT JOIN f$k f ON f.st = s.st)"""
        .stripMargin
    }.mkString(",\n")

  val oracles: Map[String, String] = Map(
    "w_kalman_1d" ->
      """WITH RECURSIVE daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |           / 1000000.0 AS DOUBLE) AS z
        |  FROM orders GROUP BY 1),
        |d2 AS (
        |  SELECT day, z, year(day) AS yr,
        |         CAST(row_number() OVER (PARTITION BY year(day) ORDER BY day)
        |           AS INTEGER) AS t
        |  FROM daily),
        |kf(yr, t, x, p, k) AS (
        |  SELECT yr, t, z AS x, CAST(10.0 AS DOUBLE) AS p,
        |         CAST(1.0 AS DOUBLE) AS k
        |  FROM d2 WHERE t = 1
        |  UNION ALL
        |  SELECT yr, t, xprev + kk * (z - xprev) AS x,
        |         (1.0 - kk) * pp AS p, kk AS k
        |  FROM (SELECT yr, t, z, xprev, pp, pp / (pp + 10.0) AS kk
        |        FROM (SELECT d.yr, d.t, d.z, kf.x AS xprev,
        |                     kf.p + 2.0 AS pp
        |              FROM kf JOIN d2 d ON d.yr = kf.yr AND d.t = kf.t + 1)))
        |SELECT d2.day, d2.z AS revenue_m, kf.x AS estimate,
        |       kf.p AS variance, kf.k AS gain
        |FROM kf JOIN d2 ON kf.yr = d2.yr AND kf.t = d2.t
        |ORDER BY d2.day""".stripMargin,
    "g_hits" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         |uni AS (
         |  SELECT unnest(tk) AS w FROM toks),
         |top AS MATERIALIZED (
         |  SELECT w AS term FROM (
         |    SELECT w, count(*) AS c FROM uni GROUP BY 1
         |    ORDER BY c DESC, w LIMIT $hitsNodes)),
         |bi AS (
         |  SELECT src, dst FROM (
         |    SELECT tk[i] AS src, tk[i + 1] AS dst
         |    FROM toks CROSS JOIN unnest(range(1, len(tk))) AS r(i)
         |    WHERE len(tk) >= 2)
         |  WHERE src <> dst),
         |ed AS MATERIALIZED (
         |  SELECT b.src, b.dst, CAST(count(*) AS BIGINT) AS w
         |  FROM bi b
         |  JOIN top t1 ON t1.term = b.src JOIN top t2 ON t2.term = b.dst
         |  GROUP BY 1, 2),
         |h0 AS (SELECT term, CAST(1.0 AS DOUBLE) AS score FROM top),
         |${hitsRounds(hitsIters)}
         |SELECT t.term,
         |       round(coalesce(a.score, 0.0), 6) AS authority,
         |       round(coalesce(h.score, 0.0), 6) AS hub
         |FROM top t
         |LEFT JOIN a$hitsIters a ON a.term = t.term
         |LEFT JOIN h$hitsIters h ON h.term = t.term
         |ORDER BY t.term""".stripMargin,
    "ev_absorbing_markov" ->
      s"""WITH pr AS (
         |  SELECT i, j, CAST(count(*) AS BIGINT) AS nij FROM (
         |    SELECT event_type AS i,
         |           lead(event_type, 1) OVER (PARTITION BY user_id
         |             ORDER BY ts, event_id) AS j
         |    FROM events)
         |  WHERE j IS NOT NULL GROUP BY 1, 2),
         |tr AS MATERIALIZED (
         |  SELECT pr.i, pr.j, pr.nij, ni.ni,
         |         pr.nij::DOUBLE / ni.ni::DOUBLE AS p
         |  FROM pr JOIN (SELECT i, CAST(sum(nij) AS BIGINT) AS ni
         |                FROM pr GROUP BY 1) ni ON ni.i = pr.i),
         |states AS MATERIALIZED (SELECT DISTINCT i AS st FROM tr),
         |t0 AS (SELECT st, CAST(0.0 AS DOUBLE) AS tv FROM states),
         |${markovSweeps(20)}
         |SELECT s.st AS event_type,
         |       (SELECT max(ni) FROM tr WHERE tr.i = s.st) AS n_out,
         |       round(coalesce((SELECT p FROM tr
         |         WHERE tr.i = s.st AND tr.j = 'purchase'), 0.0), 6)
         |         AS p_absorb_1step,
         |       round(t.tv, 6) AS t_absorb_20
         |FROM states s JOIN t20 t ON t.st = s.st
         |ORDER BY event_type""".stripMargin)
}
