package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-4 tranche 2: rank statistics, frequency sketches, collocation
  * mining, and data-layout clustering — the remaining pieces of the
  * large-corpus analytics surface. Same contract as every other
  * operator file: each query has a full-replay DuckDB oracle, exact
  * integer/decimal arithmetic everywhere a reduction is
  * order-sensitive, and transcendental outputs round to 6 dp (repo
  * float policy, COVERAGE.md).
  *
  * Reference behavior basis: the reference's dashboard computes only
  * plain aggregates (streamlit_app/dashboard.py:60-160); these are
  * the standard corpus-statistics supersets a training-data pipeline
  * layers on the same tables.
  *
  * Scale note on unpartitioned windows: every `Window.orderBy(day)`
  * in this file runs over a DAILY (or monthly) pre-aggregate — one
  * row per calendar unit, bounded at any fact scale — so the
  * single-partition WindowExec is over thousands of rows, never the
  * fact table. Per-row global orderings (ranks/cumsums over docs or
  * orders) go through `Ranking` two-phase instead.
  */
object TrainingData3 {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)
  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")
  private def d(c: Column): Column = c.cast("double")
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // ---------------------------------------------------------------
  // a_spearman — Spearman rank correlation (quantity vs price per
  // return flag) with average-rank tie handling, computed from EXACT
  // integer moments: the average rank of a tie group spanning
  // [a, a+c-1] is a+(c-1)/2, so DOUBLED ranks 2a+c-1 are integers and
  // Pearson is scale-invariant — every sum up to the final
  // sqrt/divide is exact (decimal(38,0) for the cross products,
  // HUGEINT in the oracle), making the correlation bit-stable under
  // any partitioning. Scale: one rank-window sort per variable per
  // flag partition, then a 3-row aggregate.
  // ---------------------------------------------------------------
  val aSpearman: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(col("l_returnflag").as("flag"),
      col("l_quantity").as("x"), col("l_extendedprice").as("y"))
    def dblRank(v: String): Column =
      // rank() is IntegerType: widen to long BEFORE the arithmetic
      // (2·rank overflows int past ~1e9 rows per partition)
      (rank().over(Window.partitionBy(col("flag")).orderBy(col(v)))
        .cast("long") * 2 +
        count(lit(1)).over(Window.partitionBy(col("flag"), col(v))) - 1)
    val ranked = li.select(col("flag"), dblRank("x").as("rx"), dblRank("y").as("ry"))
    def dec38(c: Column): Column = c.cast("decimal(38,0)")
    // decimal BEFORE multiply+sum: rx·ry ≈ 4n² fits a long, but the
    // SUM is ~4n³ — overflows long past ~1.3M rows per flag (the sf1
    // probe caught exactly this; DuckDB's sum(BIGINT) auto-promotes
    // to HUGEINT, Spark's sum(long) stays long)
    val g = ranked.groupBy(col("flag")).agg(
      dec38(count(lit(1))).as("n"),
      sum(dec38(col("rx"))).cast("decimal(38,0)").as("sx"),
      sum(dec38(col("ry"))).cast("decimal(38,0)").as("sy"),
      sum(dec38(col("rx")) * dec38(col("ry"))).cast("decimal(38,0)").as("sxy"),
      sum(dec38(col("rx")) * dec38(col("rx"))).cast("decimal(38,0)").as("sxx"),
      sum(dec38(col("ry")) * dec38(col("ry"))).cast("decimal(38,0)").as("syy"))
    g.select(col("flag"), col("n").cast("long").as("n"),
        round(d(col("n") * col("sxy") - col("sx") * col("sy")) /
          (sqrt(d(col("n") * col("sxx") - col("sx") * col("sx"))) *
           sqrt(d(col("n") * col("syy") - col("sy") * col("sy")))), 6)
          .as("spearman_rho"))
      .orderBy(col("flag"))
  }

  // ---------------------------------------------------------------
  // a_countmin — count-min sketch (depth 4 × width 64, md5-derived
  // row hashes) over the corpus token stream, checked on the top-10
  // exact terms. The sketch build is one groupBy over (row, bucket)
  // — 256 cells regardless of corpus size, perfect map-side combine;
  // probes broadcast. est ≥ exact is a hard CMS property (hashes
  // only ever ADD collisions), so the oracle pins the contract
  // column TRUE as well as replaying the estimates exactly.
  // ---------------------------------------------------------------
  private val cmDepth = 4
  private val cmWidth = 64L

  private def cmBucket(j: Int, term: Column): Column =
    pmod(conv(substring(md5(concat(lit(s"$j:"), term)), 1, 15), 16, 10)
      .cast("long"), lit(cmWidth))

  val aCountMin: Q = (s, dir) => {
    // aggregate the token stream to the (distinct-term, count) vocab
    // FIRST, then hash each distinct term once and add its count to
    // the sketch cells — the resulting sketch is identical (cell
    // value = Σ counts of terms hashing there) but the 4× md5 work
    // drops from every token occurrence to every vocab entry
    // (~50× fewer hashes on natural-language token distributions)
    val vocab = docs(s, dir).select(explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("exact_c"))
      // localCheckpoint, not cache(): three consumers (sketch, top-k,
      // probe) reuse the materialized vocab, and the blocks are freed
      // by ContextCleaner when the query is dropped — cache() entries
      // live in CacheManager for the whole session
      .localCheckpoint(eager = false)
    val sketch = vocab
      .select(col("exact_c"),
        posexplode(array((0 until cmDepth).map(j => cmBucket(j, col("term"))): _*)))
      .groupBy(col("pos").as("j"), col("col").as("bucket"))
      .agg(sum(col("exact_c")).as("c"))
    val top = vocab.orderBy(desc("exact_c"), col("term")).limit(10)
    top
      .select(col("term"), col("exact_c"),
        posexplode(array((0 until cmDepth).map(j => cmBucket(j, col("term"))): _*)))
      .withColumnRenamed("pos", "j").withColumnRenamed("col", "bucket")
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("term"), col("exact_c"))
      .agg(min(col("c")).as("cm_est"))
      .select(col("term"), col("exact_c"), col("cm_est"),
        (col("cm_est") >= col("exact_c")).as("est_ge_exact"))
      .orderBy(desc("exact_c"), col("term"))
  }

  // ---------------------------------------------------------------
  // t_pmi_bigrams — pointwise mutual information of the top-20
  // bigrams: integer counts for n(x,y), n(x), n(y), corpus totals,
  // then ONE fixed-order double expression per surviving row
  // (ln goes through the 6-dp rounding policy). Ranking is on the
  // integer count with the bigram itself as tiebreak, so the top-k
  // cut is reproducible. Scale: two token-explode aggregates and two
  // vocabulary joins (AQE broadcasts the 20-row side), no pair
  // explosion.
  // ---------------------------------------------------------------
  val tPmiBigrams: Q = (s, dir) => {
    val base = docs(s, dir).select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val bi = base.filter(size(col("toks")) >= 2)
      .select(explode(expr("transform(sequence(1, size(toks) - 1), " +
        "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .agg(count(lit(1)).as("n_xy"))
    val totals = broadcast(
      uni.agg(sum(col("c")).cast("long").as("n_tot")).crossJoin(
        bi.agg(sum(col("n_xy")).cast("long").as("b_tot"))))
    val top = bi.orderBy(desc("n_xy"), col("w1"), col("w2")).limit(20)
    top
      .join(uni.select(col("w").as("w1"), col("c").as("n_x")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("n_y")), Seq("w2"))
      .crossJoin(totals)
      .select(col("w1"), col("w2"), col("n_xy"), col("n_x"), col("n_y"),
        round(log((d(col("n_xy")) / d(col("b_tot"))) /
          ((d(col("n_x")) / d(col("n_tot"))) * (d(col("n_y")) / d(col("n_tot"))))), 6)
          .as("pmi"))
      .orderBy(desc("n_xy"), col("w1"), col("w2"))
  }

  // ---------------------------------------------------------------
  // o_zorder_layout — Morton (z-order) clustering key over two join
  // dimensions, the layout primitive behind multi-dimensional file
  // skipping: interleave the low 8 bits of (partkey, suppkey), cut
  // the z-curve into 256 contiguous buckets, and report each
  // bucket's bounding box. The per-bucket (max-min+1)² cell span is
  // the data-skipping story made measurable: a z-ordered file
  // covers a tiny x×y rectangle, so a predicate on EITHER dimension
  // prunes most buckets. Pure integer bit arithmetic — identical in
  // both engines by construction.
  // ---------------------------------------------------------------
  private def mortonSql(x: String, y: String): String =
    (0 until 8).map(i =>
      s"(($x >> $i) & 1) * ${1L << (2 * i)} + (($y >> $i) & 1) * ${1L << (2 * i + 1)}")
      .mkString(" + ")

  val oZorderLayout: Q = (s, dir) => {
    val li = t(s, dir, "lineitem").select(
      pmod(col("l_partkey"), lit(256)).cast("long").as("x"),
      pmod(col("l_suppkey"), lit(256)).cast("long").as("y"))
    val z = (0 until 8).map(i =>
      shiftright(col("x"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(col("y"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
      .reduce(_ + _)
    li.withColumn("bucket", shiftright(z, 8))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x")).as("min_x"), max(col("x")).as("max_x"),
        min(col("y")).as("min_y"), max(col("y")).as("max_y"))
      .withColumn("cell_span",
        (col("max_x") - col("min_x") + 1) * (col("max_y") - col("min_y") + 1))
      .orderBy(col("bucket"))
  }

  // ---------------------------------------------------------------
  // g_components — connected components over the embedding-cosine
  // similarity graph (the clustering step behind every near-dup
  // "keep one per group" policy). Hybrid, same policy as
  // Dedup.dupGroups: similarity graphs are orders of magnitude
  // smaller than the corpus (only vectors WITH a near neighbor
  // appear), so up to ~5M edges a driver union-find wins — one
  // collect in, no per-iteration jobs; beyond that the distributed
  // min-label propagation below takes over. Both paths emit
  // identical components (DifferentialSpec + a direct equality spec
  // pin this). The distributed path: each round every node takes
  // the min label among itself and its neighbors + one pointer
  // jump (path halving), so convergence is O(log diameter) rounds,
  // each one join + one min-aggregate — all distributed; the driver
  // only checks the converged-yet counter. Oracle: DuckDB
  // recursive-CTE reachability (exact, iteration-free).
  // ---------------------------------------------------------------
  val gComponents: Q = (s, dir) =>
    gComponentsImpl(graft.functions.Similarity
      .cosineNearDupPairs(s, dir, 0.3).select(col("v1"), col("v2")))

  private[graft] def gComponentsImpl(pairs: DataFrame,
      localEdgeThreshold: Long = 5000000L): DataFrame = {
    val undirected = pairs.localCheckpoint(eager = false)
    if (undirected.count() <= localEdgeThreshold)
      return gComponentsLocal(undirected)
    val edges = undirected
      .union(undirected.select(col("v2").as("v1"), col("v1").as("v2")))
      .toDF("a", "b").cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("rep", col("id")).localCheckpoint(eager = false)
    var changed = 1L
    while (changed > 0) {
      val viaNbr = edges.join(labels.withColumnRenamed("id", "nid"),
          col("b") === col("nid"))
        .select(col("a").as("id"), col("rep"))
      // eager localCheckpoint, not cache: every iterative-DataFrame
      // loop grows its logical plan each round, and Catalyst
      // re-plans (and can re-execute, racing the lazy cache through
      // the self-join below) the whole nested lineage per action —
      // cost compounds per round. Checkpointing truncates the plan
      // to the materialized result, making every round O(1) work.
      // (nbrMin itself stays lazy: both sides of the halving
      // self-join recompute it from checkpointed inputs — two
      // shallow stages, cheaper than a third eager materialization
      // per round)
      val nbrMin = labels.select(col("id"), col("rep")).union(viaNbr)
        .groupBy(col("id")).agg(min(col("rep")).as("rep"))
      // pointer jumping (path halving): follow the representative one
      // hop — rep ← rep(rep) — so label distance halves each round
      // and convergence is O(log diameter), not O(diameter). One jump
      // per round measures fastest: more jumps shave rounds but
      // re-execute the (lazy) nbrMin per self-join side and lose
      // more than they save. Without any jump, a chain-shaped
      // near-dup cluster costs one distributed round per hop.
      // eager checkpoint, then a cheap count on the materialized
      // result — measured FASTER than folding both into one lazy-
      // checkpoint action (6.1-6.8 s vs 7.5-8.8 s at sf0.1): the
      // combined job re-plans the deep lineage where the eager
      // materialization keeps each job shallow
      val next = nbrMin.alias("x")
        .join(nbrMin.select(col("id").as("rid"), col("rep").as("rrep")).alias("y"),
          col("x.rep") === col("rid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.rep"), coalesce(col("rrep"), col("x.rep"))).as("rep"))
        .localCheckpoint(eager = false)
      changed = next.join(labels.withColumnRenamed("rep", "old"), "id")
        .filter(col("rep") < col("old")).count()
      labels = next
    }
    val out = labels.groupBy(col("rep").as("component"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member"))
      .orderBy(col("component"))
    edges.unpersist()
    out
  }

  /** Driver-side union-find (path compression + union by min) for
    * similarity graphs under the hybrid threshold — min-id
    * representative, so components match the propagation path
    * exactly. Mirrors Dedup.dupGroupsLocal with this query's
    * (component, n_members, max_member) output. */
  private def gComponentsLocal(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val es = pairs.as[(Long, Long)].collect()
    val parent = new java.util.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.getOrDefault(r, r)
      var c = x // path compression
      while (parent.getOrDefault(c, c) != c) {
        val nxt = parent.getOrDefault(c, c); parent.put(c, r); c = nxt
      }
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { // min id becomes the canonical representative
        if (ra < rb) parent.put(rb, ra) else parent.put(ra, rb)
      }
    }
    val members = es.iterator.flatMap(e => Iterator(e._1, e._2)).toSet.toSeq
      .map((id: Long) => (find(id), id))
    members.toDF("rep", "id")
      .groupBy(col("rep").as("component"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member"))
      .orderBy(col("component"))
  }

  // ---------------------------------------------------------------
  // g_label_prop — synchronous label propagation (Raghavan et al.
  // 2007), 4 fixed iterations, over the same embedding-cosine
  // similarity graph as g_components: each node takes the MODE of
  // its neighbors' labels (tie → smallest label). Communities are
  // finer than components — a hub chaining two dense near-dup
  // clusters keeps them one component but two communities, which is
  // the granularity dedup "keep one per group" actually wants on
  // chain-shaped graphs. Everything is integer (counts + min
  // tiebreaks): no float policy needed, and the fixed iteration
  // count makes the unrolled DuckDB replay exact. Scale shape per
  // iteration: one edge⋈label join + a two-phase max(struct) argmax
  // (never a window over the edge list); the label frame
  // localCheckpoints per iteration — the iterative-loop lineage
  // discipline (see gComponentsImpl).
  // ---------------------------------------------------------------
  private val lpIters = 4

  val gLabelProp: Q = (s, dir) => {
    val pairs = graft.functions.Similarity
      .cosineNearDupPairs(s, dir, 0.3).select(col("v1"), col("v2"))
    val edges = pairs
      .union(pairs.select(col("v2").as("v1"), col("v1").as("v2")))
      .toDF("a", "b").localCheckpoint(eager = false)
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("lab", col("id")).localCheckpoint(eager = false)
    for (_ <- 1 to lpIters) {
      labels = edges
        .join(labels.select(col("id").as("b"), col("lab")), "b")
        .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("c"))
        // mode with smallest-label tiebreak as a two-phase
        // max(struct(c, -lab)) — no window, no second shuffle
        .groupBy(col("a"))
        .agg(max(struct(col("c").as("c"), (-col("lab")).as("neg"))).as("m"))
        .select(col("a").as("id"), (-col("m.neg")).cast("long").as("lab"))
        .localCheckpoint(eager = false)
    }
    labels.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_member"))
      .orderBy(col("community"))
  }

  // ---------------------------------------------------------------
  // g_pagerank — 5 fixed PageRank iterations (damping 0.85) on the
  // bigram co-occurrence graph of the top-50 terms. Every rank
  // update folds its in-neighbor contributions in sorted src order
  // (repo float policy: order-sensitive double sums get ONE pinned
  // fold order, mirrored in the oracle's `list(... ORDER BY src)`
  // fold), so five chained float iterations stay bit-identical
  // across engines. Scale: each iteration is one edge-rank join and
  // one grouped fold — the classic distributed PageRank shape; the
  // node set here is top-k-bounded so every iteration is a tiny
  // broadcast join against the edge list.
  // ---------------------------------------------------------------
  private val prIters = 5
  private val prNodes = 50

  val gPagerank: Q = (s, dir) => {
    val base = docs(s, dir).select(col("doc_id"), TF.tokens(col("text")).as("toks"))
    val uni = base.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // localCheckpoint: reused as both broadcast filters and the rank
    // vector's base each iteration; self-cleaning (vs a cache() entry
    // held by CacheManager for the session)
    val top = uni.orderBy(desc("c"), col("w")).limit(prNodes)
      .select(col("w").as("term")).localCheckpoint(eager = false)
    val bi = base.filter(size(col("toks")) >= 2)
      .select(explode(expr("transform(sequence(1, size(toks) - 1), " +
        "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2))")).as("b"))
      .select(col("b.w1").as("src"), col("b.w2").as("dst"))
      .filter(col("src") =!= col("dst"))
      .join(broadcast(top.select(col("term").as("src"))), Seq("src"))
      .join(broadcast(top.select(col("term").as("dst"))), Seq("dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("w"))
    val ew = bi.join(
        bi.groupBy(col("src")).agg(sum(col("w")).cast("long").as("outw")),
        Seq("src"))
      .localCheckpoint(eager = false)
    var r = top.select(col("term"), (lit(1.0) / lit(prNodes.toDouble)).as("pr"))
    for (_ <- 1 to prIters) {
      val folded = ew.join(r, ew("src") === r("term"))
        .select(col("dst"), col("src"),
          (col("pr") * d(col("w")) / d(col("outw"))).as("contrib"))
        .groupBy(col("dst"))
        .agg(expr("aggregate(sort_array(collect_list(struct(src, contrib))), 0D, " +
          "(a, x) -> a + x.contrib)").as("m"))
      r = top.join(folded, top("term") === folded("dst"), "left")
        .select(top("term"),
          (lit(0.15) / lit(prNodes.toDouble) +
            lit(0.85) * coalesce(col("m"), lit(0.0))).as("pr"))
    }
    r.select(col("term"), round(col("pr"), 6).as("pagerank"))
      .orderBy(col("term"))
  }

  // ---------------------------------------------------------------
  // t_tfidf_topk — per-document top-3 terms by tf·idf with
  // idf = ln(N/df). Ranking is on the raw double (a 1-ulp flip
  // would need distinct (tf, df) pairs whose products land within
  // one ulp — the bm25 precedent); equal (tf, df) means exactly
  // equal scores in both engines, and those ties break on the term.
  // Scale: tf is one (doc, term) aggregate, df one term aggregate
  // broadcast back, and the top-3 cut is a bounded per-doc window.
  // ---------------------------------------------------------------
  val tTfidfTopk: Q = (s, dir) => {
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs(s, dir).agg(count(lit(1)).as("n_docs"))
    // top-3 per doc via the map-side TopKAggBy, not a window: the
    // scored (doc, term) stream shuffles 3 rows per doc instead of
    // the whole vocabulary-join output. The payload packs
    // (term, tf, df) tab-separated so one aggregation carries all
    // output columns; '\t' sorts below every printable char, so
    // payload order == term order on score ties (the oracle's
    // tiebreak).
    val topk = udaf(new graft.functions.TopKAggBy[String](3))
    tf.join(dfc, Seq("term")).crossJoin(broadcast(n))
      .withColumn("score", d(col("tf")) * log(d(col("n_docs")) / d(col("df"))))
      .withColumn("packed",
        concat_ws("\t", col("term"), col("tf"), col("df")))
      .groupBy(col("doc_id"))
      .agg(topk(col("score"), col("packed")).as("nn"))
      .select(col("doc_id"), posexplode(col("nn")))
      .select(col("doc_id"), (col("pos") + 1).cast("int").as("rk"),
        split(col("col._2"), "\t").as("parts"), col("col._1").as("score"))
      .select(col("doc_id"), col("rk"),
        element_at(col("parts"), 1).as("term"),
        element_at(col("parts"), 2).cast("long").as("tf"),
        element_at(col("parts"), 3).cast("long").as("df"),
        round(col("score"), 6).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  // ---------------------------------------------------------------
  // sql_lateral — correlated LATERAL subquery (top-2 customers by
  // balance per nation) through the SQL parser: Catalyst rewrites
  // the correlated LIMIT into a DomainJoin + ranked window, so the
  // executed plan is the same shuffle-once top-k as the DataFrame
  // form — declared semantics, optimizer-chosen execution.
  // ---------------------------------------------------------------
  val sqlLateral: Q = (s, dir) => {
    t(s, dir, "nation").createOrReplaceTempView("nation")
    t(s, dir, "customer").createOrReplaceTempView("customer")
    s.sql("""
      SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
      FROM nation n JOIN LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY n.n_name, acctbal DESC, t.c_name""")
  }

  // ---------------------------------------------------------------
  // w_ewma_revenue — exponentially-weighted moving average (α=0.3)
  // of daily revenue, restarting each year. EWMA is inherently
  // sequential, so the float chain gets ONE pinned evaluation order:
  // the cumulative window collects the day-ordered prefix and a
  // left fold seeds on the first element (mirrored by DuckDB's
  // list_reduce seed semantics) — bit-identical across engines and
  // under any shuffle. Scale: the fold runs over DAYS (bounded per
  // year-partition), not rows — the heavy row stream is reduced by
  // the exact-decimal daily aggregate first; for unbounded per-key
  // series the same fold moves into flatMapGroups.
  // ---------------------------------------------------------------
  val wEwmaRevenue: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    val w = Window.partitionBy(year(col("day"))).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // RAW double output, deliberately un-rounded: the fold itself is
    // bit-identical cross-engine (pinned order, plain IEEE mul/add),
    // while round(x, 6) on ~1e7-magnitude values is the HAZARD — at
    // that magnitude ulp (~4e-9) sits close to the 6-dp half
    // boundaries and the JVM's exact-BigDecimal HALF_UP disagrees
    // with float-based rounding on boundary rows (observed at
    // sf0.1). Rounding is for transcendental noise; this chain has
    // none.
    daily.withColumn("arr", collect_list(col("revenue")).over(w))
      .withColumn("ewma", expr("aggregate(slice(arr, 2, size(arr) - 1), " +
        "element_at(arr, 1), (a, x) -> a * 0.7 + 0.3 * x)"))
      .select(col("day"), col("revenue"), col("ewma"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // q19_disjunctive — TPC-H Q19's shape: an OR of (brand × size ×
  // quantity) conjunction triples across a join. The optimizer
  // splits the disjunction: the part-only conjuncts prune the
  // build side before the join and the lineitem-only bounds
  // (quantity ∈ [1,30] overall) push into the fact scan, so the
  // join sees a fraction of both inputs — the classic
  // pushdown-through-OR test. Money math follows the repo decimal
  // policy (cast-then-multiply, exact sum, double at the edge).
  // ---------------------------------------------------------------
  val q19Disjunctive: Q = (s, dir) => {
    val pred =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(10, 25) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(20, 40) &&
        col("l_quantity").between(20, 30))
    t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // ---------------------------------------------------------------
  // w_cdc_apply — apply a change log with last-writer-wins +
  // tombstone semantics (the batch core of a MERGE INTO): orders
  // are per-customer change events ordered by (date, orderkey);
  // the latest event wins and status 'F' is a delete marker, so a
  // key whose last event is 'F' vanishes from the live state.
  // One ranked window per key then a small rollup — the standard
  // CDC-compaction shape that scales by key partitioning.
  // ---------------------------------------------------------------
  val wCdcApply: Q = (s, dir) => {
    val last = t(s, dir, "orders")
      .withColumn("rk", row_number().over(Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_orderdate"), desc("o_orderkey"))))
      .filter(col("rk") === 1)
    last.filter(col("o_orderstatus") =!= "F")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_live"),
        sum(dec(col("o_totalprice"))).cast("double").as("live_value"),
        max(col("o_orderdate")).as("latest_change"))
      .orderBy(col("c_mktsegment"))
  }

  // ---------------------------------------------------------------
  // q8_market_share — TPC-H Q8's shape: one supplier-nation's share
  // of a region's PROMO-part market per order year. Numerator and
  // denominator are exact conditional decimal sums over the same
  // 6-way star (dims broadcast, one fact shuffle), divided once at
  // the edge — the "ratio of two exact money sums" policy.
  // ---------------------------------------------------------------
  val q8MarketShare: Q = (s, dir) => {
    val rev = dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount")))
    val joined = t(s, dir, "lineitem")
      .join(t(s, dir, "part").filter(col("p_type") === "PROMO"),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation").select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region")), col("c_nationkey") === col("cn_key"))
      .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
        col("cn_region") === col("r_regionkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(t(s, dir, "nation").select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation")), col("s_nationkey") === col("sn_key"))
    joined
      .select(year(col("o_orderdate")).as("o_year"), rev.as("rev"),
        col("supp_nation"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === "NATION_3", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))).as("nation_rev"),
        sum(col("rev")).as("total_rev"))
      .select(col("o_year"),
        col("nation_rev").cast("double").as("nation_revenue"),
        col("total_rev").cast("double").as("total_revenue"),
        (col("nation_rev").cast("double") / col("total_rev").cast("double"))
          .as("mkt_share"))
      .orderBy(col("o_year"))
  }

  // ---------------------------------------------------------------
  // a_ks_drift — two-sample Kolmogorov-Smirnov statistic between
  // the 1996 and 1999 order-value distributions (the standard
  // distribution-drift monitor). Per distinct value the two ECDFs
  // are cumulative EXACT integer counts; D = max |c1/n1 - c2/n2| is
  // a max over per-row double ratios — order-free, so deterministic
  // under any partitioning. One sort-window over distinct values.
  // ---------------------------------------------------------------
  val aKsDrift: Q = (s, dir) => {
    val o = t(s, dir, "orders")
      .select(year(col("o_orderdate")).as("yr"), col("o_totalprice").as("v"))
      .filter(col("yr").isin(1996, 1999))
    val perV = o.groupBy(col("v")).agg(
      sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("d1"),
      sum(when(col("yr") === 1999, 1L).otherwise(0L)).as("d2"))
    // ECDFs via two-phase distributed running sums ([[Ranking]]):
    // distinct order values ≈ #orders, so the former global
    // Window.orderBy(v) funneled the whole table through ONE sorted
    // reducer — range partition + per-partition carries keep every
    // task at ~1/P of the data
    Ranking.withGlobalCumSums(perV, Seq("d1" -> "c1", "d2" -> "c2"), col("v"))
      .crossJoin(broadcast(o.agg(
        sum(when(col("yr") === 1996, 1L).otherwise(0L)).as("n1"),
        sum(when(col("yr") === 1999, 1L).otherwise(0L)).as("n2"))))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(abs(d(col("c1")) / d(col("n1")) - d(col("c2")) / d(col("n2"))))
          .as("ks_stat"))
  }

  // ---------------------------------------------------------------
  // a_gini_revenue — Gini concentration of per-customer revenue:
  // G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ) over value-ranked
  // customers. Σ i·xᵢ is permutation-invariant within equal-value
  // ties (the i's sum to the same total), so the row_number ranking
  // is deterministic where it matters; every sum is exact decimal
  // and only the final quotient is floating.
  // ---------------------------------------------------------------
  val aGiniRevenue: Q = (s, dir) => {
    val per = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("x"))
    // value rank via two-phase distributed ranking ([[Ranking]]):
    // the former partition-less row_number window sorted every
    // per-customer aggregate on ONE task
    val ranked = Ranking.withGlobalRank(per, "i", col("x"), col("o_custkey"))
    // 6-dp rounding on the ratio: numerator/denominator are exact
    // SCALE-2 decimals that pass 2^53 around sf0.1 — same
    // two-roundings-vs-one decimal→double hazard as a_autocorr
    // (scale-0 casts like a_spearman's are safe; scaled ones are
    // not once the unscaled value exceeds 2^53)
    ranked.agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("i") * col("x")).as("six"))
      .select(col("n").cast("long").as("n_customers"),
        col("sx").cast("double").as("total_revenue"),
        round((lit(2) * col("six") - (col("n") + 1) * col("sx")).cast("double") /
          (col("n") * col("sx")).cast("double"), 6).as("gini"))
  }

  // ---------------------------------------------------------------
  // a_benford — first-significant-digit profile of order values vs
  // Benford's law (a standard data-quality / fraud screen): exact
  // per-digit counts, the observed share as one int-ratio double,
  // and the expected log10(1+1/d) share through the 6-dp
  // transcendental rounding policy.
  // ---------------------------------------------------------------
  val aBenford: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(substring(floor(col("o_totalprice")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(t(s, dir, "orders").agg(count(lit(1)).as("n_tot"))))
      .select(col("digit"), col("n"),
        (d(col("n")) / d(col("n_tot"))).as("obs_share"),
        round(log10(lit(1.0) + lit(1.0) / d(col("digit"))), 6).as("benford_share"),
        round(abs(d(col("n")) / d(col("n_tot")) -
          log10(lit(1.0) + lit(1.0) / d(col("digit")))), 6).as("abs_dev"))
      .orderBy(col("digit"))

  // ---------------------------------------------------------------
  // j_nullsafe — null-safe equality join (<=> / IS NOT DISTINCT
  // FROM): the NULL-keyed group on each side must pair up instead of
  // disappearing, the semantics MERGE/dedup pipelines rely on when
  // join keys are genuinely nullable. Still a plain hash join (NULL
  // hashes like any key under null-safe equality) — no plan penalty.
  // ---------------------------------------------------------------
  val jNullsafe: Q = (s, dir) => {
    val seg = nullif(col("c_mktsegment"), lit("BUILDING"))
    val cust = t(s, dir, "customer")
      .groupBy(seg.as("seg")).agg(count(lit(1)).as("n_customers"))
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(seg.as("seg"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    cust.as("a").join(rev.as("b"), col("a.seg") <=> col("b.seg"), "left")
      .select(col("a.seg").as("seg"), col("n_customers"), col("revenue"))
      .orderBy(asc_nulls_first("seg"))
  }

  // ---------------------------------------------------------------
  // r5_pivot_multi — pivot with MULTIPLE aggregates per cell
  // (revenue + order count per status column): one shuffle, the
  // pivot columns are conditional aggregates, money stays exact
  // decimal until the edge.
  // ---------------------------------------------------------------
  val r5PivotMulti: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"),
        count(lit(1)).as("n"))
      .orderBy(col("o_year"))

  // ---------------------------------------------------------------
  // a_mode_status — exact mode (most frequent value, ties to the
  // smallest) of order priority per status: two-level count then a
  // 1-row-per-group ranked cut. The deterministic replacement for
  // an approximate heavy-hitter when the domain is small.
  // ---------------------------------------------------------------
  val aModeStatus: Q = (s, dir) =>
    t(s, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.partitionBy(col("o_orderstatus"))
        .orderBy(desc("n"), col("o_orderpriority"))))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"), col("o_orderpriority").as("mode_priority"),
        col("n"))
      .orderBy(col("o_orderstatus"))

  // ---------------------------------------------------------------
  // a_autocorr — lag-1 autocorrelation of daily revenue: the
  // a_corr_regr recipe (exact decimal moments → named double
  // intermediates → one shared formula text) applied to the
  // (xₜ, xₜ₋₁) pairs a lag window produces. Detects day-to-day
  // momentum/mean-reversion; everything up to the final formula is
  // exact, the formula itself is fixed-order IEEE.
  // ---------------------------------------------------------------
  val aAutocorr: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("x"))
    val paired = daily
      .withColumn("y", lag(col("x"), 1).over(Grain.bounded(col("day"))))
      .filter(col("y").isNotNull)
    val m = paired.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"))
    // 6-dp rounding: the ΣXY-scale moments exceed 2^53, and a
    // >2^53 decimal converts to double with one rounding in the JVM
    // (BigDecimal.doubleValue, correctly rounded) but two in DuckDB
    // (int128→double, then /10^scale) — observed 1-ulp divergence at
    // sf0.01. Same policy bucket as the transcendental outputs.
    m.select(col("n").cast("long").as("n_pairs"),
      round((d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))) /
        (sqrt(d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))) *
         sqrt(d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy")))), 6)
        .as("autocorr_lag1"))
  }

  // ---------------------------------------------------------------
  // w_rolling_median — exact 7-day trailing median of daily revenue:
  // the ROWS frame collects the (bounded, ≤7-element) trailing
  // prefix, sorts it, and takes the exact middle — no sketch needed
  // when the frame is bounded, and element order inside the frame
  // can't leak into the result because the array is re-sorted.
  // ---------------------------------------------------------------
  val wRollingMedian: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"))
    val w = Grain.bounded(col("day")).rowsBetween(-6, Window.currentRow)
    daily.withColumn("arr", sort_array(collect_list(col("revenue")).over(w)))
      .withColumn("m", size(col("arr")))
      .select(col("day"), col("revenue"),
        when(col("m") % 2 === 1,
            element_at(col("arr"), ((col("m") + 1) / 2).cast("int")))
          .otherwise((element_at(col("arr"), (col("m") / 2).cast("int")) +
            element_at(col("arr"), (col("m") / 2 + 1).cast("int"))) / lit(2.0))
          .as("rolling_median"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // mm_shard_manifest — training-shard planning over the multimodal
  // (binary) corpus: content-hash-ordered docs pack into shards by
  // a byte budget (exclusive prefix sum / budget), and the manifest
  // reports each shard's size. The layout step every multimodal
  // training pipeline runs before writing webdataset-style shards;
  // all integer arithmetic. The cumsum runs over doc METADATA (id,
  // byte length) — the binary payload itself never shuffles — and
  // uses Ranking.withGlobalCumSums (range-partition + per-partition
  // carries + prefix offsets): a corpus manifest is per-DOC rows, so
  // at 100 TB a global ordered window would funnel billions of rows
  // through one reducer; the two-phase form keeps P parallel sorts.
  // ---------------------------------------------------------------
  val mmShardManifest: Q = (s, dir) => {
    val budget = 16384L
    val m = docs(s, dir).select(col("doc_id"),
      octet_length(col("text").cast("binary")).cast("long").as("bytes"),
      md5(col("doc_id").cast("string")).as("key"))
    Ranking.withGlobalCumSums(m, Seq("bytes" -> "cum"),
        col("key"), col("doc_id"))
      .withColumn("shard", floor((col("cum") - col("bytes")) / lit(budget)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("bytes")).cast("long").as("shard_bytes"))
      .orderBy(col("shard"))
  }

  // ---------------------------------------------------------------
  // g_triangles — triangle count + global clustering coefficient of
  // the similarity graph: canonical (v1 < v2) edges joined three
  // ways, so each triangle counts exactly once; wedges come from
  // exact undirected degrees. The pair list is tiny after
  // thresholding (it's cached for its three join roles), so the
  // triangle join is bounded by the similarity graph, not the
  // corpus. Coefficient = 3·triangles / wedges, one double ratio.
  // ---------------------------------------------------------------
  val gTriangles: Q = (s, dir) => {
    val p = graft.functions.Similarity.cosineNearDupPairs(s, dir, 0.3)
      .select(col("v1").as("a"), col("v2").as("b")).localCheckpoint(eager = false)
    val tri = p.alias("ab")
      .join(p.alias("bc"), col("ab.b") === col("bc.a"))
      .join(p.alias("ac"),
        col("ac.a") === col("ab.a") && col("ac.b") === col("bc.b"))
      .agg(count(lit(1)).as("n_triangles"))
    val deg = p.select(col("a").as("v")).union(p.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("deg")) / 2).cast("long").as("n_edges"),
      (sum(col("deg") * (col("deg") - 1)) / 2).cast("long").as("n_wedges"))
    broadcast(stats).crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        (lit(3.0) * d(col("n_triangles")) / d(col("n_wedges")))
          .as("clustering_coeff"))
  }

  // ---------------------------------------------------------------
  // a_skew_metrics — join-key skew diagnostic (the number you check
  // BEFORE picking salting / AQE skew-join): per-key row counts of
  // the would-be join key, min/max, and max-over-average skew
  // factor. Two exact aggregates; the per-key count map-side
  // combines so the shuffle is one row per key.
  // ---------------------------------------------------------------
  val aSkewMetrics: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_keys"), sum(col("c")).cast("long").as("n_rows"),
        min(col("c")).as("min_rows"), max(col("c")).as("max_rows"))
      .select(col("n_keys"), col("n_rows"), col("min_rows"), col("max_rows"),
        (d(col("max_rows")) * d(col("n_keys")) / d(col("n_rows")))
          .as("skew_factor"))

  // ---------------------------------------------------------------
  // a_iqr_outliers — Tukey-fence outlier counts per order status,
  // made float-proof by working in integer CENTS: quartile positions
  // (n-1)·{¼,¾} have quarter fractions, so interpolating between
  // integer neighbors yields values exactly representable in a
  // double — ANY correctly-implemented interpolation formula (Spark
  // percentile vs DuckDB quantile_cont) produces the identical bits,
  // and the fences (±1.5·IQR = eighth-integers) compare exactly.
  // One grouped sketch-free percentile + one broadcast-back pass.
  // ---------------------------------------------------------------
  val aIqrOutliers: Q = (s, dir) => {
    val o = t(s, dir, "orders").select(col("o_orderstatus").as("st"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val q = o.groupBy(col("st")).agg(
      expr("percentile(cents, 0.25)").as("q1"),
      expr("percentile(cents, 0.75)").as("q3"),
      count(lit(1)).as("n"))
    o.join(broadcast(q), Seq("st"))
      .withColumn("lo", col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("hi", col("q3") + (col("q3") - col("q1")) * 1.5)
      .groupBy(col("st"))
      .agg(max(col("n")).as("n"),
        (max(col("q1")) / 100.0).as("q1_price"),
        (max(col("q3")) / 100.0).as("q3_price"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).cast("long").as("n_outliers"))
      .orderBy(col("st"))
  }

  // ---------------------------------------------------------------
  // sql_recursive — recursive CTE (Spark 4 WITH RECURSIVE) computing
  // a compounded YEARLY growth index: a RUNNING PRODUCT, which no
  // window frame expresses exactly (exp(Σln) would trip the
  // transcendental policy). The recursion pins the evaluation order
  // — each step is one double multiply/divide — so the float chain
  // is bit-identical in both engines. Yearly, not monthly: Spark
  // executes one JOB per recursion level, so level count is the cost
  // driver — and, crucially, the UnionLoop re-evaluates the step's
  // INPUT every level, so the yearly aggregate must be materialized
  // BEFORE the recursion. With `seq` inline as a CTE each of the 7
  // levels re-aggregated the full orders table (~3-4.5 s at sf0.1,
  // 28 s at 80 monthly levels); localCheckpointing the 7-row frame
  // first makes each level a scan of 7 cached rows (~job-overhead
  // only). Same plan shape at 100 TB: the recursion input is always
  // a years-count row set, never the fact table.
  // ---------------------------------------------------------------
  val sqlRecursive: Q = (s, dir) => {
    t(s, dir, "orders")
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("rev"))
      // bounded single-partition window: one row per YEAR, regardless
      // of fact-table scale
      .withColumn("k", row_number().over(Grain.bounded(col("yr"))))
      .localCheckpoint(eager = false)
      .createOrReplaceTempView("seq_rec")
    s.sql("""
      WITH RECURSIVE r(k, yr, rev, idx) AS (
        SELECT k, yr, rev, CAST(100.0 AS DOUBLE) FROM seq_rec WHERE k = 1
        UNION ALL
        SELECT seq_rec.k, seq_rec.yr, seq_rec.rev, r.idx * (seq_rec.rev / r.rev)
        FROM seq_rec JOIN r ON seq_rec.k = r.k + 1)
      SELECT yr, rev, round(idx, 6) AS growth_index FROM r ORDER BY yr""")
  }

  // ---------------------------------------------------------------
  // sql_recursive_batched — the MONTHLY (~80-level) growth index,
  // with the recursion's one-job-per-level floor cut by LEVEL
  // BATCHING: levels group into batches of 16, each batch's ratios
  // ride as one sorted array, and the recursive step advances a
  // whole batch at a time via aggregate(ratios, prev_end,
  // (a, x) -> a * x) — a left fold seeded with the previous batch's
  // end value, which is EXACTLY the sequential recursion's
  // multiply order (so a plain one-level-at-a-time DuckDB recursion
  // is a bit-identical oracle). Per-level values rematerialize
  // outside the recursion as prefix folds of the batch array from
  // the batch-start seed — same association again. 80 levels ⇒ 5
  // recursion iterations instead of 80 Spark jobs; at any scale the
  // recursion input is the batch count, never the fact table (both
  // frames localCheckpoint before the UnionLoop re-evaluates them
  // per iteration — the sql_recursive lesson).
  // ---------------------------------------------------------------
  val sqlRecursiveBatched: Q = (s, dir) => {
    val batchSize = 16
    val wk = Grain.bounded(col("yr"), col("mo"))
    t(s, dir, "orders")
      .groupBy(expr("CAST(year(o_orderdate) AS BIGINT)").as("yr"),
        expr("CAST(month(o_orderdate) AS BIGINT)").as("mo"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("rev"))
      // bounded single-partition window: one row per MONTH
      .withColumn("k", row_number().over(wk))
      .withColumn("ratio", col("rev") / lag(col("rev"), 1).over(wk))
      .withColumn("b", expr(s"CAST((k - 1) div $batchSize AS BIGINT)"))
      // position of this level's ratio inside its batch's array
      // (k=1 has no ratio; batch 0's array starts at k=2)
      .withColumn("p", when(col("b") === 0, col("k") - 1)
        .otherwise(col("k") - col("b") * batchSize))
      .localCheckpoint(eager = false)
      .createOrReplaceTempView("recb_lvl")
    s.table("recb_lvl").filter(col("k") >= 2)
      .groupBy(col("b"))
      .agg(expr("transform(sort_array(collect_list(struct(k, ratio)))," +
        " x -> x.ratio)").as("ratios"))
      .localCheckpoint(eager = false)
      .createOrReplaceTempView("recb_bat")
    s.sql("""
      WITH RECURSIVE rb(b, endv) AS (
        SELECT b, aggregate(ratios, CAST(100.0 AS DOUBLE), (a, x) -> a * x)
        FROM recb_bat WHERE b = 0
        UNION ALL
        SELECT recb_bat.b, aggregate(recb_bat.ratios, rb.endv, (a, x) -> a * x)
        FROM recb_bat JOIN rb ON recb_bat.b = rb.b + 1)
      SELECT l.yr, l.mo, l.rev,
             CASE WHEN l.k = 1 THEN CAST(100.0 AS DOUBLE)
                  ELSE round(aggregate(slice(bb.ratios, 1, CAST(l.p AS INT)),
                         coalesce(st.startv, CAST(100.0 AS DOUBLE)),
                         (a, x) -> a * x), 6)
             END AS growth_index
      FROM recb_lvl l
      LEFT JOIN recb_bat bb ON l.b = bb.b
      LEFT JOIN (SELECT b + 1 AS b, endv AS startv FROM rb) st ON l.b = st.b
      ORDER BY l.yr, l.mo""")
  }

  // ---------------------------------------------------------------
  // w_fill_forward — calendar gap-fill with carry-forward: the full
  // day spine left-joins the observed dailies and missing days take
  // the last non-null value (`last(..., ignoreNulls)` over the
  // cumulative frame / IGNORE NULLS in the oracle). The standard
  // "as-of snapshot per calendar day" shape; the spine is generated,
  // never scanned.
  // ---------------------------------------------------------------
  val wFillForward: Q = (s, dir) => {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("rev"))
    val spine = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
      .select(explode(sequence(col("lo"), col("hi"),
        expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .withColumn("revenue_filled",
        last(col("rev"), ignoreNulls = true).over(Grain.bounded(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("is_gap", col("rev").isNull)
      .select(col("day"), col("revenue_filled"), col("is_gap"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // sql_pivot — the SQL-syntax PIVOT and UNPIVOT clauses through the
  // parser, round-tripped: wide per-status revenue columns, then
  // back to long form (UNPIVOT drops the NULL cells, mirroring the
  // GROUP BY oracle's absent groups). Money stays exact decimal
  // inside the pivot; one cast at the edge.
  // ---------------------------------------------------------------
  val sqlPivot: Q = (s, dir) => {
    t(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql("""
      WITH base AS (
        SELECT year(o_orderdate) AS o_year, o_orderstatus AS st,
               CAST(o_totalprice AS DECIMAL(18,2)) AS p
        FROM orders),
      piv AS (
        SELECT * FROM base PIVOT (SUM(p) FOR st IN ('F' AS f, 'O' AS o, 'P' AS pp))),
      unp AS (
        SELECT o_year, status, CAST(rev AS DOUBLE) AS revenue
        FROM piv UNPIVOT (rev FOR status IN (f AS `F`, o AS `O`, pp AS `P`)))
      SELECT o_year, status, revenue FROM unp ORDER BY o_year, status""")
  }

  // ---------------------------------------------------------------
  // c_interval_suite — calendar-interval arithmetic with exact
  // cross-engine twins: add_months end-of-month clamping, last_day,
  // day offsets, quarter truncation, and next-Monday (replayed in
  // the oracle from ISO dow arithmetic). Scalar per-row — one
  // codegen pass, no shuffle before the ORDER BY.
  // ---------------------------------------------------------------
  val cIntervalSuite: Q = (s, dir) =>
    t(s, dir, "orders").filter(col("o_orderkey") < 500)
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
      .select(col("o_orderkey"), col("d"),
        add_months(col("d"), 1).as("plus_1m"),
        add_months(col("d"), 13).as("plus_13m"),
        last_day(col("d")).as("month_end"),
        date_add(col("d"), 45).as("plus_45d"),
        date_sub(col("d"), 30).as("minus_30d"),
        date_trunc("quarter", col("d")).cast("date").as("quarter_start"),
        next_day(col("d"), "Mon").as("next_monday"))
      .orderBy(col("o_orderkey"))

  val queries: Map[String, Q] = Map(
    "sql_pivot" -> sqlPivot,
    "c_interval_suite" -> cIntervalSuite,
    "sql_recursive" -> sqlRecursive,
    "sql_recursive_batched" -> sqlRecursiveBatched,
    "w_fill_forward" -> wFillForward,
    "a_iqr_outliers" -> aIqrOutliers,
    "g_triangles" -> gTriangles,
    "a_skew_metrics" -> aSkewMetrics,
    "a_autocorr" -> aAutocorr,
    "w_rolling_median" -> wRollingMedian,
    "mm_shard_manifest" -> mmShardManifest,
    "j_nullsafe" -> jNullsafe,
    "r5_pivot_multi" -> r5PivotMulti,
    "a_mode_status" -> aModeStatus,
    "q8_market_share" -> q8MarketShare,
    "a_ks_drift" -> aKsDrift,
    "a_gini_revenue" -> aGiniRevenue,
    "a_benford" -> aBenford,
    "w_ewma_revenue" -> wEwmaRevenue,
    "q19_disjunctive" -> q19Disjunctive,
    "w_cdc_apply" -> wCdcApply,
    "a_spearman" -> aSpearman,
    "a_countmin" -> aCountMin,
    "t_pmi_bigrams" -> tPmiBigrams,
    "o_zorder_layout" -> oZorderLayout,
    "g_components" -> gComponents,
    "g_pagerank" -> gPagerank,
    "g_label_prop" -> gLabelProp,
    "t_tfidf_topk" -> tTfidfTopk,
    "sql_lateral" -> sqlLateral)

  /** Left-fold cosine between two DuckDB double-list columns — the
    * same expression every embedding oracle in TrainingData uses. */
  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))" +
      s" / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])))" +
      s" * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]))))"

  /** One label-propagation iteration CTE: mode of neighbor labels,
    * smallest label on ties — all integer, mirrors the engine's
    * two-phase max(struct(c, -lab)) argmax exactly. */
  private def lpIterSql(i: Int): String =
    s"""l$i AS (
       |  SELECT id, lab FROM (
       |    SELECT id, lab,
       |           row_number() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rk
       |    FROM (SELECT ed.a AS id, prev.lab AS lab, count(*) AS c
       |          FROM ed JOIN l${i - 1} prev ON ed.b = prev.id
       |          GROUP BY 1, 2))
       |  WHERE rk = 1)""".stripMargin

  /** One PageRank iteration CTE: fold in-neighbor contributions in
    * src order with a 0-prepended left fold (mirrors Spark's
    * `aggregate(sort_array(...), 0D, ...)` exactly). */
  private def prIterSql(k: Int): String =
    s"""r$k AS (
       |  SELECT t.term,
       |         0.15 / $prNodes.0 + 0.85 * coalesce(m.m, 0.0) AS pr
       |  FROM top t LEFT JOIN (
       |    SELECT ew.dst, list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |             list(r.pr * CAST(ew.w AS DOUBLE) / CAST(ew.outw AS DOUBLE)
       |                  ORDER BY ew.src)),
       |           (a, b) -> a + b) AS m
       |    FROM ew JOIN r${k - 1} r ON ew.src = r.term GROUP BY ew.dst) m
       |  ON t.term = m.dst)""".stripMargin

  private val md5Hash60 = (e: String) =>
    s"list_reduce(list_transform(string_split(substr(md5($e), 1, 15), ''), " +
      "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), (a, b) -> a * 16 + b)"

  val oracles: Map[String, String] = Map(
    "sql_pivot" ->
      """SELECT year(o_orderdate) AS o_year, o_orderstatus AS status,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders
        |GROUP BY 1, 2 ORDER BY o_year, status""".stripMargin,
    "c_interval_suite" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_1m,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 13 MONTH AS DATE) AS plus_13m,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus_45d,
        |       CAST(CAST(o_orderdate AS DATE) - INTERVAL 30 DAY AS DATE) AS minus_30d,
        |       CAST(date_trunc('quarter', CAST(o_orderdate AS DATE)) AS DATE)
        |         AS quarter_start,
        |       CAST(CAST(o_orderdate AS DATE) + to_days(CAST(
        |         ((1 - isodow(CAST(o_orderdate AS DATE)) + 6) % 7) + 1 AS INTEGER))
        |         AS DATE) AS next_monday
        |FROM orders WHERE o_orderkey < 500
        |ORDER BY o_orderkey""".stripMargin,
    "sql_recursive" ->
      """WITH RECURSIVE m AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |seq AS (SELECT yr, rev, row_number() OVER (ORDER BY yr) AS k FROM m),
        |r AS (
        |  SELECT k, yr, rev, CAST(100.0 AS DOUBLE) AS idx FROM seq WHERE k = 1
        |  UNION ALL
        |  SELECT seq.k, seq.yr, seq.rev, r.idx * (seq.rev / r.rev)
        |  FROM seq JOIN r ON seq.k = r.k + 1)
        |SELECT yr, rev, round(idx, 6) AS growth_index FROM r ORDER BY yr""".stripMargin,
    // plain sequential recursion — the batched engine fold reproduces
    // its multiply association exactly (see sqlRecursiveBatched doc)
    "sql_recursive_batched" ->
      """WITH RECURSIVE m AS (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |         CAST(month(o_orderdate) AS BIGINT) AS mo,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1, 2),
        |seq AS (SELECT yr, mo, rev,
        |               row_number() OVER (ORDER BY yr, mo) AS k FROM m),
        |r AS (
        |  SELECT k, yr, mo, rev, CAST(100.0 AS DOUBLE) AS idx FROM seq WHERE k = 1
        |  UNION ALL
        |  SELECT s.k, s.yr, s.mo, s.rev, r.idx * (s.rev / r.rev)
        |  FROM seq s JOIN r ON s.k = r.k + 1)
        |SELECT yr, mo, rev,
        |       CASE WHEN k = 1 THEN CAST(100.0 AS DOUBLE)
        |            ELSE round(idx, 6) END AS growth_index
        |FROM r ORDER BY yr, mo""".stripMargin,
    "w_fill_forward" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders GROUP BY 1),
        |spine AS (
        |  SELECT CAST(unnest(generate_series((SELECT min(day) FROM daily),
        |                                     (SELECT max(day) FROM daily),
        |                                     INTERVAL 1 DAY)) AS DATE) AS day)
        |SELECT s.day,
        |       last_value(d.rev IGNORE NULLS) OVER (ORDER BY s.day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue_filled,
        |       d.rev IS NULL AS is_gap
        |FROM spine s LEFT JOIN daily d USING (day)
        |ORDER BY s.day""".stripMargin,
    "a_iqr_outliers" ->
      """WITH o AS (
        |  SELECT o_orderstatus AS st,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |q AS (
        |  SELECT st, quantile_cont(cents, 0.25) AS q1,
        |         quantile_cont(cents, 0.75) AS q3,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM o GROUP BY 1)
        |SELECT st, max(q.n) AS n,
        |       max(q.q1) / 100.0 AS q1_price,
        |       max(q.q3) / 100.0 AS q3_price,
        |       CAST(SUM(CASE WHEN o.cents < q.q1 - (q.q3 - q.q1) * 1.5
        |                       OR o.cents > q.q3 + (q.q3 - q.q1) * 1.5
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM o JOIN q USING (st)
        |GROUP BY st ORDER BY st""".stripMargin,
    "g_triangles" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.emb", "b.emb")} >= 0.3),
         |tri AS (
         |  SELECT count(*) AS n_triangles
         |  FROM p ab JOIN p bc ON ab.b = bc.a
         |  JOIN p ac ON ac.a = ab.a AND ac.b = bc.b),
         |deg AS (
         |  SELECT v, count(*) AS deg FROM (
         |    SELECT a AS v FROM p UNION ALL SELECT b FROM p)
         |  GROUP BY 1),
         |stats AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         |         CAST(SUM(deg) / 2 AS BIGINT) AS n_edges,
         |         CAST(SUM(deg * (deg - 1)) / 2 AS BIGINT) AS n_wedges
         |  FROM deg)
         |SELECT n_nodes, n_edges, CAST(n_triangles AS BIGINT) AS n_triangles,
         |       3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)
         |         AS clustering_coeff
         |FROM stats CROSS JOIN tri""".stripMargin,
    "a_skew_metrics" ->
      """WITH c AS (
        |  SELECT l_partkey, count(*) AS c FROM lineitem GROUP BY 1)
        |SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |       CAST(SUM(c) AS BIGINT) AS n_rows,
        |       min(c) AS min_rows, max(c) AS max_rows,
        |       CAST(max(c) AS DOUBLE) * CAST(count(*) AS DOUBLE)
        |         / CAST(SUM(c) AS DOUBLE) AS skew_factor
        |FROM c""".stripMargin,
    "a_autocorr" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |paired AS (
        |  SELECT x, lag(x) OVER (ORDER BY day) AS y FROM daily
        |  QUALIFY y IS NOT NULL),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
        |         CAST(SUM(x * y) AS DOUBLE) AS sxy,
        |         CAST(SUM(x * x) AS DOUBLE) AS sxx,
        |         CAST(SUM(y * y) AS DOUBLE) AS syy
        |  FROM paired)
        |SELECT n AS n_pairs,
        |       round((CAST(n AS DOUBLE) * sxy - sx * sy)
        |         / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
        |            * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS autocorr_lag1
        |FROM m""".stripMargin,
    "w_rolling_median" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day, revenue,
        |         list_sort(list(revenue) OVER (ORDER BY day
        |           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM daily)
        |SELECT day, revenue,
        |       CASE WHEN len(arr) % 2 = 1 THEN arr[CAST((len(arr) + 1) / 2 AS INTEGER)]
        |            ELSE (arr[CAST(len(arr) / 2 AS INTEGER)]
        |                  + arr[CAST(len(arr) / 2 + 1 AS INTEGER)]) / 2.0 END
        |         AS rolling_median
        |FROM c ORDER BY day""".stripMargin,
    "mm_shard_manifest" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(strlen(text) AS BIGINT) AS bytes,
        |         md5(CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, bytes,
        |         SUM(bytes) OVER (ORDER BY key, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM m)
        |SELECT CAST(floor(CAST(cum - bytes AS DOUBLE) / 16384.0) AS BIGINT) AS shard,
        |       count(*) AS n_docs, CAST(SUM(bytes) AS BIGINT) AS shard_bytes
        |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,
    "j_nullsafe" ->
      """WITH cust AS (
        |  SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
        |         count(*) AS n_customers
        |  FROM customer GROUP BY 1),
        |rev AS (
        |  SELECT nullif(c_mktsegment, 'BUILDING') AS seg,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1)
        |SELECT a.seg, a.n_customers, b.revenue
        |FROM cust a LEFT JOIN rev b ON a.seg IS NOT DISTINCT FROM b.seg
        |ORDER BY a.seg NULLS FIRST""".stripMargin,
    "r5_pivot_multi" ->
      """SELECT year(o_orderdate) AS o_year,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'F'
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |            AS DOUBLE) AS F_rev,
        |       CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS F_n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'O'
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |            AS DOUBLE) AS O_rev,
        |       CAST(count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS O_n,
        |       CAST(SUM(CASE WHEN o_orderstatus = 'P'
        |                     THEN CAST(o_totalprice AS DECIMAL(18,2)) END)
        |            AS DOUBLE) AS P_rev,
        |       CAST(count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS P_n
        |FROM orders GROUP BY 1 ORDER BY o_year""".stripMargin,
    "a_mode_status" ->
      """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |         row_number() OVER (PARTITION BY o_orderstatus
        |           ORDER BY count(*) DESC, o_orderpriority) AS rk
        |  FROM orders GROUP BY 1, 2)
        |WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,
    "q8_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year,
        |         CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS rev,
        |         sn.n_name AS supp_nation
        |  FROM lineitem
        |  JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |SELECT o_year,
        |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         AS nation_revenue,
        |       CAST(SUM(rev) AS DOUBLE) AS total_revenue,
        |       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev
        |                     ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        |         / CAST(SUM(rev) AS DOUBLE) AS mkt_share
        |FROM j GROUP BY 1 ORDER BY o_year""".stripMargin,
    "a_ks_drift" ->
      """WITH o AS (
        |  SELECT year(o_orderdate) AS yr, o_totalprice AS v FROM orders
        |  WHERE year(o_orderdate) IN (1996, 1999)),
        |perv AS (
        |  SELECT v, SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS d1,
        |         SUM(CASE WHEN yr = 1999 THEN 1 ELSE 0 END) AS d2
        |  FROM o GROUP BY 1),
        |c AS (
        |  SELECT v,
        |         SUM(d1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                       AND CURRENT ROW) AS c1,
        |         SUM(d2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |                       AND CURRENT ROW) AS c2
        |  FROM perv),
        |n AS (SELECT CAST(SUM(CASE WHEN yr = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |             CAST(SUM(CASE WHEN yr = 1999 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |      FROM o)
        |SELECT n1, n2,
        |       max(abs(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |             - CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE))) AS ks_stat
        |FROM c CROSS JOIN n GROUP BY n1, n2""".stripMargin,
    "a_gini_revenue" ->
      """WITH per AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY 1),
        |r AS (SELECT x, o_custkey,
        |             CAST(row_number() OVER (ORDER BY x, o_custkey) AS BIGINT) AS i
        |      FROM per),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(i * x) AS six
        |      FROM r)
        |SELECT n AS n_customers, CAST(sx AS DOUBLE) AS total_revenue,
        |       round(CAST(2 * six - (n + 1) * sx AS DOUBLE)
        |         / CAST(n * sx AS DOUBLE), 6) AS gini
        |FROM g""".stripMargin,
    "a_benford" ->
      """WITH dg AS (
        |  SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
        |                     1, 1) AS INTEGER) AS digit
        |  FROM orders),
        |n AS (SELECT count(*) AS n_tot FROM orders)
        |SELECT digit, count(*) AS n,
        |       CAST(count(*) AS DOUBLE) / CAST(n_tot AS DOUBLE) AS obs_share,
        |       round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share,
        |       round(abs(CAST(count(*) AS DOUBLE) / CAST(n_tot AS DOUBLE)
        |             - log10(1.0 + 1.0 / CAST(digit AS DOUBLE))), 6) AS abs_dev
        |FROM dg CROSS JOIN n
        |GROUP BY digit, n_tot ORDER BY digit""".stripMargin,
    "w_ewma_revenue" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |c AS (
        |  SELECT day, revenue,
        |         list(revenue) OVER (PARTITION BY year(day) ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
        |  FROM daily)
        |SELECT day, revenue,
        |       list_reduce(arr, (a, x) -> a * 0.7 + 0.3 * x) AS ewma
        |FROM c ORDER BY day""".stripMargin,
    "q19_disjunctive" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |           * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 25
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 40
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "w_cdc_apply" ->
      """WITH last AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |           row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
        |    FROM orders)
        |  WHERE rk = 1)
        |SELECT c_mktsegment, count(*) AS n_live,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS live_value,
        |       max(o_orderdate) AS latest_change
        |FROM last JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus <> 'F'
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,
    "a_spearman" ->
      """WITH r AS (
        |  SELECT l_returnflag AS flag,
        |         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |           + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
        |         2 * rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
        |           + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
        |  FROM lineitem),
        |g AS (
        |  SELECT flag, CAST(count(*) AS HUGEINT) AS n,
        |         CAST(sum(rx) AS HUGEINT) AS sx, CAST(sum(ry) AS HUGEINT) AS sy,
        |         CAST(sum(rx * rx) AS HUGEINT) AS sxx,
        |         CAST(sum(ry * ry) AS HUGEINT) AS syy,
        |         CAST(sum(rx * ry) AS HUGEINT) AS sxy
        |  FROM r GROUP BY 1)
        |SELECT flag, CAST(n AS BIGINT) AS n,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
        |              sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS spearman_rho
        |FROM g ORDER BY flag""".stripMargin,
    "a_countmin" ->
      s"""WITH tok AS (
         |  SELECT unnest(string_split(text, ' ')) AS term FROM documents),
         |js AS (SELECT unnest(range(0, 4)) AS j),
         |cells AS (
         |  SELECT j, ${md5Hash60("CAST(j AS VARCHAR) || ':' || term")} % 64 AS bucket
         |  FROM tok CROSS JOIN js),
         |sketch AS (SELECT j, bucket, count(*) AS c FROM cells GROUP BY 1, 2),
         |top AS (
         |  SELECT term, count(*) AS exact_c FROM tok GROUP BY 1
         |  ORDER BY exact_c DESC, term LIMIT 10),
         |probes AS (
         |  SELECT term, exact_c, j,
         |         ${md5Hash60("CAST(j AS VARCHAR) || ':' || term")} % 64 AS bucket
         |  FROM top CROSS JOIN js)
         |SELECT p.term, p.exact_c, min(s.c) AS cm_est,
         |       min(s.c) >= p.exact_c AS est_ge_exact
         |FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
         |GROUP BY p.term, p.exact_c
         |ORDER BY p.exact_c DESC, p.term""".stripMargin,
    "t_pmi_bigrams" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |uni AS (
        |  SELECT w, count(*) AS c
        |  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY 1),
        |bi AS (
        |  SELECT w1, w2, count(*) AS n_xy FROM (
        |    SELECT toks[i] AS w1, toks[i + 1] AS w2
        |    FROM base CROSS JOIN unnest(range(1, len(toks))) AS r(i)
        |    WHERE len(toks) >= 2)
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_tot,
        |         (SELECT CAST(sum(n_xy) AS BIGINT) FROM bi) AS b_tot),
        |top AS (SELECT * FROM bi ORDER BY n_xy DESC, w1, w2 LIMIT 20)
        |SELECT t.w1, t.w2, t.n_xy, ux.c AS n_x, uy.c AS n_y,
        |       round(ln((CAST(t.n_xy AS DOUBLE) / CAST(b_tot AS DOUBLE)) /
        |             ((CAST(ux.c AS DOUBLE) / CAST(n_tot AS DOUBLE)) *
        |              (CAST(uy.c AS DOUBLE) / CAST(n_tot AS DOUBLE)))), 6) AS pmi
        |FROM top t
        |JOIN uni ux ON t.w1 = ux.w
        |JOIN uni uy ON t.w2 = uy.w
        |CROSS JOIN tot
        |ORDER BY t.n_xy DESC, t.w1, t.w2""".stripMargin,
    "o_zorder_layout" ->
      s"""WITH xy AS (
         |  SELECT CAST(l_partkey % 256 AS BIGINT) AS x,
         |         CAST(l_suppkey % 256 AS BIGINT) AS y
         |  FROM lineitem),
         |zed AS (SELECT x, y, (${mortonSql("x", "y")}) >> 8 AS bucket FROM xy)
         |SELECT bucket, count(*) AS n,
         |       min(x) AS min_x, max(x) AS max_x,
         |       min(y) AS min_y, max(y) AS max_y,
         |       (max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS cell_span
         |FROM zed GROUP BY 1 ORDER BY bucket""".stripMargin,
    "g_components" ->
      s"""WITH RECURSIVE e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.emb", "b.emb")} >= 0.3),
         |nodes AS (SELECT DISTINCT v1 AS id FROM p UNION SELECT v2 FROM p),
         |ed AS (SELECT v1 AS a, v2 AS b FROM p UNION SELECT v2, v1 FROM p),
         |reach(id, rep) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT ed.a, r.rep FROM ed JOIN reach r ON ed.b = r.id),
         |lab AS (SELECT id, min(rep) AS rep FROM reach GROUP BY 1)
         |SELECT rep AS component, count(*) AS n_members, max(id) AS max_member
         |FROM lab GROUP BY 1 ORDER BY component""".stripMargin,
    "g_label_prop" ->
      s"""WITH e AS (
         |  SELECT vec_id, label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS v1, b.vec_id AS v2
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |  WHERE ${cosSql("a.emb", "b.emb")} >= 0.3),
         |ed AS (SELECT v1 AS a, v2 AS b FROM p UNION SELECT v2, v1 FROM p),
         |l0 AS (SELECT DISTINCT a AS id, a AS lab FROM ed),
         |${(1 to lpIters).map(lpIterSql).mkString(",\n")}
         |SELECT lab AS community, count(*) AS n_members, max(id) AS max_member
         |FROM l$lpIters GROUP BY 1 ORDER BY community""".stripMargin,
    "g_pagerank" ->
      s"""WITH base AS (
         |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
         |uni AS (
         |  SELECT w, count(*) AS c
         |  FROM (SELECT unnest(toks) AS w FROM base) GROUP BY 1),
         |top AS (
         |  SELECT w AS term FROM uni ORDER BY c DESC, w LIMIT $prNodes),
         |bi AS (
         |  SELECT src, dst, count(*) AS w FROM (
         |    SELECT toks[i] AS src, toks[i + 1] AS dst
         |    FROM base CROSS JOIN unnest(range(1, len(toks))) AS r(i)
         |    WHERE len(toks) >= 2)
         |  WHERE src <> dst
         |    AND src IN (SELECT term FROM top) AND dst IN (SELECT term FROM top)
         |  GROUP BY 1, 2),
         |ew AS (
         |  SELECT bi.src, bi.dst, bi.w, ow.outw
         |  FROM bi JOIN (SELECT src, CAST(sum(w) AS BIGINT) AS outw
         |                FROM bi GROUP BY 1) ow USING (src)),
         |r0 AS (SELECT term, 1.0 / $prNodes.0 AS pr FROM top),
         |${(1 to prIters).map(prIterSql).mkString(",\n")}
         |SELECT term, round(pr, 6) AS pagerank FROM r$prIters ORDER BY term""".stripMargin,
    "t_tfidf_topk" ->
      """WITH tf AS (
        |  SELECT doc_id, term, count(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
        |  GROUP BY 1, 2),
        |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |         CAST(tf AS DOUBLE)
        |           * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS score,
        |         row_number() OVER (PARTITION BY doc_id
        |           ORDER BY CAST(tf AS DOUBLE)
        |             * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) DESC, term) AS rk
        |  FROM tf JOIN dfc USING (term) CROSS JOIN n)
        |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term, tf, df,
        |       round(score, 6) AS tfidf
        |FROM scored WHERE rk <= 3
        |ORDER BY doc_id, rk""".stripMargin,
    "sql_lateral" ->
      """SELECT n.n_name, t.c_name, CAST(t.c_acctbal AS DOUBLE) AS acctbal
        |FROM nation n, LATERAL (
        |  SELECT c_name, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n.n_name, acctbal DESC, t.c_name""".stripMargin)
}
