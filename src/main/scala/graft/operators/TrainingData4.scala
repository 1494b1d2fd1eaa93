package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Round-7 embedding-pipeline extensions: Lloyd's k-means refinement
  * over the corpus embeddings (the clustering stage SemDeDup-style
  * pruning and cluster-balanced sampling both assume), and int8
  * scalar quantization (the compression step a 100 TB ANN index
  * applies before sharding). Both carry full-replay DuckDB oracles;
  * every cross-row float reduction uses the sorted-fold pattern
  * (aggregate over a sort_array'd list ≡ DuckDB list_sum over
  * list(... ORDER BY ...)) so the doubles are bit-stable under any
  * shuffle or partitioning.
  *
  * Reference behavior basis: the reference's enrichment-then-serve
  * pipeline has no embedding stage; these extend the engine's
  * similarity toolkit (SURVEY north-star: SemDeDup, IVF, k-NN graph)
  * with the missing cluster-refinement and quantization steps, all
  * public algorithms (Lloyd 1982; scalar quantization as in FAISS's
  * SQ8), re-expressed Spark-first.
  */
object TrainingData4 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")

  /** L2-normalized corpus embeddings, materialized once (the
    * localCheckpoint barrier stops CollapseProject from inlining the
    * interpreted higher-order normalize into every downstream use —
    * same rationale as sim_semdedup). */
  private def normalized(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e0"))
      .withColumn("nrm", sqrt(Similarity.dot(col("e0"), col("e0"))))
      .select(col("vec_id"), transform(col("e0"), x => x / col("nrm")).as("e"))
      .localCheckpoint(eager = false)

  // ---------------------------------------------------------------
  // sim_kmeans — one Lloyd iteration of spherical k-means (k=8):
  // deterministic md5-sampled seeds (the sim_semdedup/sim_cosine_ivf
  // quantizer), assign to argmax-cosine centroid, recompute centroids
  // as element-wise member means, re-assign. Output is the per-vector
  // final assignment — integer decisions plus one rounded cosine, so
  // the contract is exact. Scale shape: seeds via top-k (never a
  // global sort), both assignment passes are broadcast-k×d map-side
  // scans (no shuffle of the corpus), and the update shuffles k·dim
  // groups. The mean's member fold is the one deliberately
  // non-scale-free piece: it collects each cluster's component list
  // to pin the summation order for the oracle; at real corpus scale
  // the update is a plain avg() whose last-ulp nondeterminism no
  // consumer observes (same deviation class as TrainingData3's
  // documented low-cardinality windows).
  // ---------------------------------------------------------------
  /** The sim_kmeans dataflow returning BOTH the final assignment
    * (vec_id, e, cid, cos — cos = dot with the member-mean centroid)
    * AND the centroid frame (cid, ce) it was assigned against —
    * the batch-77 cluster-validity operators consume both. */
  private[operators] def kmeansAssignCents(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val k = 8
    val emb = normalized(s, dir)
    // seed selection: top-k by md5 order (TakeOrderedAndProject —
    // bounded at any corpus size), then rank the k rows
    val seeds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
    val cents0 = seeds
      .withColumn("cid", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
      .select(col("cid").cast("long").as("cid"), col("e").as("ce"))
    // map-side argmax against the collected k×d codebook — same
    // (dot desc, cid asc) rule, no n×k crossJoin/window/shuffle
    def assign(cents: DataFrame): DataFrame =
      Similarity.topCellsByScore(emb, Similarity.collectCodebook(cents),
          1, "cos", Similarity.dot)
        .select(col("vec_id"), col("e"), col("cell").as("cid"), col("cos"))
    val a1 = assign(cents0)
    // centroid update: element-wise member mean per (cluster, dim);
    // the sum folds members in vec_id order (bit-stable, replayed as
    // list_sum(list(v ORDER BY vec_id)) in the oracle), one division
    val cents1 = a1
      .select(col("cid"), col("vec_id"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("aggregate(sort_array(collect_list(struct(vec_id, v))), 0D," +
        " (a, x) -> a + x.v)").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", col("sv") / d(col("n")))
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
        .as("ce"))
    (assign(cents1), cents1)
  }

  private def kmeansAssign(s: SparkSession, dir: String): DataFrame =
    kmeansAssignCents(s, dir)._1
      .select(col("vec_id"), col("cid").as("cluster"),
        round(col("cos"), 6).as("cos"))

  val simKmeans: Q = (s, dir) => kmeansAssign(s, dir).orderBy(col("vec_id"))

  // ---------------------------------------------------------------
  // sim_kmeans_converged — Lloyd's iterated to a FIXED POINT (the
  // real clustering stage SemDeDup / cluster-balanced sampling
  // assume), bounded at 6 assignment passes: assign → (stop if the
  // assignment equals the previous one) → recompute centroids →
  // repeat. Every pass localCheckpoints (the iterative-loop lineage
  // discipline: each iteration reads a materialized frame, not the
  // whole prior dataflow), and the changed-assignment check is one
  // count over a vec_id join of two checkpointed frames. The output
  // carries `iters` (number of assignment passes), so the
  // convergence count itself is oracle-pinned: the DuckDB replay
  // unrolls all 6 passes and picks the first fixed point with the
  // same CASE rule. Scale shape per pass = sim_kmeans's: broadcast
  // k×d codebook scan (corpus never shuffles for assignment), k·dim
  // update groups; the member fold pins summation order for the
  // oracle exactly as sim_kmeans documents (plain avg() at real
  // scale).
  // ---------------------------------------------------------------
  private val KmeansMaxIters = 6

  private def kmeansSeeds(emb: DataFrame, k: Int): DataFrame =
    emb.orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(k)
      .withColumn("cid", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
      .select(col("cid").cast("long").as("cid"), col("e").as("ce"))

  // map-side argmax against the collected k×d codebook — same
  // (dot desc, cid asc) rule, no n×k crossJoin/window/shuffle (the
  // probe put that exchange at ~330 MB per pass at sf0.1)
  private def kmeansAssignPass(emb: DataFrame, cents: DataFrame): DataFrame =
    Similarity.topCellsByScore(emb, Similarity.collectCodebook(cents),
        1, "cos", Similarity.dot)
      .select(col("vec_id"), col("e"), col("cell").as("cid"), col("cos"))

  private def kmeansUpdate(a: DataFrame): DataFrame =
    a.select(col("cid"), col("vec_id"), posexplode(col("e")).as(Seq("pos", "v")))
      .groupBy(col("cid"), col("pos"))
      .agg(expr("aggregate(sort_array(collect_list(struct(vec_id, v))), 0D," +
        " (a, x) -> a + x.v)").as("sv"), count(lit(1)).as("n"))
      .withColumn("m", col("sv") / d(col("n")))
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, m))), x -> x.m)")
        .as("ce"))

  val simKmeansConverged: Q = (s, dir) => kmeansConvergedOf(normalized(s, dir))

  /** DataFrame-level entry (any L2-normalized (vec_id, e) input) —
    * the spec surface for the early-stop branch, which the gate
    * corpus never reaches (it needs ~12 passes; TrainingData4Spec
    * pins a separable fixture that fixes under the cap). */
  def kmeansConvergedOf(emb0: DataFrame): DataFrame = {
    val emb = emb0
    var cents = kmeansSeeds(emb, 8)
    var prev: DataFrame = null
    var iters = 0
    var done = false
    while (!done && iters < KmeansMaxIters) {
      val a = kmeansAssignPass(emb, cents).localCheckpoint(eager = false)
      iters += 1
      if (prev != null) {
        val changed = a.select(col("vec_id"), col("cid"))
          .join(prev.select(col("vec_id"), col("cid").as("pcid")), "vec_id")
          .filter(col("cid") =!= col("pcid")).count()
        done = changed == 0
      }
      prev = a
      if (!done && iters < KmeansMaxIters) cents = kmeansUpdate(a)
    }
    prev.select(col("vec_id"), col("cid").as("cluster"),
        round(col("cos"), 6).as("cos"), lit(iters).cast("long").as("iters"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------
  // sim_cluster_purity — label agreement of the sim_kmeans clusters
  // (the curation QA step after clustering a labeled corpus): per
  // cluster, member count, dominant label (max count, smallest label
  // as tiebreak), and purity = dominant/total — integer counts and
  // one division, exact by construction. Reuses the full kmeans
  // dataflow; the oracle replays it end-to-end.
  // ---------------------------------------------------------------
  val simClusterPurity: Q = (s, dir) => {
    val labels = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"))
    val assigned = kmeansAssign(s, dir).join(labels, "vec_id")
    val perLabel = assigned.groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("c"))
    perLabel
      .groupBy(col("cluster"))
      .agg(sum(col("c")).cast("long").as("n_members"),
        // argmax-by-count with smallest-label tiebreak as a two-phase
        // max(struct): no window, no second shuffle
        max(struct(col("c").as("c"), (-col("label")).as("neg_label"))).as("top"))
      .select(col("cluster"), col("n_members"),
        (-col("top.neg_label")).cast("long").as("dominant_label"),
        (d(col("top.c")) / d(col("n_members"))).as("purity"))
      .orderBy(col("cluster"))
  }

  // ---------------------------------------------------------------
  // e_quantize_int8 — per-dimension scalar quantization to 8-bit
  // codes (FAISS SQ8 shape): corpus pass computes per-dim [min,max],
  // each value maps to bucket floor((v-min)/step) clamped to 255 with
  // step=(max-min)/256, dequantized midpoint reconstruction, per-
  // vector distortion report. Per-dim stats are min/max (order-free
  // ⇒ exactly deterministic); code sums are integer; only the
  // reconstruction-error sum is a float fold, done in dim order.
  // Scale shape: stats are one partial-agg scan (dim-count groups),
  // the quantize pass is map-side against the broadcast 64-row stats
  // table — the corpus never shuffles.
  // ---------------------------------------------------------------
  val eQuantizeInt8: Q = (s, dir) =>
    quantizeInt8Of(Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e")))

  /** DataFrame-level entry (any (vec_id, e: array<double>) input) —
    * the spec surface for the constant-dimension edge. */
  def quantizeInt8Of(emb: DataFrame): DataFrame = {
    val ex = emb.select(col("vec_id"), posexplode(col("e")).as(Seq("pos", "v")))
    val stats = ex.groupBy(col("pos"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .withColumn("step", (col("hi") - col("lo")) / lit(256.0))
    ex.join(broadcast(stats), "pos")
      // a CONSTANT dimension has hi == lo, so step == 0 and
      // (v-lo)/step is 0/0 = NaN; Spark's non-ANSI NaN→long cast
      // would silently yield 0 while an ANSI engine errors — make
      // the degenerate bucket explicit: code 0, and the midpoint
      // reconstruction lo + 0.5·0 = lo = v gives err 0 naturally
      .withColumn("q", when(col("step") === 0d, lit(0L))
        .otherwise(least(lit(255L),
          floor((col("v") - col("lo")) / col("step")).cast("long"))))
      .withColumn("err",
        abs(col("v") - (col("lo") + (d(col("q")) + lit(0.5)) * col("step"))))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("q")).cast("long").as("sum_code"),
        max(col("q")).cast("long").as("max_code"),
        expr("aggregate(sort_array(collect_list(struct(pos, err))), 0D," +
          " (a, x) -> a + x.err)").as("sae"))
      .select(col("vec_id"), col("n_dims"), col("sum_code"), col("max_code"),
        round(col("sae") / d(col("n_dims")), 6).as("mean_abs_err"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------
  // e_pq_codes — product quantization (Jégou et al.; FAISS PQ8x16
  // shape): the 64-dim vector splits into M=8 subspaces of 8 dims,
  // each encoded as its nearest of 16 deterministic md5-sampled
  // sub-centroids (L2, tie → smallest id) — 8 codes × 4 bits ≈ 4
  // bytes per vector, the compression an IVF-PQ index stores. The
  // argmin is a two-phase min(struct(dist, cid)) aggregate (no
  // window); distances are fixed-order zip_with folds (bit-stable).
  // Scale shape: the 128-row codebook broadcasts, the corpus maps
  // through one explode(8)+join pass and shuffles only the 8-rows-
  // per-vector argmin groups.
  // ---------------------------------------------------------------
  val ePqCodes: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // consumed by seeds AND the encode pass
    val subsOf = (df: DataFrame) => df.select(col("vec_id"), col("e"),
      posexplode(transform(sequence(lit(0), lit(7)),
        mm => slice(col("e"), mm * lit(8) + 1, lit(8)))).as(Seq("m", "sub")))
    val seeds = emb
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id")).limit(16)
      .withColumn("cid", row_number().over(
        Grain.bounded(md5(col("vec_id").cast("string")), col("vec_id"))))
    val cent = subsOf(seeds.select(col("cid").cast("long").as("vec_id"), col("e")))
      .select(col("vec_id").as("cid"), col("m"), col("sub").as("ce"))
    val best = subsOf(emb)
      .join(broadcast(cent), "m")
      .withColumn("dist", expr(
        "aggregate(zip_with(sub, ce, (a, b) -> (a - b) * (a - b)), 0D," +
          " (s, v) -> s + v)"))
      .groupBy(col("vec_id"), col("m"))
      .agg(min(struct(col("dist").as("dist"), col("cid").as("cid"))).as("best"))
    best
      .groupBy(col("vec_id"))
      .agg(sum((col("m") + 1) * col("best.cid")).cast("long").as("code_sum"),
        expr("aggregate(sort_array(collect_list(struct(m, best.dist))), 0D," +
          " (a, x) -> a + x.dist)").as("sd"))
      .select(col("vec_id"), col("code_sum"),
        round(col("sd") / lit(64.0), 6).as("mse"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------
  // sim_ivf_pq_search — IVF-PQ approximate nearest neighbor with
  // ADC (asymmetric distance computation): the index layout a real
  // 100 TB ANN deployment serves from (FAISS IVFPQ shape —
  // Jégou et al. 2011). Deterministic build so the oracle replays
  // end-to-end: coarse quantizer = 16 first-by-md5 corpus vectors
  // (L2 argmin, tie → smaller cell); PQ codebook = the NEXT 16
  // vectors in md5 order (ranks 17–32 — the seeds themselves have
  // zero residual), their cell residuals split into M=8 subspaces;
  // every vector stores only (cell, 8 sub-codes). A query probes its
  // nProbe=2 nearest cells, builds a per-cell 8×16 lookup table of
  // sub-distances from its residual, and candidate distance is the
  // Σ over 8 table entries — no candidate vector is ever read at
  // search time.
  //
  // Scale shape: both codebooks broadcast (16 + 128 rows at any
  // corpus size); encoding is one map pass over the corpus (explode
  // M × broadcast argmin, the e_pq_codes plan); the search joins the
  // TINY query LUT (nQueries·nProbe·M·16 rows, broadcast) against
  // codes on (cell, m, code) — the corpus side streams, and the only
  // shuffle is the per-(query, candidate) 8-row sum + top-k. All
  // float reductions are fixed-order zip_with folds or m-sorted
  // folds — bit-stable, replayed exactly in DuckDB.
  // ---------------------------------------------------------------
  // (build/search bodies live in functions.IvfPq since round 11, so
  // the persisted build-once/search-many path — sources.AnnIndex —
  // runs the IDENTICAL dataflow; this entry composes them in-query.)
  val simIvfPqSearch: Q = (s, dir) => {
    val nCells = 16; val m8 = 8; val nProbe = 2; val nQueries = 10; val k = 5
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // consumed by seeds, assignment, and queries
    val idx = graft.functions.IvfPq.build(emb, nCells, m8)
    graft.functions.IvfPq.search(idx, emb.filter(col("vec_id") < nQueries),
      m8, nProbe, k)
  }

  // ---------------------------------------------------------------
  // sim_ann_recall_eval — recall@5 of the IVF index against the
  // brute-force ground truth, per query (the "measure, don't guess"
  // audit every ANN deployment runs before trusting an index): both
  // sides are the registered operators (sim_cosine_ivf,
  // sim_cosine_topk), joined on (query, neighbor). Integer hits and
  // one division — exact; the oracle replays both algorithms as
  // nested subqueries of their own oracle SQL.
  // ---------------------------------------------------------------
  val simAnnRecallEval: Q = (s, dir) => {
    val ivf = Similarity.ivfSampleTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"))
    val bf = Similarity.bruteForceTopK(s, dir, 10, 5)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    ivf.join(bf, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hits"))
      .select(col("query_id"), col("n_returned"), col("n_hits"),
        (d(col("n_hits")) / lit(5.0)).as("recall_at_5"))
      .orderBy(col("query_id"))
  }

  // ---------------------------------------------------------------
  // t_split_contamination — cross-split leakage matrix: after the
  // deterministic md5-nibble train/val/test assignment (the
  // t_split_assign rule), count for every ORDERED split pair how
  // many destination docs share at least one 13-token shingle with
  // the source split, plus the distinct shared-gram count — the
  // audit run before shipping a split layout (eval leakage works in
  // both directions, hence ordered pairs). Inverted-index join over
  // distinct shingles (never a split × split doc cross product):
  // Σ per-shingle postings, the t_decontaminate shape generalized
  // to the full pair matrix. All outputs are integer counts — exact.
  // ---------------------------------------------------------------
  /** Document-frequency cap for the contamination join: a shingle
    * present in more documents than this is boilerplate (license
    * headers, navigation text), not leakage signal — and it is
    * exactly the hot key whose Σ posting² makes the self-join
    * quadratic at corpus scale, so decontamination pipelines drop
    * such n-grams as standard practice. 64 bounds any shingle's pair
    * contribution at 64² while a genuinely leaked passage (df of a
    * few) always survives. The gate corpus's max 13-gram df is 4, so
    * the cap is value-neutral there; its dropping behavior is pinned
    * by the boilerplate fixture in TrainingData4Spec. */
  val ContaminationMaxDf = 64

  val tSplitContamination: Q = (s, dir) =>
    splitContaminationOf(
      Tables.table(s, dir, "documents").select(col("doc_id"), col("text")),
      ContaminationMaxDf)

  /** DataFrame-level entry (any (doc_id, text) input) — the spec
    * surface for the df-cap fixture. */
  /** (doc_id, split, distinct 13-gram) postings under the
    * deterministic md5-nibble split assignment — shared by the
    * capped matrix here and the two-tier full matrix
    * (TrainingData65), which must agree on the gram universe. */
  private[operators] def contaminationGrams(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("c", "d"), "val")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("e", "f"), "test")
          .otherwise("train").as("split"),
        explode(array_distinct(
          graft.functions.TextFunctions.shingles(col("text"), 13))).as("sh"))

  def splitContaminationOf(docsDf: DataFrame, maxDf: Int): DataFrame = {
    val grams = contaminationGrams(docsDf)
      .localCheckpoint(eager = false) // consumed by the df count and both join sides
    // df-cap BEFORE the self-join: grams is one row per (doc,
    // distinct shingle), so count(*) per shingle IS document
    // frequency; the aggregation, the cap join, and the self-join all
    // hash on sh, so the corpus shuffles on that key once and the
    // exchange is reused
    val dfreq = grams.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val kept = grams.join(dfreq.filter(col("df") <= maxDf).select(col("sh")), "sh")
    val a = kept.alias("a"); val b = kept.alias("b")
    a.join(b, col("a.sh") === col("b.sh") && col("a.split") =!= col("b.split"))
      .groupBy(col("a.split").as("split_from"), col("b.split").as("split_to"))
      .agg(countDistinct(col("b.doc_id")).as("n_leaky_docs"),
        countDistinct(col("a.sh")).as("n_shared_grams"))
      .orderBy(col("split_from"), col("split_to"))
  }

  // ---------------------------------------------------------------
  // sim_matryoshka_recall — dimension-truncation audit: recall@5 of
  // brute-force cosine over the FIRST 16 dimensions against the full
  // 64-dim ground truth, per query. The go/no-go measurement before
  // serving truncated (Matryoshka-style) embeddings — if prefix
  // recall holds, the ANN index stores a quarter of the bytes. Both
  // sides are the exact brute-force scan (the deliberate baseline,
  // see sim_cosine_topk); integer hits + one division.
  // ---------------------------------------------------------------
  val simMatryoshkaRecall: Q = (s, dir) => {
    def topk(prefixDim: Option[Int]): DataFrame = {
      val base = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.toDoubleArr(col("embedding")).as("e0"))
        .withColumn("e",
          prefixDim.map(p => slice(col("e0"), 1, p)).getOrElse(col("e0")))
      val q = broadcast(base.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("e").as("qe")))
      q.join(base.select(col("vec_id").as("neighbor_id"), col("e")),
          col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          Similarity.cosine(col("qe"), col("e")).as("cos"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("query_id"))
          .orderBy(desc("cos"), col("neighbor_id"))))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("neighbor_id"))
    }
    topk(Some(16))
      .join(topk(None).withColumn("hit", lit(1L)),
        Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_returned"),
        sum(coalesce(col("hit"), lit(0L))).cast("long").as("n_hits"))
      .select(col("query_id"), col("n_returned"), col("n_hits"),
        (d(col("n_hits")) / lit(5.0)).as("recall_at_5"))
      .orderBy(col("query_id"))
  }

  // ---------------------------------------------------------------
  // t_k_anonymity — re-identification risk audit over the quasi-
  // identifier tuple (lang, source, 100-char length bucket): a
  // document in a QI group smaller than k=5 is re-identifiable from
  // its metadata alone (Sweeney's k-anonymity, the standard release
  // gate for published corpora). The output is the per-(lang,
  // source) ROLLUP — group counts, risky-group counts, documents at
  // risk, risk share — not the risky groups themselves (publishing
  // the small groups would be the leak the audit exists to prevent).
  // Scale shape: two stacked aggregations, both map-side combining
  // (QI cardinality ≪ corpus), output bounded by lang × source.
  // Integer counts + one division — exact.
  // ---------------------------------------------------------------
  val tKAnonymity: Q = (s, dir) => {
    val k = 5
    val g = Tables.table(s, dir, "documents")
      .groupBy(col("lang"), col("source"),
        expr("CAST(n_chars AS BIGINT) div 100").as("len_bucket"))
      .agg(count(lit(1)).as("n"))
    g.groupBy(col("lang"), col("source"))
      .agg(sum(col("n")).cast("long").as("n_docs"),
        count(lit(1)).as("n_buckets"),
        sum(when(col("n") < k, 1L).otherwise(0L)).cast("long")
          .as("n_risky_buckets"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).cast("long")
          .as("n_docs_at_risk"))
      .select(col("lang"), col("source"), col("n_docs"), col("n_buckets"),
        col("n_risky_buckets"), col("n_docs_at_risk"),
        (d(col("n_docs_at_risk")) / d(col("n_docs"))).as("risk_share"))
      .orderBy(col("lang"), col("source"))
  }

  // ---------------------------------------------------------------
  // t_oov_rate — out-of-vocabulary rate per split against the TRAIN
  // split's top-16 token vocabulary (count desc, token asc — a
  // total order, so the cutoff is deterministic): the tokenizer-prep
  // metric that decides whether a vocab generalizes to held-out
  // text. Scale shape: the vocab is a TakeOrderedAndProject over the
  // train token counts and broadcasts to the token stream — the
  // corpus shuffles once for the count, never for the membership
  // probe. Counts integer; the rate is one double division.
  // ---------------------------------------------------------------
  val tOovRate: Q = (s, dir) => {
    import graft.functions.{TextFunctions => TF}
    val toks = Tables.table(s, dir, "documents")
      .select(
        when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("c", "d"), "val")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1).isin("e", "f"), "test")
          .otherwise("train").as("split"),
        explode(TF.tokens(col("text"))).as("tok"))
    val vocab = toks.filter(col("split") === "train")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
            // 16 of this corpus's 31 distinct tokens — proportionate to a
      // real 32k-of-millions vocab, and small enough that the OOV
      // path is actually exercised (top-1000 would cover everything)
      .orderBy(desc("c"), col("tok")).limit(16)
      .select(col("tok"), lit(true).as("in_vocab"))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L)).cast("long").as("n_oov"))
      .select(col("split"), col("n_tokens"), col("n_oov"),
        (d(col("n_oov")) / d(col("n_tokens"))).as("oov_rate"))
      .orderBy(col("split"))
  }

  // ---------------------------------------------------------------
  // ev_peak_concurrency — peak concurrent activity per day via the
  // classic +1/−1 interval sweep: each event opens a 5-minute
  // activity window ([ts, ts+5min), half-open, so closes sort before
  // opens at the same instant), deltas sweep in global time order
  // through Ranking.withGlobalCumSums — the TWO-PHASE cumulative sum
  // (range partition + P carry rows + partition-local window), so
  // the corpus-sized sweep never funnels through a single reducer —
  // then per-day max of the running count. Integer-exact: rows tied
  // on (t, delta) produce the same prefix multiset in any order.
  // The ops-dashboard staple (peak sessions / connections / load).
  // ---------------------------------------------------------------
  val evPeakConcurrency: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events").select(col("event_id"), col("ts"))
    val deltas = ev
      .select(col("event_id"), col("ts").as("t"), lit(1L).as("delta"))
      .unionAll(ev.select(col("event_id"),
        (col("ts") + expr("INTERVAL 5 MINUTES")).as("t"), lit(-1L).as("delta")))
    Ranking.withGlobalCumSums(deltas, Seq("delta" -> "active"),
        col("t"), col("delta"), col("event_id"))
      .groupBy(to_date(col("t")).as("day"))
      .agg(max(col("active")).cast("long").as("peak_active"),
        sum(when(col("delta") === 1L, 1L).otherwise(0L)).cast("long").as("n_opens"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // j_interval_overlap — interval-overlap join, DAY-BUCKETED (the
  // standard scale technique for genomic/telemetry range joins):
  // per-(user, day) activity intervals [first event, last event],
  // overlap theta only ever inside one day bucket — pair work is
  // Σ per-day active-user², never corpus². On this dense synthetic
  // corpus every user pair overlaps daily, so the CONTRACT is the
  // per-day aggregate (pair count, longest overlap, its argmax pair
  // via min(struct) with the (u1,u2) tiebreak), keeping the output
  // bounded by day count while the join itself is the full bucketed
  // interval meet. Overlap is exact integer microseconds.
  // ---------------------------------------------------------------
  val jIntervalOverlap: Q = (s, dir) => {
    val iv = Tables.table(s, dir, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
    val a = iv.alias("a"); val b = iv.alias("b")
    a.join(b, col("a.day") === col("b.day") &&
        col("a.user_id") < col("b.user_id") &&
        col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
      .select(col("a.day").as("day"),
        col("a.user_id").as("u1"), col("b.user_id").as("u2"),
        (expr("unix_micros(least(a.e, b.e))") -
          expr("unix_micros(greatest(a.s, b.s))")).as("overlap_us"))
      .filter(col("overlap_us") >= 600L * 1000000L)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_pairs"),
        min(struct((-col("overlap_us")).as("neg"), col("u1").as("u1"),
          col("u2").as("u2"))).as("top"))
      .select(col("day"), col("n_pairs"),
        (-col("top.neg")).cast("long").as("max_overlap_us"),
        col("top.u1").cast("long").as("top_u1"),
        col("top.u2").cast("long").as("top_u2"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // ev_rfm_segments — RFM (recency / frequency / monetary) customer
  // segmentation, the classic lifecycle-marketing rollup: per-user
  // aggregates, global quartile per dimension, users bucketed into
  // "R{1-4}F{1-4}M{1-4}" segments. Quartiles come from
  // Ranking.withGlobalRank — the TWO-PHASE global row_number (range
  // partition + per-partition carries), never a single-partition
  // ntile window, so the ranking survives a billion-user corpus.
  // The quartile rule is explicit integer arithmetic
  // ((4·(rank−1)) div n + 1) rather than SQL NTILE, so the oracle
  // replays the same formula instead of NTILE's engine-specific
  // uneven-bucket semantics. The per-user monetary sum folds in
  // event_id order (repo float policy); recency anchors on the
  // corpus max day (broadcast 1-row aggregate).
  // ---------------------------------------------------------------
  val evRfmSegments: Q = (s, dir) => {
    val ev = Tables.table(s, dir, "events")
    val byUser = ev.groupBy(col("user_id"))
      .agg(max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("frequency"),
        expr("aggregate(sort_array(collect_list(struct(event_id, value))), 0D," +
          " (a, x) -> a + x.value)").as("monetary"))
    val anchor = ev.agg(max(to_date(col("ts"))).as("now_day"))
    val base = byUser.crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("now_day"), col("last_day")).cast("long"))
      .localCheckpoint(eager = false) // three rank passes + the rollup read it
    val n = base.count()
    def quartile(rankCol: String): Column =
      expr(s"CAST((4 * ($rankCol - 1)) div $n AS BIGINT) + 1")
    val ranked = Ranking.withGlobalRank(
      Ranking.withGlobalRank(
        Ranking.withGlobalRank(base,
          "rrk", col("recency_days"), col("user_id")),
        "frk", col("frequency").desc, col("user_id")),
      "mrk", col("monetary").desc, col("user_id"))
    ranked
      .withColumn("segment", concat(
        lit("R"), quartile("rrk").cast("string"),
        lit("F"), quartile("frk").cast("string"),
        lit("M"), quartile("mrk").cast("string")))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("recency_days")).cast("long").as("sum_rec"),
        sum(col("frequency")).cast("long").as("total_events"))
      .select(col("segment"), col("n_users"),
        (d(col("sum_rec")) / d(col("n_users"))).as("avg_recency_days"),
        col("total_events"))
      .orderBy(col("segment"))
  }

  // ---------------------------------------------------------------
  // t_ngram_novelty — per-document novelty: the fraction of a doc's
  // distinct 5-gram shingles whose FIRST corpus occurrence (min
  // doc_id) is this document. The curation metric behind "is the
  // tail of this source still contributing new content, or
  // restating the head" — falling novelty marks the point where a
  // crawl stops paying for itself. Scale shape: one shuffle on the
  // gram (min-doc aggregate), the join back hashes on the same key
  // (exchange reuse), then a doc-keyed count — all integers plus
  // one division.
  // ---------------------------------------------------------------
  val tNgramNovelty: Q = (s, dir) => {
    val grams = Tables.table(s, dir, "documents")
      .select(col("doc_id"), explode(array_distinct(
        graft.functions.TextFunctions.shingles(col("text"), 5))).as("g"))
      .localCheckpoint(eager = false) // consumed by the min-doc agg and the join
    val first = grams.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        (d(col("n_novel")) / d(col("n_grams"))).as("novelty"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // w_brown_trend — Brown's linear (double) exponential smoothing of
  // daily revenue, α=0.3, restarting each year: s1 = EWMA(x),
  // s2 = EWMA(s1), level = 2·s1 − s2, trend = (α/(1−α))(s1 − s2),
  // one-step forecast = level + trend — the trend-aware forecast one
  // notch above w_ewma_revenue (which tracks level only and lags any
  // trending series). Two CHAINED SCALAR folds, each the proven
  // w_ewma_revenue order-pinned pattern (day-ordered prefix list +
  // left fold seeded on the first element) — deliberately NOT a
  // struct-accumulator fold: DuckDB 1.0's list_reduce evaluates
  // multi-field struct lambdas by mutating the accumulator field by
  // field (a later field sees the earlier field's NEW value), so a
  // coupled (level, trend) state would silently diverge. Raw double
  // output, un-rounded (the w_ewma precedent: rounding ~1e7
  // magnitudes near half-boundaries is the hazard, not the pinned
  // chain). Scale: folds run over DAYS per year partition (≤366),
  // never the row stream — the heavy input reduces through the
  // exact-decimal daily aggregate first.
  // ---------------------------------------------------------------
  val wBrownTrend: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("revenue"))
    val w = Window.partitionBy(year(col("day"))).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("arr", collect_list(col("revenue")).over(w))
      .withColumn("s1", expr("aggregate(slice(arr, 2, size(arr) - 1), " +
        "element_at(arr, 1), (a, x) -> a * 0.7 + 0.3 * x)"))
      .withColumn("s1arr", collect_list(col("s1")).over(w))
      .withColumn("s2", expr("aggregate(slice(s1arr, 2, size(s1arr) - 1), " +
        "element_at(s1arr, 1), (a, x) -> a * 0.7 + 0.3 * x)"))
      .withColumn("level", lit(2) * col("s1") - col("s2"))
      .withColumn("trend", (col("s1") - col("s2")) * lit(3.0) / lit(7.0))
      .select(col("day"), col("revenue"), col("level"), col("trend"),
        (col("level") + col("trend")).as("forecast_next"))
      .orderBy(col("day"))
  }

  // ---------------------------------------------------------------
  // j_table_diff — snapshot reconciliation (the data-diff staple for
  // pipeline regression testing): key-level diff of two table
  // versions into added / removed / changed / unchanged counts plus
  // per-column change counts. The "next" snapshot is a deterministic
  // simulated drift of orders (every 89th key deleted, every 97th
  // price bumped by an exact DECIMAL 1.00, every 83rd status
  // flipped, every 101st re-inserted under a shifted key), so the
  // diff exercises all four statuses and both compared columns.
  // Scale shape: ONE full-outer join hashed on the key; every
  // column comparison is a map-side expression above it — at 100 TB
  // this is the cheapest possible reconciliation (no sort, no
  // per-column joins). Money compares as exact DECIMAL(18,2).
  // ---------------------------------------------------------------
  val jTableDiff: Q = (s, dir) => {
    val base = Tables.table(s, dir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("CAST(o_totalprice AS DECIMAL(18,2))").as("price"),
        col("o_orderstatus").as("status"))
    val next = base
      .filter(col("k") % 89 =!= 0)
      .withColumn("price",
        when(col("k") % 97 === 0, col("price") + expr("CAST(1.00 AS DECIMAL(18,2))"))
          .otherwise(col("price")))
      .withColumn("status",
        when(col("k") % 83 === 0, lit("X")).otherwise(col("status")))
      .unionByName(base.filter(col("k") % 101 === 0)
        .select((col("k") + lit(100000000L)).as("k"), col("price"), col("status")))
    val a = base.select(col("k"), col("price").as("p0"), col("status").as("s0"))
    val b = next.select(col("k"), col("price").as("p1"), col("status").as("s1"))
    a.join(b, Seq("k"), "full_outer")
      .withColumn("st",
        when(col("p0").isNull, "added")
          .when(col("p1").isNull, "removed")
          .when(col("p0") =!= col("p1") || col("s0") =!= col("s1"), "changed")
          .otherwise("unchanged"))
      .groupBy(col("st").as("status"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("p0").isNotNull && col("p1").isNotNull &&
          col("p0") =!= col("p1"), 1L).otherwise(0L)).cast("long")
          .as("n_price_changed"),
        sum(when(col("s0").isNotNull && col("s1").isNotNull &&
          col("s0") =!= col("s1"), 1L).otherwise(0L)).cast("long")
          .as("n_status_changed"))
      .orderBy(col("status"))
  }

  // ---------------------------------------------------------------
  // t_contrastive_pairs — contrastive training-triple mining over
  // the embedding corpus: for every anchor that has one, its best
  // POSITIVE (highest-cosine same-label neighbor at cos ≥ 0.4 — the
  // near-dup machinery repurposed as pair supervision) and its
  // HARDEST NEGATIVE (highest-cosine different-label member of the
  // anchor's IVF cell — "hard" because it is the closest thing that
  // is provably not a duplicate), plus the margin between them — the
  // (anchor, positive, hard-negative) generator an embedding-model
  // fine-tune consumes. Scale shape: positives are label-blocked
  // pairs, negatives are cell-blocked pairs (the deterministic
  // md5-seeded 16-cell quantizer from sim_semdedup) — never a corpus
  // cross product; both argmaxes are two-phase max(struct), no
  // windows. Cosines are the bit-stable fold; output rounds to 6.
  // ---------------------------------------------------------------
  val tContrastivePairs: Q = (s, dir) => {
    val emb = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        Similarity.toDoubleArr(col("embedding")).as("e"))
      .localCheckpoint(eager = false) // seeds + both pair joins read it
    // best positive per anchor: label-blocked, cos >= 0.4
    val a = emb.select(col("vec_id").as("aid"), col("label").as("alab"),
      col("e").as("ae"))
    val posB = emb.select(col("vec_id").as("bid"), col("label").as("blab"),
      col("e").as("be"))
    val pos = a.join(posB, col("alab") === col("blab") &&
        col("aid") =!= col("bid"))
      .withColumn("cos", Similarity.cosine(col("ae"), col("be")))
      .filter(col("cos") >= 0.4)
      .groupBy(col("aid"))
      .agg(max(struct(col("cos").as("cos"), (-col("bid")).as("nb"))).as("p"))
      .select(col("aid"), (-col("p.nb")).cast("long").as("positive_id"),
        col("p.cos").as("pos_cos"))
    // deterministic 16-cell quantizer — the shared kmeansSeeds rule
    val cents = kmeansSeeds(emb.select(col("vec_id"), col("e")), 16)
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("cc", Similarity.cosine(col("e"), col("ce")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(desc("cc"), col("cid"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("label"), col("e"), col("cid"))
    // hardest negative per anchor: same cell, different label
    val na = assigned.select(col("vec_id").as("aid"), col("label").as("alab"),
      col("e").as("ae"), col("cid"))
    val nb = assigned.select(col("vec_id").as("bid"), col("label").as("blab"),
      col("e").as("be"), col("cid"))
    val neg = na.join(nb, Seq("cid"))
      .filter(col("alab") =!= col("blab"))
      .withColumn("cos", Similarity.cosine(col("ae"), col("be")))
      .groupBy(col("aid"))
      .agg(max(struct(col("cos").as("cos"), (-col("bid")).as("nb"))).as("n"))
      .select(col("aid"), (-col("n.nb")).cast("long").as("negative_id"),
        col("n.cos").as("neg_cos"))
    pos.join(neg, "aid")
      .select(col("aid").as("anchor_id"), col("positive_id"),
        col("negative_id"), round(col("pos_cos"), 6).as("pos_cos"),
        round(col("neg_cos"), 6).as("neg_cos"),
        round(col("pos_cos") - col("neg_cos"), 6).as("margin"))
      .orderBy(col("anchor_id"))
  }

  // ---------------------------------------------------------------
  // w_cusum_drift — one-sided CUSUM drift detection on daily
  // revenue (Page 1954), restarting each year: s_t = max(0,
  // s_{t-1} + (x_t − μ) − k) with μ the year's exact-decimal daily
  // mean, slack k = 0.05·μ, alarm at s > h = 0.5·μ — the
  // change-point monitor that fires on a sustained shift where a
  // fixed threshold fires on one spike. Sequential by definition, so
  // the float chain gets the w_ewma_revenue treatment: day-ordered
  // prefix list + one pinned left fold (greatest(0, …) per step),
  // replayed in DuckDB with the list_prepend-seeded list_reduce.
  // μ is exact (decimal sum / integer count, one division); the
  // per-year stats JOIN on the year key — no broadcast-scalar cross
  // join. Folds run over days per year partition (≤366). Raw double
  // cusum (the EWMA rounding precedent); the alarm flag is the
  // integer-like contract column.
  // ---------------------------------------------------------------
  val wCusumDrift: Q = (s, dir) => {
    val daily = Tables.table(s, dir, "orders")
      .groupBy(col("o_orderdate").as("day"))
      .agg(expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)")
        .as("revenue"))
      .withColumn("yr", year(col("day")))
    val stats = daily.groupBy(col("yr"))
      .agg((expr("CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)") /
        d(count(lit(1)))).as("mu"))
    val w = Window.partitionBy(col("yr")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(stats, "yr")
      .withColumn("arr", collect_list(col("revenue")).over(w))
      .withColumn("cusum", expr(
        "aggregate(arr, 0D, (s, x) -> greatest(0D, s + x - mu - 0.05 * mu))"))
      .select(col("day"), col("revenue"), col("cusum"),
        (col("cusum") > lit(0.5) * col("mu")).as("alarm"))
      .orderBy(col("day"))
  }

  val queries: Map[String, Q] = Map(
    "w_cusum_drift" -> wCusumDrift,
    "t_contrastive_pairs" -> tContrastivePairs,
    "j_table_diff" -> jTableDiff,
    "ev_rfm_segments" -> evRfmSegments,
    "t_ngram_novelty" -> tNgramNovelty,
    "w_brown_trend" -> wBrownTrend,
    "j_interval_overlap" -> jIntervalOverlap,
    "ev_peak_concurrency" -> evPeakConcurrency,
    "sim_kmeans" -> simKmeans,
    "sim_kmeans_converged" -> simKmeansConverged,
    "sim_ivf_pq_search" -> simIvfPqSearch,
    "sim_ann_recall_eval" -> simAnnRecallEval,
    "sim_matryoshka_recall" -> simMatryoshkaRecall,
    "sim_cluster_purity" -> simClusterPurity,
    "e_quantize_int8" -> eQuantizeInt8,
    "e_pq_codes" -> ePqCodes,
    "dedup_containment" -> ((s, dir) => Dedup.containmentPairs(s, dir)),
    "t_split_contamination" -> tSplitContamination,
    "t_oov_rate" -> tOovRate,
    "t_k_anonymity" -> tKAnonymity)

  /** DuckDB dot product — bit-identical twin of Similarity.dot
    * (list_sum folds the list sequentially, matching Spark's
    * aggregate left-fold; pinned by the sim_* oracle family). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))"

  /** DuckDB cosine — the Similarity.cosine twin (same fold order). */
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Shared kmeans replay: normalize → md5 seeds → assign → mean
    * update (member fold in vec_id order) → re-assign. Exposed to
    * the batch-77 cluster-validity oracles (Davies–Bouldin /
    * Calinski–Harabasz replay the same dataflow: CTEs `a2` = final
    * assignment, `c1` = its centroids, `e` = normalized corpus). */
  private[operators] val kmeansCte: String =
    s"""e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id,
       |         list_transform(emb, x -> x / sqrt(list_sum(
       |           list_transform(range(1, len(emb) + 1), i -> emb[i] * emb[i])))) AS e
       |  FROM e0),
       |c0 AS (
       |  SELECT CAST(rn AS BIGINT) AS cid, e AS ce
       |  FROM (SELECT vec_id, e,
       |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |        FROM e)
       |  WHERE rn <= 8),
       |a1 AS (
       |  SELECT vec_id, e, cid, cos FROM (
       |    SELECT e.vec_id, e.e, c.cid, ${dotSql("e.e", "c.ce")} AS cos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${dotSql("e.e", "c.ce")} DESC, c.cid) AS rk
       |    FROM e CROSS JOIN c0 c) WHERE rk = 1),
       |ex AS (
       |  SELECT vec_id, cid, unnest(e) AS v,
       |         unnest(range(1, len(e) + 1)) AS pos
       |  FROM a1),
       |c1 AS (
       |  SELECT cid, list(m ORDER BY pos) AS ce
       |  FROM (SELECT cid, pos,
       |               list_sum(list(v ORDER BY vec_id)) / count(*) AS m
       |        FROM ex GROUP BY cid, pos)
       |  GROUP BY cid),
       |a2 AS (
       |  SELECT vec_id, cid, cos FROM (
       |    SELECT e.vec_id, c.cid, ${dotSql("e.e", "c.ce")} AS cos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${dotSql("e.e", "c.ce")} DESC, c.cid) AS rk
       |    FROM e CROSS JOIN c1 c) WHERE rk = 1)""".stripMargin

  /** Unrolled fixed-point replay for sim_kmeans_converged: all 6
    * assignment passes as CTEs, the first i≥2 with a_i ≡ a_{i-1}
    * selected by the same first-match CASE rule the engine's early
    * stop applies (the engine can never stop at pass 1 — there is no
    * previous assignment to compare). */
  private val kmeansConvergedSql: String = {
    val passes = (1 to KmeansMaxIters).map { i =>
      val assign =
        s"""a$i AS (
           |  SELECT vec_id, e, cid, cos FROM (
           |    SELECT e.vec_id, e.e, c.cid, ${dotSql("e.e", "c.ce")} AS cos,
           |           row_number() OVER (PARTITION BY e.vec_id
           |             ORDER BY ${dotSql("e.e", "c.ce")} DESC, c.cid) AS rk
           |    FROM e CROSS JOIN c${i - 1} c) WHERE rk = 1)""".stripMargin
      val update = if (i >= KmeansMaxIters) "" else
        s""",
           |c$i AS (
           |  SELECT cid, list(m ORDER BY pos) AS ce
           |  FROM (SELECT cid, pos,
           |               list_sum(list(v ORDER BY vec_id)) / count(*) AS m
           |        FROM (SELECT vec_id, cid, unnest(e) AS v,
           |                     unnest(range(1, len(e) + 1)) AS pos
           |              FROM a$i)
           |        GROUP BY cid, pos)
           |  GROUP BY cid)""".stripMargin
      assign + update
    }.mkString(",\n")
    val chgCases = (2 to KmeansMaxIters - 1).map { i =>
      s"""    WHEN (SELECT count(*) FROM a$i x JOIN a${i - 1} y USING (vec_id)
         |          WHERE x.cid <> y.cid) = 0 THEN $i""".stripMargin
    }.mkString("\n")
    val cidCase = (2 to KmeansMaxIters - 1)
      .map(i => s"WHEN $i THEN a$i.cid").mkString(" ")
    val cosCase = (2 to KmeansMaxIters - 1)
      .map(i => s"WHEN $i THEN a$i.cos").mkString(" ")
    val joins = (2 to KmeansMaxIters)
      .map(i => s"JOIN a$i USING (vec_id)").mkString(" ")
    s"""WITH e0 AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |e AS (
       |  SELECT vec_id,
       |         list_transform(emb, x -> x / sqrt(list_sum(
       |           list_transform(range(1, len(emb) + 1), i -> emb[i] * emb[i])))) AS e
       |  FROM e0),
       |c0 AS (
       |  SELECT CAST(rn AS BIGINT) AS cid, e AS ce
       |  FROM (SELECT vec_id, e,
       |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |        FROM e)
       |  WHERE rn <= 8),
       |$passes,
       |it AS (
       |  SELECT CASE
       |$chgCases
       |    ELSE $KmeansMaxIters END AS iters)
       |SELECT a1.vec_id,
       |       CAST(CASE it.iters $cidCase ELSE a$KmeansMaxIters.cid END AS BIGINT) AS cluster,
       |       round(CASE it.iters $cosCase ELSE a$KmeansMaxIters.cos END, 6) AS cos,
       |       CAST(it.iters AS BIGINT) AS iters
       |FROM a1 $joins CROSS JOIN it
       |ORDER BY a1.vec_id""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "sim_kmeans_converged" -> kmeansConvergedSql,
    "w_cusum_drift" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |d2 AS (SELECT day, revenue, year(day) AS yr FROM daily),
        |st AS (
        |  SELECT yr, CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS mu
        |  FROM d2 GROUP BY 1),
        |c AS (
        |  SELECT d2.day, d2.revenue, st.mu,
        |         list(d2.revenue) OVER (PARTITION BY d2.yr ORDER BY d2.day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
        |  FROM d2 JOIN st USING (yr)),
        |f AS (
        |  SELECT day, revenue, mu,
        |         list_reduce(list_prepend(CAST(0 AS DOUBLE), arr),
        |           (s, x) -> greatest(CAST(0 AS DOUBLE),
        |                              s + x - mu - 0.05 * mu)) AS cusum
        |  FROM c)
        |SELECT day, revenue, cusum, cusum > 0.5 * mu AS alarm
        |FROM f ORDER BY day""".stripMargin,
    "t_contrastive_pairs" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(label AS BIGINT) AS label,
         |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         |  FROM embeddings),
         |pos AS (
         |  SELECT aid, bid AS positive_id, cos AS pos_cos FROM (
         |    SELECT a.vec_id AS aid, b.vec_id AS bid,
         |           ${cosSql("a.e", "b.e")} AS cos,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY ${cosSql("a.e", "b.e")} DESC, b.vec_id) AS rk
         |    FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id
         |    WHERE ${cosSql("a.e", "b.e")} >= 0.4) WHERE rk = 1),
         |c0 AS (
         |  SELECT CAST(rn AS BIGINT) AS cid, e AS ce
         |  FROM (SELECT vec_id, e,
         |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
         |        FROM e)
         |  WHERE rn <= 16),
         |asg AS (
         |  SELECT vec_id, label, e, cid FROM (
         |    SELECT v.vec_id, v.label, v.e, c.cid,
         |           row_number() OVER (PARTITION BY v.vec_id
         |             ORDER BY ${cosSql("v.e", "c.ce")} DESC, c.cid) AS rk
         |    FROM e v CROSS JOIN c0 c) WHERE rk = 1),
         |neg AS (
         |  SELECT aid, bid AS negative_id, cos AS neg_cos FROM (
         |    SELECT a.vec_id AS aid, b.vec_id AS bid,
         |           ${cosSql("a.e", "b.e")} AS cos,
         |           row_number() OVER (PARTITION BY a.vec_id
         |             ORDER BY ${cosSql("a.e", "b.e")} DESC, b.vec_id) AS rk
         |    FROM asg a JOIN asg b ON a.cid = b.cid AND a.label <> b.label)
         |  WHERE rk = 1)
         |SELECT p.aid AS anchor_id, p.positive_id, n.negative_id,
         |       round(p.pos_cos, 6) AS pos_cos, round(n.neg_cos, 6) AS neg_cos,
         |       round(p.pos_cos - n.neg_cos, 6) AS margin
         |FROM pos p JOIN neg n ON p.aid = n.aid
         |ORDER BY anchor_id""".stripMargin,
    "j_table_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |         o_orderstatus AS status
        |  FROM orders),
        |nxt AS (
        |  SELECT k,
        |         CASE WHEN k % 97 = 0 THEN price + CAST(1.00 AS DECIMAL(18,2))
        |              ELSE price END AS price,
        |         CASE WHEN k % 83 = 0 THEN 'X' ELSE status END AS status
        |  FROM base WHERE k % 89 <> 0
        |  UNION ALL
        |  SELECT k + 100000000, price, status FROM base WHERE k % 101 = 0),
        |d AS (
        |  SELECT coalesce(a.k, b.k) AS k, a.price AS p0, a.status AS s0,
        |         b.price AS p1, b.status AS s1
        |  FROM base a FULL OUTER JOIN nxt b ON a.k = b.k)
        |SELECT CASE WHEN p0 IS NULL THEN 'added'
        |            WHEN p1 IS NULL THEN 'removed'
        |            WHEN p0 <> p1 OR s0 <> s1 THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(CASE WHEN p0 IS NOT NULL AND p1 IS NOT NULL
        |                      AND p0 <> p1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_price_changed,
        |       CAST(sum(CASE WHEN s0 IS NOT NULL AND s1 IS NOT NULL
        |                      AND s0 <> s1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_status_changed
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "ev_rfm_segments" ->
      """WITH u AS (
        |  SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
        |         count(*) AS frequency,
        |         list_sum(list(value ORDER BY event_id)) AS monetary
        |  FROM events GROUP BY 1),
        |a AS (SELECT max(CAST(ts AS DATE)) AS now_day FROM events),
        |b AS (
        |  SELECT u.*, date_diff('day', last_day, now_day) AS recency_days
        |  FROM u CROSS JOIN a),
        |nn AS (SELECT count(*) AS n FROM b),
        |rk AS (
        |  SELECT b.*,
        |         row_number() OVER (ORDER BY recency_days, user_id) AS rrk,
        |         row_number() OVER (ORDER BY frequency DESC, user_id) AS frk,
        |         row_number() OVER (ORDER BY monetary DESC, user_id) AS mrk
        |  FROM b),
        |seg AS (
        |  SELECT 'R' || CAST((4 * (rrk - 1)) // nn.n + 1 AS VARCHAR)
        |      || 'F' || CAST((4 * (frk - 1)) // nn.n + 1 AS VARCHAR)
        |      || 'M' || CAST((4 * (mrk - 1)) // nn.n + 1 AS VARCHAR) AS segment,
        |         recency_days, frequency
        |  FROM rk CROSS JOIN nn)
        |SELECT segment, CAST(count(*) AS BIGINT) AS n_users,
        |       CAST(sum(recency_days) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |         AS avg_recency_days,
        |       CAST(sum(frequency) AS BIGINT) AS total_events
        |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin,
    "w_brown_trend" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |  FROM orders GROUP BY 1),
        |c1 AS (
        |  SELECT day, revenue,
        |         list(revenue) OVER (PARTITION BY year(day) ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
        |  FROM daily),
        |c2 AS (
        |  SELECT day, revenue,
        |         list_reduce(arr, (a, x) -> a * 0.7 + 0.3 * x) AS s1
        |  FROM c1),
        |c3 AS (
        |  SELECT day, revenue, s1,
        |         list(s1) OVER (PARTITION BY year(day) ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s1arr
        |  FROM c2),
        |c4 AS (
        |  SELECT day, revenue, s1,
        |         list_reduce(s1arr, (a, x) -> a * 0.7 + 0.3 * x) AS s2
        |  FROM c3)
        |SELECT day, revenue,
        |       2 * s1 - s2 AS level,
        |       (s1 - s2) * 3.0 / 7.0 AS trend,
        |       (2 * s1 - s2) + (s1 - s2) * 3.0 / 7.0 AS forecast_next
        |FROM c4 ORDER BY day""".stripMargin,
    "t_ngram_novelty" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(shingles)) AS g
        |  FROM (SELECT doc_id,
        |               CASE WHEN len(toks) < 5 THEN [text]
        |                    ELSE list_transform(range(1, len(toks) - 3),
        |                           i -> array_to_string(toks[i:i+4], ' '))
        |               END AS shingles
        |        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |              FROM documents))),
        |f AS (SELECT g, min(doc_id) AS first_doc FROM g GROUP BY 1)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_novel,
        |       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
        |         AS DOUBLE) / CAST(count(*) AS DOUBLE) AS novelty
        |FROM g JOIN f USING (g)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // recall eval: both registered algorithms replayed as nested
    // subqueries of their own oracle SQL, joined on (query, neighbor)
    "sim_ann_recall_eval" ->
      s"""WITH ivf AS (SELECT * FROM (
         |${TrainingData.oracles("sim_cosine_ivf")}
         |)),
         |bf AS (SELECT * FROM (
         |${TrainingData.oracles("sim_cosine_topk")}
         |))
         |SELECT i.query_id, CAST(count(*) AS BIGINT) AS n_returned,
         |       CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS BIGINT) AS n_hits,
         |       CAST(sum(CASE WHEN b.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |         AS DOUBLE) / 5.0 AS recall_at_5
         |FROM ivf i LEFT JOIN bf b
         |  ON i.query_id = b.query_id AND i.neighbor_id = b.neighbor_id
         |GROUP BY i.query_id ORDER BY i.query_id""".stripMargin,
    "sim_matryoshka_recall" ->
      """WITH e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |full_rk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * n.e[i]))
        |               / (sqrt(list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * q.e[i])))
        |                  * sqrt(list_sum(list_transform(range(1, len(n.e) + 1), i -> n.e[i] * n.e[i]))))
        |             DESC, n.vec_id) AS rk
        |    FROM e0 q CROSS JOIN e0 n
        |    WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id) WHERE rk <= 5),
        |pre AS (SELECT vec_id, e[1:16] AS e FROM e0),
        |pre_rk AS (
        |  SELECT query_id, neighbor_id FROM (
        |    SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
        |           row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |             list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * n.e[i]))
        |               / (sqrt(list_sum(list_transform(range(1, len(q.e) + 1), i -> q.e[i] * q.e[i])))
        |                  * sqrt(list_sum(list_transform(range(1, len(n.e) + 1), i -> n.e[i] * n.e[i]))))
        |             DESC, n.vec_id) AS rk
        |    FROM pre q CROSS JOIN pre n
        |    WHERE q.vec_id < 10 AND n.vec_id <> q.vec_id) WHERE rk <= 5)
        |SELECT p.query_id, CAST(count(*) AS BIGINT) AS n_returned,
        |       CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_hits,
        |       CAST(sum(CASE WHEN f.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
        |         AS DOUBLE) / 5.0 AS recall_at_5
        |FROM pre_rk p LEFT JOIN full_rk f
        |  ON p.query_id = f.query_id AND p.neighbor_id = f.neighbor_id
        |GROUP BY p.query_id ORDER BY p.query_id""".stripMargin,
    "sim_ivf_pq_search" ->
      """WITH e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |rk0 AS (
        |  SELECT vec_id, e,
        |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |  FROM e0),
        |coarse AS (
        |  SELECT CAST(rn AS BIGINT) AS cid, e AS ce FROM rk0 WHERE rn <= 16),
        |assigned AS (
        |  SELECT vec_id, cell, r FROM (
        |    SELECT v.vec_id, c.cid AS cell,
        |           list_transform(range(1, len(v.e) + 1), i -> v.e[i] - c.ce[i]) AS r,
        |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |             list_sum(list_transform(range(1, len(v.e) + 1),
        |               i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i]))), c.cid) AS rk
        |    FROM e0 v CROSS JOIN coarse c) WHERE rk = 1),
        |subcode AS (
        |  SELECT CAST(s.rn - 16 AS BIGINT) AS scid, ms.m,
        |         list_transform(range(1, 9), i -> a.r[ms.m * 8 + i]) AS sc
        |  FROM rk0 s JOIN assigned a ON s.vec_id = a.vec_id
        |  CROSS JOIN (SELECT unnest(range(0, 8)) AS m) ms
        |  WHERE s.rn > 16 AND s.rn <= 32),
        |codes AS (
        |  SELECT vec_id, cell, m, scid AS code FROM (
        |    SELECT a.vec_id, a.cell, scb.m, scb.scid,
        |           row_number() OVER (PARTITION BY a.vec_id, scb.m ORDER BY
        |             list_sum(list_transform(range(1, 9),
        |               i -> (a.r[scb.m * 8 + i] - scb.sc[i])
        |                    * (a.r[scb.m * 8 + i] - scb.sc[i]))), scb.scid) AS rk
        |    FROM assigned a CROSS JOIN subcode scb) WHERE rk = 1),
        |probes AS (
        |  SELECT query_id, cell, qr FROM (
        |    SELECT v.vec_id AS query_id, c.cid AS cell,
        |           list_transform(range(1, len(v.e) + 1), i -> v.e[i] - c.ce[i]) AS qr,
        |           row_number() OVER (PARTITION BY v.vec_id ORDER BY
        |             list_sum(list_transform(range(1, len(v.e) + 1),
        |               i -> (v.e[i] - c.ce[i]) * (v.e[i] - c.ce[i]))), c.cid) AS rk
        |    FROM e0 v CROSS JOIN coarse c WHERE v.vec_id < 10) WHERE rk <= 2),
        |lut AS (
        |  SELECT p.query_id, p.cell, s.m, s.scid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (p.qr[s.m * 8 + i] - s.sc[i])
        |                * (p.qr[s.m * 8 + i] - s.sc[i]))) AS lutd
        |  FROM probes p CROSS JOIN subcode s),
        |cand AS (
        |  SELECT l.query_id, c.vec_id AS neighbor_id,
        |         list_sum(list(l.lutd ORDER BY l.m)) AS adist
        |  FROM codes c JOIN lut l
        |    ON c.cell = l.cell AND c.m = l.m AND c.code = l.scid
        |  WHERE c.vec_id <> l.query_id
        |  GROUP BY 1, 2)
        |SELECT query_id, neighbor_id, round(adist, 6) AS approx_dist,
        |       CAST(rk AS INTEGER) AS rk
        |FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |        ORDER BY adist, neighbor_id) AS rk FROM cand)
        |WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "j_interval_overlap" ->
      """WITH iv AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         min(ts) AS s, max(ts) AS e
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.day AS day, a.user_id AS u1, b.user_id AS u2,
        |         epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) AS overlap_us
        |  FROM iv a JOIN iv b
        |    ON a.day = b.day AND a.user_id < b.user_id
        |   AND a.s <= b.e AND b.s <= a.e
        |  WHERE epoch_us(least(a.e, b.e)) - epoch_us(greatest(a.s, b.s)) >= 600000000),
        |ranked AS (
        |  SELECT day, n_pairs, overlap_us, u1, u2,
        |         row_number() OVER (PARTITION BY day
        |           ORDER BY overlap_us DESC, u1, u2) AS rk
        |  FROM (SELECT *, count(*) OVER (PARTITION BY day) AS n_pairs FROM pairs))
        |SELECT day, CAST(n_pairs AS BIGINT) AS n_pairs,
        |       CAST(overlap_us AS BIGINT) AS max_overlap_us,
        |       CAST(u1 AS BIGINT) AS top_u1, CAST(u2 AS BIGINT) AS top_u2
        |FROM ranked WHERE rk = 1 ORDER BY day""".stripMargin,
    "ev_peak_concurrency" ->
      """WITH d AS (
        |  SELECT event_id, ts AS t, 1 AS delta FROM events
        |  UNION ALL
        |  SELECT event_id, ts + INTERVAL 5 MINUTE, -1 FROM events),
        |s AS (
        |  SELECT t, delta,
        |         sum(delta) OVER (ORDER BY t, delta, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS active
        |  FROM d)
        |SELECT CAST(t AS DATE) AS day, CAST(max(active) AS BIGINT) AS peak_active,
        |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opens
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_kmeans" ->
      s"""WITH $kmeansCte
         |SELECT vec_id, cid AS cluster, round(cos, 6) AS cos
         |FROM a2 ORDER BY vec_id""".stripMargin,
    "sim_cluster_purity" ->
      s"""WITH $kmeansCte,
         |lab AS (
         |  SELECT a2.cid AS cluster, CAST(emb.label AS BIGINT) AS label
         |  FROM a2 JOIN embeddings emb ON a2.vec_id = emb.vec_id),
         |pl AS (
         |  SELECT cluster, label, count(*) AS c FROM lab GROUP BY 1, 2),
         |top AS (
         |  SELECT cluster, label AS dominant_label, c AS top_c,
         |         row_number() OVER (PARTITION BY cluster
         |           ORDER BY c DESC, label) AS rk,
         |         sum(c) OVER (PARTITION BY cluster) AS n_members
         |  FROM pl)
         |SELECT cluster, CAST(n_members AS BIGINT) AS n_members,
         |       dominant_label,
         |       CAST(top_c AS DOUBLE) / CAST(n_members AS DOUBLE) AS purity
         |FROM top WHERE rk = 1 ORDER BY cluster""".stripMargin,
    "e_pq_codes" ->
      """WITH e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |ms AS (SELECT unnest(range(0, 8)) AS m),
        |sub AS (
        |  SELECT vec_id, m,
        |         list_transform(range(1, 9), i -> e[m * 8 + i]) AS sub
        |  FROM e0 CROSS JOIN ms),
        |seeds AS (
        |  SELECT CAST(rn AS BIGINT) AS cid, e
        |  FROM (SELECT vec_id, e,
        |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
        |        FROM e0)
        |  WHERE rn <= 16),
        |cent AS (
        |  SELECT cid, m, list_transform(range(1, 9), i -> e[m * 8 + i]) AS ce
        |  FROM seeds CROSS JOIN ms),
        |dist AS (
        |  SELECT s.vec_id, s.m, c.cid,
        |         list_sum(list_transform(range(1, 9),
        |           i -> (s.sub[i] - c.ce[i]) * (s.sub[i] - c.ce[i]))) AS dist
        |  FROM sub s JOIN cent c ON s.m = c.m),
        |best AS (
        |  SELECT vec_id, m, cid, dist FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id, m
        |      ORDER BY dist, cid) AS rk FROM dist)
        |  WHERE rk = 1)
        |SELECT vec_id, CAST(sum((m + 1) * cid) AS BIGINT) AS code_sum,
        |       round(list_sum(list(dist ORDER BY m)) / 64.0, 6) AS mse
        |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "dedup_containment" ->
      """WITH sh AS (
        |  SELECT doc_id, lang, source, unnest(list_distinct(shingles)) AS sh
        |  FROM (SELECT doc_id, lang, source,
        |               CASE WHEN len(toks) < 3 THEN [text]
        |                    ELSE list_transform(range(1, len(toks) - 1),
        |                           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |               END AS shingles
        |        FROM (SELECT doc_id, lang, source, text,
        |                     string_split(text, ' ') AS toks
        |              FROM documents))),
        |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM sh a JOIN sh b
        |    ON a.sh = b.sh AND a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id <> b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE) AS containment
        |FROM inter JOIN sizes sa ON d1 = sa.doc_id
        |WHERE CAST(i AS DOUBLE) / CAST(sa.n AS DOUBLE) >= 0.8
        |ORDER BY d1, d2""".stripMargin,
    "t_split_contamination" ->
      """WITH sh AS (
        |  SELECT doc_id,
        |         CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |              ELSE 'train' END AS split,
        |         unnest(list_distinct(shingles)) AS sh
        |  FROM (SELECT doc_id,
        |               CASE WHEN len(toks) < 13 THEN [text]
        |                    ELSE list_transform(range(1, len(toks) - 11),
        |                           i -> array_to_string(toks[i:i+12], ' '))
        |               END AS shingles
        |        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |              FROM documents))),
        |dfreq AS (SELECT sh, count(*) AS df FROM sh GROUP BY 1),
        |kept AS (
        |  SELECT sh.doc_id, sh.split, sh.sh
        |  FROM sh JOIN dfreq USING (sh) WHERE dfreq.df <= 64)
        |SELECT a.split AS split_from, b.split AS split_to,
        |       count(DISTINCT b.doc_id) AS n_leaky_docs,
        |       count(DISTINCT a.sh) AS n_shared_grams
        |FROM kept a JOIN kept b ON a.sh = b.sh AND a.split <> b.split
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_k_anonymity" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(n_chars AS BIGINT) // 100 AS len_bucket,
        |         count(*) AS n
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT lang, source,
        |       CAST(sum(n) AS BIGINT) AS n_docs,
        |       CAST(count(*) AS BIGINT) AS n_buckets,
        |       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_risky_buckets,
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_docs_at_risk,
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
        |         / CAST(sum(n) AS DOUBLE) AS risk_share
        |FROM g GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_oov_rate" ->
      """WITH toks AS (
        |  SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |              WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |              ELSE 'train' END AS split,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, count(*) AS c FROM toks WHERE split = 'train' GROUP BY 1)
        |  ORDER BY c DESC, tok LIMIT 16)
        |SELECT split, CAST(count(*) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |       CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(*) AS DOUBLE) AS oov_rate
        |FROM toks t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY split ORDER BY split""".stripMargin,
    "e_quantize_int8" ->
      """WITH e0 AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        |  FROM embeddings),
        |ex AS (
        |  SELECT vec_id, unnest(e) AS v,
        |         unnest(range(1, len(e) + 1)) AS pos
        |  FROM e0),
        |stats AS (
        |  SELECT pos, min(v) AS lo, max(v) AS hi,
        |         (max(v) - min(v)) / 256.0 AS step
        |  FROM ex GROUP BY pos),
        |q0 AS (
        |  SELECT ex.vec_id, ex.pos, ex.v, s.lo, s.step,
        |         CASE WHEN s.step = 0 THEN 0
        |              ELSE least(255, CAST(floor((ex.v - s.lo) / s.step) AS BIGINT))
        |         END AS q
        |  FROM ex JOIN stats s USING (pos)),
        |q AS (
        |  SELECT vec_id, pos, q,
        |         abs(v - (lo + (q + 0.5) * step)) AS err
        |  FROM q0)
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
        |       CAST(sum(q) AS BIGINT) AS sum_code,
        |       CAST(max(q) AS BIGINT) AS max_code,
        |       round(list_sum(list(err ORDER BY pos)) / count(*), 6) AS mean_abs_err
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin)
}
