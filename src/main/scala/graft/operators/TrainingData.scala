package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextFunctions => TF}
import graft.multimodal.Multimodal
import graft.sources.Tables

/** Query entries for the training-data-pipeline extensions
  * (dedup / similarity / text analysis / multimodal), ALL with
  * full-replay DuckDB oracles: since round 4 the MinHash-LSH,
  * SimHash, sign-LSH ANN and langid oracles replay the algorithm in
  * SQL over portable md5-derived hashes (see the `portableHashes`
  * paths), so every entry here is rows+schema+hash checked — none
  * are rows-only.
  */
object TrainingData {
  private type Q = (SparkSession, String) => DataFrame
  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  val tTokenCount: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"), col("n_chars"),
      length(col("text")).cast("long").as("text_len"),
      TF.tokenCount(col("text")).as("n_tokens"),
      // BPE-ish proxy: greedy ≤4-char alpha chunks. Native run-length
      // count (⌈run/4⌉ per alpha run) — value-identical to
      // size(regexp_extract_all(text, "[a-z]{1,4}")) without the
      // regex engine or match-array allocation (~5× on the bench);
      // PropertySpec pins the equality
      graft.plans.HashExpressions.alphaChunkCount(col("text"), 4)
        .as("n_subword_tokens"))
      .orderBy(col("doc_id"))

  val tQualityScore: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_tokens"),
      TF.stopwordRatio(col("text")).as("stop_ratio"),
      TF.avgWordLen(col("text")).as("avg_word_len"),
      TF.qualityScore(col("text")).as("quality_score"))
      .orderBy(col("doc_id"))

  val tFingerprint: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"),
      TF.fingerprint(col("text")).as("fingerprint"),
      TF.fingerprint(lower(col("text"))).as("fingerprint_normalized"))
      .orderBy(col("doc_id"))

  val tLangId: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"), col("lang").as("labeled_lang"),
      TF.langId(col("text")).as("predicted_lang"))
      .orderBy(col("doc_id"))

  /** Deterministic content-hash split assignment — the reproducible
    * train/val/test mechanism for corpora: bucket = first md5 nibble
    * of the doc key (portable across engines, unlike engine hash()),
    * train = 0..b (12/16), val = c..d, test = e..f. Rerunning or
    * re-partitioning can never move a document between splits.
    */
  val tSplitAssign: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("bucket", substring(md5(col("doc_id").cast("string")), 1, 1))
      .withColumn("split",
        when(col("bucket").isin("c", "d"), "val")
          .when(col("bucket").isin("e", "f"), "test")
          .otherwise("train"))
      .groupBy(col("split"), col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("split"), col("lang"))

  /** Gopher-style repetition features: distinct-token fraction and
    * top-token mass per document — the standard cheap signals for
    * filtering degenerate (repetitive) documents from a training
    * corpus. All doubles are single divisions of exact counts.
    */
  val tRepetition: Q = (s, dir) => {
    val cnt = docs(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    cnt.groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).cast("long").as("top_c"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_distinct").cast("double") / col("n_tokens")).as("distinct_frac"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic sequence packing: pack documents into ~`target`
    * token bins for pretraining batches. Scale shape: shard by a
    * content-hash nibble, order WITHIN the shard by content hash,
    * and bin by the pre-document running token count — a
    * per-partition window cumsum, never a global sort, and the
    * assignment is reproducible under any partitioning. Documents
    * are never split across bins (bin = floor(preceding-sum /
    * target)).
    */
  val tPackSequences: Q = (s, dir) => {
    val target = 2048L
    val keyed = docs(s, dir).select(col("doc_id"),
      TF.tokenCount(col("text")).as("n_tok"),
      md5(col("doc_id").cast("string")).as("key"))
      .withColumn("shard", substring(col("key"), 1, 1))
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("bin",
        floor((sum(col("n_tok")).over(w) - col("n_tok")) / target))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).cast("long").as("total_tokens"))
      .orderBy(col("shard"), col("bin"))
  }

  /** Text normalization pipeline — the cleanup stage before any
    * fingerprint/dedup at corpus scale: lowercase, strip
    * non-alphanumerics, collapse whitespace. Emits the normalized
    * fingerprint (what exact-dedup keys on after cleaning) plus
    * before/after lengths. Pure codegen'd string expressions.
    */
  val tNormalize: Q = (s, dir) => {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    docs(s, dir).select(col("doc_id"),
      length(col("text")).cast("long").as("raw_len"),
      length(norm).cast("long").as("norm_len"),
      md5(norm).as("norm_fingerprint"))
      .orderBy(col("doc_id"))
  }

  /** Weighted mixture sampling — pretraining data mixing: each
    * language stratum contributes a weight-proportional quota
    * (en 3× the rest here), membership decided by md5 rank so the
    * mixture is reproducible under reruns and repartitioning.
    * Emits per-stratum achieved counts plus an id-sum checksum so
    * the oracle verifies membership, not just counts.
    */
  val tMixtureSample: Q = (s, dir) => {
    // Per-stratum quota via the map-side [[graft.functions.TopKAggBy]]
    // (constant score, payload-ordered ⇒ the k md5-smallest docs),
    // NOT a per-lang row_number window: the window form shuffles and
    // sorts the ENTIRE stratum on one task per language — at corpus
    // scale a stratum is billions of rows. The partial aggregate
    // pre-trims each map task to k rows, so the shuffle carries
    // ≤ k·langs-per-partition rows no matter the corpus size. Ranks
    // come back from posexplode over the sorted buffer (identical
    // order to the old window: md5 ASC, doc_id ASC).
    val maxQuota = 15
    val quota = when(col("lang") === "en", maxQuota).otherwise(5)
    val topk = udaf(new graft.functions.TopKAggBy[(String, Long)](maxQuota))
    docs(s, dir)
      .select(col("lang"),
        struct(md5(col("doc_id").cast("string")).as("_1"),
          col("doc_id").as("_2")).as("key"))
      .groupBy(col("lang"))
      .agg(topk(lit(0.0), col("key")).as("picked"))
      .select(col("lang"), posexplode(col("picked")))
      .filter(col("pos") < quota)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("col._2._2")).cast("long").as("id_checksum"))
      .orderBy(col("lang"))
  }

  /** Global document-frequency table — the idf side of TF-IDF. */
  val tDocFrequency: Q = (s, dir) =>
    docs(s, dir)
      .select(explode(array_distinct(TF.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col("token"))

  /** Per-doc top-3 terms ranked tf-idf-style but with an all-integer
    * order (tf DESC, df ASC, token) — deterministic across engines
    * with no float log in the ranking path.
    */
  val tTopTerms: Q = (s, dir) => {
    val tf = docs(s, dir)
      .select(col("doc_id"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(desc("tf"), col("df"), col("token"))
    tf.join(broadcast(df), "token")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("rk"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Deterministic stratified sampling: k docs per language, chosen
    * by md5 order — a reproducible "random" sample whose membership
    * survives reruns and repartitioning (same property as
    * [[tSplitAssign]], per-stratum exact counts).
    */
  val tStratifiedSample: Q = (s, dir) => {
    // Same map-side top-k shape as [[tMixtureSample]] (k docs by md5
    // order per language, payload carries the output columns so no
    // join-back); the former per-lang window sorted whole strata on
    // single tasks
    val topk = udaf(new graft.functions.TopKAggBy[(String, Long, Long)](10))
    docs(s, dir)
      .select(col("lang"),
        struct(md5(col("doc_id").cast("string")).as("_1"),
          col("doc_id").as("_2"), col("n_chars").as("_3")).as("key"))
      .groupBy(col("lang"))
      .agg(topk(lit(0.0), col("key")).as("picked"))
      .select(col("lang"), explode(col("picked")).as("p"))
      .select(col("lang"), col("p._2._2").as("doc_id"),
        col("p._2._3").as("n_chars"))
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Array-function suite over token arrays (flat scalar outputs so
    * the oracle compares cleanly across engines). */
  val cArraySuite: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("toks", sort_array(array_distinct(TF.tokens(col("text")))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_distinct"),
        element_at(col("toks"), 1).as("first_token"),
        element_at(col("toks"), -1).as("last_token"),
        array_contains(col("toks"), "spark").as("has_spark"),
        concat_ws("|", slice(col("toks"), 1, 3)).as("first3"))
      .orderBy(col("doc_id"))

  val dedupExact: Q = (s, dir) => Dedup.exactSummary(s, dir)
  val dedupJaccard: Q = (s, dir) => Dedup.jaccardPairs(s, dir, 0.9)
  val dedupNgramJaccard: Q = (s, dir) => Dedup.ngramJaccardPairs(s, dir, 3, 0.5)
  val dedupEmbeddingCosine: Q = (s, dir) =>
    graft.functions.Similarity.cosineNearDupPairs(s, dir, 0.4)
  // LSH bands generate candidates; exact-Jaccard verification makes
  // the output exact over the CANDIDATE set. Recall at the
  // J≈threshold margin is ~99%, not 100% (miss prob (1-J⁴)¹⁶ ≈ 1.2%
  // per borderline pair — sf0.1 produced ~10 such misses), so the
  // oracle REPLAYS signatures + banding in SQL over the same
  // portable md5 shingle hashes instead of assuming recall — the
  // repo-wide sketch-oracle rule. DedupSpec still measures recall
  // against the exact join independently.
  val dedupMinhashLsh: Q = (s, dir) =>
    Dedup.minhashLshPairs(s, dir, portableHashes = true)
  val dedupGroups: Q = (s, dir) =>
    Dedup.dupGroups(Dedup.minhashLshPairsRaw(s, dir, portableHashes = true))
      .select(col("canonical_id"), col("group_size"))
  // portable hashes → the oracle replays simhash end-to-end in SQL;
  // banding is lossless at maxDist=3 (4 bands), so output is the
  // exact Hamming≤3 pair set, not a candidate approximation
  val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(s, dir, 3, portableHashes = true)
  // passage-level near-dup via winnowing fingerprints (see
  // Dedup.winnowPairs); the oracle replays fingerprint + inverted
  // index end-to-end in SQL
  val dedupWinnowPairs: Q = (s, dir) => Dedup.winnowPairs(s, dir)

  /** MinHash sketch-accuracy contract (the Jaccard analog of
    * a_approx_distinct's HLL contract): for every exact near-dup
    * pair, the 64-permutation signature estimate
    * (matching positions / k) is compared against the true Jaccard
    * at a 0.25 band (≈4.4σ at k=64, J≥0.7). The oracle REPLAYS the
    * estimate from its own sig CTE rather than pinning TRUE — at
    * corpus scale rare legitimate outliers exist (the sf1 probe
    * surfaced one ~4σ pair), so the contract "almost all pairs
    * within the band" lives in DedupSpec; the oracle checks both
    * engines agree on every per-pair boolean.
    */
  val dedupMinhashEst: Q = (s, dir) => {
    val sigs = docs(s, dir)
      .select(col("doc_id"),
        Dedup.minhashSignature(col("text"), 64, 3, portableHashes = true).as("sig"))
    val pairs = Dedup.minhashLshPairs(s, dir, portableHashes = true)
    pairs
      .join(sigs.select(col("doc_id").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("doc_id").as("d2"), col("sig").as("s2")), "d2")
      .withColumn("est",
        expr("aggregate(zip_with(s1, s2, (a, b) -> IF(a = b, 1, 0)), 0, (a, x) -> a + x)")
          .cast("double") / 64.0)
      .select(col("d1"), col("d2"), col("jaccard"),
        (abs(col("est") - col("jaccard")) <= 0.25).as("est_within_025"))
      .orderBy(col("d1"), col("d2"))
  }

  val simCosineTopK: Q = (s, dir) => Similarity.bruteForceTopK(s, dir, 10, 5)
  // both ANN variants are oracle-checked by REPLAYING the algorithm
  // in DuckDB (planes / sampled centroids embedded as SQL literals),
  // not by assuming ANN output equals brute force; recall itself is
  // measured in SimilaritySpec
  val simCosineLsh: Q = (s, dir) => Similarity.lshTopK(s, dir, 10, 5)
  val simCosineIvf: Q = (s, dir) => Similarity.ivfSampleTopK(s, dir, 10, 5)

  val mmBinaryFeatures: Q = (s, dir) => Multimodal.binaryFeatures(s, dir)
  val mmFrameSample: Q = (s, dir) => Multimodal.frameFeatures(s, dir)

  /** Winnowing fingerprint (MOSS) via the native
    * [[graft.plans.WinnowFingerprint]] codegen expression: k-gram
    * Rabin-Karp rolling hashes → per-window minima → sorted distinct
    * set. The per-document plagiarism/near-dup fingerprint that
    * guarantees detection of any shared run ≥ k+w-1 chars at ~2/(w+1)
    * the k-gram storage. Emitted as scalar summaries (set size, min,
    * md5 of the joined set) so the oracle — which replays the exact
    * algorithm with list_reduce/list_min — compares flat columns.
    */
  val tWinnowFingerprint: Q = (s, dir) => {
    val fp = graft.plans.HashExpressions.winnowFingerprint(col("text"), 8, 4)
    docs(s, dir)
      // the expression hashes UTF-8 BYTES while the DuckDB oracle walks
      // unicode() codepoints; they agree only on ASCII. Enforce that
      // contract per row (length == octet_length iff every char is
      // single-byte) instead of assuming it of future corpora.
      .where(assert_true(length(col("text")) === octet_length(col("text")),
        lit("winnow oracle assumes ASCII text")).isNull)
      .withColumn("fp", fp)
      .select(col("doc_id"),
        // k-gram count as the expression computes it: len-k+1 when the
        // text holds at least one k-gram, else the single whole-string
        // (or empty-string sentinel) hash
        greatest(length(col("text")) - 8 + 1, lit(1)).cast("long").as("n_kgrams"),
        size(col("fp")).cast("long").as("n_fp"),
        element_at(col("fp"), 1).as("fp_min"),
        md5(concat_ws(",", col("fp"))).as("fp_md5"))
      .orderBy(col("doc_id"))
  }

  /** Bigram language-model prep: corpus-wide bigram counts joined to
    * first-token unigram counts → conditional probability, top-20 by
    * frequency. Shuffle shape at scale: two partial-agg reduces plus
    * one broadcast-back join on the (tiny) surviving top set — the
    * unigram join happens AFTER the top-k cut, never on the full
    * bigram table.
    */
  val tBigramLm: Q = (s, dir) => {
    val d = docs(s, dir)
    val big = d.select(explode(TF.shingles(col("text"), 2)).as("bigram"))
      .groupBy(col("bigram")).agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("bigram")).limit(20)
      .withColumn("w1", substring_index(col("bigram"), " ", 1))
    val uni = d.select(explode(TF.tokens(col("text"))).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c1"))
    big.join(uni, Seq("w1"), "left_outer")
      .select(col("bigram"), col("c"), col("c1"),
        (col("c").cast("double") / col("c1").cast("double")).as("p_w2_given_w1"))
      .orderBy(desc("c"), col("bigram"))
  }

  /** PII-scrub pass shape: count pattern families (digit runs,
    * capitalized tokens, URLs) and measure the redacted length —
    * the standard pre-training scrub, all codegen'd regex (no UDF).
    */
  val tPiiScrub: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
        .cast("long").as("n_digit_runs"),
      size(regexp_extract_all(col("text"), lit("[A-Z][a-z]+"), lit(0)))
        .cast("long").as("n_cap_words"),
      size(regexp_extract_all(col("text"), lit("https?://[^ ]+"), lit(0)))
        .cast("long").as("n_urls"),
      length(regexp_replace(col("text"), "[0-9]+", "<NUM>"))
        .cast("long").as("len_scrubbed"))
      .orderBy(col("doc_id"))

  /** Zipf bucket histogram of the document-frequency table:
    * bucket = ⌊log₂ df⌋ + 1 via binary-representation length (pure
    * integer — no float log at bucket boundaries). The standard
    * head/tail shape check on a corpus vocabulary.
    */
  val tZipfBuckets: Q = (s, dir) =>
    docs(s, dir)
      .select(explode(array_distinct(TF.tokens(col("text")))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("df"))
      .groupBy(length(bin(col("df"))).cast("long").as("log2_bucket"))
      .agg(count(lit(1)).as("n_tokens"),
        min(col("df")).as("min_df"), max(col("df")).as("max_df"))
      .orderBy(col("log2_bucket"))

  /** Higher-order array functions (aggregate / filter / exists /
    * forall / zip_with) over token arrays — the lambda-expression
    * surface, flat scalar outputs for the oracle (which replays
    * zip_with(toks, reverse(toks)) via symmetric indexing).
    */
  val cHigherOrderSuite: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("toks", TF.tokens(col("text")))
      .select(col("doc_id"),
        expr("aggregate(toks, 0L, (a, t) -> a + length(t))").as("sum_tok_len"),
        expr("size(filter(toks, t -> length(t) > 4))").cast("long").as("n_long"),
        expr("exists(toks, t -> t = 'the')").as("has_the"),
        expr("forall(toks, t -> length(t) > 0)").as("all_nonempty"),
        expr("aggregate(zip_with(toks, reverse(toks), (a, b) -> IF(a = b, 1L, 0L)), 0L, (a, x) -> a + x)")
          .as("n_sym_pos"))
      .orderBy(col("doc_id"))

  /** Edit-distance near-dup pairs: levenshtein ≤ k over 40-char
    * prefixes within a (lang, source) block — but candidates come
    * from a q-gram filter, NEVER a block-quadratic join (fixed block
    * cardinality makes per-block pair counts quadratic in corpus
    * size; the one remaining 100×-scale killer flagged in round 7).
    *
    * The candidate rule is EXACT (zero false negatives), so the
    * result — and therefore the simple quadratic DuckDB oracle — is
    * unchanged; only the plan is. Gravano et al.'s q-gram count
    * filter: one edit destroys at most q q-grams, so
    * ed(A,B) ≤ k ⟹ multiset-overlap(G_q(A), G_q(B)) ≥ max(n_A,n_B) − k·q
    * (n = prefix_len − q + 1). Occurrence-numbering the grams turns
    * multiset overlap into plain set overlap, and the AllPairs
    * prefix-filter (rarest-df-first total order, index the first
    * n − T + 1 items) turns the overlap bound into a posting join.
    * Three exactness guards: (a) identical prefixes collapse into one
    * group first (duplicate mass never re-enters candidate gen — the
    * [[Dedup.prefixJaccardPairs]] design); (b) pairs where BOTH sides
    * have n ≤ k·q (the count bound is vacuous) meet in an explicit
    * short pool, quadratic only among ≤(k·q+q−1+1)-char prefixes and
    * further cut by the length filter; (c) |len_A − len_B| ≤ k prunes
    * candidates (lev ≥ length difference) without affecting recall.
    */
  val dedupEditDistance: Q = (s, dir) =>
    editDistancePairsOf(
      docs(s, dir).filter(col("doc_id") % 7 === 0)
        .select(col("doc_id"), col("lang"), col("source"),
          substring(col("text"), 1, 40).as("prefix")))

  /** DataFrame-level entry (any (doc_id, lang, source, prefix) input)
    * — the spec surface for randomized differential testing against
    * the quadratic blocked reference join. */
  def editDistancePairsOf(base: DataFrame, k: Int = 10, q: Int = 3): DataFrame = {
    val kq = k * q
    // stage 1: identical-prefix collapse within the block. NULL
    // prefixes drop first: the blocked reference join emits nothing
    // for them (levenshtein over NULL is NULL), but groupBy would
    // collapse them into one group and stage 4 would emit false
    // 0-distance pairs — the one place NULL handling diverges.
    val groups0 = base
      .filter(col("prefix").isNotNull)
      .groupBy(col("lang"), col("source"), col("prefix"))
      .agg(sort_array(collect_list(col("doc_id"))).as("members"))
      .withColumn("gkey", md5(concat_ws("",
        col("lang"), col("source"), col("prefix"))))
      .withColumn("len", length(col("prefix")))
      // occurrence-numbered q-grams: "gram#occ" makes multiset
      // intersection a set intersection (count-filter soundness)
      .withColumn("grams0",
        when(col("len") < q, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), col("len") - (q - 1)),
            i => col("prefix").substr(i, lit(q)))))
      .withColumn("items", transform(col("grams0"), (g, i) =>
        concat(g, lit("#"),
          size(filter(slice(col("grams0"), lit(1), i + 1), x => x === g))
            .cast("string"))))
      .drop("grams0")
      .withColumn("n", size(col("items")))
      .localCheckpoint(eager = false) // consumed by df-count, posting, verify, expand
    // stage 2: rarest-first global order (ascending document
    // frequency, ties by item text — selectivity only, any total
    // order is exact), then per-group indexed prefix of
    // p = n − max(n − k·q, 1) + 1 = min(n, k·q + 1) items
    val posting = groups0.select(col("gkey"), explode(col("items")).as("it"))
    val dfreq = posting.groupBy("it").agg(count(lit(1)).as("df"))
    val ordered = posting
      .join(dfreq, "it")
      .groupBy("gkey")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("it")))),
        x => x.getField("it")).as("items_o"))
    val g2 = groups0.join(ordered, Seq("gkey"), "left")
      .withColumn("p", least(col("n"), lit(kq + 1)))
      .localCheckpoint(eager = false)
    val idx = g2.filter(col("n") > 0)
      .select(col("gkey"), col("lang"), col("source"), col("len"),
        explode(slice(col("items_o"), lit(1), col("p"))).as("it"))
    val ia = idx.alias("ia"); val ib = idx.alias("ib")
    val candPrefix = ia.join(ib,
        col("ia.it") === col("ib.it") && col("ia.lang") === col("ib.lang") &&
        col("ia.source") === col("ib.source") &&
        col("ia.gkey") < col("ib.gkey") &&
        abs(col("ia.len") - col("ib.len")) <= k)
      .select(col("ia.gkey").as("g1"), col("ib.gkey").as("g2"))
    // short pool: both n ≤ k·q ⟹ the count bound gives nothing;
    // quadratic ONLY among these bounded-length prefixes (≤ k·q+q−1
    // chars), still blocked and length-filtered
    val shorts = g2.filter(col("n") <= kq)
      .select(col("gkey"), col("lang"), col("source"), col("len"))
    val sa = shorts.alias("sa"); val sb = shorts.alias("sb")
    val candShort = sa.join(sb,
        col("sa.lang") === col("sb.lang") &&
        col("sa.source") === col("sb.source") &&
        col("sa.gkey") < col("sb.gkey") &&
        abs(col("sa.len") - col("sb.len")) <= k)
      .select(col("sa.gkey").as("g1"), col("sb.gkey").as("g2"))
    val cand = candPrefix.union(candShort).distinct()
    // stage 3: levenshtein verifies CANDIDATES only
    val sets = g2.select(col("gkey"), col("prefix"))
    val verified = cand
      .join(sets.select(col("gkey").as("g1"), col("prefix").as("p1")), "g1")
      .join(sets.select(col("gkey").as("g2"), col("prefix").as("p2")), "g2")
      .withColumn("dist", levenshtein(col("p1"), col("p2")).cast("long"))
      .filter(col("dist") <= k)
      .select(col("g1"), col("g2"), col("dist"))
    // stage 4: expand groups back to doc pairs (identical prefixes →
    // distance 0 within a group; cross pairs inherit the rep distance)
    val m = g2.select(col("gkey"), explode(col("members")).as("doc_id"))
    val wx = m.alias("wx"); val wy = m.alias("wy")
    val within = wx.join(wy,
        col("wx.gkey") === col("wy.gkey") &&
        col("wx.doc_id") < col("wy.doc_id"))
      .select(col("wx.doc_id").as("d1"), col("wy.doc_id").as("d2"),
        lit(0L).as("edit_dist"))
    val cross = verified
      .join(m.select(col("gkey").as("g1"), col("doc_id").as("m1")), "g1")
      .join(m.select(col("gkey").as("g2"), col("doc_id").as("m2")), "g2")
      .select(least(col("m1"), col("m2")).as("d1"),
        greatest(col("m1"), col("m2")).as("d2"),
        col("dist").as("edit_dist"))
    within.union(cross).orderBy(col("d1"), col("d2"))
  }

  /** End-to-end corpus cleaning — the composed training-data
    * pipeline in one dataflow: exact dedup (md5 fingerprint,
    * keep-min-id) → near-dup group resolution (MinHash-LSH pairs →
    * connected components) dropping every non-canonical member →
    * per-language survivor accounting. Linear output in corpus size
    * (groups, not pairs) — the shape a 100 TB clean must take. The
    * oracle replays the whole pipeline (fingerprint dedup + the
    * recursive-CTE closure over exact-Jaccard pairs).
    */
  val tCorpusClean: Q = (s, dir) => {
    val d = docs(s, dir)
    val exactSurvivors = d
      .withColumn("fp", TF.fingerprint(col("text")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"))
    // near-dup members that are NOT their group's canonical (min id)
    val dropNearDup = Dedup.dupGroups(
        Dedup.minhashLshPairsRaw(s, dir, portableHashes = true))
      .select(col("canonical_id"), explode(col("members")).as("doc_id"))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select(col("doc_id"))
    val cleaned = exactSurvivors
      .join(dropNearDup, Seq("doc_id"), "left_anti")
    d.groupBy(col("lang")).agg(count(lit(1)).as("n_raw"))
      .join(exactSurvivors.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_exact_unique")), Seq("lang"))
      .join(cleaned.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_clean")), Seq("lang"))
      .orderBy(col("lang"))
  }

  /** The custom [[graft.functions.SimHashAgg]] typed Aggregator in
    * the checked surface: per-language corpus-level simhash over the
    * portable md5 token hashes. reduce/merge are associative and
    * commutative (64 signed bit counters), so Spark runs it
    * partial-aggregated — the shuffle carries one 64-int buffer per
    * partition-group, never the token stream. The oracle replays the
    * per-bit majority in SQL.
    */
  val aSimhashAgg: Q = (s, dir) => {
    val agg = udaf(graft.functions.SimHashAgg,
      org.apache.spark.sql.Encoders.scalaLong)
    docs(s, dir)
      .select(col("lang"), explode(TF.md5TokenHashes(col("text"))).as("h"))
      .groupBy(col("lang"))
      .agg(agg(col("h")).as("corpus_simhash"), count(lit(1)).as("n_hashes"))
      .orderBy(col("lang"))
  }

  /** Corpus length profile: per-language document-length deciles via
    * ntile over a UNIQUE ordering (n_chars, doc_id) — the
    * distribution snapshot used to set packing / truncation budgets.
    */
  val tLengthDeciles: Q = (s, dir) => {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars"), col("doc_id"))
    docs(s, dir)
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("decile"))
  }

  /** Benchmark decontamination — the standard 13-gram collision
    * check between a training corpus and an eval set (here: every
    * 50th document stands in for the benchmark — a slice that
    * provably collides on this corpus, so the check is non-vacuous):
    * any shared
    * 13-token shingle flags a (train, eval) pair with its collision
    * count. Inverted-index join over distinct shingles — never a
    * train×eval cross product — so the check scales as
    * Σ per-shingle postings, the same shape at 100 TB.
    */
  val tDecontaminate: Q = (s, dir) => {
    val d = docs(s, dir)
    def shingled(df: DataFrame, idCol: String) = df
      .select(col("doc_id").as(idCol),
        explode(array_distinct(TF.shingles(col("text"), 13))).as("sh"))
    val evalSet = shingled(d.filter(col("doc_id") % 50 === 7), "eval_id")
    val train = shingled(d.filter(col("doc_id") % 50 =!= 7), "doc_id")
    train.join(evalSet, "sh")
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared_13grams"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  /** Regex-extraction surface: capture groups, regex filters
    * (rlike), and regex splitting — the pattern-mining primitives
    * over raw text, all codegen'd.
    */
  val cRegexSuite: Q = (s, dir) =>
    docs(s, dir).select(col("doc_id"),
      regexp_extract(col("text"), "^(\\w+) (\\w+)", 1).as("w1"),
      regexp_extract(col("text"), "^(\\w+) (\\w+)", 2).as("w2"),
      col("text").rlike("[0-9]").as("has_digit"),
      col("text").rlike("\\b(the|and)\\b").as("has_conjunction"),
      size(split(col("text"), "[aeiou]+")).cast("long").as("n_vowel_splits"))
      .orderBy(col("doc_id"))

  /** Extended string-function surface: translate / pads / repeat /
    * reverse / replace / position / left-right slices / ascii, over
    * the first token of each document.
    */
  val cStringSuite2: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("w", substring_index(col("text"), " ", 1))
      .select(col("doc_id"),
        translate(col("w"), "aeiou", "AEIOU").as("t_vowels"),
        lpad(col("w"), 12, "_").as("t_lpad"),
        rpad(substring(col("w"), 1, 4), 6, ".").as("t_rpad"),
        repeat(substring(col("w"), 1, 2), 3).as("t_repeat"),
        reverse(col("w")).as("t_rev"),
        regexp_replace(col("w"), "e", "3").as("t_leet"),
        instr(col("w"), "e").cast("long").as("t_pos_e"),
        substring(col("w"), 1, 2).as("t_left2"),
        ascii(col("w")).cast("long").as("t_ascii"))
      .orderBy(col("doc_id"))

  /** Null-handling surface: nullif / try-division / coalesce /
    * null-safe equality over a derived sparse column (every 3rd doc
    * NULL) — the null-semantics contract an engine must pin down.
    */
  val cNullSuite: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("sparse",
        when(col("doc_id") % 3 === 0, col("n_chars")))
      .select(col("doc_id"),
        coalesce(col("sparse"), lit(-1L)).as("filled"),
        nullif(col("sparse"), col("n_chars")).isNull.as("matches_nchars"),
        (col("n_chars").cast("double") /
          nullif(col("doc_id") % 5, lit(0)).cast("double")).as("try_div"),
        col("sparse") <=> col("n_chars") as "nullsafe_eq",
        isnull(col("sparse")).as("is_missing"))
      .orderBy(col("doc_id"))

  /** Map-typed column surface: per-doc token→length map built with
    * map_from_arrays, then cardinality / key lookup (null when
    * absent) / value-fold — flat scalar outputs for the oracle's
    * MAP replay.
    */
  val cMapSuite: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("ks", sort_array(array_distinct(TF.tokens(col("text")))))
      .withColumn("m", map_from_arrays(col("ks"),
        expr("transform(ks, k -> length(k))")))
      .select(col("doc_id"),
        size(col("m")).cast("long").as("n_keys"),
        element_at(col("m"), "the").cast("long").as("len_the"),
        expr("aggregate(map_values(m), 0L, (a, x) -> a + x)").as("sum_val_len"))
      .orderBy(col("doc_id"))

  /** Generator surface: posexplode over token arrays — leading-token
    * vocabulary (tokens appearing in the first 3 positions), with
    * 1-based positions to match the oracle's generate_subscripts.
    */
  val cGeneratorSuite: Q = (s, dir) =>
    docs(s, dir)
      .select(col("doc_id"), posexplode(TF.tokens(col("text"))))
      .filter(col("pos") < 3)
      .select(col("col").as("token"), (col("pos") + 1).cast("long").as("pos1"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_lead"), min(col("pos1")).as("min_pos"))
      .orderBy(desc("n_lead"), col("token"))
      .limit(30)

  /** Modality routing: the demux stage of a multimodal pipeline —
    * rows fan out to per-modality branches keyed on (here
    * synthetic) content type, with per-branch size accounting.
    */
  val mmModalityRoute: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("n_bytes", length(col("text").cast("binary")).cast("long"))
      .withColumn("modality",
        when(col("n_bytes") % 3 === 0, "image")
          .when(col("n_bytes") % 3 === 1, "audio")
          .otherwise("video"))
      .groupBy(col("modality"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).cast("long").as("total_bytes"),
        max(col("n_bytes")).as("max_bytes"))
      .orderBy(col("modality"))

  /** Document chunking with overlap — the windowing stage a RAG index
    * or pretraining tokenizer runs over a corpus: fixed-size token
    * windows (W=32) at stride S=24 (8-token overlap), document-local,
    * never split across documents. A chunk starts at every stride
    * offset < n_tokens; the trailing chunk may be short. Scale shape:
    * pure narrow generator + slice — zero shuffles before the final
    * presentation sort, so it streams at any corpus size. `chunk_fp`
    * (md5 of the space-joined window) is the key a chunk-level dedup
    * or vector-index build uses downstream.
    */
  val tChunkOverlap: Q = (s, dir) => {
    val W = 32; val S = 24
    docs(s, dir)
      .select(col("doc_id"), TF.tokens(col("text")).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), col("n") - 1, lit(S))).as("st"))
      .select(col("doc_id"),
        (col("st") / S).cast("long").as("chunk_index"),
        slice(col("toks"), col("st") + 1, lit(W)).as("chunk"))
      .select(col("doc_id"), col("chunk_index"),
        size(col("chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("chunk"))).as("chunk_fp"))
      .orderBy(col("doc_id"), col("chunk_index"))
  }

  /** Sequential Poisson (priority) sampling — Ohlsson's weighted
    * without-replacement scheme: priority ξ = u/w with u a
    * deterministic content-hash uniform and w = n_chars; the sample
    * is the k smallest priorities. u is (v+1)/2⁵² with v the first
    * 13 md5 nibbles (52 bits), so u is EXACT in a double (power-of-
    * two denominator, no rounding) and ξ is one IEEE division —
    * bit-reproducible across engines, rerun-stable, and any document
    * subset keeps a consistent sample (the property that makes
    * priority sampling composable across shards at 100 TB). Top-k
    * via orderBy+limit = TakeOrderedAndProject: per-partition heads,
    * never a global sort.
    */
  val tWeightedSample: Q = (s, dir) =>
    docs(s, dir)
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double") + 1) / lit(4503599627370496.0))
      .withColumn("priority", col("u") / col("n_chars"))
      .select(col("doc_id"), col("lang"),
        col("n_chars").cast("long").as("weight"), col("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(100)

  /** Per-source epoch/repetition planner — the up-sampling half of a
    * pretraining data mixture (the selection-only half is
    * [[tMixtureSample]]): each source gets a token budget
    * proportional to its target weight; a source smaller than its
    * budget repeats (epochs > 1), a larger one down-samples
    * (epochs < 1). Every doc gets floor(r) epochs, and the
    * fractional remainder is met by granting one extra epoch to the
    * docs whose md5-uniform u < frac(r) — a per-doc independent
    * decision, so the whole plan is a tiny per-source stats
    * aggregate + broadcast join-back + one narrow pass: no
    * per-source sort, rank, or window anywhere, linear at any
    * corpus size, and deterministic under reruns and repartitioning
    * (md5 of doc_id, never rand()).
    */
  val tSourceEpochs: Q = (s, dir) => {
    val d = docs(s, dir).select(col("doc_id"), col("source"),
      TF.tokenCount(col("text")).as("n_tok"),
      ((conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("double") + 1) / lit(4503599627370496.0)).as("u"))
    val stats = d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("src_tokens"))
      // target weight 1..4 derived from the source name — a
      // deterministic stand-in for a curated per-domain recipe table
      .withColumn("w", lit(1) + substring(col("source"), 4, 10).cast("int") % 4)
    val totals = stats.agg(sum(col("src_tokens")).as("tot"),
      sum(col("w").cast("long")).as("wsum"))
    val plan = stats.crossJoin(broadcast(totals))
      .withColumn("r",
        col("tot") * col("w") / col("wsum") / col("src_tokens"))
      .select(col("source"), col("n_docs"), col("src_tokens"),
        floor(col("r")).as("base_epochs"),
        (col("r") - floor(col("r"))).as("frac"))
    d.join(broadcast(plan), "source")
      .groupBy(col("source"))
      .agg(max(col("n_docs")).as("n_docs"),
        max(col("src_tokens")).as("src_tokens"),
        max(col("base_epochs")).as("base_epochs"),
        sum(when(col("u") < col("frac"), 1L).otherwise(0L)).as("n_upsampled"),
        (max(col("base_epochs")) * max(col("src_tokens")) +
          sum(when(col("u") < col("frac"), col("n_tok")).otherwise(0L)))
          .as("emitted_tokens"),
        sum(when(col("u") < col("frac"), col("doc_id")).otherwise(0L))
          .as("upsampled_id_sum"))
      .orderBy(col("source"))
  }

  /** Deterministic training-order shuffle — the "global shuffle"
    * stage between corpus and trainer: every (doc, epoch) pair
    * routes to a hash shard and is ordered inside it by an md5 key
    * mixing doc and epoch, so the training order is reproducible,
    * uncorrelated with corpus order, spreads a doc's repeat epochs
    * far apart, and needs NO corpus-wide sort — shard count scales
    * with the corpus and each shard orders independently (here 16
    * shards via the key's first hex digit; sort_array inside the
    * aggregate, no Window or global Sort). Sources repeat w (1..4)
    * epochs. Emits per-shard counts plus an md5 fingerprint of the
    * ordered (doc_id:epoch) sequence so the oracle verifies the
    * ORDER itself, not just membership.
    */
  val oTrainingOrder: Q = (s, dir) => {
    val w = lit(1) + substring(col("source"), 4, 10).cast("int") % 4
    val expanded = docs(s, dir)
      .select(col("doc_id"), col("source"))
      .withColumn("epoch", explode(sequence(lit(0), w - 1)))
      .withColumn("key", md5(concat_ws(":", col("doc_id"), col("epoch"))))
      .withColumn("shard", conv(substring(col("key"), 1, 1), 16, 10).cast("int"))
    expanded.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("epoch").cast("long")).as("epoch_sum"),
        md5(concat_ws("|",
          transform(
            sort_array(collect_list(
              struct(col("key"), col("doc_id"), col("epoch")))),
            x => concat_ws(":", x.getField("doc_id"), x.getField("epoch")))))
          .as("order_fingerprint"))
      .orderBy(col("shard"))
  }

  /** Quality-threshold sweep — the curve a pipeline operator reads
    * to pick a filtering cutoff: for each threshold t ∈ {0.1..0.9},
    * how many docs and tokens survive `quality_score ≥ t`, per
    * language. ONE scan computes all 18 conditional sums inside a
    * single two-phase aggregate (map-side combine to one row per
    * lang); the threshold dimension explodes AFTER aggregation over
    * the tiny per-lang rows — never a ×9 blow-up of the corpus
    * stream. The per-doc score is the same expression t_quality_score
    * hash-matches across engines, so the ≥ comparisons are
    * deterministic.
    */
  val tQualitySweep: Q = (s, dir) => {
    val base = docs(s, dir).select(col("lang"),
      TF.qualityScore(col("text")).as("q"),
      TF.tokenCount(col("text")).as("n_tok"))
    val aggs = (1 to 9).flatMap { i =>
      val t = i / 10.0
      Seq(sum(when(col("q") >= t, 1L).otherwise(0L)).as(s"k$i"),
        sum(when(col("q") >= t, col("n_tok")).otherwise(0L)).as(s"tk$i"))
    }
    base.groupBy(col("lang")).agg(aggs.head, aggs.tail: _*)
      .select(col("lang"), explode(array((1 to 9).map(i =>
        struct(lit(i).as("i"), col(s"k$i").as("k"), col(s"tk$i").as("tk"))): _*))
        .as("x"))
      .select(col("lang"), (col("x.i") / lit(10.0)).as("threshold"),
        col("x.k").as("n_docs_kept"), col("x.tk").as("tokens_kept"))
      .orderBy(col("lang"), col("threshold"))
  }

  /** Canonical-survivor resolution over the MinHash-LSH dup groups:
    * each near-dup cluster keeps its best member (longest text,
    * doc_id as the deterministic tiebreak) — the policy stage that
    * turns "groups found" into keep/drop decisions in a corpus
    * dedup. Survivor selection is a single min(struct) aggregate
    * (partial-aggregating, linear in members — no per-group window
    * sort), stacked on the same hybrid component machinery as
    * dedup_groups.
    */
  val dedupResolveBest: Q = (s, dir) => {
    val groups =
      Dedup.dupGroups(Dedup.minhashLshPairsRaw(s, dir, portableHashes = true))
    groups.select(col("canonical_id"), explode(col("members")).as("doc_id"))
      .join(docs(s, dir).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_members"),
        min(struct((-col("n_chars")).as("neg_chars"),
          col("doc_id").as("id"))).as("best"))
      .select(col("canonical_id"), col("n_members"),
        col("best.id").as("survivor_id"),
        (-col("best.neg_chars")).cast("long").as("survivor_chars"))
      .orderBy(col("canonical_id"))
  }

  /** Incremental LSH dedup: the new-batch (doc_id%10==0) slice
    * against the corpus band index — see
    * [[Dedup.minhashIncrementalHits]] for the 100 TB rationale. */
  val dedupIncremental: Q = (s, dir) => Dedup.minhashIncrementalHits(s, dir)

  /** BPE merge-candidate counting — the first merge iteration of
    * tokenizer vocabulary induction (Sennrich et al.): adjacent
    * character-pair frequencies within words, weighted by corpus
    * occurrence. Scale shape: two generators + one partial-
    * aggregating groupBy — the same count-shuffle as word count —
    * then TakeOrderedAndProject for the top candidates; the full
    * BPE loop re-runs this counting per merge, so the per-iteration
    * primitive is what must scale.
    */
  val tBpeMerges: Q = (s, dir) =>
    docs(s, dir)
      .select(explode(TF.tokens(col("text"))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
        .as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("pair"))
      .limit(30)

  val queries: Map[String, Q] = Map(
    "dedup_incremental" -> dedupIncremental,
    "t_bpe_merges" -> tBpeMerges,
    "t_chunk_overlap" -> tChunkOverlap,
    "t_weighted_sample" -> tWeightedSample,
    "t_source_epochs" -> tSourceEpochs,
    "o_training_order" -> oTrainingOrder,
    "t_quality_sweep" -> tQualitySweep,
    "dedup_resolve_best" -> dedupResolveBest,
    "t_token_count" -> tTokenCount,
    "t_repetition" -> tRepetition,
    "t_pack_sequences" -> tPackSequences,
    "t_normalize" -> tNormalize,
    "t_mixture_sample" -> tMixtureSample,
    "t_quality_score" -> tQualityScore,
    "t_fingerprint_md5" -> tFingerprint,
    "t_langid" -> tLangId,
    "t_split_assign" -> tSplitAssign,
    "t_doc_frequency" -> tDocFrequency,
    "c_array_suite" -> cArraySuite,
    "t_stratified_sample" -> tStratifiedSample,
    "t_top_terms" -> tTopTerms,
    "dedup_exact" -> dedupExact,
    "dedup_jaccard_pairs" -> dedupJaccard,
    "dedup_ngram_jaccard" -> dedupNgramJaccard,
    "dedup_embedding_cosine" -> dedupEmbeddingCosine,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_minhash_est" -> dedupMinhashEst,
    "dedup_groups" -> dedupGroups,
    "dedup_simhash" -> dedupSimhash,
    "dedup_winnow_pairs" -> dedupWinnowPairs,
    "sim_cosine_topk" -> simCosineTopK,
    "sim_cosine_lsh" -> simCosineLsh,
    "sim_cosine_ivf" -> simCosineIvf,
    "mm_binary_features" -> mmBinaryFeatures,
    "mm_frame_sample" -> mmFrameSample,
    "t_winnow_fingerprint" -> tWinnowFingerprint,
    "t_bigram_lm" -> tBigramLm,
    "t_pii_scrub" -> tPiiScrub,
    "t_zipf_buckets" -> tZipfBuckets,
    "t_corpus_clean" -> tCorpusClean,
    "a_simhash_agg" -> aSimhashAgg,
    "c_string_suite2" -> cStringSuite2,
    "c_regex_suite" -> cRegexSuite,
    "t_decontaminate" -> tDecontaminate,
    "t_length_deciles" -> tLengthDeciles,
    "c_null_suite" -> cNullSuite,
    "c_higher_order_suite" -> cHigherOrderSuite,
    "c_map_suite" -> cMapSuite,
    "c_generator_suite" -> cGeneratorSuite,
    "dedup_edit_distance" -> dedupEditDistance,
    "mm_modality_route" -> mmModalityRoute)

  /** Shared CTE chain replaying MinHash end-to-end in SQL: md5-60
    * shingle hashes → 64 permutation minima ((h&2³²⁻¹)·aᵢ+bᵢ mod
    * 2⁶¹-1, the exact constants of plans.MinHashSignature) → 16
    * four-row bands keyed by the signature slice → candidate pairs →
    * exact hash-set Jaccard ≥ 0.7. This runs the SAME candidate
    * generation as Dedup.minhashLshPairs(portableHashes=true), so
    * LSH recall (~99% at the threshold margin, NOT 100%) is
    * replayed, never assumed — at sf0.1 a full-pairwise oracle
    * disagreed on ~10 borderline pairs. */
  private[operators] val minhashCtes =
    """d0 AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
      |shl AS (
      |  SELECT doc_id, list_distinct(
      |    CASE WHEN len(toks) < 3 THEN [text]
      |         ELSE list_transform(range(1, len(toks) - 1),
      |                i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) END) AS shingles
      |  FROM d0),
      |hsl AS (
      |  SELECT doc_id, list_distinct(list_transform(shingles,
      |    s -> list_reduce(list_transform(string_split(substr(md5(s), 1, 15), ''),
      |           c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
      |         (a, b) -> a * 16 + b))) AS hs
      |  FROM shl),
      |sig AS (
      |  SELECT doc_id, list_transform(range(0, 64), i ->
      |    list_min(list_transform(hs, h ->
      |      ((h & 4294967295) * (2 * i + 1000003) + (104729 * i + 780291637))
      |        % 2305843009213693951))) AS sig
      |  FROM hsl),
      |banded AS (
      |  SELECT doc_id, b, array_to_string(sig[4 * b + 1 : 4 * b + 4], ',') AS key
      |  FROM sig CROSS JOIN (SELECT unnest(range(0, 16)) AS b) bb),
      |cand AS (
      |  SELECT DISTINCT l.doc_id AS d1, r.doc_id AS d2
      |  FROM banded l JOIN banded r
      |    ON l.b = r.b AND l.key = r.key AND l.doc_id < r.doc_id),
      |sizes AS (SELECT doc_id, len(hs) AS n FROM hsl),
      |hflat AS (SELECT doc_id, unnest(hs) AS h FROM hsl),
      |inter AS (
      |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
      |  FROM hflat a JOIN hflat b ON a.h = b.h AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |lshp AS (
      |  SELECT d1, d2, jaccard FROM (
      |    SELECT c.d1, c.d2,
      |           CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS jaccard
      |    FROM cand c
      |    JOIN inter i ON c.d1 = i.d1 AND c.d2 = i.d2
      |    JOIN sizes sa ON c.d1 = sa.doc_id
      |    JOIN sizes sb ON c.d2 = sb.doc_id)
      |  WHERE jaccard >= 0.7)""".stripMargin

  /** DuckDB cosine of two double-list columns — the bit-identical
    * twin of Similarity.cosine (left-fold list_sum). */
  private def cosSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]))" +
      s" / (sqrt(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $a[i])))" +
      s" * sqrt(list_sum(list_transform(range(1, len($b) + 1), i -> $b[i] * $b[i]))))"

  /** Oracle for sim_cosine_lsh: replays sign-LSH exactly — the same
    * seeded hyperplanes (embedded as literals), bucket assignment,
    * Hamming≤1 multiprobe, exact re-scoring, top-k. */
  private def lshOracleSql: String = {
    val nPlanes = 8
    val ps = Similarity.planes(64, nPlanes, 42L)
    val bucket = ps.zipWithIndex.map { case (p, i) =>
      val lits = p.mkString("[", ", ", "]")
      s"(CASE WHEN list_sum(list_transform(range(1, 65), i -> emb[i] * ($lits)[i])) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("\n      + ")
    val probeSet = (0L +: (0 until nPlanes).map(1L << _)).mkString("(", ", ", ")")
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |b AS (
       |  SELECT vec_id, emb,
       |      $bucket AS bucket
       |  FROM e),
       |cand AS (
       |  SELECT q.vec_id AS query_id, q.emb AS qe, n.vec_id AS neighbor_id, n.emb AS ne
       |  FROM (SELECT * FROM b WHERE vec_id < 10) q
       |  JOIN b n ON xor(q.bucket, n.bucket) IN $probeSet
       |  WHERE n.vec_id <> q.vec_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${cosSql("qe", "ne")} AS cos FROM cand),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rk AS INTEGER) AS rk
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin
  }

  /** Oracle for sim_cosine_ivf: replays the deterministic-sample IVF
    * (md5-ordered centroid pick, argmax-cosine assignment, nProbe
    * nearest cells, exact re-scoring, top-k). */
  private def ivfOracleSql: String =
    s"""WITH e AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS cid, emb AS ce
       |  FROM (SELECT vec_id, emb,
       |               row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
       |        FROM e)
       |  WHERE rn <= 16),
       |scoredc AS (
       |  SELECT e.vec_id, e.emb, c.cid, ${cosSql("e.emb", "c.ce")} AS csim
       |  FROM e CROSS JOIN cents c),
       |assigned AS (
       |  SELECT vec_id, emb, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
       |        FROM scoredc)
       |  WHERE crk = 1),
       |qprobe AS (
       |  SELECT vec_id AS query_id, emb AS qe, cid AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid) AS crk
       |        FROM scoredc WHERE vec_id < 10)
       |  WHERE crk <= 4),
       |cand AS (
       |  SELECT q.query_id, q.qe, a.vec_id AS neighbor_id, a.emb AS ne
       |  FROM qprobe q JOIN assigned a USING (cell)
       |  WHERE a.vec_id <> q.query_id),
       |scored AS (
       |  SELECT query_id, neighbor_id, ${cosSql("qe", "ne")} AS cos FROM cand),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
       |  FROM scored)
       |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rk AS INTEGER) AS rk
       |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin

  val oracles: Map[String, String] = Map(
    // full winnowing replay: per-char codes → k-gram rolling hashes
    // (list_reduce mirrors the expression's seed-with-first-char
    // fold) → window minima → sorted distinct fingerprint. Short-text
    // arms mirror the expression exactly: empty → [0], 0 < len < k →
    // one whole-string hash (ASCII contract asserted in the query).
    "t_winnow_fingerprint" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         list_transform(string_split(text, ''),
        |           ch -> CAST(unicode(ch) AS BIGINT)) AS cs
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |         CASE WHEN len(cs) = 0 THEN [CAST(0 AS BIGINT)]
        |              WHEN len(cs) < 8 THEN
        |                [list_reduce(cs, (a, b) -> (a * 257 + b) % 1000000007)]
        |              ELSE list_transform(range(1, len(cs) - 8 + 2),
        |                     i -> list_reduce(cs[i:i+7],
        |                            (a, b) -> (a * 257 + b) % 1000000007)) END AS ks
        |  FROM c),
        |f AS (
        |  SELECT doc_id, len(ks) AS n_kgrams,
        |         list_sort(list_distinct(
        |           CASE WHEN len(ks) < 4 THEN [list_min(ks)]
        |                ELSE list_transform(range(1, len(ks) - 4 + 2),
        |                       i -> list_min(ks[i:i+3])) END)) AS fp
        |  FROM g)
        |SELECT doc_id, CAST(n_kgrams AS BIGINT) AS n_kgrams,
        |       CAST(len(fp) AS BIGINT) AS n_fp,
        |       fp[1] AS fp_min,
        |       md5(array_to_string(fp, ',')) AS fp_md5
        |FROM f ORDER BY doc_id""".stripMargin,
    // winnowing replay (as t_winnow_fingerprint) → inverted-index
    // set-Jaccard over fingerprint hashes, (lang, source)-blocked
    "dedup_winnow_pairs" ->
      """WITH c AS (
        |  SELECT doc_id, lang, source,
        |         list_transform(string_split(text, ''),
        |           ch -> CAST(unicode(ch) AS BIGINT)) AS cs
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, lang, source,
        |         CASE WHEN len(cs) = 0 THEN [CAST(0 AS BIGINT)]
        |              WHEN len(cs) < 8 THEN
        |                [list_reduce(cs, (a, b) -> (a * 257 + b) % 1000000007)]
        |              ELSE list_transform(range(1, len(cs) - 8 + 2),
        |                     i -> list_reduce(cs[i:i+7],
        |                            (a, b) -> (a * 257 + b) % 1000000007)) END AS ks
        |  FROM c),
        |f AS (
        |  SELECT doc_id, lang, source,
        |         list_distinct(CASE WHEN len(ks) < 12 THEN [list_min(ks)]
        |              ELSE list_transform(range(1, len(ks) - 12 + 2),
        |                     i -> list_min(ks[i:i+11])) END) AS fp
        |  FROM g),
        |items AS (SELECT doc_id, lang, source, unnest(fp) AS it FROM f),
        |sizes AS (SELECT doc_id, count(*) AS n FROM items GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM items a JOIN items b
        |    ON a.it = b.it AND a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON d1 = sa.doc_id
        |JOIN sizes sb ON d2 = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
        |ORDER BY d1, d2""".stripMargin,
    "t_bigram_lm" ->
      """WITH big AS (
        |  SELECT bigram, count(*) AS c FROM (
        |    SELECT unnest(CASE WHEN len(toks) < 2 THEN [text]
        |                  ELSE list_transform(range(1, len(toks)),
        |                         i -> toks[i] || ' ' || toks[i+1]) END) AS bigram
        |    FROM (SELECT text, string_split(text, ' ') AS toks FROM documents))
        |  GROUP BY 1 ORDER BY c DESC, bigram LIMIT 20),
        |uni AS (
        |  SELECT w1, count(*) AS c1 FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w1 FROM documents)
        |  GROUP BY 1)
        |SELECT bigram, c, c1,
        |       CAST(c AS DOUBLE) / CAST(c1 AS DOUBLE) AS p_w2_given_w1
        |FROM (SELECT bigram, c, split_part(bigram, ' ', 1) AS w1 FROM big)
        |LEFT JOIN uni USING (w1)
        |ORDER BY c DESC, bigram""".stripMargin,
    "t_pii_scrub" ->
      """SELECT doc_id,
        |       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_digit_runs,
        |       CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT) AS n_cap_words,
        |       CAST(len(regexp_extract_all(text, 'https?://[^ ]+')) AS BIGINT) AS n_urls,
        |       CAST(length(regexp_replace(text, '[0-9]+', '<NUM>', 'g')) AS BIGINT) AS len_scrubbed
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_zipf_buckets" ->
      """SELECT CAST(length(bin(df)) AS BIGINT) AS log2_bucket,
        |       count(*) AS n_tokens, min(df) AS min_df, max(df) AS max_df
        |FROM (SELECT token, count(*) AS df FROM (
        |        SELECT unnest(list_distinct(string_split(text, ' '))) AS token
        |        FROM documents)
        |      GROUP BY 1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "c_higher_order_suite" ->
      """SELECT doc_id,
        |       CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_tok_len,
        |       CAST(len(list_filter(toks, t -> length(t) > 4)) AS BIGINT) AS n_long,
        |       len(list_filter(toks, t -> t = 'the')) > 0 AS has_the,
        |       len(list_filter(toks, t -> NOT length(t) > 0)) = 0 AS all_nonempty,
        |       CAST(list_sum(list_transform(range(1, len(toks) + 1),
        |              i -> CASE WHEN toks[CAST(i AS INTEGER)] = toks[-CAST(i AS INTEGER)]
        |                        THEN 1 ELSE 0 END)) AS BIGINT) AS n_sym_pos
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |ORDER BY doc_id""".stripMargin,
    // full pipeline replay: md5 keep-first + the dedup_groups
    // recursive closure at J≥0.7 → drop non-canonical members →
    // per-lang survivor counts
    "t_corpus_clean" ->
      s"""WITH RECURSIVE $minhashCtes,
        |nodes AS (SELECT DISTINCT d1 AS id FROM lshp UNION SELECT DISTINCT d2 FROM lshp),
        |edges AS (SELECT d1 AS a, d2 AS b FROM lshp UNION SELECT d2, d1 FROM lshp),
        |reach(id, rep) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.a, r.rep FROM edges e JOIN reach r ON e.b = r.id),
        |dropn AS (
        |  SELECT id FROM (SELECT id, min(rep) AS rep FROM reach GROUP BY 1)
        |  WHERE rep <> id),
        |exact AS (
        |  SELECT doc_id, lang FROM (
        |    SELECT doc_id, lang,
        |           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
        |    FROM documents)
        |  WHERE rk = 1),
        |clean AS (
        |  SELECT doc_id, lang FROM exact
        |  WHERE doc_id NOT IN (SELECT id FROM dropn))
        |SELECT r.lang, r.n_raw, e.n_exact_unique, c.n_clean
        |FROM (SELECT lang, count(*) AS n_raw FROM documents GROUP BY 1) r
        |JOIN (SELECT lang, count(*) AS n_exact_unique FROM exact GROUP BY 1) e USING (lang)
        |JOIN (SELECT lang, count(*) AS n_clean FROM clean GROUP BY 1) c USING (lang)
        |ORDER BY lang""".stripMargin,
    // per-lang per-bit majority over the same md5-derived 60-bit
    // hashes as dedup_simhash (bits 60-63 are always 0)
    "a_simhash_agg" ->
      """WITH tok AS (
        |  SELECT lang,
        |         unnest(list_distinct(list_transform(string_split(text, ' '),
        |           t -> list_reduce(list_transform(string_split(substr(md5(t), 1, 15), ''),
        |                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |                (a, b) -> a * 16 + b)))) AS h
        |  FROM documents),
        |bits AS (
        |  SELECT lang, r.b,
        |         CASE WHEN sum(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM tok CROSS JOIN (SELECT unnest(range(0, 60)) AS b) r
        |  GROUP BY 1, 2),
        |sh AS (SELECT lang, CAST(SUM(bit * (1::BIGINT << b)) AS BIGINT) AS corpus_simhash
        |       FROM bits GROUP BY 1),
        |cnt AS (SELECT lang, count(*) AS n_hashes FROM tok GROUP BY 1)
        |SELECT lang, corpus_simhash, n_hashes
        |FROM sh JOIN cnt USING (lang) ORDER BY lang""".stripMargin,
    "c_string_suite2" ->
      """SELECT doc_id,
        |       translate(w, 'aeiou', 'AEIOU') AS t_vowels,
        |       lpad(w, 12, '_') AS t_lpad,
        |       rpad(substr(w, 1, 4), 6, '.') AS t_rpad,
        |       repeat(substr(w, 1, 2), 3) AS t_repeat,
        |       reverse(w) AS t_rev,
        |       regexp_replace(w, 'e', '3', 'g') AS t_leet,
        |       CAST(strpos(w, 'e') AS BIGINT) AS t_pos_e,
        |       substr(w, 1, 2) AS t_left2,
        |       CAST(ascii(w) AS BIGINT) AS t_ascii
        |FROM (SELECT doc_id, split_part(text, ' ', 1) AS w FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t_length_deciles" ->
      """SELECT lang, CAST(decile AS BIGINT) AS decile, count(*) AS n_docs,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM (SELECT lang, n_chars,
        |             ntile(10) OVER (PARTITION BY lang
        |                             ORDER BY n_chars, doc_id) AS decile
        |      FROM documents)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_decontaminate" ->
      """WITH sh AS (
        |  SELECT doc_id, unnest(list_distinct(shingles)) AS sh
        |  FROM (SELECT doc_id,
        |               CASE WHEN len(toks) < 13 THEN [text]
        |                    ELSE list_transform(range(1, len(toks) - 11),
        |                           i -> array_to_string(toks[i:i+12], ' '))
        |               END AS shingles
        |        FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
        |              FROM documents)))
        |SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_shared_13grams
        |FROM (SELECT * FROM sh WHERE doc_id % 50 <> 7) t
        |JOIN (SELECT * FROM sh WHERE doc_id % 50 = 7) e USING (sh)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "c_regex_suite" ->
      """SELECT doc_id,
        |       regexp_extract(text, '^(\w+) (\w+)', 1) AS w1,
        |       regexp_extract(text, '^(\w+) (\w+)', 2) AS w2,
        |       regexp_matches(text, '[0-9]') AS has_digit,
        |       regexp_matches(text, '\b(the|and)\b') AS has_conjunction,
        |       CAST(len(string_split_regex(text, '[aeiou]+')) AS BIGINT) AS n_vowel_splits
        |FROM documents ORDER BY doc_id""".stripMargin,
    "c_null_suite" ->
      """SELECT doc_id,
        |       coalesce(sparse, -1) AS filled,
        |       nullif(sparse, n_chars) IS NULL AS matches_nchars,
        |       CAST(n_chars AS DOUBLE) / CAST(nullif(doc_id % 5, 0) AS DOUBLE) AS try_div,
        |       sparse IS NOT DISTINCT FROM n_chars AS nullsafe_eq,
        |       sparse IS NULL AS is_missing
        |FROM (SELECT doc_id, n_chars,
        |             CASE WHEN doc_id % 3 = 0 THEN n_chars END AS sparse
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "c_map_suite" ->
      """SELECT doc_id, CAST(cardinality(m) AS BIGINT) AS n_keys,
        |       CAST(m['the'][1] AS BIGINT) AS len_the,
        |       CAST(list_sum(map_values(m)) AS BIGINT) AS sum_val_len
        |FROM (SELECT doc_id, map(ks, list_transform(ks, k -> length(k))) AS m
        |      FROM (SELECT doc_id,
        |                   list_sort(list_distinct(string_split(text, ' '))) AS ks
        |            FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "c_generator_suite" ->
      """SELECT token, count(*) AS n_lead, CAST(min(pos) AS BIGINT) AS min_pos
        |FROM (SELECT unnest(toks) AS token, generate_subscripts(toks, 1) AS pos
        |      FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |WHERE pos <= 3
        |GROUP BY 1 ORDER BY n_lead DESC, token LIMIT 30""".stripMargin,
    "dedup_edit_distance" ->
      """SELECT a.doc_id AS d1, b.doc_id AS d2,
        |       CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
        |FROM (SELECT doc_id, lang, source, substr(text, 1, 40) AS prefix
        |      FROM documents WHERE doc_id % 7 = 0) a
        |JOIN (SELECT doc_id, lang, source, substr(text, 1, 40) AS prefix
        |      FROM documents WHERE doc_id % 7 = 0) b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.prefix, b.prefix) <= 10
        |ORDER BY d1, d2""".stripMargin,
    "mm_modality_route" ->
      """SELECT modality, count(*) AS n_docs,
        |       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
        |       max(n_bytes) AS max_bytes
        |FROM (SELECT CASE WHEN octet_length(CAST(text AS BLOB)) % 3 = 0 THEN 'image'
        |                  WHEN octet_length(CAST(text AS BLOB)) % 3 = 1 THEN 'audio'
        |                  ELSE 'video' END AS modality,
        |             CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
        |      FROM documents)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "sim_cosine_lsh" -> lshOracleSql,
    "sim_cosine_ivf" -> ivfOracleSql,
    // full simhash replay: md5-hex-fold token hashes → per-bit
    // majority (bits 60-63 are always 0: hashes < 2^60) → blocked
    // pairwise Hamming. Matches the lossless-banded Spark plan.
    "dedup_simhash" ->
      """WITH tok AS (
        |  SELECT doc_id, lang, source,
        |         unnest(list_distinct(list_transform(string_split(text, ' '),
        |           t -> list_reduce(list_transform(string_split(substr(md5(t), 1, 15), ''),
        |                  c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |                (a, b) -> a * 16 + b)))) AS h
        |  FROM documents),
        |bits AS (
        |  SELECT doc_id, lang, source, r.b,
        |         CASE WHEN sum(CASE WHEN (h >> r.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
        |              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
        |  FROM tok CROSS JOIN (SELECT unnest(range(0, 60)) AS b) r
        |  GROUP BY 1, 2, 3, 4),
        |sh AS (SELECT doc_id, lang, source, sum(bit * (1::BIGINT << b)) AS simhash
        |       FROM bits GROUP BY 1, 2, 3)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
        |FROM sh a JOIN sh b
        |  ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
        |ORDER BY d1, d2""".stripMargin,
    "t_bpe_merges" ->
      """WITH tok AS (
        |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
        |p AS (
        |  SELECT unnest(list_transform(range(1, length(tok)),
        |           i -> substr(tok, i, 2))) AS pair
        |  FROM tok WHERE length(tok) >= 2)
        |SELECT pair, CAST(count(*) AS BIGINT) AS n
        |FROM p GROUP BY 1 ORDER BY n DESC, pair LIMIT 30""".stripMargin,
    // incremental banding replayed: the same signature CTEs, with
    // candidates restricted to new(batch)×old(corpus) band meets —
    // never old×old — then exact cross-side Jaccard
    "dedup_incremental" ->
      s"""WITH $minhashCtes,
         |icand AS (
         |  SELECT DISTINCT n.doc_id AS nd, o.doc_id AS od
         |  FROM banded n JOIN banded o ON n.b = o.b AND n.key = o.key
         |  WHERE n.doc_id % 10 = 0 AND o.doc_id % 10 <> 0),
         |iint AS (
         |  SELECT a.doc_id AS nd, b.doc_id AS od, count(*) AS i
         |  FROM hflat a JOIN hflat b ON a.h = b.h
         |  WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
         |  GROUP BY 1, 2),
         |ver AS (
         |  SELECT c.nd, c.od,
         |         CAST(i.i AS DOUBLE) / CAST(sa.n + sb.n - i.i AS DOUBLE) AS j
         |  FROM icand c
         |  JOIN iint i ON c.nd = i.nd AND c.od = i.od
         |  JOIN sizes sa ON c.nd = sa.doc_id
         |  JOIN sizes sb ON c.od = sb.doc_id)
         |SELECT nd AS new_doc_id, CAST(count(*) AS BIGINT) AS n_matches,
         |       min(od) AS first_match, max(j) AS best_jaccard
         |FROM ver WHERE j >= 0.7 GROUP BY 1 ORDER BY 1""".stripMargin,
    // chunk windows replayed with list slicing; DuckDB clamps
    // toks[a:b] at the list end exactly like slice()'s length cap
    "t_chunk_overlap" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 24)) AS st
        |      FROM d WHERE len(toks) > 0)
        |SELECT doc_id, CAST(st // 24 AS BIGINT) AS chunk_index,
        |       CAST(len(toks[st + 1 : st + 32]) AS BIGINT) AS n_chunk_tokens,
        |       md5(array_to_string(toks[st + 1 : st + 32], ' ')) AS chunk_fp
        |FROM s ORDER BY doc_id, chunk_index""".stripMargin,
    // priority = ((v+1)/2^52)/n_chars with v = first 13 md5 nibbles:
    // u is exact (power-of-two denominator), so the single division
    // is bit-identical cross-engine and the double survives the
    // exact-equality compare
    "t_weighted_sample" ->
      """SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight,
        |       (CAST(list_reduce(list_transform(
        |            string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), ''),
        |            c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |          (a, b) -> a * 16 + b) + 1 AS DOUBLE) / 4503599627370496.0)
        |         / n_chars AS priority
        |FROM documents
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin,
    // epoch planner: replay the budget arithmetic exactly — integer
    // stats, left-assoc double division, md5-uniform extra-epoch set
    "t_source_epochs" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         (CAST(list_reduce(list_transform(
        |              string_split(substr(md5(CAST(doc_id AS VARCHAR)), 1, 13), ''),
        |              c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)),
        |            (a, b) -> a * 16 + b) + 1 AS DOUBLE) / 4503599627370496.0) AS u
        |  FROM documents),
        |s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(n_tok) AS BIGINT) AS src_tokens,
        |         CAST(1 + (CAST(substr(source, 4) AS INT) % 4) AS INT) AS w
        |  FROM d GROUP BY source),
        |t AS (SELECT CAST(SUM(src_tokens) AS BIGINT) AS tot,
        |             CAST(SUM(w) AS BIGINT) AS wsum FROM s),
        |p AS (
        |  SELECT source, n_docs, src_tokens,
        |         CAST(floor(r) AS BIGINT) AS base_epochs, r - floor(r) AS frac
        |  FROM (SELECT s.*, tot * w / wsum / src_tokens AS r FROM s, t))
        |SELECT p.source, p.n_docs, p.src_tokens, p.base_epochs,
        |       CAST(SUM(CASE WHEN d.u < p.frac THEN 1 ELSE 0 END) AS BIGINT) AS n_upsampled,
        |       CAST(p.base_epochs * p.src_tokens +
        |            SUM(CASE WHEN d.u < p.frac THEN d.n_tok ELSE 0 END) AS BIGINT) AS emitted_tokens,
        |       CAST(SUM(CASE WHEN d.u < p.frac THEN d.doc_id ELSE 0 END) AS BIGINT) AS upsampled_id_sum
        |FROM d JOIN p USING (source)
        |GROUP BY p.source, p.n_docs, p.src_tokens, p.base_epochs
        |ORDER BY p.source""".stripMargin,
    // training order: replay the epoch expansion, md5 shard routing,
    // and the in-shard order itself (ordered string_agg fingerprint)
    "o_training_order" ->
      """WITH e AS (
        |  SELECT doc_id,
        |         unnest(range(0, 1 + (CAST(substr(source, 4) AS INT) % 4))) AS epoch
        |  FROM documents),
        |k AS (
        |  SELECT doc_id, epoch,
        |         md5(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR)) AS key
        |  FROM e)
        |SELECT CAST(strpos('0123456789abcdef', substr(key, 1, 1)) - 1 AS INT) AS shard,
        |       CAST(COUNT(*) AS BIGINT) AS n_items,
        |       CAST(SUM(epoch) AS BIGINT) AS epoch_sum,
        |       md5(string_agg(CAST(doc_id AS VARCHAR) || ':' || CAST(epoch AS VARCHAR), '|'
        |           ORDER BY key, doc_id, epoch)) AS order_fingerprint
        |FROM k GROUP BY 1 ORDER BY shard""".stripMargin,
    // quality sweep: same per-doc score expression t_quality_score
    // hash-matches, swept over 9 thresholds from a range cross
    "t_quality_sweep" ->
      """WITH b AS (
        |  SELECT lang,
        |         (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |           * least(CAST(length(text) - n_tokens + 1 AS DOUBLE)
        |                   / CAST(n_tokens AS DOUBLE), 10.0) / 10.0 AS q,
        |         CAST(n_tokens AS BIGINT) AS n_tok
        |  FROM (SELECT lang, text,
        |               len(string_split(text, ' ')) AS n_tokens,
        |               len(list_filter(string_split(text, ' '),
        |                   t -> t IN ('the','a','of','and','to'))) AS n_stops
        |        FROM documents)),
        |th AS (SELECT unnest(range(1, 10)) AS i)
        |SELECT b.lang, i / 10.0 AS threshold,
        |       CAST(SUM(CASE WHEN b.q >= i / 10.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
        |       CAST(SUM(CASE WHEN b.q >= i / 10.0 THEN b.n_tok ELSE 0 END) AS BIGINT) AS tokens_kept
        |FROM b, th
        |GROUP BY 1, 2 ORDER BY lang, threshold""".stripMargin,
    // the dedup_groups recursive closure + per-group argmax survivor
    "dedup_resolve_best" ->
      s"""WITH RECURSIVE $minhashCtes,
         |nodes AS (SELECT DISTINCT d1 AS id FROM lshp UNION SELECT d2 FROM lshp),
         |edges AS (SELECT d1 AS a, d2 AS b FROM lshp UNION SELECT d2, d1 FROM lshp),
         |reach(id, rep) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.rep FROM edges e JOIN reach r ON e.b = r.id),
         |grp AS (SELECT id, min(rep) AS rep FROM reach GROUP BY 1),
         |m AS (SELECT g.rep, d.doc_id, d.n_chars
         |      FROM grp g JOIN documents d ON d.doc_id = g.id),
         |r AS (SELECT rep, doc_id, n_chars,
         |        row_number() OVER (PARTITION BY rep
         |          ORDER BY n_chars DESC, doc_id) AS rn,
         |        count(*) OVER (PARTITION BY rep) AS n
         |      FROM m)
         |SELECT rep AS canonical_id, CAST(n AS BIGINT) AS n_members,
         |       doc_id AS survivor_id, CAST(n_chars AS BIGINT) AS survivor_chars
         |FROM r WHERE rn = 1 AND n > 1 ORDER BY canonical_id""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS text_len,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |       CAST(len(regexp_extract_all(text, '[a-z]{1,4}')) AS BIGINT) AS n_subword_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_normalize" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS raw_len,
        |       CAST(length(norm) AS BIGINT) AS norm_len,
        |       md5(norm) AS norm_fingerprint
        |FROM (SELECT doc_id, text,
        |        trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |             ' +', ' ', 'g')) AS norm
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t_mixture_sample" ->
      """SELECT lang, count(*) AS n_sampled, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
        |FROM (
        |  SELECT lang, doc_id,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |WHERE rk <= CASE WHEN lang = 'en' THEN 15 ELSE 5 END
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_repetition" ->
      """WITH cnt AS (
        |  SELECT doc_id, tok, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS distinct_frac,
        |       CAST(max(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_token_frac
        |FROM cnt GROUP BY 1 ORDER BY 1""".stripMargin,
    "t_pack_sequences" ->
      """WITH keyed AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
        |         md5(CAST(doc_id AS VARCHAR)) AS key,
        |         substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
        |  FROM documents),
        |binned AS (
        |  SELECT shard,
        |         CAST(floor((SUM(n_tok) OVER (PARTITION BY shard ORDER BY key, doc_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tok)
        |           / 2048.0) AS BIGINT) AS bin,
        |         n_tok
        |  FROM keyed)
        |SELECT shard, bin, count(*) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS total_tokens
        |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "t_quality_score" ->
      """SELECT doc_id,
        |       CAST(n_tokens AS BIGINT) AS n_tokens,
        |       CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stop_ratio,
        |       CAST(length(text) - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS avg_word_len,
        |       (1.0 - CAST(n_stops AS DOUBLE) / CAST(n_tokens AS DOUBLE))
        |         * least(CAST(length(text) - n_tokens + 1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 10.0) / 10.0
        |         AS quality_score
        |FROM (SELECT doc_id, text,
        |             len(string_split(text, ' ')) AS n_tokens,
        |             len(list_filter(string_split(text, ' '),
        |                 t -> t IN ('the','a','of','and','to'))) AS n_stops
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t_fingerprint_md5" ->
      """SELECT doc_id, md5(text) AS fingerprint,
        |       md5(lower(text)) AS fingerprint_normalized
        |FROM documents ORDER BY doc_id""".stripMargin,
    "t_stratified_sample" ->
      """SELECT lang, doc_id, n_chars
        |FROM (SELECT lang, doc_id, n_chars,
        |             row_number() OVER (PARTITION BY lang
        |                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |      FROM documents)
        |WHERE rk <= 10 ORDER BY lang, doc_id""".stripMargin,
    "c_array_suite" ->
      """SELECT doc_id,
        |       CAST(len(toks) AS BIGINT) AS n_distinct,
        |       toks[1] AS first_token,
        |       toks[-1] AS last_token,
        |       list_contains(toks, 'spark') AS has_spark,
        |       array_to_string(toks[1:3], '|') AS first3
        |FROM (SELECT doc_id,
        |             list_sort(list_distinct(string_split(text, ' '))) AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "t_doc_frequency" ->
      """SELECT token, count(*) AS df
        |FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
        |      FROM documents)
        |GROUP BY 1 ORDER BY df DESC, token""".stripMargin,
    "t_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, token, count(*) AS tf
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |  GROUP BY 1, 2),
        |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
        |SELECT doc_id, token, tf, df, CAST(rk AS INTEGER) AS rk FROM (
        |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |         row_number() OVER (PARTITION BY tf.doc_id
        |                            ORDER BY tf.tf DESC, df.df ASC, tf.token) AS rk
        |  FROM tf JOIN df ON tf.token = df.token)
        |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,
    "t_split_assign" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
        |            ELSE 'train' END AS split,
        |       lang, count(*) AS n
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_exact" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
        |       count(*) - count(DISTINCT md5(text)) AS n_dups
        |FROM documents""".stripMargin,
    "dedup_jaccard_pairs" ->
      """WITH tokens AS (
        |  SELECT doc_id, lang, source,
        |         unnest(list_distinct(string_split(text, ' '))) AS tok
        |  FROM documents),
        |sizes AS (SELECT doc_id, count(*) AS n FROM tokens GROUP BY 1),
        |inter AS (
        |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
        |  FROM tokens a JOIN tokens b
        |    ON a.tok = b.tok AND a.lang = b.lang AND a.source = b.source
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON d1 = sa.doc_id
        |JOIN sizes sb ON d2 = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.9
        |ORDER BY d1, d2""".stripMargin,
    "dedup_ngram_jaccard" ->
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
        |   AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT d1, d2, CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) AS jaccard
        |FROM inter
        |JOIN sizes sa ON d1 = sa.doc_id
        |JOIN sizes sb ON d2 = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / CAST(sa.n + sb.n - i AS DOUBLE) >= 0.5
        |ORDER BY d1, d2""".stripMargin,
    // exact oracle: LSH + exact verification emits precisely the
    // full-pairwise shingle-Jaccard pairs at t=0.7 (unblocked)
    "dedup_minhash_lsh" ->
      s"""WITH $minhashCtes
         |SELECT d1, d2, jaccard FROM lshp ORDER BY d1, d2""".stripMargin,
    // the estimate is REPLAYED from the sig CTE (matching positions
    // / 64), not pinned TRUE: at k=64 the 0.25 band is ~4σ, so rare
    // legitimate outliers exist at scale (the sf1 probe surfaced
    // one) — both engines must compute the same boolean, whatever it
    // is; DedupSpec separately asserts the distributional contract
    "dedup_minhash_est" ->
      s"""WITH $minhashCtes,
         |est AS (
         |  SELECT p.d1, p.d2, p.jaccard,
         |         CAST(len(list_filter(range(1, 65),
         |             i -> s1.sig[i] = s2.sig[i])) AS DOUBLE) / 64.0 AS est
         |  FROM lshp p JOIN sig s1 ON p.d1 = s1.doc_id
         |              JOIN sig s2 ON p.d2 = s2.doc_id)
         |SELECT d1, d2, jaccard, abs(est - jaccard) <= 0.25 AS est_within_025
         |FROM est ORDER BY d1, d2""".stripMargin,
    // connected components of the banded pair graph via recursive
    // min-label closure — the SQL twin of Dedup.dupGroups'
    // propagation loop
    "dedup_groups" ->
      s"""WITH RECURSIVE $minhashCtes,
         |nodes AS (SELECT DISTINCT d1 AS id FROM lshp UNION SELECT d2 FROM lshp),
         |edges AS (SELECT d1 AS a, d2 AS b FROM lshp UNION SELECT d2, d1 FROM lshp),
         |reach(id, rep) AS (
         |  SELECT id, id FROM nodes
         |  UNION
         |  SELECT e.a, r.rep FROM edges e JOIN reach r ON e.b = r.id)
         |SELECT rep AS canonical_id, CAST(count(*) AS BIGINT) AS group_size
         |FROM (SELECT id, min(rep) AS rep FROM reach GROUP BY 1)
         |GROUP BY 1 HAVING count(*) > 1 ORDER BY 1""".stripMargin,
    // marker-stopword scoring, argmax with first-language tiebreak —
    // the SQL mirror of TextFunctions.langId's reduceLeft
    "t_langid" ->
      """SELECT doc_id, lang AS labeled_lang,
        |  (SELECT l FROM (VALUES
        |     ('de', len(list_filter(toks, t -> t IN ('der','die','und','ist','das','nicht')))),
        |     ('en', len(list_filter(toks, t -> t IN ('the','and','of','to','is','in')))),
        |     ('es', len(list_filter(toks, t -> t IN ('el','la','de','que','los','una')))),
        |     ('fr', len(list_filter(toks, t -> t IN ('le','la','et','les','des','est')))),
        |     ('pt', len(list_filter(toks, t -> t IN ('o','a','de','que','não','uma'))))
        |   ) s(l, sc) ORDER BY sc DESC, l LIMIT 1) AS predicted_lang
        |FROM (SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS toks
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH e AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings)
        |SELECT v1, v2, round(cos, 6) AS cosine FROM (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2,
        |         list_sum(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * b.emb[i]))
        |           / (sqrt(list_sum(list_transform(range(1, len(a.emb) + 1), i -> a.emb[i] * a.emb[i])))
        |              * sqrt(list_sum(list_transform(range(1, len(b.emb) + 1), i -> b.emb[i] * b.emb[i]))))
        |           AS cos
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cos >= 0.4
        |ORDER BY v1, v2""".stripMargin,
    "sim_cosine_topk" ->
      """WITH e AS (
        |  SELECT vec_id,
        |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |  FROM embeddings),
        |q AS (SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < 10),
        |pairs AS (
        |  SELECT q.query_id, e.vec_id AS neighbor_id,
        |         list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * e.emb[i]))
        |           / (sqrt(list_sum(list_transform(range(1, len(q.qe) + 1), i -> q.qe[i] * q.qe[i])))
        |              * sqrt(list_sum(list_transform(range(1, len(e.emb) + 1), i -> e.emb[i] * e.emb[i]))))
        |           AS cos
        |  FROM q, e WHERE e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cos,
        |         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rk
        |  FROM pairs)
        |SELECT query_id, neighbor_id, round(cos, 6) AS cosine, CAST(rk AS INTEGER) AS rk
        |FROM ranked WHERE rk <= 5 ORDER BY query_id, rk""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |         64 + (octet_length(CAST(text AS BLOB)) * 7) % 513 AS w,
        |         64 + (octet_length(CAST(text AS BLOB)) * 13) % 513 AS h,
        |         1 + octet_length(CAST(text AS BLOB)) % 30 AS n_frames
        |  FROM documents),
        |x AS (SELECT doc_id, text, n_frames, w, h,
        |             unnest(range(0, least(n_frames, 3))) AS frame_idx
        |      FROM f)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |       CAST(frame_idx AS BIGINT) AS frame_idx,
        |       md5(text || '#' || CAST(frame_idx AS VARCHAR)) AS frame_hash,
        |       CAST(224 AS BIGINT) AS resized_w,
        |       CAST(h * 224 // w AS BIGINT) AS resized_h
        |FROM x ORDER BY doc_id, frame_idx""".stripMargin,
    "mm_binary_features" ->
      """SELECT doc_id,
        |       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |       CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 513 AS BIGINT) AS width,
        |       CAST(64 + (octet_length(CAST(text AS BLOB)) * 13) % 513 AS BIGINT) AS height,
        |       CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS BIGINT) AS n_frames,
        |       substr(md5(text), 1, 16) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin)
}
