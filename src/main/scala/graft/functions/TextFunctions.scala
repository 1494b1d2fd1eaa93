package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for LLM training-data pipelines, built
  * from codegen'd `functions._` only (no UDFs in the hot path) so
  * they stay inside WholeStageCodegen at 100 TB.
  */
object TextFunctions {
  /** Whitespace tokens. Texts are single-space separated here; the
    * regex handles general whitespace. */
  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Word n-gram shingles: n consecutive tokens joined by space.
    * Native single-pass expression (graft.plans.TokenShingles) —
    * the interpreted transform(sequence, slice, concat_ws) pipeline
    * it replaces rebuilt every window via boxed array slices at
    * ~0.9 ms/doc; the primitive pass is ~5 µs/doc. */
  def shingles(text: Column, n: Int): Column =
    graft.plans.HashExpressions.tokenShingles(tokens(text), n)

  /** 64-bit hashes of distinct shingles — input to MinHash/SimHash.
    * Computed by the native TokenShingleHashes expression (one
    * primitive pass; see graft.plans) rather than interpreted
    * transform(slice+concat_ws)+xxhash64 string rebuilding. */
  def shingleHashes(text: Column, n: Int): Column =
    array_distinct(
      graft.plans.HashExpressions.tokenShingleHashes(tokens(text), n))

  /** Stable document fingerprint (exact-dup key). md5 matches every
    * other engine's md5 — portable across the oracle boundary. */
  def fingerprint(text: Column): Column = md5(text)

  /** Portable 60-bit token hashes: first 15 hex chars of md5,
    * parsed base-16 — computable identically in any engine with md5
    * (the DuckDB oracle folds the same hex digits). 15 hex chars
    * keep the value < 2⁶⁰, inside BIGINT everywhere. Computed by the
    * native Md5TokenHashes expression (digest bytes → long, no
    * hex-string round-trip, no interpreted HOF); slower than the
    * native FNV [[shingleHashes]], used where the oracle must replay
    * hashing end-to-end (portable SimHash). */
  def md5TokenHashes(text: Column): Column =
    array_distinct(graft.plans.HashExpressions.md5TokenHashes(tokens(text)))

  /** Portable 60-bit hashes of distinct n-gram SHINGLES — the
    * oracle-replayable variant of [[shingleHashes]] (same
    * md5-vs-native-FNV trade as [[md5TokenHashes]]): used where the
    * DuckDB oracle must replay MinHash banding end-to-end instead of
    * assuming LSH recall. */
  def md5ShingleHashes(text: Column, n: Int): Column =
    array_distinct(graft.plans.HashExpressions.md5TokenHashes(shingles(text, n)))

  /** Simple quality features: stopword ratio + average word length
    * → composite score in [0,1]. All integer-derived doubles with a
    * fixed op order (deterministic under reordering/shuffle). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = filter(toks, t => t.isin(stopwords: _*))
    size(stops).cast("double") / size(toks).cast("double")
  }

  def avgWordLen(text: Column): Column =
    (length(text) - tokenCount(text) + 1).cast("double") /
      tokenCount(text).cast("double")

  def qualityScore(text: Column): Column =
    (lit(1.0) - stopwordRatio(text)) * least(avgWordLen(text), lit(10.0)) / 10.0

  /** Heuristic language ID: score marker-stopword hits per language,
    * pick argmax (ties → lexicographically first language). Real
    * content-based langid; the synthetic corpus shares one vocab so
    * accuracy there is meaningless — unit-tested on natural text.
    */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "los", "una"),
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est"),
    "pt" -> Seq("o", "a", "de", "que", "não", "uma"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    // struct(score, negated-lang) max ⇒ argmax with deterministic ties
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, ms) =>
      struct(size(filter(toks, t => t.isin(ms: _*))).as("score"),
        lit(lang).as("lang"))
    }
    // greatest by score then FIRST lang on ties: iterate in order,
    // strictly-greater replaces → first max wins
    scored.reduceLeft { (best, cand) =>
      when(cand.getField("score") > best.getField("score"), cand).otherwise(best)
    }.getField("lang")
  }
}
