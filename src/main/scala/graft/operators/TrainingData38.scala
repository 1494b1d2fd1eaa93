package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.sources.Tables

/** Round-9 batch 33: Flesch reading-ease scoring with a
  * deterministic vowel-group syllable proxy (Flesch 1948 — the
  * readability gate CC curation pipelines run), per-language
  * tokenizer fertility (subwords per word — the multilingual
  * tokenizer-budget audit, Rust et al. 2021), and boilerplate
  * detection by common document suffixes (the footer/navigation
  * text that template-heavy crawls repeat). All one-scan
  * integer-exact aggregates with full-replay DuckDB oracles.
  */
object TrainingData38 {
  private type Q = (SparkSession, String) => DataFrame
  private def d(c: Column): Column = c.cast("double")
  private def docs(s: SparkSession, dir: String) =
    Tables.table(s, dir, "documents")

  // ---------------------------------------------------------------
  // t_readability — Flesch Reading Ease per document:
  //   FRE = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
  // with syllables ≈ vowel groups ([aeiouy]+ runs, the standard
  // dictionary-free proxy) and sentences = [.!?]+ runs floored at 1.
  // Scale shape: pure codegen'd per-row expressions — one scan, no
  // shuffle before the presentation sort; the three counters are
  // exact integers, FRE is one fixed double DAG rounded at the edge.
  // ---------------------------------------------------------------
  val tReadability: Q = (s, dir) => {
    val base = docs(s, dir).select(col("doc_id"), col("lang"),
      TF.tokenCount(col("text")).as("n_words"),
      greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
        .cast("long").as("n_sentences"),
      regexp_count(lower(col("text")), lit("[aeiouy]+"))
        .cast("long").as("n_syllables"))
    val fre = lit(206.835) -
      lit(1.015) * (d(col("n_words")) / d(col("n_sentences"))) -
      lit(84.6) * (d(col("n_syllables")) / d(col("n_words")))
    base.select(col("doc_id"), col("lang"), col("n_words"),
        col("n_sentences"), col("n_syllables"),
        round(fre, 6).as("flesch"),
        when(fre >= 60.0, "easy").when(fre >= 30.0, "medium")
          .otherwise(lit("hard")).as("band"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------
  // t_tokenizer_fertility — subwords per whitespace word, by
  // language: the audit that says how many tokens a fixed-budget
  // tokenizer spends per language (fertility ≫ 1 = the language is
  // under-served and its effective context shrinks). Subword proxy:
  // a bounded-piece tokenizer that splits every word into ⌈len/4⌉
  // pieces (the deterministic stand-in for a BPE vocab — piece
  // count, not piece identity, is what fertility measures). Scale
  // shape: one scan, integer counters, one 5-key shuffle; both
  // counts are map-combinable sums.
  // ---------------------------------------------------------------
  val tTokenizerFertility: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    docs(s, dir).select(col("lang"),
        size(toks).cast("long").as("w"),
        aggregate(transform(toks, t => ceil(length(t) / lit(4.0)).cast("long")),
          lit(0L), (a, x) => a + x).as("sw"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("w")).cast("long").as("n_words"),
        sum(col("sw")).cast("long").as("n_subwords"))
      .withColumn("fertility",
        round(d(col("n_subwords")) / d(col("n_words")), 6))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------
  // t_boilerplate_suffix — template/boilerplate detection: the last
  // 3 tokens of each document as a suffix key, counted across the
  // corpus; a suffix shared by many documents is footer/navigation
  // boilerplate (the crawl-cleaning heuristic behind trafilatura-
  // style pruning). Top-10 by count with corpus share. Scale shape:
  // the suffix key is a codegen'd slice (no explode — one row per
  // doc), one hash aggregate, TakeOrderedAndProject for the top-k;
  // the ONE-ROW corpus total broadcasts into the share.
  // ---------------------------------------------------------------
  val tBoilerplateSuffix: Q = (s, dir) => {
    val toks = TF.tokens(col("text"))
    val suffix = array_join(
      slice(toks, greatest(size(toks) - 2, lit(1)), lit(3)), " ")
    val counts = docs(s, dir).select(suffix.as("suffix"))
      .groupBy(col("suffix")).agg(count(lit(1)).cast("long").as("n_docs"))
    val tot = docs(s, dir).agg(count(lit(1)).cast("long").as("n_total"))
    counts.crossJoin(broadcast(tot))
      .select(col("suffix"), col("n_docs"),
        round(d(col("n_docs")) / d(col("n_total")), 6).as("share"))
      .orderBy(desc("n_docs"), col("suffix"))
      .limit(10)
  }

  val queries: Map[String, Q] = Map(
    "t_readability" -> tReadability,
    "t_tokenizer_fertility" -> tTokenizerFertility,
    "t_boilerplate_suffix" -> tBoilerplateSuffix)

  val oracles: Map[String, String] = Map(
    "t_readability" ->
      """WITH base AS (
        |  SELECT doc_id, lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
        |           AS BIGINT) AS n_sentences,
        |         CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |           AS BIGINT) AS n_syllables
        |  FROM documents),
        |f AS (
        |  SELECT *,
        |         206.835
        |           - 1.015 * (n_words::DOUBLE / n_sentences::DOUBLE)
        |           - 84.6 * (n_syllables::DOUBLE / n_words::DOUBLE) AS fre
        |  FROM base)
        |SELECT doc_id, lang, n_words, n_sentences, n_syllables,
        |       round(fre, 6) AS flesch,
        |       CASE WHEN fre >= 60.0 THEN 'easy'
        |            WHEN fre >= 30.0 THEN 'medium'
        |            ELSE 'hard' END AS band
        |FROM f ORDER BY doc_id""".stripMargin,
    "t_tokenizer_fertility" ->
      """WITH per AS (
        |  SELECT lang,
        |         CAST(len(toks) AS BIGINT) AS w,
        |         CAST(list_sum(list_transform(toks,
        |           t -> CAST(ceil(length(t) / 4.0) AS BIGINT))) AS BIGINT) AS sw
        |  FROM (SELECT lang, string_split(text, ' ') AS toks FROM documents))
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(w) AS BIGINT) AS n_words,
        |       CAST(sum(sw) AS BIGINT) AS n_subwords,
        |       round(CAST(sum(sw) AS BIGINT)::DOUBLE
        |         / CAST(sum(w) AS BIGINT)::DOUBLE, 6) AS fertility
        |FROM per GROUP BY lang ORDER BY lang""".stripMargin,
    "t_boilerplate_suffix" ->
      """WITH sfx AS (
        |  SELECT array_to_string(toks[greatest(len(toks) - 2, 1):], ' ')
        |    AS suffix
        |  FROM (SELECT string_split(text, ' ') AS toks FROM documents)),
        |cnt AS (
        |  SELECT suffix, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM sfx GROUP BY 1),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents)
        |SELECT suffix, n_docs,
        |       round(n_docs::DOUBLE / n_total::DOUBLE, 6) AS share
        |FROM cnt CROSS JOIN tot
        |ORDER BY n_docs DESC, suffix LIMIT 10""".stripMargin)
}
