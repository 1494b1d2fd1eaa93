package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.functions.{TextFunctions => TF}
import graft.sources.Sinks

/** Streaming training-data ingest: document files land continuously,
  * each micro-batch is quality-filtered, normalized, fingerprinted,
  * and appended exactly-once by content fingerprint — the streaming
  * twin of the batch corpus-cleaning ops (t_normalize /
  * t_quality_score / dedup_exact). Re-delivered or re-scraped
  * documents with identical content are dropped by the
  * key-idempotent sink regardless of arrival batch, so the corpus
  * stays exact-dup-free without any global state: the dedup "state"
  * IS the sink, probed with a keys-only column-pruned scan.
  */
object CorpusStream {
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("text", StringType),
    StructField("n_chars", LongType)))

  /** Per-batch transform, also usable in batch mode (spec pins
    * stream ≡ batch). Quality gate: ≥ minTokens tokens and quality
    * score above the floor. */
  def prepare(docs: DataFrame, minTokens: Int = 5,
      minQuality: Double = 0.2): DataFrame =
    docs
      .filter(TF.tokenCount(col("text")) >= minTokens &&
        TF.qualityScore(col("text")) > minQuality)
      .withColumn("fingerprint", TF.fingerprint(col("text")))
      .withColumn("n_tokens", TF.tokenCount(col("text")))

  def start(spark: SparkSession, srcDir: String,
      corpusPath: String): StreamingQuery =
    spark.readStream.schema(docSchema).parquet(srcDir)
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Sinks.appendDedup(prepare(batch), corpusPath, "fingerprint")
        ()
      }
      .start()
}
