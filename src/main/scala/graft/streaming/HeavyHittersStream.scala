package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.functions.{MisraGries, TextFunctions => TF}

/** Streaming heavy hitters: the Misra-Gries sketch as a streaming
  * aggregation — per language, the running ≤k-entry frequent-token
  * summary over everything ingested so far. Because MG reduce/merge
  * are the Aggregator's own methods, Spark maintains the sketch AS
  * the aggregation state: each micro-batch folds its tokens into the
  * ≤k-entry buffer, state size is O(langs × k) forever, and the
  * shuffle per batch carries one buffer per partition — the exact
  * property that makes frequent-items viable on an unbounded stream.
  * The MG guarantees (containment above N/(k+1), underestimates
  * bounded by N/(k+1)) hold for any merge order, hence for any
  * micro-batch arrival pattern — StreamingSpec pins stream-vs-batch
  * contract equivalence.
  */
object HeavyHittersStream {
  /** Shared transform (batch or streaming input). */
  def sketchByLang(docs: DataFrame, k: Int): DataFrame = {
    val mg = udaf(new MisraGries(k))
    docs.select(col("lang"), explode(TF.tokens(col("text"))).as("token"))
      .groupBy(col("lang"))
      .agg(mg(col("token")).as("sketch"), count(lit(1)).as("n"))
  }

  def start(spark: SparkSession, srcDir: String, queryName: String,
      k: Int = 8): StreamingQuery =
    sketchByLang(
      spark.readStream.schema(CorpusStream.docSchema).parquet(srcDir), k)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
