package graft.enrich

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Domains, EnrichedHeadline, RawHeadline}

/** Enrichment boundary — the reference's only "UDF" is a per-row
  * LLM call (reference: scripts/llm_enricher.py:148-211). It is
  * side-effecting, non-deterministic and I/O-bound, so it is NOT a
  * Catalyst `Expression`: it runs as `mapPartitions` with one client
  * per partition (the Spark analog of the reference's single client
  * + 50-row serial batches; partition parallelism replaces batching).
  *
  * At 100 TB scale this boundary is the expensive step: partition
  * count bounds the request concurrency, and each partition's
  * iterator streams rows without materializing the partition.
  */
trait Enricher extends Serializable {
  /** Classify one headline → (sentiment, category, confidence). */
  def classify(title: String, rowIndex: Long): (String, String, Double)
}

/** Deterministic mock (reference: scripts/llm_test_enricher.py:191-198):
  * `sentiment = [Positiva,Negativa,Neutra][i % 3]`,
  * `category = first-5-categories[i % 5]` keyed by a stable row
  * index. Spark has no implicit row order, so the index convention
  * is `row_number() over (order by link) - 1` (SURVEY §7.5).
  */
object MockEnricher extends Enricher {
  private val cats = Domains.categories.take(5)
  override def classify(title: String, i: Long): (String, String, Double) =
    (Domains.sentiments((i % 3).toInt), cats((i % 5).toInt),
      Domains.clampConfidence(0.5 + (i % 50) / 100.0))
}

/** Bronze row + the stable mock index (SURVEY §7.5 convention). */
final case class IndexedRaw(title: String, link: String, source: String,
    scraped_at: Timestamp, row_index: Long)

object Enrich {
  /** Enrich a bronze batch into silver rows. Deterministic given a
    * deterministic Enricher and `now`. The stable row index is
    * assigned with [[graft.operators.Ranking.withGlobalRank]] —
    * range-partition by `link` + per-partition local rank + carried
    * offsets — which keeps the `order by link` total-order contract
    * (SURVEY §2.11) bit-identical while planning NO unpartitioned
    * WindowExec: the previous `row_number().over(Window.orderBy)`
    * funneled the whole bronze corpus through one reducer, the
    * parity pipeline's only genuine 100×-scale killer (round-12
    * verdict). PlanSpec pins the absence of a single-partition
    * window in this path.
    */
  def enrichBatch(spark: SparkSession, bronze: Dataset[RawHeadline],
      enricher: Enricher, now: Timestamp,
      modelUsed: String = "gpt-3.5-turbo-1106"): Dataset[EnrichedHeadline] = {
    import spark.implicits._
    val indexed = graft.operators.Ranking
      .withGlobalRank(bronze.toDF(), "row_index", $"link")
      .withColumn("row_index", col("row_index") - 1)
      .as[IndexedRaw]
    indexed.mapPartitions { it =>
      // one enricher "client" per partition, like the reference's
      // single client per process (llm_enricher.py:26-67)
      it.map { r =>
        val t0 = System.nanoTime()
        val (s, c, conf) =
          try enricher.classify(r.title, r.row_index)
          catch { // per-row failure → sentinel, never drop input rows
            // (reference: llm_enricher.py:204-211)
            case scala.util.control.NonFatal(_) =>
              (Domains.Error, Domains.Error, 0.0)
          }
        val dt = (System.nanoTime() - t0) / 1e9
        EnrichedHeadline(r.link, r.title, r.link,
          Option(r.source).getOrElse("g1"), r.scraped_at,
          Domains.clampSentiment(s), Domains.clampCategory(c),
          Domains.clampConfidence(conf), dt, now, modelUsed)
      }
    }
  }
}
