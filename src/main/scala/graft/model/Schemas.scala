package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Explicit schemas for the three medallion layers.
  *
  * Bronze mirrors the reference's production DDL
  * (reference: dags/g1_scraping_dag.py:34-39); silver mirrors
  * scripts/llm_enricher.py:124-137 (the `id SERIAL` surrogate is
  * dropped — only `raw_link` is semantically keyed, SURVEY §1.3).
  * All timestamps are UTC (engine convention, SURVEY §7.5).
  */
final case class RawHeadline(
    title: String,
    link: String,
    source: String,
    scraped_at: Timestamp)

final case class EnrichedHeadline(
    raw_link: String,
    title: String,
    link: String,
    source: String,
    scraped_at: Timestamp,
    sentiment: String,
    category: String,
    confidence_score: Double,
    processing_time_seconds: Double,
    processed_at: Timestamp,
    model_used: String)

object Schemas {
  /** CSV ingest never uses inferSchema — determinism (SURVEY §1.2). */
  val raw: StructType = StructType(Seq(
    StructField("title", StringType, nullable = false),
    StructField("link", StringType, nullable = false),
    StructField("source", StringType, nullable = true),
    StructField("scraped_at", TimestampType, nullable = true)))

  val enriched: StructType = StructType(Seq(
    StructField("raw_link", StringType, nullable = false),
    StructField("title", StringType, nullable = false),
    StructField("link", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("scraped_at", TimestampType, nullable = true),
    StructField("sentiment", StringType, nullable = true),
    StructField("category", StringType, nullable = true),
    StructField("confidence_score", DoubleType, nullable = true),
    StructField("processing_time_seconds", DoubleType, nullable = true),
    StructField("processed_at", TimestampType, nullable = true),
    StructField("model_used", StringType, nullable = true)))
}
