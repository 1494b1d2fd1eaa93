package graft.jobs

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / pipeline reporting (reference: Q2 validation suite
  * dags/g1_enrichement_dag.py:124-194; Q3 processing report
  * dag:196-262 + scripts/llm_enricher.py:321-372).
  *
  * `CURRENT_DATE`-relative queries take an injectable `today`
  * (SURVEY §7.5) so tests and the DuckDB oracle are deterministic.
  */
final case class ValidationReport(
    totalToday: Long, errorsToday: Long, avgConfidence: Option[Double],
    errorRate: Double, warnings: Seq[String])

final case class ProcessingReport(
    totalRaw: Long, totalProcessed: Long, processedToday: Long,
    avgProcessingTime: Option[Double], pending: Long,
    topCategories: Seq[(String, Long)])

object Reports {
  val ErrorRateThreshold = 0.10    // dag:176-184
  val MinAvgConfidence = 0.7       // dag:185-193

  private def onDay(df: DataFrame, today: LocalDate): DataFrame =
    df.filter(to_date(col("processed_at")) === lit(java.sql.Date.valueOf(today)))

  /** Q2: totals / error rows / avg confidence / thresholds. */
  def validate(silver: DataFrame, today: LocalDate): ValidationReport = {
    val day = onDay(silver, today)
    val row: Row = day.agg(
      count(lit(1)).as("total"),
      count(when(col("sentiment") === "Erro", 1)).as("errors"),
      round(avg(when(col("sentiment") =!= "Erro", col("confidence_score"))), 3)
        .as("avg_conf")).head()
    val total = row.getLong(0)
    val errors = row.getLong(1)
    val avgConf = if (row.isNullAt(2)) None else Some(row.getDouble(2))
    val rate = if (total == 0) 0.0 else errors.toDouble / total
    val warnings = Seq(
      if (rate > ErrorRateThreshold) Some(f"error rate $rate%.3f > $ErrorRateThreshold") else None,
      if (avgConf.exists(_ < MinAvgConfidence)) Some(s"avg confidence ${avgConf.get} < $MinAvgConfidence") else None
    ).flatten
    ValidationReport(total, errors, avgConf, rate, warnings)
  }

  /** Q3: processing summary + top-5 categories today (O4). */
  def summary(bronze: DataFrame, silver: DataFrame, today: LocalDate): ProcessingReport = {
    val day = onDay(silver, today)
    val top5 = day.filter(col("category") =!= "Erro")
      .groupBy(col("category")).count()
      .orderBy(desc("count"), col("category")).limit(5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val stats = silver.agg(
      count(lit(1)).as("total"),
      round(avg(col("processing_time_seconds")), 3).as("avg_time")).head()
    ProcessingReport(
      totalRaw = bronze.count(),
      totalProcessed = stats.getLong(0),
      processedToday = day.count(),
      avgProcessingTime = if (stats.isNullAt(1)) None else Some(stats.getDouble(1)),
      pending = EnrichJob.pending(bronze, silver).count(),
      topCategories = top5)
  }
}
