package graft.serve

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Parameterized serving facade over a silver table — the engine
  * analog of the reference dashboard's four cached loaders + KPI
  * block (streamlit_app/dashboard.py:35-302). The fixed-parameter
  * variants in [[Queries]] are the oracle-checked forms; this is the
  * user-facing API with the dashboard's actual knobs (date range,
  * top-k, default last-7-days window).
  */
object Dashboard {
  private def dte = to_date(col("processed_at"))

  /** Default window: last 7 days ending at the table's max date
    * (dashboard.py:208 `timedelta(days=7)`). */
  def defaultRange(silver: DataFrame): (LocalDate, LocalDate) = {
    val end = silver.agg(max(dte)).head().getDate(0).toLocalDate
    (end.minusDays(7), end)
  }

  private def inRange(silver: DataFrame, start: LocalDate, end: LocalDate) =
    silver.filter(dte.between(
      lit(java.sql.Date.valueOf(start)), lit(java.sql.Date.valueOf(end))))

  /** q1: daily sentiment counts, date-ordered (dashboard.py:57). */
  def dailySentiment(silver: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    graft.jobs.GoldJob.dailySentiment(
      graft.jobs.GoldJob.staging(inRange(silver, start, end)))
      .orderBy(col("analysis_date"))

  /** q2: date×category counts (dashboard.py:87-95). */
  def categoryCounts(silver: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    inRange(silver, start, end)
      .filter(col("category").isNotNull)
      .groupBy(dte.as("analysis_date"), col("category"))
      .agg(count(lit(1)).as("count"))
      .orderBy(desc("analysis_date"), desc("count"), col("category"))

  /** q3: per-(date, sentiment) confidence stats (dashboard.py:128-138). */
  def confidenceStats(silver: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    inRange(silver, start, end)
      .groupBy(dte.as("analysis_date"), col("sentiment"))
      .agg(round(avg(col("confidence_score")), 3).as("avg_confidence"),
        min(col("confidence_score")).as("min_confidence"),
        max(col("confidence_score")).as("max_confidence"))
      .orderBy(desc("analysis_date"), col("sentiment"))

  /** q4: latest n headlines (dashboard.py:169-180). */
  def recentHeadlines(silver: DataFrame, n: Int): DataFrame =
    silver.select(col("title").as("headline_title"),
        col("link").as("headline_link"), col("sentiment"), col("category"),
        col("processed_at"))
      .orderBy(desc("processed_at"), desc("headline_link")).limit(n)

  /** KPI block (dashboard.py:283-302). */
  final case class Kpis(total: Long, positive: Long, negative: Long,
      neutral: Long, pctPositive: Double, daily: Double)

  def kpis(silver: DataFrame, start: LocalDate, end: LocalDate): Kpis = {
    val r: Row = inRange(silver, start, end).agg(
      count(lit(1)), count(when(col("sentiment") === "Positiva", 1)),
      count(when(col("sentiment") === "Negativa", 1)),
      count(when(col("sentiment") === "Neutra", 1)),
      countDistinct(dte)).head()
    val total = r.getLong(0)
    Kpis(total, r.getLong(1), r.getLong(2), r.getLong(3),
      if (total == 0) 0.0 else r.getLong(1) * 100.0 / total,
      if (r.getLong(4) == 0) 0.0 else total.toDouble / r.getLong(4))
  }

  /** Top-k categories over the range + their daily time series
    * (dashboard.py:377-407). */
  def topCategoryTimeSeries(silver: DataFrame, start: LocalDate,
      end: LocalDate, k: Int): DataFrame = {
    val counts = categoryCounts(silver, start, end)
    val top = counts.groupBy(col("category"))
      .agg(sum(col("count")).as("total"))
      .orderBy(desc("total"), col("category")).limit(k)
      .select(col("category"))
    counts.join(broadcast(top), Seq("category"))
      .orderBy(col("analysis_date"), col("category"))
  }
}
