package graft.jobs

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

import graft.enrich.MockEnricher

/** Operational entry point: run the full medallion pipeline
  * (CSV raw dir → bronze → silver → gold) exactly as the reference's
  * two DAGs + dbt run would, in one idempotent invocation.
  *
  *   sbt "runMain graft.jobs.PipelineMain <rawCsvDir> <workDir>"
  *
  * Uses the deterministic MockEnricher (the real enricher is any
  * [[graft.enrich.Enricher]] implementation).
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    val Array(rawDir, workDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ingested = IngestJob.run(spark, rawDir, s"$workDir/bronze")
    val enriched = EnrichJob.run(spark, s"$workDir/bronze",
      s"$workDir/silver", MockEnricher,
      new Timestamp(System.currentTimeMillis()))
    GoldJob.run(spark.read.parquet(s"$workDir/silver"), s"$workDir/gold")
    val today = java.time.LocalDate.now(java.time.ZoneOffset.UTC)
    val v = Reports.validate(spark.read.parquet(s"$workDir/silver"), today)
    val s = Reports.summary(spark.read.parquet(s"$workDir/bronze"),
      spark.read.parquet(s"$workDir/silver"), today)
    println(s"ingested=$ingested enriched=$enriched " +
      s"validation=$v summary=$s")
    spark.stop()
  }
}
