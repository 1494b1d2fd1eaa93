package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.enrich.MockEnricher
import graft.jobs.{EnrichJob, GoldJob, IngestJob, Reports}
import graft.model.Domains
import graft.sources.Tables

/** End-to-end pipeline over FIXTURES.md fixture A: the reference's
  * 5 seed headlines through ingest → mock-enrich → gold, asserting
  * the hand-computed expectations, plus the idempotence property
  * (re-run ≡ run once — the ON CONFLICT DO NOTHING analog).
  */
class PipelineSpec extends SparkTestBase {
  import PipelineSpec._

  test("fixture A end-to-end: ingest, enrich, gold expectations") {
    val work = tmpDir()
    writeFixtureCsv(s"$work/raw/headlines.csv")

    val n = IngestJob.run(spark, s"$work/raw", s"$work/bronze")
    assert(n == 5, "all 5 seed headlines survive cleaning")

    val now = Timestamp.valueOf("2024-03-01 09:00:00")
    val appended = EnrichJob.run(spark, s"$work/bronze", s"$work/silver",
      MockEnricher, now)
    assert(appended == 5)

    val silver = spark.read.parquet(s"$work/silver")
    // i%3 mock over link order (FIXTURES.md §1): P,N,Nu,P,N
    val sentiments = silver.orderBy("raw_link")
      .select("sentiment").collect().map(_.getString(0)).toSeq
    assert(sentiments == Seq("Positiva", "Negativa", "Neutra", "Positiva", "Negativa"))

    val gold = GoldJob.dailySentiment(GoldJob.staging(silver)).collect()
    assert(gold.length == 1)
    val r = gold.head
    assert(r.getAs[Long]("positive_headlines") == 2)
    assert(r.getAs[Long]("negative_headlines") == 2)
    assert(r.getAs[Long]("neutral_headlines") == 1)
    assert(r.getAs[Long]("total_headlines") == 5)

    val cat = GoldJob.dailyCategory(GoldJob.staging(silver)).collect()
    assert(cat.length == 5 && cat.forall(_.getAs[Long]("category_count") == 1))
    assert(cat.forall(c => math.abs(c.getAs[Double]("category_percentage") - 0.2) < 1e-12))
  }

  test("enrich is idempotent: second run appends nothing") {
    val work = tmpDir()
    writeFixtureCsv(s"$work/raw/headlines.csv")
    IngestJob.run(spark, s"$work/raw", s"$work/bronze")
    val now = Timestamp.valueOf("2024-03-01 09:00:00")
    assert(EnrichJob.run(spark, s"$work/bronze", s"$work/silver", MockEnricher, now) == 5)
    assert(EnrichJob.run(spark, s"$work/bronze", s"$work/silver", MockEnricher, now) == 0)
    assert(spark.read.parquet(s"$work/silver").count() == 5)
  }

  test("ingest cleaning: short titles dropped, relative urls normalized, dupes removed") {
    val work = tmpDir()
    val rows = Seq(
      "A valid headline about something important,https://site/x1,G1,2024-03-01T08:00:00.000000",
      "short,https://site/x2,G1,2024-03-01T08:00:00.000000",
      "A relative-link headline long enough,/economia/news1,G1,2024-03-01T08:00:00.000000",
      "A valid headline about something important,https://site/x1,G1,2024-03-01T08:00:00.000000",
      "Bad link headline that is long enough,ftp://nope,G1,2024-03-01T08:00:00.000000")
    writeCsv(s"$work/raw/h.csv", rows)
    IngestJob.run(spark, s"$work/raw", s"$work/bronze")
    val bronze = spark.read.parquet(s"$work/bronze")
    assert(bronze.count() == 2)
    val links = bronze.select("link").collect().map(_.getString(0)).toSet
    assert(links.contains("https://g1.globo.com/economia/news1"))
  }

  test("validation report thresholds and summary counts") {
    val work = tmpDir()
    writeFixtureCsv(s"$work/raw/headlines.csv")
    IngestJob.run(spark, s"$work/raw", s"$work/bronze")
    val now = Timestamp.valueOf("2024-03-01 09:00:00")
    EnrichJob.run(spark, s"$work/bronze", s"$work/silver", MockEnricher, now)
    val silver = spark.read.parquet(s"$work/silver")
    val v = Reports.validate(silver, java.time.LocalDate.of(2024, 3, 1))
    assert(v.totalToday == 5 && v.errorsToday == 0)
    // mock confidences are 0.50-0.54 ⇒ the <0.7 QA gate must fire
    // (reference: dags/g1_enrichement_dag.py:185-193)
    assert(v.warnings.exists(_.contains("avg confidence")))
    val sum = Reports.summary(spark.read.parquet(s"$work/bronze"), silver,
      java.time.LocalDate.of(2024, 3, 1))
    assert(sum.totalRaw == 5 && sum.totalProcessed == 5 && sum.pending == 0)
    assert(sum.topCategories.length == 5)
  }

  test("csv sink round-trips through the csv source") {
    val work = tmpDir()
    writeFixtureCsv(s"$work/raw/headlines.csv")
    val original = graft.sources.Tables.rawHeadlinesCsv(spark, s"$work/raw/headlines.csv")
    graft.sources.Sinks.writeCsv(original, s"$work/out_csv")
    val back = spark.read.schema(graft.model.Schemas.raw)
      .option("header", "true").csv(s"$work/out_csv")
    assert(back.orderBy("link").collect().toSeq ==
      original.orderBy("link").collect().toSeq)
  }

  test("corrupt csv rows are captured by the audit read, not silently coerced") {
    val work = tmpDir()
    writeMixedCsv(s"$work/raw/headlines.csv")
    val audit = graft.sources.Tables
      .rawHeadlinesCsvAudit(spark, s"$work/raw/headlines.csv").cache()
    try {
      assert(audit.count() == 3)
      val corrupt = audit.filter(col("_corrupt_record").isNotNull)
      assert(corrupt.count() == 1)
      assert(corrupt.select("link").collect().head.getString(0)
        == "https://exemplo.com/ok-2")
      // the plain read null-coerces the bad timestamp but keeps the row,
      // so downstream cleaning decides its fate explicitly
      val plain = graft.sources.Tables
        .rawHeadlinesCsv(spark, s"$work/raw/headlines.csv")
      assert(plain.count() == 3)
      assert(plain.filter(col("scraped_at").isNull).count() == 1)
    } finally audit.unpersist()
  }

  test("compaction merges small-file appends without changing data") {
    val work = tmpDir()
    val df = graft.sources.Tables.table(spark, sf, "events").limit(500)
    (1 to 5).foreach { _ =>
      df.repartition(8).write.mode("append").parquet(s"$work/sink")
    }
    val before = spark.read.parquet(s"$work/sink")
    val beforeRows = before.count()
    val beforeFiles = new java.io.File(s"$work/sink")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(beforeFiles >= 40)
    val n = graft.sources.Sinks.compact(spark, s"$work/sink", targetMB = 128)
    assert(n == 1)
    val afterFiles = new java.io.File(s"$work/sink")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(afterFiles == 1)
    assert(spark.read.parquet(s"$work/sink").count() == beforeRows)
  }

  test("domain clamps mirror the reference validation") {
    assert(Domains.clampSentiment("Positiva") == "Positiva")
    assert(Domains.clampSentiment("garbage") == "Erro")
    assert(Domains.clampSentiment(null) == "Erro")
    assert(Domains.clampCategory(" Economia ") == "Economia")
    assert(Domains.clampCategory("nope") == "Erro")
    assert(Domains.clampConfidence(0.5) == 0.5)
    assert(Domains.clampConfidence(1.5) == 0.0)
    assert(Domains.clampConfidence(-0.1) == 0.0)
  }
}

object PipelineSpec {
  /** FIXTURES.md fixture A — the reference's 5 test headlines. */
  val fixtureTitles: Seq[String] = Seq(
    "Economia brasileira cresce 2.5% no terceiro trimestre",
    "Nova tecnologia de IA promete revolucionar diagnósticos médicos",
    "Flamengo vence clássico e se aproxima do título brasileiro",
    "Presidente anuncia novo programa de habitação popular",
    "Cientistas descobrem nova espécie na Amazônia")

  def writeMixedCsv(path: String): Unit =
    writeCsv(path, Seq(
      "Manchete válida com comprimento suficiente,https://exemplo.com/ok-1,G1,2024-03-01T08:00:00.000000",
      // timestamp unparseable under the declared format
      "Outra manchete válida e bastante longa,https://exemplo.com/ok-2,G1,not-a-timestamp",
      "Terceira manchete também muito válida,https://exemplo.com/ok-3,G1,2024-03-01T08:00:00.000000"))

  def writeCsv(path: String, rows: Seq[String]): Unit = {
    val f = new java.io.File(path)
    f.getParentFile.mkdirs()
    val w = new java.io.PrintWriter(f, "UTF-8")
    try {
      w.println("title,link,source,scraped_at")
      rows.foreach(w.println)
    } finally w.close()
  }

  def writeFixtureCsv(path: String): Unit =
    writeCsv(path, fixtureTitles.zipWithIndex.map { case (t, i) =>
      s"$t,https://exemplo.com/noticia-$i,G1,2024-03-01T08:00:00.000000"
    })
}
