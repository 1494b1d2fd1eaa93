package graft

import java.time.LocalDate

import graft.serve.Dashboard
import graft.sources.HeadlineData

/** The parameterized serving facade over the derived silver table:
  * results must be consistent with the oracle-checked fixed-form
  * queries and internally coherent (KPIs sum, top-k bounds).
  */
class DashboardSpec extends SparkTestBase {
  private lazy val silver = HeadlineData.silverCached(spark, sf)
  private val start = LocalDate.of(2024, 1, 1)
  private val end = LocalDate.of(2024, 1, 7)

  test("default range is last-7-days ending at max date") {
    val (s, e) = Dashboard.defaultRange(silver)
    assert(e == LocalDate.of(2024, 1, 7) && s == e.minusDays(7))
  }

  test("daily sentiment over the full range matches the oracle-form query") {
    val viaFacade = Dashboard.dailySentiment(silver, start, end)
      .collect().toSeq
    val viaOracleForm = serve.Queries.a1DailySentiment(spark, sf)
      .collect().toSeq
    assert(viaFacade == viaOracleForm)
  }

  test("kpis are coherent") {
    val k = Dashboard.kpis(silver, start, end)
    assert(k.total > 0)
    assert(k.positive + k.negative + k.neutral <= k.total) // 'Erro' rows in total only
    assert(k.pctPositive >= 0 && k.pctPositive <= 100)
    assert(k.daily > 0)
  }

  test("recent headlines returns n, newest first") {
    val rows = Dashboard.recentHeadlines(silver, 7).collect()
    assert(rows.length == 7)
    val ts = rows.map(_.getAs[java.sql.Timestamp]("processed_at").getTime)
    assert(ts.zip(ts.tail).forall { case (a, b) => a >= b })
  }

  test("top-k category time series only contains k categories") {
    val df = Dashboard.topCategoryTimeSeries(silver, start, end, 3)
    assert(df.select("category").distinct().count() <= 3)
    assert(df.count() > 0)
  }
}
