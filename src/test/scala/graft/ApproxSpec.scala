package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** approx_count_distinct must land within HLL++ tolerance of exact. */
class ApproxSpec extends SparkTestBase {
  test("approx distinct within 10% of exact") {
    import spark.implicits._
    val li = Tables.table(spark, sf, "lineitem")
    val joined = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("exact"),
        approx_count_distinct(col("l_orderkey")).as("approx"))
      .as[(String, Long, Long)].collect()
    joined.foreach { case (flag, exact, approx) =>
      val err = math.abs(approx - exact).toDouble / exact
      assert(err < 0.10, s"$flag: exact=$exact approx=$approx err=$err")
    }
  }
}
