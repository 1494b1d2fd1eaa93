package graft

import graft.sources.{Bucketing, Tables}

/** Co-bucketed tables must join without a shuffle exchange, and the
  * result must equal the plain path join.
  */
class BucketingSpec extends SparkTestBase {
  test("bucketed join plans without exchange and matches plain join") {
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Bucketing.stageOrderJoin(spark, sf, buckets = 4)
      val joined = Bucketing.bucketedOrderJoin(spark)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")

      val expected = Tables.table(spark, sf, "lineitem")
        .join(Tables.table(spark, sf, "orders"),
          org.apache.spark.sql.functions.col("l_orderkey") ===
            org.apache.spark.sql.functions.col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
    }
  }
}
