package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins: write both sides of a
  * repeated equi-join bucketed (and sorted) by the join key, and the
  * join plans with NO shuffle exchange on either side — the lever
  * that turns the lineitem⋈orders shuffle (the largest movement in
  * the corpus at 100 TB) into a local zip of pre-sorted buckets.
  *
  * Bucketing requires the table catalog (`saveAsTable`), not bare
  * parquet paths; BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {
  /** Write `df` bucketed+sorted by `key` as managed table `name`. */
  def writeBucketed(df: DataFrame, name: String, key: String,
      buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)

  /** Stage lineitem + orders as co-bucketed tables on the order key. */
  def stageOrderJoin(spark: SparkSession, sfDir: String,
      buckets: Int = 8): Unit = {
    writeBucketed(Tables.table(spark, sfDir, "lineitem"),
      "lineitem_bkt", "l_orderkey", buckets)
    writeBucketed(Tables.table(spark, sfDir, "orders"),
      "orders_bkt", "o_orderkey", buckets)
  }

  /** The co-located join over the staged tables. */
  def bucketedOrderJoin(spark: SparkSession): DataFrame =
    spark.table("lineitem_bkt").join(spark.table("orders_bkt"),
      org.apache.spark.sql.functions.col("l_orderkey") ===
        org.apache.spark.sql.functions.col("o_orderkey"))
}
