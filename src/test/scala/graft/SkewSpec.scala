package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Salted variants must be result-identical to their unsalted
  * equivalents (salting only changes the shuffle layout).
  */
class SkewSpec extends SparkTestBase {
  private def events = Tables.table(spark, sf, "events")

  test("salted join equals plain join") {
    val dim = events.select(col("user_id")).distinct()
      .withColumn("user_tag", concat(lit("u"), col("user_id")))
    val plain = events.join(dim, Seq("user_id"))
      .groupBy("user_tag").count().orderBy("user_tag").collect().toSeq
    val salted = Skew.saltedJoin(events, dim, "user_id", 8, col("event_id"))
      .groupBy("user_tag").count().orderBy("user_tag").collect().toSeq
    assert(salted == plain)
  }

  test("salted sum equals plain sum") {
    val plain = events.groupBy("event_type")
      .agg(sum(col("value").cast("decimal(18,2)")).as("s"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedSum(events, Seq("event_type"),
        col("value").cast("decimal(18,2)"), 8, col("event_id"), "s")
      .orderBy("event_type").collect().toSeq
    assert(salted.map(_.toString) == plain.map(_.toString))
  }

  test("salted count-distinct equals countDistinct") {
    val plain = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .orderBy("event_type").collect().toSeq
    val salted = Skew.saltedCountDistinct(events, Seq("event_type"),
        col("user_id"), 8, "n")
      .orderBy("event_type").collect().toSeq
    assert(salted.map(_.toString) == plain.map(_.toString))
  }
}
