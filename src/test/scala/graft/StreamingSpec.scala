package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables
import graft.streaming.EventStreams

/** The streaming tumbling-window agg must equal its batch twin on
  * the same input once the stream drains (AvailableNow ≅ the
  * reference's daily cron batch).
  */
class StreamingSpec extends SparkTestBase {
  test("streaming daily agg equals batch result") {
    val dir = tmpDir()
    // stage events (post ns→µs conversion) as a parquet dir source
    Tables.table(spark, sf, "events").write.parquet(s"$dir/events")
    val q = EventStreams.runToMemory(spark, s"$dir/events", "ev_stream_test")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("ev_stream_test")
      .select(col("day"), col("event_type"), col("n"))
      .orderBy("day", "event_type").collect().toSeq
    val batch = Relational.evTumblingDaily(spark, sf)
      .select(col("day"), col("event_type"), col("n"))
      .orderBy("day", "event_type").collect().toSeq
    assert(streamed == batch)
  }
}
