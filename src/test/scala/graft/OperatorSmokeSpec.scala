package graft

/** Contract smoke: every declared query runs at sf0.001 and every
  * oracle key has a matching query (the driver hard-fails
  * otherwise). Result correctness is the DuckDB gate's job
  * (tools/check.py), not this suite's.
  */
class OperatorSmokeSpec extends SparkTestBase {
  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name executes at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}
