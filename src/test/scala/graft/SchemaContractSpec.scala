package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Contract over the ENGINE-FACING schema of every testdata table —
  * i.e. what `Tables.table` returns, after its normalizations.
  *
  * Why this exists: the driver regenerated /root/testdata mid-round-6
  * and events.ts silently changed parquet encoding (TIMESTAMP(NANOS)
  * → TIMESTAMP_MICROS with isAdjustedToUTC=0, which Spark reads as
  * TIMESTAMP_NTZ); eleven tests and five registry queries failed with
  * confusing analysis errors. This suite pins the contract so the
  * next silent regeneration fails ONE clear test naming the table and
  * column. TESTDATA.md §schema-contract documents the expectation.
  */
class SchemaContractSpec extends SparkTestBase {

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, sf, name).schema.fields
      .map(f => f.name -> f.dataType).toMap

  test("events: engine-facing ts is TIMESTAMP (LTZ), never NTZ or raw long") {
    val f = fields("events")
    assert(f("ts") == TimestampType,
      s"events.ts must normalize to TimestampType, got ${f("ts")} — " +
        "did the testdata regenerate with a new parquet encoding? " +
        "Fix belongs in Tables.events, not at call sites.")
    assert(f("event_id") == LongType)
    assert(f("user_id") == LongType)
    assert(f("event_type") == StringType)
    assert(f("value") == DoubleType)
  }

  test("date-ish columns read as a temporal type (orders, lineitem)") {
    // the generator has emitted these as TIMESTAMP_MICROS (NTZ) in
    // every generation so far; the engine and the DuckDB oracle both
    // read them as naive timestamps, so queries compare consistently
    // under ANY of date/timestamp/timestamp_ntz — pin "temporal", not
    // one encoding, so a regeneration to DATE doesn't false-alarm.
    // Only events.ts needs exact LTZ (unix_micros/stream windows).
    def temporal(dt: DataType): Boolean =
      dt == DateType || dt == TimestampType || dt == TimestampNTZType
    val o = fields("orders")
    assert(temporal(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")
    val l = fields("lineitem")
    assert(temporal(l("l_shipdate")), s"l_shipdate: ${l("l_shipdate")}")
  }

  test("key numeric/text columns keep their engine-facing types") {
    val l = fields("lineitem")
    assert(l("l_quantity") == DoubleType || l("l_quantity").isInstanceOf[DecimalType])
    assert(l("l_extendedprice") == DoubleType || l("l_extendedprice").isInstanceOf[DecimalType])
    val d = fields("documents")
    assert(d("text") == StringType)
    val e = fields("embeddings")
    assert(e("embedding") match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }, s"embeddings.embedding must be array<float|double>, got ${e("embedding")}")
  }

  test("every table in the registry is readable and non-empty at sf0.001") {
    for (t <- Tables.tpch)
      assert(Tables.table(spark, sf, t).limit(1).count() == 1L, s"$t is empty")
  }

  test("queries and oracleSql registries cover the same keys") {
    // the driver's correctness gate joins these two maps by key: a
    // query without an oracle gets a weaker rows-only check, and an
    // oracle without a query is dead weight — keep them in lockstep
    // so no registry entry can silently fall out of the gate
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).mkString(", ")}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).mkString(", ")}")
  }
}
