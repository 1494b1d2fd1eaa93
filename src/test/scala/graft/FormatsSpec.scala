package graft

import graft.sources.{HeadlineData, Sinks}

/** Source/sink format round-trips beyond parquet+CSV: ORC and
  * JSON-lines. Both must preserve every row and (for ORC) every
  * type; JSON-lines degrades types by design and must come back
  * intact through an explicit-schema read.
  */
class FormatsSpec extends SparkTestBase {

  private def silver = HeadlineData.silver(spark, sf)

  // nullability is not round-trippable through any file format
  // (readers report nullable); names + types are the contract
  private def shape(df: org.apache.spark.sql.DataFrame) =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq

  test("ORC round-trip preserves rows and schema") {
    val dir = tmpDir() + "/orc"
    val in = silver
    Sinks.writeOrc(in, dir)
    val back = spark.read.orc(dir)
    assert(shape(back) == shape(in))
    assert(back.count() == in.count())
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
  }

  test("JSON-lines round-trip with explicit schema preserves rows") {
    val dir = tmpDir() + "/jsonl"
    val in = silver
    Sinks.writeJsonl(in, dir)
    val back = Sinks.readJsonl(spark, in.schema, dir)
    assert(shape(back) == shape(in))
    assert(back.exceptAll(in).isEmpty && in.exceptAll(back).isEmpty)
  }
}
