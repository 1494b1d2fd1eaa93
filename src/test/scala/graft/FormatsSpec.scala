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

  test("corrupt JSON lines: PERMISSIVE captures, FAILFAST raises") {
    import org.apache.spark.sql.types._
    val dir = tmpDir()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/rows.jsonl"),
      ("""{"id": 1, "v": "ok"}""" + "\n" +
       """{"id": oops-not-json""" + "\n" +
       """{"id": 3, "v": "fine"}""" + "\n").getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (the ingest default): bad line lands in the corrupt
    // column with data columns null, good lines parse — the quality
    // gate can then count/quarantine instead of dying mid-scan
    val rows = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/rows.jsonl")
      .collect()
    assert(rows.length == 3)
    val corrupt = rows.filter(!_.isNullAt(2))
    assert(corrupt.length == 1 && corrupt.head.isNullAt(0))
    assert(rows.filter(_.isNullAt(2)).map(_.getLong(0)).toSet == Set(1L, 3L))
    // FAILFAST: the same file must abort the scan
    val failed = intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.take(2)))
        .option("mode", "FAILFAST").json(s"$dir/rows.jsonl").collect()
    }
    assert(failed.getMessage.contains("FAILFAST") ||
      failed.getCause != null)
  }
}
