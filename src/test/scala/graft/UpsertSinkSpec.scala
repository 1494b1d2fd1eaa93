package graft

import graft.sources.Sinks

class UpsertSinkSpec extends SparkTestBase {

  test("upsertReplace: last-write-wins merge, idempotent, keeps unmatched rows") {
    import spark.implicits._
    val dir = tmpDir() + "/sink"
    val v1 = Seq(("k1", "a", 1L), ("k2", "b", 2L), ("k3", "c", 3L))
      .toDF("key", "payload", "v")
    Sinks.overwrite(v1, dir)
    // batch replaces k2/k3 and inserts k4
    val batch = Seq(("k2", "B", 20L), ("k3", "C", 30L), ("k4", "d", 4L))
      .toDF("key", "payload", "v")
    val (replaced, inserted) = Sinks.upsertReplace(batch, dir, "key")
    assert(replaced == 2L && inserted == 1L)
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("payload"),
        r.getAs[Long]("v"))).toSet
    assert(got == Set(("k1", "a", 1L), ("k2", "B", 20L),
      ("k3", "C", 30L), ("k4", "d", 4L)))
    // idempotent: same batch again replaces 3, inserts 0, same content
    val (r2, i2) = Sinks.upsertReplace(batch, dir, "key")
    assert(r2 == 3L && i2 == 0L)
    assert(spark.read.parquet(dir).count() == 4L)
    // fresh path: everything inserts
    val dir2 = tmpDir() + "/sink2"
    val (r3, i3) = Sinks.upsertReplace(batch, dir2, "key")
    assert(r3 == 0L && i3 == 3L)
  }

  test("upsertReplacePartitioned: touched partitions merge, untouched files untouched") {
    import spark.implicits._
    val dir = tmpDir() + "/psink"
    val v1 = Seq(("k1", "d1", "a"), ("k2", "d1", "b"), ("k3", "d2", "c"),
      ("k4", "d3", "e"))
      .toDF("key", "part", "payload")
    v1.write.partitionBy("part").parquet(dir)
    val d3files = new java.io.File(s"$dir/part=d3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    // batch touches d1 (replace k2) and d4 (new partition)
    val batch = Seq(("k2", "d1", "B"), ("k5", "d4", "f"))
      .toDF("key", "part", "payload")
    val (replaced, inserted) =
      Sinks.upsertReplacePartitioned(batch, dir, "key", "part")
    assert(replaced == 1L && inserted == 1L)
    val got = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[String]("key"), r.getAs[String]("part"),
        r.getAs[String]("payload"))).toSet
    assert(got == Set(("k1", "d1", "a"), ("k2", "d1", "B"),
      ("k3", "d2", "c"), ("k4", "d3", "e"), ("k5", "d4", "f")))
    // dynamic partition overwrite must not have rewritten part=d3
    val d3after = new java.io.File(s"$dir/part=d3").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => (f.getName, f.lastModified))
    assert(d3after.toSeq == d3files.toSeq,
      "untouched partition was rewritten")
  }
}
