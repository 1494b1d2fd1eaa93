package graft

import graft.plans.{GraftExtensions, GraftFunctions}

/** The native expressions must be callable from SQL after
  * registration, and the extensions class must inject cleanly.
  */
class ExtensionsSpec extends SparkTestBase {
  test("registered SQL functions evaluate") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_simhash64(graft_shingle_hashes(array('a','b','c'), 1)) AS sh,
        |       size(graft_minhash(graft_shingle_hashes(array('a','b','c'), 2), 16)) AS k,
        |       size(graft_winnow('the quick brown fox jumps', 8, 4)) AS nw
        |""".stripMargin).head()
    assert(r.getAs[Long]("sh") != 0L)
    assert(r.getAs[Int]("k") == 16)
    assert(r.getAs[Int]("nw") > 0)
  }

  test("SQL minhash equals the Column API") {
    GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = Seq("the quick brown fox", "jumps over the dog").toDF("text")
    val viaSql = df.selectExpr("graft_minhash(graft_shingle_hashes(split(text, ' '), 2), 8) AS sig")
      .as[Seq[Long]].collect().toSeq
    val viaCol = df.select(
        graft.operators.Dedup.minhashSignature(col("text"), 8, 2).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(viaSql == viaCol)
  }

  test("extensions class injects without error") {
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
