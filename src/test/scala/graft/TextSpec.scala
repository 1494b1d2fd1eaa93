package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("langid identifies natural-language samples") {
    val samples = Seq(
      ("the cat is in the house and the dog is outside", "en"),
      ("el perro corre por la calle y la casa es grande", "es"),
      ("der hund ist im haus und die katze ist nicht da", "de"),
      ("le chat et le chien sont dans les maisons des voisins", "fr"),
      ("o menino disse que a menina não vai uma vez", "pt"))
    val got = samples.toDF("text", "expected")
      .select(col("expected"), TF.langId(col("text")).as("got"))
      .as[(String, String)].collect()
    got.foreach { case (exp, act) => assert(act == exp, s"expected $exp got $act") }
  }

  test("token count, shingles, quality features") {
    val df = Seq("the quick brown fox").toDF("text")
    assert(df.select(TF.tokenCount(col("text"))).head().getLong(0) == 4)
    val sh = df.select(TF.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh == Seq("the quick brown", "quick brown fox"))
    val shortDoc = Seq("hello world").toDF("text")
    assert(shortDoc.select(TF.shingles(col("text"), 3)).head()
      .getSeq[String](0) == Seq("hello world"))
    val ratio = df.select(TF.stopwordRatio(col("text"))).head().getDouble(0)
    assert(math.abs(ratio - 0.25) < 1e-12)
    val q = df.select(TF.qualityScore(col("text"))).head().getDouble(0)
    assert(q > 0 && q <= 1)
  }

  test("fingerprint is md5 and stable") {
    val fp = Seq("abc").toDF("text")
      .select(TF.fingerprint(col("text"))).head().getString(0)
    assert(fp == "900150983cd24fb0d6963f7d28e17f72")
  }
}
