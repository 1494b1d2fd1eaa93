package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ranking, Selection}

/** Selection.valuesAtRanks must return EXACTLY the values a full
  * global sort would put at the requested ranks — on smooth, peaked,
  * tied, and degenerate distributions, and below/above the final-sort
  * cap (the narrowing loop only engages above it). */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private def reference(vs: Seq[Double], ks: Seq[Long]): Seq[Double] = {
    val sorted = vs.sorted
    ks.map(k => sorted((k - 1).toInt))
  }

  private def check(vs: Seq[Double], ks: Seq[Long],
      nBuckets: Int = 64, cap: Long = 100): Unit = {
    val df = vs.toDF("v").repartition(7)
    val got = Selection
      .valuesAtRanks(df, col("v"), ks, nBuckets = nBuckets, cap = cap)
      .collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
    val want = ks.zip(reference(vs, ks)).toMap
    assert(got === want, s"ks=$ks")
  }

  test("matches sort-based order statistics on a smooth distribution") {
    val vs = (1 to 5000).map(i => math.sin(i.toDouble) * 1000.0)
    check(vs, Seq(1L, 2500L, 2501L, 5000L))
  }

  test("peaked distribution forces multiple narrowing iterations") {
    // 90% of mass inside one initial bucket
    val vs = (1 to 5000).map(i =>
      if (i % 10 == 0) i.toDouble else 1e-9 * (i % 97))
    check(vs, Seq(2500L, 2501L), nBuckets = 8, cap = 50)
  }

  test("heavy ties: the tied value is returned at every spanned rank") {
    val vs = Seq.fill(3000)(42.0) ++ (1 to 2000).map(_.toDouble)
    check(vs, Seq(2000L, 2500L, 3500L), nBuckets = 16, cap = 100)
  }

  test("all-equal input falls back without stalling") {
    val vs = Seq.fill(4000)(7.5)
    check(vs, Seq(1L, 2000L, 4000L), nBuckets = 16, cap = 100)
  }

  test("n below cap skips the narrowing loop entirely") {
    val vs = (1 to 50).map(_.toDouble).reverse
    check(vs, Seq(1L, 25L, 26L, 50L))
  }

  test("long values select exactly (hodges-lehmann shape)") {
    val vs = (1 to 4001).map(i => ((i * 7919) % 4001).toLong)
    val df = vs.toDF("w").repartition(5)
    val ks = Seq(2000L, 2001L, 2002L)
    val got = Selection.valuesAtRanks(df, col("w"), ks,
      nBuckets = 32, cap = 64)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val sorted = vs.sorted
    assert(got === ks.map(k => k -> sorted((k - 1).toInt)).toMap)
  }

  test("agrees with Ranking.withGlobalRank on random doubles") {
    val rnd = new scala.util.Random(13)
    val vs = Seq.fill(3000)(rnd.nextGaussian() * 50.0)
    val df = vs.toDF("v").repartition(6)
    val ks = Seq(1L, 700L, 1500L, 1501L, 2999L)
    val viaRank = Ranking.withGlobalRank(df, "rk", col("v"))
      .filter(col("rk").isInCollection(ks))
      .collect().map(r => r.getAs[Long]("rk") -> r.getDouble(0)).toMap
    val viaSel = Selection.valuesAtRanks(df, col("v"), ks,
      nBuckets = 64, cap = 128)
      .collect().map(r => r.getLong(1) -> r.getDouble(0)).toMap
    assert(viaSel === viaRank)
  }
}
