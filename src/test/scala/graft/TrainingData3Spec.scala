package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData3

/** Semantic checks for the rank-stat / sketch / collocation / layout
  * operators (the DuckDB oracle checks cross-engine equivalence;
  * these check the math means what it claims).
  */
class TrainingData3Spec extends SparkTestBase {
  import spark.implicits._

  test("spearman: bounded on real data, exactly ±1 on monotone data") {
    val r = TrainingData3.aSpearman(spark, sf)
      .select("spearman_rho").as[Double].collect()
    assert(r.nonEmpty)
    r.foreach(rho => assert(rho >= -1.0 && rho <= 1.0))
    // planted: y monotone-increasing in x under flag "M" (rho = 1),
    // monotone-decreasing under "D" (rho = -1); ranks, not values
    val dir = tmpDir()
    val rows = (1 to 50).map(i => ("M", i, i * i)) ++
      (1 to 50).map(i => ("D", i, -3 * i))
    rows.toDF("l_returnflag", "l_quantity", "l_extendedprice")
      .write.parquet(s"$dir/lineitem.parquet")
    val planted = TrainingData3.aSpearman(spark, dir)
      .select("flag", "spearman_rho").as[(String, Double)].collect().toMap
    assert(planted("M") == 1.0 && planted("D") == -1.0)
  }

  test("count-min never underestimates and is exact sans collisions") {
    val r = TrainingData3.aCountMin(spark, sf)
      .select("exact_c", "cm_est", "est_ge_exact")
      .as[(Long, Long, Boolean)].collect()
    assert(r.length == 10)
    r.foreach { case (exact, est, flag) =>
      assert(flag && est >= exact)
    }
  }

  test("pmi: top bigrams are count-ordered and pmi is finite") {
    val r = TrainingData3.tPmiBigrams(spark, sf)
      .select("n_xy", "pmi").as[(Long, Double)].collect()
    assert(r.length == 20)
    assert(r.map(_._1).toSeq == r.map(_._1).toSeq.sortBy(-_))
    r.foreach { case (_, pmi) => assert(!pmi.isNaN && !pmi.isInfinite) }
  }

  test("z-order buckets are 16x16 tiles covering every row") {
    val r = TrainingData3.oZorderLayout(spark, sf)
      .select("n", "cell_span").as[(Long, Long)].collect()
    val total = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(r.map(_._1).sum == total)
    // one z-bucket of 256 consecutive z values is exactly a 16x16 tile
    r.foreach { case (_, span) => assert(span <= 256) }
  }
}
