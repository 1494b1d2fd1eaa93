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

  test("spark.sql.extensions injection path: rule fires and SQL functions resolve") {
    // the shared test session is BUILT with
    // spark.sql.extensions=graft.plans.GraftExtensions (SparkTestBase)
    // — the production wiring, not extraOptimizations: a regression in
    // GraftExtensions.apply / injectOptimizerRule fails here
    assert(spark.sparkContext.getConf
      .get("spark.sql.extensions", "").contains("graft.plans.GraftExtensions"))
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b").localCheckpoint()
    val q = df.selectExpr(
      "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp")
    assert(q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct])),
      s"injected rule did not fire:\n${q.queryExecution.optimizedPlan}")
    assert(q.head().getDouble(0) == 11.0)
    // the injected SQL functions resolve without register()
    assert(spark.newSession().sql(
      "SELECT graft_simhash64(graft_shingle_hashes(array('a','b'), 1)) AS sh")
      .head().getAs[Long]("sh") != 0L)
  }

  test("RewriteDotProduct: HOF dot-product SQL plans as the native expression, same results") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // localCheckpoint: an RDD-backed plan, so ConvertToLocalRelation
    // cannot constant-fold the projection away before the rule runs
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.5, -1.5), Seq(2.0, 2.0)),
      (Seq(1.0, 2.0), Seq(7.0))) // mismatched lengths → NULL
      .toDF("a", "b").localCheckpoint()
    val hofSql = "aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp"
    val plain = df.selectExpr(hofSql).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.RewriteDotProduct
    try {
      val q = df.selectExpr(hofSql)
      val rewritten = q.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct]))
      assert(rewritten, s"rule did not fire:\n${q.queryExecution.optimizedPlan}")
      val got = q.collect()
        .map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
      assert(got == plain, "rewrite changed results")
      assert(got(0) == 32.0 && got(2) == null)

      // nullable elements: the guard must keep the rule silent (the
      // native loop can't represent a null element) and semantics
      // stay the HOF's
      val nsrc = Seq((Seq(2.0, 3.0), 1)).toDF("b", "one").localCheckpoint()
      val nullable = nsrc.selectExpr(
        "aggregate(zip_with(array(1.0D, CAST(NULL AS DOUBLE)), b," +
          " (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp")
      assert(!nullable.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct])),
        "rule must not fire on nullable elements")
      assert(nullable.head().isNullAt(0))

      // a −0.0 seed is observable (all-negative-zero products) — not
      // rewritten
      val negZero = df.selectExpr(
        "aggregate(zip_with(a, b, (x, y) -> x * y), -0D, (s, v) -> s + v) AS dp")
      assert(!negZero.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct])),
        "rule must not fire on a -0.0 seed")

      // non-deterministic arrays: the rewrite would evaluate the
      // array once in the size guard and again in the dot — silent
      val nondet = df.selectExpr(
        "aggregate(zip_with(array(rand(), rand()), slice(b, 1, 2)," +
          " (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp")
      assert(!nondet.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct])),
        "rule must not fire on non-deterministic arrays")

      // expensive (non-reference) inputs: the rewrite duplicates each
      // input into the size guard, so it only fires on cheap
      // re-evaluatable inputs — a transform() keeps the HOF form
      val expensive = df.selectExpr(
        "aggregate(zip_with(transform(a, x -> x + 1.0D), transform(b, x -> x)," +
          " (x, y) -> x * y), 0D, (s, v) -> s + v) AS dp")
      assert(!expensive.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.plans.DotProduct])),
        "rule must not duplicate expensive array-producing inputs")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ eq graft.plans.RewriteDotProduct)
    }
  }
}
