package graft

import org.apache.spark.sql.functions._

import graft.operators.TrainingData4

/** Invariant pins for the round-7 embedding extensions. Value-level
  * correctness is the DuckDB oracle's job (full-replay oracles in
  * TrainingData4.oracles); these pin the structural contracts that an
  * oracle hash can't express as clearly.
  */
class TrainingData4Spec extends SparkTestBase {

  test("sim_kmeans: every vector assigned exactly once, clusters in 1..8, cos in [-1,1]") {
    val out = TrainingData4.simKmeans(spark, sf).cache()
    try {
      val n = graft.sources.Tables.table(spark, sf, "embeddings").count()
      assert(out.count() == n)
      assert(out.select(countDistinct(col("vec_id"))).head.getLong(0) == n)
      val bad = out.filter(col("cluster") < 1 || col("cluster") > 8 ||
        col("cos") < -1.000001 || col("cos") > 1.000001).count()
      assert(bad == 0L)
      // refinement must not leave empty clusters on this corpus: the
      // md5 seeds are spread, so all 8 survive the Lloyd step
      assert(out.select(countDistinct(col("cluster"))).head.getLong(0) == 8L)
    } finally out.unpersist()
  }

  test("sim_cluster_purity: members sum to corpus, purity in (0,1]") {
    val out = TrainingData4.simClusterPurity(spark, sf).cache()
    try {
      val n = graft.sources.Tables.table(spark, sf, "embeddings").count()
      assert(out.agg(sum(col("n_members"))).head.getLong(0) == n)
      assert(out.filter(col("purity") <= 0.0 || col("purity") > 1.0).count() == 0L)
      // dominant label must be one of the corpus labels
      val labels = graft.sources.Tables.table(spark, sf, "embeddings")
        .select(col("label").cast("long")).distinct().collect().map(_.getLong(0)).toSet
      assert(out.collect().forall(r => labels.contains(r.getAs[Long]("dominant_label"))))
    } finally out.unpersist()
  }

  test("e_quantize_int8: codes bounded in [0,255], full dim coverage, distortion below one step") {
    val out = TrainingData4.eQuantizeInt8(spark, sf).cache()
    try {
      assert(out.filter(col("max_code") > 255 || col("max_code") < 0).count() == 0L)
      assert(out.filter(col("n_dims") =!= 64).count() == 0L)
      // midpoint reconstruction error is ≤ step/2 per dim; mean must
      // stay well under one per-dim step for a non-degenerate corpus
      assert(out.filter(col("mean_abs_err") < 0.0).count() == 0L)
      assert(out.agg(max(col("mean_abs_err"))).head.getDouble(0) < 0.05)
    } finally out.unpersist()
  }
}
