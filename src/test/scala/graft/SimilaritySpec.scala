package graft

import graft.functions.Similarity

/** ANN verification: brute-force cosine is the exact baseline; the
  * sign-LSH variant must (a) only return true neighbors ranked by
  * true cosine and (b) achieve nontrivial recall@5 on the labeled
  * clustered embeddings.
  */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("brute force returns k neighbors per query, ordered by cosine") {
    val res = Similarity.bruteForceTopK(spark, sf, nQueries = 5, k = 3)
      .as[(Long, Long, Double, Int)].collect()
    assert(res.length == 15)
    res.groupBy(_._1).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b },
        "cosine non-increasing in rank")
    }
  }

  test("lsh top-k recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf, nQueries = 10, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.lshTopK(spark, sf, nQueries = 10, k = 5, nPlanes = 4)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean recall@5 too low: $mean")
  }

  test("ivf top-k recall vs brute force") {
    val exact = Similarity.bruteForceTopK(spark, sf, nQueries = 10, k = 5)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = Similarity.ivfTopK(spark, sf, nQueries = 10, k = 5,
        nCells = 8, nProbe = 3)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a & truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.3, s"mean IVF recall@5 too low: $mean")
  }
}
