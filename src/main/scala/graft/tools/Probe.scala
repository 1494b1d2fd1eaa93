package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage-timing probe for the dedup candidate pipeline. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    import graft.functions.{TextFunctions => TF}
    import graft.operators.Dedup
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val base = docs.select(col("doc_id"),
      TF.shingleHashes(col("text"), 3).as("sh"),
      Dedup.minhashSignature(col("text"), 64, 3).as("sig")).cache()
    timed("base materialize")(base.count())
    val banded = base.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        bnd => xxhash64(concat_ws("_", bnd,
          concat_ws(",", slice(col("sig"), bnd * lit(4) + 1, lit(4))))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("bucket"))
    timed("banded")(banded.count())
    val l = banded.alias("l"); val r = banded.alias("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.bucket") === col("r.bucket") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("d1"), col("r.doc_id").as("d2")).distinct()
    timed("cand")(println("cand=" + cand.count()))
    val sets = base.select(col("doc_id"), col("sh"))
    val verified = cand
      .join(sets.select(col("doc_id").as("d1"), col("sh").as("sh1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("sh").as("sh2")), "d2")
      .select(col("d1"), col("d2"),
        (size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= 0.7)
    timed("verify+filter")(verified.count())
    timed("full fresh")(Dedup.minhashLshPairs(spark, dir).count())
    spark.stop()
  }
}
