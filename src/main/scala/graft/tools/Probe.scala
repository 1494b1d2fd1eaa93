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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm scan

    // token jaccard (threshold 0.9) stage timing — mirrors
    // Dedup.prefixJaccardPairs structure
    val threshold = 0.9
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      TF.tokens(col("text")).as("items"))
    val distinctItems = base
      .withColumn("items", array_distinct(col("items"))).cache()
    timed("distinctItems materialize")(distinctItems.count())
    val posting = distinctItems
      .select(col("doc_id"), explode(col("items")).as("it"))
    val dfreq = posting.groupBy("it").agg(count(lit(1)).as("df"))
    timed("dfreq")(println("vocab=" + dfreq.count()))
    val ordered = posting
      .join(dfreq, "it")
      .groupBy("doc_id")
      .agg(transform(sort_array(collect_list(struct(col("df"), col("it")))),
        x => x.getField("it")).as("items"))
    timed("ordered")(ordered.count())
    val withArr = distinctItems.drop("items").join(ordered, "doc_id")
      .withColumn("n", size(col("items")))
      .withColumn("p",
        (col("n") - ceil(col("n") * threshold - lit(1e-9)) + 1).cast("int"))
      .cache()
    timed("withArr materialize")(withArr.count())
    val pre = withArr.select(col("doc_id"), col("lang"), col("source"),
      explode(slice(col("items"), lit(1), col("p"))).as("it"))
    timed("prefix explode")(println("pre=" + pre.count()))
    val a = pre.alias("a"); val b = pre.alias("b")
    val cand = a.join(b,
        col("a.it") === col("b.it") && col("a.lang") === col("b.lang") &&
        col("a.source") === col("b.source") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    timed("candidates")(println("cand=" + cand.count()))
    val sets = withArr.select(col("doc_id"), col("items"))
    val out = cand
      .join(sets.select(col("doc_id").as("d1"), col("items").as("s1")), "d1")
      .join(sets.select(col("doc_id").as("d2"), col("items").as("s2")), "d2")
      .select(col("d1"), col("d2"),
        (size(array_intersect(col("s1"), col("s2"))).cast("double") /
          size(array_union(col("s1"), col("s2"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    timed("verify")(println("pairs=" + out.count()))
    timed("full fresh token 2nd")(graft.operators.Dedup.jaccardPairs(spark, dir).count())
    timed("full fresh token 3rd")(graft.operators.Dedup.jaccardPairs(spark, dir).count())
    spark.stop()
  }
}
