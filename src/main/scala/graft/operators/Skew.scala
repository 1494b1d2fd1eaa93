package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives for hot keys at cluster scale.
  *
  * Notes on when to reach for these: Spark's hash aggregation is
  * already two-phase (map-side partial), so plain sums/counts rarely
  * need salting; AQE's skew-join handling splits oversized SMJ
  * partitions at runtime. Explicit salting remains the tool for
  * (a) shuffle joins where one side's key distribution is
  * pathological and the other side is small enough to replicate,
  * and (b) aggregations whose per-key state is itself large
  * (collect_list/countDistinct-style) so one reducer drowns.
  */
object Skew {
  /** Salted equi-join: the skewed (big) side gets a deterministic
    * salt in [0, n) hashed from `saltSrc` (any well-distributed
    * column, e.g. a row id); the small side is replicated n× so
    * every (key, salt) bucket finds its match. Result equals
    * `big.join(small, key)` exactly; the shuffle spreads each hot
    * key over n reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, n: Int,
      saltSrc: Column): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(saltSrc), lit(n.toLong)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until n).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase salted sum: partial-aggregate on (keys, salt), then
    * final-aggregate on keys. Equals a direct groupBy(keys).sum.
    */
  def saltedSum(df: DataFrame, keys: Seq[String], value: Column, n: Int,
      saltSrc: Column, as: String): DataFrame = {
    val k = keys.map(col)
    df.withColumn("__salt", pmod(xxhash64(saltSrc), lit(n.toLong)))
      .groupBy(k :+ col("__salt"): _*).agg(sum(value).as("__partial"))
      .groupBy(k: _*).agg(sum(col("__partial")).as(as))
  }

  /** Two-phase exact count-distinct: dedupe (keys, value) under a
    * value-derived salt (phase 1 shrinks each hot key's stream to
    * its distinct values, spread over n reducers), then count per
    * key. Equals countDistinct exactly.
    */
  def saltedCountDistinct(df: DataFrame, keys: Seq[String], value: Column,
      n: Int, as: String): DataFrame = {
    val k = keys.map(col)
    df.withColumn("__v", value)
      .withColumn("__salt", pmod(xxhash64(col("__v")), lit(n.toLong)))
      .groupBy(k :+ col("__salt") :+ col("__v"): _*).agg(count(lit(1)))
      .groupBy(k: _*).agg(count(lit(1)).as(as))
  }
}
