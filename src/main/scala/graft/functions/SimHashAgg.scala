package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a typed [[Aggregator]] over token hashes:
  * buffer = 64 signed bit-counters, reduce/merge are associative and
  * commutative → Spark runs it as a partial (map-side) aggregate,
  * so the shuffle carries one 64-int buffer per document, not the
  * token stream. Finish packs the counter signs into one Long.
  *
  * Near-dup candidates are then pairs with small Hamming distance
  * (see [[graft.operators.Dedup.simhashPairs]]).
  */
object SimHashAgg extends Aggregator[Long, Array[Int], Long] {
  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var b = 0
    while (b < 64) {
      if (((tokenHash >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
      b += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var h = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) h |= (1L << b); b += 1 }
    h
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
