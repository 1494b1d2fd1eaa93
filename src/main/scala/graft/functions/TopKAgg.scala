package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed [[Aggregator]]: keeps the k best
  * (score DESC, id ASC — the deterministic tiebreak every ranked
  * query in this repo uses) in a bounded, best-first buffer.
  *
  * This replaces the `row_number().over(partitionBy(grp))` pattern
  * wherever only the top k rows per group survive: the window form
  * shuffles and sorts EVERY candidate row, while an Aggregator is a
  * partial (map-side) aggregate — each map task pre-trims to k rows
  * per group, so the shuffle carries ≤ k·groups-per-partition rows
  * no matter how many candidates were scored. For pair-scoring
  * stages (k-NN graphs, ANN probes) whose candidate sets are
  * quadratic in the cell width, that is the difference between
  * shuffling ~n²/cells rows and shuffling k·n.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), List[(Double, Long)], Seq[(Double, Long)]] {

  override def zero: List[(Double, Long)] = Nil

  private def beats(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && beats(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(beats(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def reduce(buf: List[(Double, Long)],
      x: (Double, Long)): List[(Double, Long)] = insert(buf, x)

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] = b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}
