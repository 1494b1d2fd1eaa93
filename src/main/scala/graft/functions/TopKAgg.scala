package graft.functions

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Per-group top-k as a typed [[Aggregator]]: keeps the k best
  * (score DESC, payload ASC — the deterministic tiebreak every
  * ranked query in this repo uses) in a bounded, best-first buffer.
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
class TopKAggBy[T: TypeTag](k: Int)(implicit ord: Ordering[T])
    extends Aggregator[(Double, T), List[(Double, T)], Seq[(Double, T)]] {

  override def zero: List[(Double, T)] = Nil

  private def beats(a: (Double, T), b: (Double, T)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && ord.lt(a._2, b._2))

  private def insert(buf: List[(Double, T)],
      x: (Double, T)): List[(Double, T)] = {
    if (buf.lengthCompare(k) >= 0 && beats(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(beats(_, x))
      val merged = pre ::: (x :: post)
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }
  }

  override def reduce(buf: List[(Double, T)],
      x: (Double, T)): List[(Double, T)] = insert(buf, x)

  override def merge(a: List[(Double, T)],
      b: List[(Double, T)]): List[(Double, T)] = b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, T)]): Seq[(Double, T)] = buf

  override def bufferEncoder: Encoder[List[(Double, T)]] =
    ExpressionEncoder[List[(Double, T)]]()
  override def outputEncoder: Encoder[Seq[(Double, T)]] =
    ExpressionEncoder[Seq[(Double, T)]]()
}

/** Long-payload instance (neighbor ids in k-NN graphs). */
class TopKAgg(k: Int) extends TopKAggBy[Long](k)
