package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed [[Aggregator]]:
  * buffer = at most `k` (token → counter) entries. `reduce` is the
  * classic streaming update (hit → increment, room → insert, full →
  * decrement-all); `merge` adds counters then trims to the k largest
  * by subtracting the (k+1)-th count — the mergeable-summaries
  * reduction (Agarwal et al., PODS'12), so Spark can run it as a
  * map-side partial aggregate and the shuffle carries one ≤k-entry
  * map per partition instead of the token stream.
  *
  * Guarantees (any merge order, any partitioning): every token with
  * true count > N/(k+1) is present, and every stored estimate e
  * satisfies e ≤ true ≤ e + N/(k+1). The summary CONTENT beyond the
  * guarantee is merge-order-dependent, so oracle-checked queries
  * must expose only the guaranteed facts (see a_heavy_hitters),
  * never raw estimates.
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1)

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None =>
        buf.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (combined.size <= k) combined
    else {
      // subtract the (k+1)-th largest counter from everything, keep
      // the strictly-positive survivors (≤ k of them by construction)
      val cut = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      combined.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
