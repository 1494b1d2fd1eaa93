package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of (point-in-time) join — an operator Spark lacks natively,
  * composed from built-ins per the preference order (compose before
  * custom plans): tag both sides, union, and carry the most recent
  * right-side row forward with `last(_, ignoreNulls)` over a running
  * window per key. One shuffle on the key — the same cost shape as a
  * sort-merge join — versus the naive range-join + per-row argmax,
  * which is quadratic per key. Right-side ties on (key, ts) must be
  * pre-deduplicated by the caller for deterministic results.
  */
object AsOf {
  /** For each left row, attach the latest right row with
    * `right.ts <= left.ts` (inclusive, same `key`). Right columns
    * return in struct column `asof` (field `__rts` = right ts; null
    * struct when no prior right row exists).
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, rightCols, forward = false)

  /** Forward variant: for each left row, attach the EARLIEST right
    * row with `right.ts >= left.ts` (inclusive, same `key`) — e.g.
    * next-purchase attribution for a view event. Same one-shuffle
    * carry-forward mechanics, with the per-key ordering reversed.
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame =
    asOfImpl(left, right, key, ts, rightCols, forward = true)

  /** Bounded-staleness variant (ASOF ... TOLERANCE): the carried
    * right row only counts if it is within `toleranceSec` of the
    * left timestamp — the feature-store freshness contract ("most
    * recent value, but never older than X"). A match outside the
    * bound returns a null `asof` struct, exactly like no match at
    * all. Same one-shuffle carry mechanics; the bound is a post-carry
    * scalar predicate, so it costs nothing at any scale (vs. the
    * range-join formulation, which pays a per-key interval meet).
    */
  def asOfJoinTolerance(left: DataFrame, right: DataFrame, key: String,
      ts: String, rightCols: Seq[String], toleranceSec: Long,
      forward: Boolean = false): DataFrame = {
    // a negative bound would silently interpolate "INTERVAL -n SECONDS"
    // and make every carry stale (all-null asof) instead of erroring
    require(toleranceSec >= 0, s"toleranceSec must be >= 0, got $toleranceSec")
    asOfImpl(left, right, key, ts, rightCols, forward, Some(toleranceSec))
  }

  private def asOfImpl(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], forward: Boolean,
      toleranceSec: Option[Long] = None): DataFrame = {
    val leftPayload = left.columns.filterNot(c => c == key || c == ts).toSeq
    val carryType = StructType(
      StructField("__rts", right.schema(ts).dataType) +:
        rightCols.map(c => right.schema(c)))

    val rAligned = leftPayload.foldLeft(
      right.select(col(key), col(ts), lit(0).as("__side"),
        struct(col(ts).as("__rts") +: rightCols.map(col): _*).as("__carry"))
    ) { (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType)) }

    val lAligned = left
      .select(col(key) +: col(ts) +: lit(1).as("__side") +: leftPayload.map(col): _*)
      .withColumn("__carry", lit(null).cast(carryType))

    val order = Seq(key, ts, "__side", "__carry") ++ leftPayload
    // right rows sort BEFORE left rows at equal ts (side 0 < 1) —
    // inclusive semantics in both directions. Backward walks time
    // ascending (carry = latest right with rts <= lts); forward
    // walks time descending (carry = earliest right with rts >= lts).
    val tsOrder = if (forward) col(ts).desc else col(ts).asc
    val w = Window.partitionBy(col(key))
      .orderBy(tsOrder, col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lAligned.select(order.map(col): _*)
      .unionByName(rAligned.select(order.map(col): _*))
      .withColumn("asof", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__carry")
    toleranceSec match {
      case None => carried
      case Some(t) =>
        val fresh =
          if (forward) col("asof.__rts") <= col(ts) + expr(s"INTERVAL $t SECONDS")
          else col("asof.__rts") >= col(ts) - expr(s"INTERVAL $t SECONDS")
        // when() without otherwise yields a typed null struct — a
        // stale carry looks exactly like no match
        carried.withColumn("asof", when(col("asof").isNotNull && fresh, col("asof")))
    }
  }
}
