package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop. No reference counterpart
  * (the reference has no joins at all — SURVEY §2 "Joins: absent");
  * Spark plans a raw `ts BETWEEN lo AND hi` predicate as
  * BroadcastNestedLoopJoin, which is quadratic and only viable when one
  * side broadcasts. This operator makes it a hash join:
  *
  *  - the interval side explodes each `[lo, hi)` into the fixed-width time
  *    bins it overlaps (`ceil(span / binWidth)` rows, O(1) when intervals
  *    are bounded by a few bin widths),
  *  - the point side maps each timestamp to its single bin,
  *  - an equi-join on the bin key + residual range predicate recovers the
  *    exact semantics.
  *
  * One hash shuffle per side on the bin key; at 100 TB this scales like any
  * other equi-join, and skewed bins are handled by AQE like any other key.
  * Pick `binWidth` close to the typical interval span: wider bins mean
  * fewer duplicate interval rows but more residual-filter waste.
  */
object RangeJoin {

  /** Inner-join `points` (timestamp column `ptsCol`) to `intervals`
    * (`[loCol, hiCol)` timestamp columns): one output row per (point,
    * interval) containment. Columns from both inputs are kept; callers
    * disambiguate names beforehand.
    */
  def intervalJoin(
      points: DataFrame, ptsCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidthMicros: Long): DataFrame = {
    val p = points.withColumn("_bin",
      expr(s"unix_micros($ptsCol) div ${binWidthMicros}L"))
    // drop degenerate intervals (hi <= lo) up front: they can match nothing,
    // and a start > stop sequence() would emit a DESCENDING bin list whose
    // junk candidates survive to the residual filter as pure fan-out waste
    val iv = intervals.where(col(hiCol) > col(loCol)).withColumn("_bin",
      explode(sequence(
        expr(s"unix_micros($loCol) div ${binWidthMicros}L"),
        // hi is exclusive: the last overlapped bin is floor((hi-1µs)/width)
        expr(s"(unix_micros($hiCol) - 1L) div ${binWidthMicros}L"))))
    p.join(iv, Seq("_bin"))
      .where(col(ptsCol) >= col(loCol) && col(ptsCol) < col(hiCol))
      .drop("_bin")
  }
}
