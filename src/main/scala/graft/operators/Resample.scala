package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: per-key fixed-interval spine + aggregation +
  * forward fill — the gap-filling operator family (downsample, regularize,
  * carry last observation forward) that event tables need before joining
  * to anything clocked. No reference counterpart.
  *
  * Scale shape: the spine explodes one row per (key, bucket) — linear in
  * key-count × time-range, generated map-side from each key's min/max; the
  * aggregation is an ordinary two-phase hash agg; the fill is one window
  * pass (shuffle by key, sort by bucket within partition). Same
  * single-shuffle cost family as sessionization.
  */
object Resample {

  /** Per-`keyCol` spine of `interval`-wide buckets covering [min(ts),
    * max(ts)], each bucket left-joined to that bucket's aggregated rows
    * (`n` = rows in bucket, `bucket_value` = their exact-decimal sum as
    * DOUBLE), with `filled_value` carrying the last non-null bucket value
    * forward per key (still NULL before a key's first observed bucket).
    *
    * `interval` must be a Spark interval literal string (e.g. "1 hour");
    * buckets are `date_trunc(truncUnit, ts)`-aligned, so `truncUnit` must
    * match the interval ("hour" for "1 hour").
    */
  def gapFill(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      truncUnit: String = "hour",
      interval: String = "1 hour"): DataFrame = {
    def bucket(c: Column): Column = date_trunc(truncUnit, c)
    val spine = events
      .groupBy(col(keyCol))
      .agg(bucket(min(col(tsCol))).as("_lo"), bucket(max(col(tsCol))).as("_hi"))
      .select(col(keyCol),
        explode(expr(s"sequence(_lo, _hi, interval $interval)")).as("bucket"))
    val perBucket = events
      .groupBy(col(keyCol), bucket(col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        // decimal(38,2), not (12,2): with ANSI off a narrower intermediate
        // overflows to a silent NULL bucket_value at ~10^10 per bucket —
        // and the forward fill would then propagate the NULL. 38,2 holds
        // ~10^36, beyond any physical bucket total; values are identical
        // where both fit, so the oracle (whose DuckDB sum widens to
        // DECIMAL(38,2) natively) is unchanged.
        sum(col(valueCol).cast("decimal(38,2)")).cast("double").as("bucket_value"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBucket, Seq(keyCol, "bucket"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("filled_value",
        last(col("bucket_value"), ignoreNulls = true).over(w))
  }
}
