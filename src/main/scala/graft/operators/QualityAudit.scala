package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deequ-style data-quality audit: per-column completeness, cardinality,
  * and range metrics computed in a SINGLE aggregation pass and emitted as a
  * long-format report — the profiling step a training-data pipeline runs
  * before trusting a new snapshot.
  *
  * Scale shape: all metrics fold in one `agg(...)` over one scan. The
  * count-distincts make Catalyst plan an Expand (one replica of the scan
  * per distinct column) — the standard exact-distinct trade; swap
  * `countDistinct` for `approx_count_distinct` when auditing at 100 TB and
  * exactness isn't required (the report schema is unchanged). The final
  * long-format pivot is a driver-free `inline()` of a literal-width array —
  * no shuffle after the aggregate.
  */
object QualityAudit {

  /** Report: one row per audited column —
    * `(column, n_null, n_distinct, min_v, max_v)`, numeric ranges as DOUBLE
    * (computed in DECIMAL(12,2) for cross-engine exactness), null for
    * string columns.
    */
  def audit(df: DataFrame, numericCols: Seq[String], stringCols: Seq[String]): DataFrame = {
    def metrics(c: String, numeric: Boolean): Seq[Column] = {
      val base = Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"))
      if (numeric) base ++ Seq(
        min(col(c).cast("decimal(12,2)")).cast("double").as(s"${c}__min"),
        max(col(c).cast("decimal(12,2)")).cast("double").as(s"${c}__max"))
      else base
    }
    val aggs = numericCols.flatMap(metrics(_, numeric = true)) ++
      stringCols.flatMap(metrics(_, numeric = false))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows =
      numericCols.map(c => struct(lit(c).as("column"),
        col(s"${c}__nulls").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"))) ++
      stringCols.map(c => struct(lit(c).as("column"),
        col(s"${c}__nulls").as("n_null"), col(s"${c}__distinct").as("n_distinct"),
        lit(null).cast("double").as("min_v"), lit(null).cast("double").as("max_v")))
    wide.select(inline(array(rows: _*)))
  }
}
