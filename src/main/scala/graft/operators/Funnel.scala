package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for an event log and a sequence of step types,
  * compute each actor's per-step completion timestamp, where step k counts
  * only if it happens STRICTLY AFTER the actor's step-(k-1) time (the
  * standard product-analytics "ordered funnel" semantics — a view after the
  * purchase does not complete a view→purchase funnel).
  *
  * Scale shape: every step is an unordered window aggregate over the same
  * `partitionBy(key)` — Catalyst plans ONE hash exchange on the key and
  * evaluates all k window passes on the co-located partitions, and the
  * downstream `groupBy(key)` reuses that partitioning (no second shuffle;
  * PlanSpec asserts a single exchange). State per actor is k timestamps,
  * independent of event count, so hot keys need no skew mitigation.
  * (The reference engine has no funnel operator; semantics are gated by
  * the DuckDB oracle on `ev16_funnel`.)
  */
object Funnel {

  /** One row per actor: `key, t1..tk` (step completion times, null when the
    * funnel stalled before that step), `reached` = number of completed steps.
    */
  def stepTimes(
      events: DataFrame,
      keyCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(keyCol))
    val withSteps = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val eligible =
        if (i == 0) col(typeCol) === step
        else col(typeCol) === step && col(tsCol) > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(eligible, col(tsCol))).over(w))
    }
    // the window values are constant per key — min() just collapses to one
    // row per actor, reusing the window's hash partitioning
    val aggCols = steps.indices.map(i => min(col(s"t${i + 1}")).as(s"t${i + 1}"))
    withSteps
      .groupBy(col(keyCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("reached",
        // fold forward so the OUTERMOST test is the deepest step — the
        // expression must report the highest completed step, and t_k
        // non-null implies all earlier steps are non-null
        steps.indices
          .foldLeft(lit(0)) { (acc, i) =>
            when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
          }.cast("int"))
  }
}
