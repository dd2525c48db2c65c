package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — an operator the reference lacks entirely (SURVEY §2.1
  * "Joins: absent") and Spark's DataFrame API doesn't expose directly.
  *
  * Semantics: for each left row, attach the id of the right row with the
  * greatest `(ts, id)` such that `right.ts <= left.ts`, matched on `keyCol`
  * (NULL when no such row exists).
  *
  * Implementation choice (per the custom-operator preference order —
  * compose built-ins before custom plans): tag and union both sides, then
  * one `last(..., ignoreNulls)` window over
  * `(key ORDER BY ts, side, id ROWS UNBOUNDED PRECEDING)`. Right rows sort
  * before left rows at equal `ts`, so "at or before" includes same-instant
  * matches.
  *
  * Scale: exactly one hash shuffle on `keyCol` + a per-partition sort —
  * the same cost as any windowed aggregation; no range-join cartesian
  * blow-up, no broadcast requirement on either side. Skewed keys are
  * handled by AQE the same way any window shuffle is.
  */
object AsOfJoin {

  def lastPriorMatch(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      matchCol: String): DataFrame = {
    val l = left.select(
      col(keyCol), col(tsCol), col(idCol), lit(1).as("__side"))
    val r = right.select(
      col(keyCol), col(tsCol), col(idCol), lit(0).as("__side"))
    val w = Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn(matchCol,
        last(when(col("__side") === 0, col(idCol)), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col(idCol), col(keyCol), col(tsCol), col(matchCol))
  }
}
