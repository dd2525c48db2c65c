package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. The reference's one optimization was exactly
  * this problem: Zipf-headed word counts crushing one worker, attacked with
  * hand-tuned log-scale range thresholds (α=10, `MasterNode.java:139-169`).
  * On Spark, partial aggregation + AQE skew splitting cover most cases for
  * free; salting is the remaining tool for pathological single-key skew in
  * aggregations whose per-key state is mergeable.
  */
object Skew {

  /** Two-stage salted aggregation: count/sum grouped by `key` where one key
    * may dominate the data. Stage 1 groups by (key, salt) — the hot key's
    * rows spread over `nSalts` reducers; stage 2 merges the per-salt
    * partials. Both stages are ordinary hash aggregates with map-side
    * combine; total shuffle volume is `nSalts` rows per key plus the
    * original partial-agg output.
    *
    * The default salt is a per-ROW position id, not a value hash: in the
    * pathological-skew case the hot key's values are constant (counting
    * `(word, 1)` pairs), so any value- or payload-derived hash puts every
    * hot row in ONE salt group and the salting is a no-op. A position id
    * always spreads; it is nondeterministic across task retries, which is
    * harmless here because the aggregate is mergeable (any partition of the
    * rows into salt groups sums to the same totals). Pass `saltSource` when
    * retry-stable salt assignment matters (it is hashed, so any
    * distinguishing column works).
    */
  /** Per-row position salt in [0, nSalts) — spreads even when every other
    * column of the hot key's rows is identical.
    */
  def defaultSalt(nSalts: Int): Column =
    pmod(monotonically_increasing_id(), lit(nSalts))

  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      nSalts: Int = 16,
      saltSource: Option[Column] = None): DataFrame = {
    val salt = saltSource.map(c => pmod(xxhash64(c), lit(nSalts)))
      .getOrElse(defaultSalt(nSalts))
    df.select(col(keyCol), col(valueCol), salt.as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial_sum")).as("total"), sum(col("_partial_n")).as("n"))
  }
}
