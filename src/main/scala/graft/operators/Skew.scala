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
    * The default salt is DETERMINISTIC — `xxhash64` over every input
    * column. A per-row position id (`monotonically_increasing_id`) would
    * also spread, but it is nondeterministic across task retries: after a
    * fetch failure with a PARTIAL stage recompute, rows can land in
    * different (key, salt) groups than reducers already consumed,
    * double-counting or dropping rows (the SPARK-23207 class of bug —
    * stage rollback does not cover nondeterministic SQL expressions). The
    * classic objection to value-derived salt — "the hot key's rows are
    * byte-identical, so they all hash to ONE salt group" — does not bite
    * here: identical rows collapse in the map-side partial aggregate
    * before the shuffle, so the reducer for that one group receives at
    * most one partial row per map partition regardless of row count. The
    * regime where salting earns its keep (a hot key with many DISTINCT
    * values, which partial aggregation cannot compress) is exactly where
    * the value hash spreads. Pass `saltSource` to salt on a specific
    * distinguishing column instead of the whole row.
    */
  /** Deterministic per-row salt in [0, nSalts): xxhash64 over `cols`. */
  def defaultSalt(nSalts: Int, cols: Seq[Column]): Column =
    pmod(xxhash64(cols: _*), lit(nSalts))

  def saltedSum(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      nSalts: Int = 16,
      saltSource: Option[Column] = None): DataFrame = {
    val salt = saltSource.map(c => pmod(xxhash64(c), lit(nSalts)))
      .getOrElse(defaultSalt(nSalts, df.columns.toSeq.map(col)))
    df.select(col(keyCol), col(valueCol), salt.as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial_sum")).as("total"), sum(col("_partial_n")).as("n"))
  }
}
