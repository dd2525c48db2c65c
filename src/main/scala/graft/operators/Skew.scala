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
    val salt = saltSource.map(c => defaultSalt(nSalts, Seq(c)))
      .getOrElse(defaultSalt(nSalts, df.columns.toSeq.map(col)))
    df.select(col(keyCol), col(valueCol), salt.as("_salt"))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_partial_sum"), count(lit(1)).as("_partial_n"))
      .groupBy(col(keyCol))
      .agg(sum(col("_partial_sum")).as("total"), sum(col("_partial_n")).as("n"))
  }

  /** Salted equi-join for single-hot-key JOIN skew — the case AQE's
    * skew-split cannot always fix (AQE splits a skewed partition only when
    * the other side's matching partition can be replicated; with a giant
    * build side it gives up). The big side gains a deterministic salt in
    * [0, nSalts) hashed from `saltSource` (a column that VARIES within the
    * hot key — never the join key itself, which would put the whole hot key
    * back in one bucket); the small side is replicated nSalts× via an
    * exploded literal sequence. The join key becomes (key, salt), so the
    * hot key's probe rows spread over nSalts reducers.
    *
    * Cost model, stated plainly: big side shuffles once (unchanged volume);
    * small side shuffles nSalts×. Use only when the small side is too big
    * to broadcast (broadcast beats salting outright) and a measured hot key
    * dominates; result is identical to the unsalted inner join because
    * every (key, salt) pair on the big side meets exactly one replicated
    * small row.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      nSalts: Int,
      saltSource: Column): DataFrame = {
    // nSalts=0 would NULL every salt (non-ANSI pmod) → silent empty join
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    // a pre-existing _salt would be silently overwritten then dropped
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "saltedJoin reserves the column name _salt; rename it on the inputs")
    val b = big.withColumn("_salt", defaultSalt(nSalts, Seq(saltSource)).cast("long"))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(nSalts.toLong - 1L))))
    b.join(s, b(bigKey) === s(smallKey) && b("_salt") === s("_salt"))
      .drop("_salt")
  }
}
