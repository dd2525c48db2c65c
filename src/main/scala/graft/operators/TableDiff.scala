package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation: diff two versions of a keyed table into
  * added / removed / changed / unchanged row statuses — the primitive under
  * data-migration validation, CDC backfill checks, and "did the pipeline
  * change anything it shouldn't have" audits.
  *
  * Scale shape: one full-outer sort-merge join on the key (both sides
  * shuffle exactly once, on the same key — at 100 TB this is the minimal
  * movement for an exact diff; pre-bucketed inputs via
  * [[Bucketing.writeBucketed]] make it exchange-free). Non-key columns are
  * packed into one struct per side so the change test is a single
  * null-safe struct comparison, not N per-column predicates — constant
  * expression depth regardless of schema width.
  */
object TableDiff {

  /** One row per key present in either version: `keyCols…, status` where
    * status ∈ added (key only in v2), removed (only in v1), changed
    * (both, payload differs), unchanged.
    */
  def diff(v1: DataFrame, v2: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    val dataCols = v1.columns.filterNot(keyCols.contains).toSeq
    require(dataCols == v2.columns.filterNot(keyCols.contains).toSeq,
      s"schemas disagree: ${v1.columns.toSeq} vs ${v2.columns.toSeq}")
    val l = v1.select(keyCols.map(col) :+
      struct(dataCols.map(col): _*).as("_graft_l"): _*)
    val r = v2.select(keyCols.map(col) :+
      struct(dataCols.map(col): _*).as("_graft_r"): _*)
    l.join(r, keyCols, "full_outer")
      .withColumn("status",
        when(col("_graft_l").isNull, "added")
          .when(col("_graft_r").isNull, "removed")
          .when(col("_graft_l") <=> col("_graft_r"), "unchanged")
          .otherwise("changed"))
      .select(keyCols.map(col) :+ col("status"): _*)
  }
}
