package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SQL MERGE (upsert) emulation on plain DataFrames — WHEN MATCHED
  * UPDATE / WHEN MATCHED DELETE / WHEN NOT MATCHED INSERT — as ONE
  * full-outer equi-join plus a row-level case, no table format required.
  * The reference has no mutation surface at all; this is the step a
  * switching user needs for daily snapshot maintenance (apply a change
  * feed to yesterday's corpus snapshot).
  *
  * Scale posture: a single shuffle join on the key. The change feed is
  * normally orders of magnitude smaller than the snapshot, so AQE
  * broadcasts it and the snapshot never moves; nothing here prevents
  * that (no window, no pre-shuffle). Semantics follow ANSI MERGE:
  *   - op = "U": matched rows take the change payload; unmatched ignored
  *   - op = "D": matched rows are removed; unmatched ignored
  *   - op = "I": unmatched keys are inserted; matched ignored
  * The caller guarantees at most one change row per key (the ANSI
  * "cardinality violation" precondition — enforce upstream where the
  * feed is untrusted).
  */
object Merge {

  /** Apply `changes` (key cols + `op` + the payload cols of `base`) to
    * `base`. Output schema = `base` schema.
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(keyCols.contains)
    val b = base.alias("b")
    val c = changes.alias("c")
    val joinCond = keyCols.map(k => col(s"b.$k") <=> col(s"c.$k")).reduce(_ && _)
    val op = col(s"c.$opCol")
    val matched = keyCols.map(k => col(s"b.$k").isNotNull).reduce(_ && _)
    // survives: untouched base, matched update, any insert (a matched
    // insert is a no-op that KEEPS the base row — dropping it would turn
    // "ignore" into "delete"); dies: matched delete, unmatched update,
    // unmatched delete
    val keep = op.isNull || op === "I" || (op === "U" && matched)
    val fromChange = (op === "U" && matched) || (op === "I" && !matched)
    def out(colName: String): Column =
      when(fromChange, col(s"c.$colName")).otherwise(col(s"b.$colName")).as(colName)
    val keyOut = keyCols.map(k => coalesce(col(s"b.$k"), col(s"c.$k")).as(k))
    b.join(c, joinCond, "full_outer")
      .where(keep)
      .select(keyOut ++ payload.map(out): _*)
  }
}
