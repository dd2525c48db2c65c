package graft.core

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Build/verify-time guard for the judge's compare layer.
  *
  * The driver hashes oracle-gated query outputs by sorting rows in pandas;
  * a top-level array/map/struct column makes that sort throw
  * (`unhashable type: numpy.ndarray`) at JUDGE time — after the round is
  * sealed (round 4's `q38_array_ops` proved this fails late). Any judged
  * output that carries list semantics must serialize them to a canonical
  * scalar (`array_join` ↔ DuckDB `array_to_string`).
  *
  * Enforced in two places: [[graft.SparkEntry]]-sweeping SchemaGuardSpec
  * (fails `sbt test` the moment a new query declares a nested output) and
  * [[graft.Verify]] (fails the query with an explicit message rather than
  * letting the harness crash opaquely downstream).
  */
object SchemaGuard {

  /** Output columns allowed to stay nested despite having an oracle.
    * Empty today — every judged query emits scalar columns. Add a
    * `"queryName.columnName"` entry only with a matching driver-side
    * compare change. */
  val allowedNested: Set[String] = Set.empty

  /** Names of top-level nested columns the harness cannot sort. */
  def nestedColumns(schema: StructType): Seq[String] =
    schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => f.name
    }.toSeq

  /** Violations for one judged query (nested and not allowlisted). */
  def violations(queryName: String, schema: StructType): Seq[String] =
    nestedColumns(schema).filterNot(c => allowedNested(s"$queryName.$c"))

  /** Throws with an actionable message if `schema` would crash the
    * driver's pandas compare for an oracle-gated query. */
  def assertComparable(queryName: String, schema: StructType): Unit = {
    val bad = violations(queryName, schema)
    require(bad.isEmpty,
      s"judged query '$queryName' emits top-level nested column(s) " +
        s"${bad.mkString(", ")} — the driver's pandas compare cannot sort " +
        "them; serialize with array_join(col, ',') (oracle: " +
        "array_to_string) or emit derived scalars")
  }
}
