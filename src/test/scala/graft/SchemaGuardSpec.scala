package graft

import org.apache.spark.sql.types._
import graft.core.SchemaGuard

/** Build-time gate for the q38-class failure mode (VERDICT r4 #7): an
  * oracle-gated query whose output carries a top-level nested column can
  * never be adjudicated — the driver's pandas row-sort throws on it, and
  * that failure only surfaces at judge time. This spec fails `sbt test`
  * the moment such a query is declared.
  *
  * Streaming queries (`st*`) are excluded from the sweep: their output
  * schema only exists after the stream executes, which SchemaGuard in
  * [[graft.Verify]] still covers at gate time; every one of them emits
  * scalar aggregates today.
  */
class SchemaGuardSpec extends SparkSpec {

  test("flat schemas pass, nested top-level columns are flagged") {
    val flat = StructType(Seq(
      StructField("k", LongType), StructField("s", StringType)))
    assert(SchemaGuard.violations("q", flat).isEmpty)
    val nested = StructType(Seq(
      StructField("k", LongType),
      StructField("xs", ArrayType(LongType)),
      StructField("m", MapType(StringType, LongType)),
      StructField("st", StructType(Seq(StructField("a", LongType))))))
    assert(SchemaGuard.violations("q", nested) == Seq("xs", "m", "st"))
    intercept[IllegalArgumentException] {
      SchemaGuard.assertComparable("q", nested)
    }
  }

  test("allowlist is honored per query.column") {
    val nested = StructType(Seq(StructField("xs", ArrayType(LongType))))
    // Nothing is allowlisted today; the filter itself is exercised via
    // the set's membership semantics.
    assert(SchemaGuard.violations("someq", nested) == Seq("xs"))
    assert(SchemaGuard.allowedNested.isEmpty,
      "allowlist additions need a matching driver-side compare change")
  }

  test("no oracle-gated batch query emits a top-level nested column") {
    val oracleGated = SparkEntry.oracleSql.keySet
    val offenders = SparkEntry.allDefs.toSeq.sortBy(_._1).flatMap {
      case (name, d) if oracleGated(name) && !name.startsWith("st") =>
        val bad = SchemaGuard.violations(name, d.fn(spark, sf0001).schema)
        if (bad.isEmpty) Nil else Seq(s"$name: ${bad.mkString(",")}")
      case _ => Nil
    }
    assert(offenders.isEmpty,
      s"nested judged outputs (driver compare will crash): $offenders")
  }
}
