package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** The custom physical operator ([[graft.plans.TopKPerKey]]) must agree
  * exactly with the window row_number formulation it replaces, under any
  * input partitioning, including short groups and k beyond the group
  * size — and must not crash on empty input.
  */
class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  private def li = spark.read.parquet(s"$sf0001/lineitem.parquet")
    .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")

  private def windowRef(k: Int) = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
  }

  private def native(df: org.apache.spark.sql.DataFrame, k: Int) =
    TopKPerKey.perKey(df, Seq("l_suppkey"),
      Seq(("l_extendedprice", true), ("l_orderkey", false), ("l_linenumber", false)), k)

  private def asSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet

  test("heap top-k equals the window formulation, groups shorter than k included") {
    for (k <- Seq(1, 3, 50)) { // 50 exceeds most suppliers' row counts
      val got = asSet(native(li, k))
      val ref = asSet(windowRef(k))
      assert(got == ref, s"k=$k: ${got.size} vs ${ref.size}")
      assert(got.nonEmpty)
    }
  }

  test("result is invariant under input partitioning") {
    val a = asSet(native(li, 3))
    val b = asSet(native(li.repartition(7, col("l_orderkey")), 3))
    val c = asSet(native(li.coalesce(1), 3))
    assert(a == b && b == c)
  }

  test("empty input yields empty output, no error") {
    assert(native(li.where(lit(false)), 3).count() == 0L)
  }

  test("plan: custom exec above ONE hash exchange — no sort, no window below it") {
    val p = native(li, 3).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKey"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    val execIdx = p.indexOf("TopKPerKey")
    val below = p.substring(execIdx)
    assert(!below.contains("Sort ") && !below.contains("Window"), p)
  }
}
