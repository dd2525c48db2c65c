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

  test("plan: partial-topk → ONE hash exchange → final-topk — no sort, no window") {
    val p = native(li, 3).queryExecution.executedPlan.toString
    // two-phase: final above the exchange, partial below (map-side)
    val fin = p.indexOf("TopKPerKeyFinal")
    val exch = p.indexOf("Exchange hashpartitioning")
    val part = p.indexOf("TopKPerKeyPartial")
    assert(fin >= 0 && exch > fin && part > exch, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    val below = p.substring(fin)
    assert(!below.contains("Sort ") && !below.contains("Window"), p)
  }

  test("metrics: partial phase bounds what crosses the exchange") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    // many input partitions so the partial reduction is visible
    val in = li.repartition(6, col("l_orderkey"))
    val df = native(in, 2)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    // AQE hides materialized subtrees inside (leaf) QueryStageExec nodes —
    // descend through them
    def execsIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[graft.plans.TopKPerKeyExec] = {
      val here = p match { case t: graft.plans.TopKPerKeyExec => Seq(t); case _ => Nil }
      val stage = p match {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case _ => Nil
      }
      here ++ (p.children ++ stage).flatMap(execsIn)
    }
    val execs = execsIn(plan)
    val partial = execs.find(_.partial).getOrElse(fail(s"no partial exec in\n$plan"))
    val fin = execs.find(!_.partial).getOrElse(fail(s"no final exec in\n$plan"))
    val inputRows = in.count()
    val partialOut = partial.metrics("numOutputRows").value
    val finalOut = fin.metrics("numOutputRows").value
    // partial emits ≤ partitions × keys × k — strictly fewer than input here
    assert(partialOut > 0 && partialOut < inputRows, s"partial=$partialOut input=$inputRows")
    // final only ever tightens
    assert(finalOut > 0 && finalOut <= partialOut, s"final=$finalOut partial=$partialOut")
    assert(finalOut == native(in, 2).count())
    // eviction metric wired (bounded-heap churn happened somewhere)
    assert((partial.metrics("numEvictions").value +
      fin.metrics("numEvictions").value) > 0)
  }

  test("strategy registration is idempotent under concurrent callers") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futs = (1 to 8).map(_ => Future { native(li, 1).count() })
    futs.foreach(Await.result(_, 120.seconds))
    val n = spark.experimental.extraStrategies
      .count(_.isInstanceOf[graft.plans.TopKPerKeyStrategy])
    assert(n == 1, s"strategy registered $n times")
  }
}
