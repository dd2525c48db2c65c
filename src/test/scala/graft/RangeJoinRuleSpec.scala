package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinRule

/** The auto-rewrite rule: a naive non-equi temporal BETWEEN join must plan
  * as a bin-keyed equi-join (no nested loop) with unchanged results.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = new Timestamp(min * 60000L)

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RangeJoinRule(spark))
    try f finally spark.experimental.extraOptimizations = Nil
  }

  private val points = Seq(
    (1L, ts(0)), (2L, ts(7)), (3L, ts(12)), (4L, ts(25))
  ).toDF("pid", "pts")
  private val intervals = Seq(
    (10L, ts(5), ts(13)),   // contains 7, 12
    (11L, ts(0), ts(1)),    // contains 0
    (12L, ts(30), ts(20))   // degenerate: hi < lo, matches nothing
  ).toDF("iid", "lo", "hi")

  test("non-equi [lo, hi) join: rewritten plan, exact results") {
    withRule {
      val j = points.join(intervals,
        $"pts" >= $"lo" && $"pts" < $"hi")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("CartesianProduct"), plan)
      assert(plan.contains("_graft_bin"), plan) // the rule actually fired
      val got = j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 11L), (2L, 10L), (3L, 10L)))
    }
  }

  test("inclusive upper bound keeps boundary matches") {
    withRule {
      val j = points.join(intervals, $"pts" >= $"lo" && $"pts" <= $"hi")
      val got = j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      // pid 3 at minute 12 < 13 still matches; boundary pts == hi would too
      assert(got == Set((1L, 11L), (2L, 10L), (3L, 10L)))
      val boundary = Seq((9L, ts(13))).toDF("pid", "pts")
        .join(intervals, $"pts" >= $"lo" && $"pts" <= $"hi")
        .select($"iid").as[Long].collect().toSeq
      assert(boundary == Seq(10L)) // pts == hi included
    }
  }

  test("joins with an equi conjunct are left alone") {
    withRule {
      val l = Seq((1L, ts(1))).toDF("k", "ats")
      val r = Seq((1L, ts(0), ts(5))).toDF("k2", "lo", "hi")
      val j = l.join(r, $"k" === $"k2" && $"ats" >= $"lo" && $"ats" < $"hi")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("_graft_bin"), plan) // no rewrite needed
      assert(j.count() == 1)
    }
  }

  test("auto bin width: 6-hour intervals derive a 6-hour bin (<= 2 bins/row)") {
    withRule {
      // 20 intervals, each spanning exactly 6 h — the case a fixed
      // 10-minute width would explode into 37 bins per interval row
      val pts = (0 until 50).map(i => (i.toLong, ts(i * 30))).toDF("pid", "pts")
      val ivs = (0 until 20).map(i => (i.toLong, ts(i * 60), ts(i * 60 + 360)))
        .toDF("iid", "lo", "hi")
      val j = pts.join(ivs, $"pts" >= $"lo" && $"pts" < $"hi")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bin"), plan) // rewrite fired
      // width == the sampled median span (6 h = 21_600_000_000 µs), so
      // every interval explodes into at most 2 bins
      assert(plan.contains("21600000000"), plan)
      val got = j.select($"pid", $"iid").as[(Long, Long)].collect().toSet
      spark.experimental.extraOptimizations = Nil
      val want = pts.join(ivs, $"pts" >= $"lo" && $"pts" < $"hi")
        .select($"pid", $"iid").as[(Long, Long)].collect().toSet
      assert(got == want)
    }
  }

  test("rewrite matches the hand-built intervalJoin result on fixture events") {
    val ev = graft.core.Tables(spark, sf0001).events
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"),
        ($"ts" - expr("INTERVAL 5 MINUTES")).as("lo"),
        ($"ts" + expr("INTERVAL 5 MINUTES")).as("hi"))
    val clicks = ev.where($"event_type" === "click")
      .select($"event_id".as("click_id"), $"ts")
    val manual = graft.operators.RangeJoin
      .intervalJoin(clicks, "ts", purchases, "lo", "hi", 600000000L)
      .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    val auto = withRule {
      clicks.join(purchases, $"ts" >= $"lo" && $"ts" < $"hi")
        .select($"purchase_id", $"click_id").as[(Long, Long)].collect().toSet
    }
    assert(auto == manual)
  }
}
