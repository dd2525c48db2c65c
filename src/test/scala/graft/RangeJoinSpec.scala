package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("interval containment matches a nested-loop reference, incl. bin edges") {
    val points = Seq(
      (1L, ts(0)), (2L, ts(59)), (3L, ts(60)), (4L, ts(119)),
      (5L, ts(120)), (6L, ts(1000))
    ).toDF("pid", "pts")
    val intervals = Seq(
      (10L, ts(0), ts(60)),     // [0, 60): pids 1, 2
      (11L, ts(59), ts(121)),   // [59, 121): pids 2, 3, 4, 5 — spans 3 bins
      (12L, ts(200), ts(300))   // empty
    ).toDF("iid", "lo", "hi")

    val got = RangeJoin.intervalJoin(points, "pts", intervals, "lo", "hi",
        binWidthMicros = 60L * 1000000L)
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet

    val want = Set((10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (11L, 4L), (11L, 5L))
    assert(got === want)
  }

  test("plans as an equi-join on the bin key, not a nested loop") {
    val points = Seq((1L, ts(10))).toDF("pid", "pts")
    val intervals = Seq((10L, ts(0), ts(60))).toDF("iid", "lo", "hi")
    val plan = RangeJoin.intervalJoin(points, "pts", intervals, "lo", "hi", 60000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
