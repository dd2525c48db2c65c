package graft

import java.sql.Timestamp

class ResampleSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("gapFill: empty buckets appear with n=0 and carry the last value forward") {
    def t(h: Int) = new Timestamp(h * 3600_000L)
    // user 1: events in hours 0 and 3 → spine 0..3, gaps at 1, 2
    val ev = Seq((1L, t(0), 5.0), (1L, t(0), 2.5), (1L, t(3), 1.0))
      .toDF("user_id", "ts", "value")
    val r = graft.operators.Resample.gapFill(ev, "user_id", "ts", "value")
      .select($"bucket", $"n", $"bucket_value", $"filled_value")
      .as[(Timestamp, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1.getTime).toSeq
    assert(r.map(_._1) == (0 to 3).map(h => t(h)))
    assert(r.map(_._2) == Seq(2L, 0L, 0L, 1L))
    assert(r.map(_._3) == Seq(Some(7.5), None, None, Some(1.0)))
    assert(r.map(_._4) == Seq(Some(7.5), Some(7.5), Some(7.5), Some(1.0)))
  }
}

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
