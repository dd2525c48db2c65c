package graft

import java.sql.Timestamp
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000)

  test("latest prior-or-equal match per key, ties broken by max id") {
    val left = Seq( // (id, user, ts)
      (100L, 1L, ts(50)),
      (101L, 1L, ts(10)),  // before any right row → NULL
      (102L, 2L, ts(30)),
      (103L, 3L, ts(30))   // user with no right rows → NULL
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (200L, 1L, ts(20)),
      (201L, 1L, ts(40)),
      (202L, 1L, ts(60)),  // after left 100 → not matched
      (210L, 2L, ts(30)),  // same instant as left 102 → matches
      (211L, 2L, ts(30))   // same ts, higher id → wins the tie
    ).toDF("event_id", "user_id", "ts")

    val got = AsOfJoin.lastPriorMatch(left, right,
        keyCol = "user_id", tsCol = "ts", idCol = "event_id", matchCol = "m")
      .select($"event_id", $"m").as[(Long, Option[Long])].collect().toMap

    assert(got(100L).contains(201L))
    assert(got(101L).isEmpty)
    assert(got(102L).contains(211L))
    assert(got(103L).isEmpty)
  }
}
