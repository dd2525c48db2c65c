package graft

import graft.operators.Merge

class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert applies U/D/I and ignores ghost update and matched insert") {
    val base = Seq(
      (1L, "a", 10.0),
      (2L, "b", 20.0),
      (3L, "c", 30.0),
      (4L, "d", 40.0)
    ).toDF("k", "s", "v")
    val changes = Seq(
      (2L, "U", "b2", 22.0),   // matched update → new payload
      (3L, "D", "x", 0.0),     // matched delete → row gone
      (5L, "I", "e", 50.0),    // unmatched insert → new row
      (1L, "I", "zz", 99.0),   // MATCHED insert → ignored, base row kept
      (9L, "U", "gh", 1.0),    // UNmatched update → ignored entirely
      (8L, "D", "gh", 1.0)     // UNmatched delete → ignored entirely
    ).toDF("k", "op", "s", "v")
    val r = Merge.upsert(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(r == Seq(
      (1L, "a", 10.0),
      (2L, "b2", 22.0),
      (4L, "d", 40.0),
      (5L, "e", 50.0)))
  }

  test("upsert with empty change feed is identity") {
    val base = Seq((1L, "a", 1.0)).toDF("k", "s", "v")
    val changes = Seq.empty[(Long, String, String, Double)].toDF("k", "op", "s", "v")
    val r = Merge.upsert(base, changes, Seq("k"))
      .as[(Long, String, Double)].collect().toSeq
    assert(r == Seq((1L, "a", 1.0)))
  }

  test("upsert on composite key matches on all key columns") {
    val base = Seq((1L, "x", 10.0), (1L, "y", 20.0)).toDF("k1", "k2", "v")
    val changes = Seq((1L, "y", "U", 25.0)).toDF("k1", "k2", "op", "v")
    val r = Merge.upsert(base, changes, Seq("k1", "k2"))
      .as[(Long, String, Double)].collect().sortBy(_._2).toSeq
    assert(r == Seq((1L, "x", 10.0), (1L, "y", 25.0)))
  }
}
