package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamOps

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(min * 60000)

  test("tumbling window aggregation with watermark drops late rows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val agg = StreamOps.tumblingCounts(df, "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("wm_test").start()
    // batch 1: window [0,10) and [10,20)
    mem.addData((ts(1), "a", 1.0), (ts(11), "a", 2.0))
    q.processAllAvailable()
    // batch 2: advance watermark far ahead → closes earlier windows
    mem.addData((ts(60), "a", 3.0))
    q.processAllAvailable()
    // batch 3: a VERY late row for window [0,10) — beyond watermark → dropped
    mem.addData((ts(2), "a", 99.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("wm_test")
      .select($"w_start", $"n", $"total_value")
      .as[(Timestamp, Long, Double)].collect().toSeq.sortBy(_._1.getTime)
    // emitted: [0,10) n=1 total=1.0 and [10,20) n=1 total=2.0 — late 99.0 absent
    assert(out.map(r => (r._2, r._3)) == Seq((1L, 1.0), (1L, 2.0)))
  }

  test("streaming word count equals batch word count (complete mode)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val agg = StreamOps.streamingWordCount(mem.toDF().toDF("value"))
    val q = agg.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("wc_stream_test").start()
    mem.addData("b a B", "a! a?")
    q.processAllAvailable()
    q.stop()
    val got = spark.table("wc_stream_test").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 2L))
  }

  test("flatMapGroupsWithState keeps running per-user state across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val mem = MemoryStream[(Long, String, Double)]
    val df = mem.toDF().toDF("user_id", "event_type", "value")
    val updates = StreamOps.runningUserStats(df)
    val q = updates.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("state_test").start()
    mem.addData((1L, "click", 5.0), (1L, "view", 2.0), (2L, "click", 7.0))
    q.processAllAvailable()
    mem.addData((1L, "buy", 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("state_test")
      .as[(Long, Long, Double)].collect().toSeq
    // final state for user 1: n=3, max=9.0 (second batch update)
    assert(rows.contains((1L, 3L, 9.0)))
    assert(rows.contains((2L, 1L, 7.0)))
  }

  test("parquetStream reads BOTH fixture layouts: bare file and directory") {
    // production tables are directories of part files; the driver fixture
    // is a bare file — pathGlobFilter on the parent dir matches zero files
    // for a directory entry (the sf1-sweep defect), so the source must
    // switch to streaming the directory itself
    val root = graft.core.Workspace.dir(s"spec/stream_layout_${System.nanoTime()}")
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "source")
    df.repartition(2).write.parquet(s"$root/documents.parquet") // directory
    def rows(dir: String): Long = {
      val out = s"$dir/out_${System.nanoTime()}"
      val q = StreamOps.parquetStream(spark, dir, "documents.parquet")
        .writeStream.format("parquet")
        .option("path", s"$out/data").option("checkpointLocation", s"$out/ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(s"$out/data").count()
    }
    assert(rows(root) == 3L, "directory-layout table must stream its part files")
    assert(rows(sf0001) ==
      spark.read.parquet(s"$sf0001/documents.parquet").count(),
      "bare-file fixture layout must stream exactly the named file")
  }

  test("orderedEwma sorts within each batch and resumes the fold across batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Long, Double)]
      val df = mem.toDF().toDF("user_id", "ts", "event_id", "value")
      val q = StreamOps.orderedEwma(df)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("ewma_order_test").start()
      // batch 1, user 7: ARRIVAL order deliberately reversed vs event time
      mem.addData((7L, ts(3), 3L, 4.0), (7L, ts(1), 1L, 1.0), (7L, ts(2), 2L, 2.0))
      q.processAllAvailable()
      // batch 2: later events, again out of order — must resume from state
      mem.addData((7L, ts(5), 5L, 8.0), (7L, ts(4), 4L, 16.0))
      q.processAllAvailable()
      q.stop()
      var a = 0.0
      Seq(1.0, 2.0, 4.0).foreach(x => a = a * 0.7 + 0.3 * x)
      val afterB1 = a
      Seq(16.0, 8.0).foreach(x => a = a * 0.7 + 0.3 * x)
      val got = spark.table("ewma_order_test")
        .select("user_id", "n", "ewma").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._2)
      assert(got.toSeq == Seq((7L, 3L, afterB1), (7L, 5L, a)),
        s"got ${got.toSeq}; the event-time fold must ignore arrival order")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("shardTopK: multi-batch stream sample equals the batch smallest-k") {
    // the st21 correctness claim: distinct + global smallest-k over the
    // APPEND sink equals a one-shot batch top-k, under arbitrary
    // batching — including a final batch that touches only one shard
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val k = 3
      // (shard, doc_id, source, n_chars, u, prio): two shards, priorities
      // chosen so later batches evict earlier winners in shard 0 only
      val rows = Seq(
        (0, 1L, "a", 10L, 100L, 10.0), (0, 2L, "a", 10L, 200L, 20.0),
        (1, 3L, "b", 10L, 300L, 30.0), (0, 4L, "a", 10L, 400L, 40.0),
        (1, 5L, "b", 10L, 500L, 5.0), (0, 6L, "a", 10L, 600L, 6.0),
        (0, 7L, "a", 10L, 700L, 7.0), (1, 8L, "b", 10L, 800L, 80.0),
        (0, 9L, "a", 10L, 900L, 1.0))
      val mem = MemoryStream[(Int, Long, String, Long, Long, Double)]
      val df = mem.toDF().toDF("shard", "doc_id", "source", "n_chars", "u", "prio")
      val q = StreamOps.shardTopK(df, k)
        .writeStream.outputMode(OutputMode.Append())
        .format("memory").queryName("shard_topk_test").start()
      Seq(rows.slice(0, 4), rows.slice(4, 8), rows.slice(8, 9)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      q.stop()
      val got = spark.table("shard_topk_test")
        .dropDuplicates("doc_id")
        .orderBy(col("prio").asc, col("doc_id")).limit(k)
        .select("doc_id").as[Long].collect().toSeq
      val expected = rows.sortBy(r => (r._6, r._2)).take(k).map(_._2)
      assert(got == expected, s"got $got, expected $expected")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("st25 stateful dedup actually drops duplicate content") {
    // the sf fixtures carry no exact duplicates (st25's judged run gates
    // the fp values but every doc survives) — this pins the DEDUP: 3
    // distinct texts replicated across 9 docs must emit exactly 3 fps,
    // and a NULL doc must collapse onto the empty-text fp (the
    // coalesce-to-empty convention)
    val dir = java.nio.file.Files.createTempDirectory("graft_st25").toString
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    val dup = base.limit(9).withColumn("text",
      when(col("doc_id") % 3 === 0, lit("alpha beta"))
        .when(col("doc_id") % 3 === 1, lit("gamma"))
        .otherwise(lit(null).cast("string")))
    dup.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fps = SparkEntry.queries("st25_stream_dedup_state")(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(fps.length == 3, s"9 docs of 3 contents must emit 3 fps, got $fps")
    assert(fps == fps.sorted && fps.distinct == fps)
    // the null-text fp IS the empty-string fold (FNV offset basis)
    assert(fps.contains(-3750763034362895579L),
      "null text must dedup as the empty doc")
  }

  test("dynamic-gap session window: an earlier LONG-gap event bridges what the short gap splits") {
    // user 1: purchase@0 (45-min window) then view@20 (10-min window).
    //   A fixed 10-min gap (or st08's lag-diff rule) would split them —
    //   20 > 0+10 — but the purchase's window [0, 45) covers ts=20, so
    //   they MUST merge; session end = max(0+45, 20+10) = 45.
    // user 2: view@0 then view@20 — 20 >= 0+10 stays split.
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    input.addData((1L, ts(0), "purchase"), (1L, ts(20), "view"),
      (2L, ts(0), "view"), (2L, ts(20), "view"))
    val df = input.toDF().toDF("user_id", "ts", "event_type")
    val gap = expr(
      """make_interval(0, 0, 0, 0, 0,
        |  CASE WHEN event_type = 'purchase' THEN 45
        |       WHEN event_type = 'view' THEN 10
        |       ELSE 20 END, 0)""".stripMargin)
    val agg = df.withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s"), col("w.end").as("e"), col("n"))
    val name = s"dyn_session_${System.nanoTime()}"
    val got = StreamOps.runToMemory(spark, agg, name, OutputMode.Complete)
      .orderBy(col("user_id"), col("s"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSeq
    assert(got == Seq((1L, 0L, 45L, 2L), (2L, 0L, 10L, 1L), (2L, 20L, 30L, 1L)))
  }
}
