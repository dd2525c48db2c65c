package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.operators.Skew
import graft.streaming.StreamOps

class SkewStreamSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum equals direct groupBy sum on skewed data") {
    val rows = (1 to 2000).map(i => ("hot", i.toDouble)) ++
      (1 to 50).map(i => (s"k$i", i.toDouble))
    val df = rows.toDF("key", "value")
    val direct = df.groupBy($"key")
      .agg(sum($"value").as("total"), count(lit(1)).as("n"))
      .as[(String, Double, Long)].collect().toSet
    val salted = Skew.saltedSum(df, "key", "value", nSalts = 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == direct)
  }

  test("default salt is deterministic and spreads a hot key with distinct values") {
    // Deterministic (retry-safe — the SPARK-23207 class of partial-
    // recompute bug rules out position ids): same rows → same salt, twice.
    val df = (1 to 1000).map(i => ("hot", i.toDouble)).toDF("key", "value")
    def saltCounts() = df
      .select(Skew.defaultSalt(8, Seq($"key", $"value")).as("s"))
      .groupBy($"s").count().as[(Long, Long)].collect().toMap
    val a = saltCounts()
    assert(a == saltCounts(), "default salt must be deterministic across runs")
    // the regime where salting matters — a hot key with many DISTINCT
    // values (map-side combine can't compress it) — spreads over the salts
    assert(a.size == 8, s"expected 8 salt groups, got ${a.size}")
    // constant-value rows DO collapse to one salt group, and that is fine:
    // map-side partial aggregation compresses identical rows before the
    // shuffle, so the totals (and the skew) are unaffected
    val const = (1 to 1000).map(_ => ("hot", 1.0)).toDF("key", "value")
    val salted = Skew.saltedSum(const, "key", "value", nSalts = 8)
      .as[(String, Double, Long)].collect().toSet
    assert(salted == Set(("hot", 1000.0, 1000L)))
  }

  test("salted join equals plain join on hot-key data; salt spreads the hot key") {
    val big = ((1 to 2000).map(i => (1L, i)) ++        // hot key, distinct payloads
      (1 to 50).map(i => (i.toLong + 1L, i))).toDF("k", "payload")
    val small = (1 to 60).map(i => (i.toLong, s"dim$i")).toDF("sk", "attr")
    val plain = big.join(small, $"k" === $"sk")
      .select($"k", $"payload", $"attr")
      .as[(Long, Int, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", "sk",
        nSalts = 8, saltSource = $"payload")
      .select($"k", $"payload", $"attr")
      .as[(Long, Int, String)].collect().toSet
    assert(salted == plain) // inner-join parity: each (key, salt) meets one replica
    // hot key's probe rows actually spread across the salt space
    val spread = big.where($"k" === 1L)
      .select(Skew.defaultSalt(8, Seq($"payload")).as("s"))
      .select(countDistinct($"s")).as[Long].head()
    assert(spread == 8L, s"hot key used $spread of 8 salts")
  }

  test("salted plan spreads the hot key over nSalts first-stage groups") {
    val df = (1 to 100).map(i => ("hot", i.toDouble)).toDF("key", "value")
    val plan = Skew.saltedSum(df, "key", "value", nSalts = 8)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("_salt"), plan) // two-level aggregate survived optimization
  }

  test("streaming dedup keeps first arrival per key, drops later duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val dedup = StreamOps.streamingDedup(
      mem.toDF().toDF("event_id", "ts", "payload"),
      keyCols = Seq("event_id"), watermark = "10 minutes")
    val q = dedup.writeStream.format("memory")
      .queryName("dedup_test").outputMode(OutputMode.Append).start()
    def ts(min: Int) = new Timestamp(3600L * 1000 + min * 60000L)
    mem.addData((1L, ts(0), "a"), (2L, ts(1), "b"), (1L, ts(2), "dup"))
    q.processAllAvailable()
    mem.addData((2L, ts(3), "dup"), (3L, ts(4), "c"))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("dedup_test")
      .select($"event_id", $"payload").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }
}
