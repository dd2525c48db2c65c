package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planted-skew drill (VERDICT r11 #6): SURVEY §2.10/§7.4 names Zipf key
  * skew as the core scale risk the reference attacked with its α=10
  * log-threshold heuristic (`MasterNode.java:154-164`); this drill is
  * the direct evidence for how THIS engine handles it, on a fixture
  * with one planted hot key.
  *
  * Fixture: sf1 events replicated `REP`× (disjoint event_id spaces),
  * with a DETERMINISTIC 30% of rows reassigned to one hot user
  * (`xxhash64(event_id) % 10 < 3`), joined star-style against a per-user
  * dimension — the q03 shape with the dim forced off the broadcast path
  * (`autoBroadcastJoinThreshold=-1`), because a broadcastable dim makes
  * skew moot (broadcast IS the first-line fix).
  *
  * Three cells, identical result digests required:
  *  - `unsalted_skewoff`: the naive shuffled join — the straggler
  *    baseline (one reducer owns the hot key's 30%).
  *  - `unsalted_aqeskew`: AQE skew-join splitting ON. The drill lowers
  *    `skewedPartitionThresholdInBytes`/`advisoryPartitionSizeInBytes`
  *    proportionally to the fixture (the defaults, 256 MB/64 MB, are
  *    cluster-scale constants; at 100 TB the hot partition trips them on
  *    its own — here the whole table is tens of MB). Evidence = the
  *    executed plan's `skew=true` marks + the task-time spread closing.
  *  - `salted_skewoff`: [[graft.operators.Skew.saltedJoin]] (sk02's
  *    operator) with AQE skew split OFF — proves the explicit-salt path
  *    stands on its own where AQE can't act (e.g. a build side too big
  *    to replicate).
  *
  * Per cell: median-of-3 wall, max/p50 task duration of the heaviest
  * stage (the straggler metric), and the row/xxhash digest. Output JSON
  * to stdout and `target/skewdrill.json`.
  */
object SkewDrill {

  private class TaskTimeListener extends SparkListener {
    val durations = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskInfo != null) durations.add((t.stageId, t.taskInfo.duration))
    def reset(): Unit = durations.clear()
    /** (max task ms, p50 task ms, n tasks) of the heaviest stage. */
    def heaviestStage(): (Long, Long, Int) = {
      import scala.jdk.CollectionConverters._
      val byStage = durations.asScala.toSeq.groupBy(_._1)
      if (byStage.isEmpty) return (0L, 0L, 0)
      val (_, ts) = byStage.maxBy(_._2.map(_._2).sum)
      val sorted = ts.map(_._2).sorted
      (sorted.last, sorted(sorted.size / 2), sorted.size)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val out   = sys.env.getOrElse("SPARK_GRAFT_SKEW_DIR", "/tmp/skewdrill")
    val rep   = sys.env.getOrElse("SPARK_GRAFT_SKEW_REP", "4").toInt
    val spark = graft.core.GraftSession.builder(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new TaskTimeListener
    spark.sparkContext.addSparkListener(listener)

    // ---- fixture: planted 30% hot key, REP× volume, deterministic ----
    val hotUser = 77L
    val events = graft.core.Tables(spark, sfDir).events
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val replicated = events
      .withColumn("_r", explode(sequence(lit(0L), lit(rep - 1L))))
      .select(
        (col("event_id") + col("_r") * ScaleData.Stride).as("event_id"),
        when(pmod(xxhash64(col("event_id") + col("_r") * ScaleData.Stride), lit(10)) < 3,
          lit(hotUser))
          .otherwise(col("user_id") + col("_r") * ScaleData.Stride).as("user_id"),
        col("event_type"), col("value"))
    replicated.write.mode("overwrite").parquet(s"$out/events")
    // per-user dimension: every user id the fixture can produce
    replicated.select(col("user_id")).distinct()
      .select(col("user_id"), pmod(col("user_id"), lit(8)).as("segment"))
      .write.mode("overwrite").parquet(s"$out/users")
    val nRows = spark.read.parquet(s"$out/events").count()
    val hotRows = spark.read.parquet(s"$out/events")
      .where(col("user_id") === hotUser).count()
    println(f"[skewdrill] fixture: $nRows rows, hot key = $hotRows (${100.0 * hotRows / nRows}%.1f%%)")

    def joined(salted: Boolean): DataFrame = {
      val e = spark.read.parquet(s"$out/events")
      val u = spark.read.parquet(s"$out/users").withColumnRenamed("user_id", "uid")
      val j =
        if (salted)
          graft.operators.Skew.saltedJoin(e, u, "user_id", "uid",
            nSalts = 32, saltSource = col("event_id"))
        else e.join(u, e("user_id") === u("uid"))
      j.groupBy(col("segment"))
        .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).as("sv"))
    }

    def digest(df: DataFrame): (Long, Long) = {
      val cols = df.columns.sorted.map(col).toIndexedSeq
      val r = df.select(count(lit(1)).as("n"),
        sum(xxhash64(to_json(struct(cols: _*)))).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def cell(name: String, salted: Boolean, aqeSkew: Boolean): Unit = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqeSkew.toString)
      if (aqeSkew) {
        // fixture-proportional thresholds (defaults are cluster-scale):
        // hot partition here is ~tens of MB, default trip wire is 256 MB
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4MB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2MB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      }
      val d = digest(joined(salted)) // warm-up + correctness digest
      val walls = Seq.fill(3) {
        System.gc()
        listener.reset()
        val t0 = System.nanoTime()
        joined(salted).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        (w, listener.heaviestStage())
      }
      val (wall, (maxT, p50T, nT)) = walls.sortBy(_._1).apply(1)
      // the final executed (adaptive) plan — collect() drives the
      // Dataset's OWN QueryExecution (a write action wraps a fresh one,
      // whose plan would still read isFinalPlan=false)
      val q = joined(salted); q.collect()
      val plan = q.queryExecution.executedPlan.toString
      val skewMarks = "skew=true".r.findAllIn(plan).size
      val line =
        f"""{"cell":"$name","wall_sec":$wall%.2f,"rows":${d._1},"digest":${d._2},""" +
        s""""heaviest_stage":{"max_task_ms":$maxT,"p50_task_ms":$p50T,"tasks":$nT},""" +
        s""""plan_skew_marks":$skewMarks}"""
      println(s"[skewdrill] $line")
      results(name) = line
    }

    cell("unsalted_skewoff", salted = false, aqeSkew = false)
    cell("unsalted_aqeskew", salted = false, aqeSkew = true)
    cell("salted_skewoff",   salted = true,  aqeSkew = false)

    val path = java.nio.file.Paths.get("target", "skewdrill.json")
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, results.values.mkString("[", ",\n", "]\n"))
    println(s"[skewdrill] wrote $path")
    spark.stop()
  }
}
