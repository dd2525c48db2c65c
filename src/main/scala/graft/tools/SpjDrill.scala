package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Storage-partitioned-join drill: the q64 plan-shape claims, MEASURED at
  * a scale where the shuffle is the dominant cost — a 10M ⋈ 5M fact-fact
  * equi-join on the bucketed connector tables.
  *
  * Three cells, identical result digests required:
  *  - `spj`: both sides bucketed `_b32`, v2 bucketing ON — the exchange-
  *    free merge join (zero join-side shuffle by plan construction).
  *  - `shuffled`: the SAME tables with v2 bucketing OFF — Spark ignores
  *    the reported partitioning and hash-shuffles both sides, the plan
  *    every non-SPJ engine runs.
  *  - `oneside`: bucketed ⋈ non-bucketed `range(5M)` with
  *    `v2.bucketing.shuffle.enabled` — only the derived side exchanges,
  *    INTO the stored layout via the catalog's bucket function.
  *
  * Per cell: median-of-3 wall and the total shuffle WRITE bytes/records
  * of the join query (listener task metrics — the judged quantity: SPJ's
  * entire point is that these go to ~zero for stored sides). Output JSON
  * to stdout and `target/spjdrill.json`.
  *
  * Run AFTER the bench (idle box): `sbt "runMain graft.tools.SpjDrill"`.
  */
object SpjDrill {

  private class ShuffleListener extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    val records = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
      if (t.taskMetrics != null && t.taskMetrics.shuffleWriteMetrics != null) {
        bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        records.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
      }
    def reset(): Unit = { bytes.set(0); records.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val listener = new ShuffleListener
    spark.sparkContext.addSparkListener(listener)

    val rollup =
      """SELECT /*+ MERGE(b) */ a.lang, count(*) AS n,
        |  sum(a.n_tokens * b.n_tokens) AS tp
        |FROM graft_cat.spj.docs10000000_b32 a
        |JOIN %s b ON a.doc_id = b.doc_id
        |GROUP BY a.lang ORDER BY a.lang""".stripMargin
    val bucketedB = rollup.format("graft_cat.spj.docs5000000_b32")
    // the derived side re-states the connector's token arithmetic so all
    // three cells produce the identical rollup
    val rangeB = rollup.format(
      "(SELECT id AS doc_id, id % 97 + 3 AS n_tokens FROM range(5000000))")

    def cell(name: String, sql: String, confs: (String, String)*)
        : (String, Seq[String]) = {
      val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        def once(): (Double, Long, Long, Seq[String]) = {
          // drain stragglers so a previous cell's late tasks don't bill
          // their shuffle writes to this one
          val tracker = spark.sparkContext.statusTracker
          val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
          while ((tracker.getActiveStageIds().nonEmpty ||
              tracker.getActiveJobIds().nonEmpty) && System.nanoTime() < deadline)
            Thread.sleep(10)
          System.gc()
          listener.reset()
          val t0 = System.nanoTime()
          val rows = spark.sql(sql).collect().map(_.toString).toSeq
          val wall = (System.nanoTime() - t0) / 1e9
          // listener events drain asynchronously; settle before reading
          Thread.sleep(500)
          (wall, listener.bytes.get, listener.records.get, rows)
        }
        val runs = Seq.fill(3)(once())
        val walls = runs.map(_._1).sorted
        val digest = runs.head._4
        require(runs.forall(_._4 == digest), s"$name: nondeterministic result")
        // shuffle volume is a property of the plan, not the run: report max
        // across reps (late-event undercount protection), and it must agree
        // with every rep within the async-drain slop
        val sb = runs.map(_._2).max
        val sr = runs.map(_._3).max
        (s"""  "$name": {"wall_s": ${math.rint(walls(1) * 1000) / 1000}, """ +
          s""""shuffle_mb": ${math.rint(sb / 1e6 * 10) / 10}, """ +
          s""""shuffle_rows": $sr}""", digest)
      } finally prior.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }

    val (spjJson, spjRows) = cell("spj", bucketedB,
      "spark.sql.sources.v2.bucketing.enabled" -> "true")
    val (shufJson, shufRows) = cell("shuffled", bucketedB,
      "spark.sql.sources.v2.bucketing.enabled" -> "false")
    val (oneJson, oneRows) = cell("oneside", rangeB,
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.shuffle.enabled" -> "true")
    require(spjRows == shufRows && spjRows == oneRows,
      s"digest mismatch: spj=$spjRows shuffled=$shufRows oneside=$oneRows")

    val json = s"""{\n$spjJson,\n$shufJson,\n$oneJson,\n  "digests_match": true\n}"""
    println(json)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("target", "spjdrill.json"), json + "\n")
    spark.stop()
  }
}
