package graft.bench

import org.apache.spark.sql.functions._

/** Phase decomposition of st22 (round 11): dd10 — the identical lookup
  * as a batch query — runs in ~1.0 s and the streaming machinery floor
  * is ~0.6 s (StreamFloor), yet st22 benches ~4.4 s. This times each
  * phase of st22's body separately to locate the other ~2.8 s.
  */
object St22Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val s: org.apache.spark.sql.SparkSession = spark
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t0 = System.nanoTime()
    def rel(ms: Long): String = f"${(ms - t0 / 1000000L) / 1000.0}%8.2f"
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        events.add(f"    stage ${si.stageId}%4d [${rel(si.submissionTime.getOrElse(0L))} .. ${rel(si.completionTime.getOrElse(0L))}] tasks=${si.numTasks}%3d taskRun=${si.taskMetrics.executorRunTime / 1000.0}%6.2fs ${si.name.takeWhile(_ != '\n').take(50)}")
      }
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        events.add(f"    job ${j.jobId}%4d START [${rel(j.time)}]")
      override def onJobEnd(
          j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        events.add(f"    job ${j.jobId}%4d END   [${rel(j.time)}]")
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val ti = te.taskInfo; val m = te.taskMetrics
        events.add(f"    task stage=${te.stageId}%4d [${rel(ti.launchTime)} .. ${rel(ti.finishTime)}] run=${if (m == null) -1 else m.executorRunTime}%5dms deser=${if (m == null) -1 else m.executorDeserializeTime}%5dms resultSer=${if (m == null) -1 else m.resultSerializationTime}%4dms gc=${if (m == null) -1 else m.jvmGCTime}%4dms")
      }
    })
    for (rep <- 1 to 3) {
      println(s"== rep $rep")
      val (buckets, docsT) = t("ensureIndex") {
        graft.queries.TextQueries.dd09EnsureIndex(spark, sfDir, force = false)
      }
      val src = t("source+plan") {
        val src = graft.streaming.StreamOps.fanOut(
          graft.streaming.StreamOps
            .parquetStream(spark, sfDir, "documents.parquet")
            .where(col("doc_id") >= 400))
        graft.operators.Dedup.dedupAgainstIndexStreaming(
          src, spark.table(buckets), spark.table(docsT), threshold = 0.8)
      }
      val name = s"st22_profile_${System.nanoTime()}"
      val q = t("start") {
        src.writeStream
          .outputMode(org.apache.spark.sql.streaming.OutputMode.Append)
          .format("memory").queryName(name)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
      }
      events.clear()
      t("awaitTermination")(q.awaitTermination())
      Thread.sleep(300)
      if (rep == 3) events.forEach(e => println(e))
      t("sink orderBy + noop") {
        spark.table(name).orderBy(col("batch_id"), col("corpus_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
