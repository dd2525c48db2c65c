package graft.bench

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query stage attribution for ANY judged query (the BenchDebug
  * listener without its 5 s gate or full-bench sweep): run each named
  * query warm-up + once timed, print every stage's wall / task-run /
  * CPU / GC / shuffle-write plus the job count. This is the tool the
  * round-10/11 perf items are attributed with — "which stage, which
  * exchange" instead of a guessed hotspot.
  *
  * Usage: `java -cp target/scala-2.13/classes:/opt/spark/jars/\*
  * graft.bench.QueryProfile tx37_unigram_score [more...]`
  * (env `SPARK_GRAFT_SF_DIR` / `SPARK_GRAFT_CPUS` as graft.Bench).
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Long, Long)]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages.synchronized { stages += ((si.stageId,
          si.name.takeWhile(_ != '\n').take(60),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.shuffleWriteMetrics.bytesWritten)) }
      }
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    def run(n: String): Double = {
      graft.queries.TextQueries.releaseCaches()
      graft.operators.Graph.releaseCaches()
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { n =>
      run(n) // warm-up
      stages.synchronized(stages.clear()); jobs.set(0)
      val t = run(n)
      // drain the listener bus so late stage-completed events are counted
      Thread.sleep(500)
      println(f"== $n: $t%.2f s, ${jobs.get()} jobs, ${stages.size} stages")
      stages.synchronized(stages.sortBy(-_._3).take(14)).foreach {
        case (id, nm, wall, rt, cpu, gc, sw) =>
          println(f"  stage $id%4d wall=${wall / 1000.0}%6.2fs " +
            f"taskRun=${rt / 1000.0}%7.2fs cpu=${cpu / 1000.0}%7.2fs " +
            f"gc=${gc / 1000.0}%5.2fs shufW=${sw / 1e6}%7.1fMB  $nm")
      }
    }
    spark.stop()
  }
}
