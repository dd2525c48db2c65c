package graft.bench

import org.apache.spark.scheduler._
import scala.collection.mutable

/** Diagnostic variant of [[graft.Bench]]: same query sequence, but attaches
  * a listener and prints per-stage wall / task-run / CPU / GC / shuffle-write
  * for any query slower than 5 s. This is how hotspots get attributed to a
  * stage (e.g. a verify join burning 700 task-seconds in interpreted
  * expression eval) rather than guessed at.
  */
object BenchDebug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, Long, Long, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo; val m = si.taskMetrics
        stages += ((si.stageId,
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime, m.executorCpuTime / 1000000L,
          m.jvmGCTime, m.shuffleWriteMetrics.bytesWritten))
      }
    })
    // same local-iteration filter contract as graft.Bench (any judged
    // query may be named, not just benchmark-flagged ones)
    val names = sys.env.get("SPARK_GRAFT_BENCH_FILTER")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet) match {
      case Some(s) => graft.SparkEntry.allDefs.keys.toSeq.sorted.filter(s)
      case None    => graft.SparkEntry.benchQueries.keys.toSeq.sorted
    }
    def run(n: String): Double = {
      System.gc()
      val t0 = System.nanoTime()
      graft.SparkEntry.allDefs(n).fn(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warm-up
    names.foreach { n =>
      stages.clear()
      val t = run(n)
      println(f"== $n: $t%.1f s")
      if (t > 5) stages.sortBy(-_._2).take(8).foreach {
        case (id, wall, rt, cpu, gc, sw) =>
          println(f"  stage $id%4d wall=${wall / 1000.0}%7.1fs " +
            f"taskRun=${rt / 1000.0}%8.1fs cpu=${cpu / 1000.0}%8.1fs " +
            f"gc=${gc / 1000.0}%6.1fs shufW=${sw / 1e6}%8.1fMB")
      }
    }
    spark.stop()
  }
}
