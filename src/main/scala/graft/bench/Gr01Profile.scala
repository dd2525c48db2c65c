package graft.bench

import org.apache.spark.scheduler._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Throwaway phase/stage profiler for gr01 (not part of the judged surface). */
object Gr01Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Int)]()
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages += ((si.stageId, si.name.takeWhile(_ != '\n').take(70),
          si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L),
          m.executorRunTime, si.numTasks))
        println(f"[metrics] stage=${si.stageId} run=${m.executorRunTime} " +
          f"deser=${m.executorDeserializeTime} gc=${m.jvmGCTime} " +
          f"cpu=${m.executorCpuTime / 1000000} srlz=${m.resultSerializationTime} " +
          f"shufWriteMs=${m.shuffleWriteMetrics.writeTime / 1000000} " +
          f"shufFetchWait=${m.shuffleReadMetrics.fetchWaitTime} " +
          f"inRec=${m.inputMetrics.recordsRead} outRec=${m.outputMetrics.recordsWritten} " +
          f"shufReadRec=${m.shuffleReadMetrics.recordsRead} shufWriteRec=${m.shuffleWriteMetrics.recordsWritten}")
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs += 1
    })

    def full(): Unit = {
      val fn = graft.SparkEntry.allDefs("gr01_pagerank").fn
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    full() // warm-up
    Thread.sleep(500)
    stages.clear(); jobs = 0
    val t0 = System.nanoTime()
    full()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[phase] full: $wall%.3f s, jobs=$jobs, stages=${stages.size}")
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      val info = spark.sparkContext.getRDDStorageInfo.find(_.id == id)
      println(s"[rdd] id=$id lvl=${rdd.getStorageLevel.description} " +
        info.map(i => s"cachedParts=${i.numCachedPartitions}/${i.numPartitions} mem=${i.memSize}").getOrElse("(no storage info)") +
        s" ${rdd.name}")
    }
    stages.sortBy(_._1).foreach { case (id, name, w, rt, nt) =>
      println(f"[stage] $id%4d wall=${w}%5d ms taskRun=${rt}%6d ms tasks=$nt%4d  $name")
    }
    spark.stop()
  }
}
