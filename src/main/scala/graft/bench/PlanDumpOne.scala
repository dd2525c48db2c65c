package graft.bench

import java.nio.file.{Files, Paths}

/** Per-query plan dump for the optimization-round plan artifacts
  * (`plans/rNN/<query>_{before,after}.txt`): unlike [[PlanDump]] (all
  * bench queries into one PLANS.md), this writes one file per named
  * query so before/after plan diffs are reviewable.
  *
  * Each file carries TWO sections (r12 verdict #8): the pre-execution
  * `.explain("formatted")` plan, and the EXECUTED plan after the query
  * has run through the noop sink — with AQE on, only the latter shows
  * runtime decisions (ReusedExchange, AQEShuffleRead coalescing/skew
  * splits, runtime join-strategy rewrites), so reuse/coalesce claims
  * must be read off the executed section.
  *
  * Usage:
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.bench.PlanDumpOne plans/r13 _before sx02_kmv_overlap [more...]" }}}
  */
object PlanDumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpOne <outDir> <suffix> <query> [query...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus   = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark  = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    // The EXECUTED plan must come from the query execution that actually
    // ran: `df.write...save()` plans a fresh QueryExecution for the write
    // command, so printing df.queryExecution.executedPlan afterwards
    // would show the UNEXECUTED initial plan (isFinalPlan=false, raw
    // Exchanges — no ReusedExchange/AQEShuffleRead visible). A
    // QueryExecutionListener hands us the write's own QueryExecution
    // after it completed, where AdaptiveSparkPlanExec prints the final
    // re-optimized plan.
    val lastExecuted = new java.util.concurrent.atomic.AtomicReference[String]("")
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit =
          lastExecuted.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })
    args.drop(2).foreach { name =>
      val streamBefore =
        new java.util.HashSet(graft.streaming.StreamOps.lastStreamingPlans.keySet())
      val sb = new StringBuilder
      try {
        val df = graft.SparkEntry.allDefs(name).fn(spark, sfDir)
        sb.append(df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode))
        lastExecuted.set("")
        df.write.format("noop").mode("overwrite").save()
        // the listener bus delivers asynchronously; wait briefly
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (lastExecuted.get().isEmpty && System.nanoTime() < deadline)
          Thread.sleep(50)
        sb.append("\n=== executed plan (AQE final) ===\n")
          .append(lastExecuted.get())
      } catch { case e: Throwable =>
        sb.append(s"\n(failed: ${e.getMessage})")
      }
      graft.streaming.StreamOps.lastStreamingPlans.forEach { (qn, p) =>
        if (!streamBefore.contains(qn))
          sb.append(s"\n=== micro-batch executed plan ($qn) ===\n").append(p)
      }
      Files.writeString(outDir.resolve(s"$name$suffix.txt"), sb.toString + "\n")
      println(s"[plandump] wrote $name$suffix.txt")
    }
    spark.stop()
  }
}
