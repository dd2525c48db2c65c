package graft.bench

import java.nio.file.{Files, Paths}

/** Per-query `.explain("formatted")` dump for the optimization-round plan
  * artifacts (`plans/r12/<query>_{before,after}.txt`): unlike
  * [[PlanDump]] (all bench queries into one PLANS.md), this writes one
  * file per named query so before/after plan diffs are reviewable.
  *
  * Usage:
  * {{{ SPARK_GRAFT_SF_DIR=... sbt "runMain graft.bench.PlanDumpOne plans/r12 _before sx02_kmv_overlap [more...]" }}}
  */
object PlanDumpOne {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpOne <outDir> <suffix> <query> [query...]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir  = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark  = graft.core.GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(outDir)
    args.drop(2).foreach { name =>
      val streamBefore =
        new java.util.HashSet(graft.streaming.StreamOps.lastStreamingPlans.keySet())
      val plan =
        try graft.SparkEntry.allDefs(name).fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"(failed: ${e.getMessage})" }
      val sb = new StringBuilder(plan)
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
