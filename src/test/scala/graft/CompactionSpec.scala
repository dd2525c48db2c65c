package graft

import org.apache.spark.sql.functions._
import graft.operators.Compaction

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks file count to the byte-sized plan, content intact") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val df = (1L to 2000L).map(i => (i, s"row_$i")).toDF("id", "payload")
    df.repartition(32).write.parquet(s"$tmp/frag")
    val nIn = Compaction.dataFiles(spark, s"$tmp/frag").length
    assert(nIn == 32)
    val (seen, planned) =
      Compaction.compact(spark, s"$tmp/frag", s"$tmp/out", targetBytes = 1L << 30)
    assert(seen == 32 && planned == 1)
    assert(Compaction.dataFiles(spark, s"$tmp/out").length == 1)
    // byte-identical content (as a set — compaction may reorder rows)
    val got = spark.read.parquet(s"$tmp/out").as[(Long, String)].collect().toSet
    assert(got == df.as[(Long, String)].collect().toSet)
  }

  test("plannedFiles sizes by bytes and never returns zero") {
    assert(Compaction.plannedFiles(0L, 1024L) == 1)
    assert(Compaction.plannedFiles(1024L, 1024L) == 1)
    assert(Compaction.plannedFiles(1025L, 1024L) == 2)
    assert(Compaction.plannedFiles(10L * 1024L, 1024L) == 10)
  }

  test("shrinking compaction plans no shuffle (coalesce, not repartition)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_compact2").toString
    (1L to 100L).toDF("id").repartition(8).write.parquet(s"$tmp/frag")
    // mirror compact()'s shrink path and inspect the plan it would run
    val plan = spark.read.parquet(s"$tmp/frag").coalesce(1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
