package graft.bench

import org.apache.spark.sql.functions._

/** Measures the fixed cost of the judged streaming convention itself:
  * drive (a) a ZERO-ROW file stream and (b) a pass-through projection of
  * the full documents stream to completion through the same
  * `StreamOps.runToMemory` path every st* query uses (AvailableNow, one
  * batch, memory sink). Whatever an st* query costs ABOVE (b) is its
  * actual query work; (a) vs (b) splits machinery from data volume.
  * This is the number that decides whether an st* bench time is "slow
  * plan" or "price of running real Structured Streaming" — the round-11
  * st22/st24 attribution.
  */
object StreamFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def med3(label: String)(f: => Unit): Unit = {
      f // warm-up
      val ts = Seq.fill(3) {
        System.gc()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: median ${ts.sorted.apply(1)}%.2f s (runs ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    med3("empty stream (machinery floor)") {
      val src = graft.streaming.StreamOps
        .parquetStream(spark, sfDir, "documents.parquet")
        .where(col("doc_id") < 0)
      graft.streaming.StreamOps.runToMemory(spark, src.select(col("doc_id")),
        s"floor_empty_${System.nanoTime()}",
        mode = org.apache.spark.sql.streaming.OutputMode.Append).count()
    }
    med3("pass-through stream (floor + full-table replay)") {
      val src = graft.streaming.StreamOps
        .parquetStream(spark, sfDir, "documents.parquet")
      graft.streaming.StreamOps.runToMemory(spark,
        src.select(col("doc_id"), length(col("text")).as("n")),
        s"floor_pass_${System.nanoTime()}",
        mode = org.apache.spark.sql.streaming.OutputMode.Append).count()
    }
    spark.stop()
  }
}
