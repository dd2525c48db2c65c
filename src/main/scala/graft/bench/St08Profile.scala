package graft.bench

import org.apache.spark.sql.functions._

/** Attribution harness for st08 (streaming session windows) at sf1 —
  * round-7 verdict #5: "compare the session path against alternatives and
  * keep the cheaper one, or document the cost as irreducible replay".
  *
  * Measures, on `SPARK_GRAFT_SF_DIR`:
  *   1. the BATCH form of the identical session_window aggregate
  *      (no watermark, no state store) — the floor any streaming
  *      formulation must pay for scan + session-merge math;
  *   2. judged st08 (streaming session_window, default HDFS-backed
  *      in-memory state store);
  *   3. st08 with the RocksDB state store provider (the st15/st20
  *      store) — is the store the cost, or the operator?
  * Each is median-of-3 after a warm-up, mirroring [[graft.Bench]].
  */
object St08Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.builder(s"local[$cpus]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      System.gc(); val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def med3(label: String)(f: => Unit): Unit = {
      time(f) // warm-up
      val ts = Seq.fill(3)(time(f)).sorted
      println(f"[st08profile] $label: ${ts(1)}%.2f s (min ${ts.head}%.2f max ${ts.last}%.2f)")
    }

    val batchSession = () => graft.core.Tables(spark, sfDir).events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("w.end").as("s_end"), col("n"))
      .write.format("noop").mode("overwrite").save()

    val st08 = () => graft.SparkEntry.allDefs("st08_stream_session")
      .fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    med3("batch session_window (floor)")(batchSession())
    med3("st08 streaming, default state store")(st08())

    val key = "spark.sql.streaming.stateStore.providerClass"
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try med3("st08 streaming, RocksDB state store")(st08())
    finally spark.conf.unset(key)

    // 4. local session pre-merge (SPARK-36576): merge gap-adjacent
    //    sessions map-side before the state-store exchange
    val mergeKey = "spark.sql.streaming.sessionWindow.merge.sessions.in.local.partition"
    spark.conf.set(mergeKey, "true")
    try med3("st08 streaming, local pre-merge")(st08())
    finally spark.conf.unset(mergeKey)

    spark.stop()
  }
}
