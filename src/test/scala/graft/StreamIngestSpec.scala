package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** st31's contracts beyond the oracle gate: multi-micro-batch accretion
  * (the oracle run drains in one AvailableNow batch — here the delta is
  * forced through per-file batches and must land identically), and the
  * cross-session visibility rule the operator's scaladoc states (appends
  * from a cloned session are invisible to a reader holding the stale
  * relation cache until refreshTable).
  */
class StreamIngestSpec extends SparkSpec {
  import spark.implicits._

  private def lookupPairs(buckets: String, docsT: String, batch: org.apache.spark.sql.DataFrame) =
    Dedup.dedupAgainstIndex(batch, spark.table(buckets), spark.table(docsT),
        threshold = 0.8)
      .select($"batch_id", $"corpus_id", $"jaccard")
      .as[(Long, Long, Double)].collect().toSet

  test("multi-micro-batch streamed accretion equals the offline build") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_st31spec").toString
    // the delta installment as THREE files -> three foreachBatch appends
    val deltaDir = s"$tmp/delta"
    docs.where($"doc_id" >= 300 && $"doc_id" < 400)
      .repartition(3).write.parquet(deltaDir)
    Dedup.writeIndex(Dedup.minhashIndex(docs.where($"doc_id" < 300)),
      "spec_st31_idx", s"$tmp/idx", 4)
    val nAppends = new java.util.concurrent.atomic.AtomicInteger(0)
    val src = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(deltaDir)
    val fb: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], Long) => Unit =
      (batch, _) =>
        if (!batch.isEmpty) {
          nAppends.incrementAndGet()
          Dedup.appendToIndex(batch.toDF(), "spec_st31_idx", s"$tmp/idx", 4)
        }
    val q = src.writeStream.foreachBatch(fb)
      .option("checkpointLocation", s"$tmp/ck")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(nAppends.get() == 3, s"expected 3 per-file appends, got ${nAppends.get()}")
    // cross-session visibility: the reader session still holds the
    // pre-append listing until refreshed — the scaladoc'd stale-read mode
    val stale = spark.table("spec_st31_idx_docs").count()
    assert(stale == 300L, s"expected the stale pre-append snapshot, got $stale")
    spark.catalog.refreshTable("spec_st31_idx_docs")
    spark.catalog.refreshTable("spec_st31_idx_buckets")
    assert(spark.table("spec_st31_idx_docs").count() == 400L)
    // content equivalence: streamed accretion == offline build of < 400
    val batch = docs.where($"doc_id" >= 400)
    val streamed = lookupPairs("spec_st31_idx_buckets", "spec_st31_idx_docs", batch)
    Dedup.writeIndex(Dedup.minhashIndex(docs.where($"doc_id" < 400)),
      "spec_st31_ref", s"$tmp/ref", 4)
    val rebuilt = lookupPairs("spec_st31_ref_buckets", "spec_st31_ref_docs", batch)
    assert(streamed == rebuilt && streamed.nonEmpty,
      s"missing=${(rebuilt -- streamed).take(3)} extra=${(streamed -- rebuilt).take(3)}")
  }
}
