package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Dedup}
import graft.functions.TextFunctions

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("chunking: overlap, no redundant tail, empty doc") {
    // 10 chars, chunkLen 6, stride 4 → "abcdef", "efghij" — and STOP: a
    // third chunk ("ij") would be entirely contained in the second,
    // duplicating training text
    val d = Seq((1L, "abcdefghij"), (2L, "")).toDF("doc_id", "text")
    val got = Chunking.chunk(d, chunkLen = 6, stride = 4)
      .select($"doc_id", $"chunk_ix", $"chunk")
      .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((1L, 0, "abcdef"), (1L, 1, "efghij")))
    // empty doc → no chunks (no junk row from a descending sequence)
    // doc shorter than one chunk → exactly one chunk
    val short = Chunking.chunk(Seq((3L, "abc")).toDF("doc_id", "text"), 6, 4)
      .select($"chunk_ix", $"chunk").as[(Int, String)].collect().toSeq
    assert(short == Seq((0, "abc")))
  }

  test("chunking covers every character; contiguous when stride == chunkLen") {
    for ((len, cl, st) <- Seq((1, 6, 4), (10, 6, 4), (23, 8, 8), (7, 5, 3), (150, 200, 150))) {
      val text = (0 until len).map(i => ('a' + i % 26).toChar).mkString
      val chunks = Chunking.chunk(Seq((1L, text)).toDF("doc_id", "text"), cl, st)
        .select($"chunk_ix", $"chunk").as[(Int, String)].collect().sortBy(_._1)
      // every character position is inside at least one chunk
      val covered = chunks.flatMap { case (ix, c) => ix * st until ix * st + c.length }.toSet
      assert(covered == (0 until len).toSet, s"len=$len cl=$cl st=$st")
      // non-overlapping config reassembles the exact document
      if (cl == st) assert(chunks.map(_._2).mkString == text)
    }
  }

  test("packing: exclusive running total assigns budget-boundary batches") {
    val d = Seq(
      (1L, "s", 400L), (2L, "s", 400L), (3L, "s", 400L), // cum_prev 0,400,800
      (4L, "s", 400L),                                   // cum_prev 1200 → batch 1
      (5L, "t", 50L)                                     // separate stratum
    ).toDF("doc_id", "source", "n_tokens")
    val got = Chunking.packBatches(d, budget = 1000L)
      .select($"doc_id", $"batch_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("dup clusters: min-label propagation finds components + singletons") {
    // components {1,2,3} (chain), {5,6}; 4 is a singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, nodes)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("stopword removal cleans and re-joins; PII scrub redacts portably") {
    val r = Seq("The cat and the dog").toDF("t")
      .select(TextFunctions.removeStopwords($"t")).as[String].head()
    assert(r == "cat dog") // "The"/"the"/"and" dropped, single-space join
    val p = Seq("mail a@b.com or call +1 555-123 4567 now").toDF("t")
      .select(TextFunctions.scrubPii($"t")).as[String].head()
    assert(!p.contains("a@b.com") && p.contains("<EMAIL>"), p)
    assert(!p.contains("555"), p)
    assert(p.contains("<PHONE>"), p)
  }
}
