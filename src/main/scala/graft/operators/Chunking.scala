package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data shaping operators: fixed-width document chunking with
  * overlap, and sequence packing (assigning documents to token-budget
  * batches). No reference counterpart — these are the steps between "clean
  * corpus" and "tensors" in an LLM data pipeline, expressed as pure column
  * arithmetic + one window function so they stay inside whole-stage codegen
  * and scale like any map/window stage.
  */
object Chunking {

  /** Split each document into fixed-width character chunks: chunk i covers
    * 1-based positions [i·stride + 1, i·stride + chunkLen]; with
    * chunkLen > stride consecutive chunks overlap by (chunkLen − stride)
    * characters (the standard context-window overlap). Emission stops once
    * a chunk's end reaches the document's end — a doc fits in one chunk
    * when len ≤ chunkLen, otherwise ceil((len − chunkLen)/stride) + 1
    * chunks (the standard chunker contract; the earlier ceil(len/stride)
    * form emitted a final chunk entirely CONTAINED in its predecessor
    * whenever chunkLen > stride, duplicating training text downstream).
    * Empty documents produce NO chunks (guarded — an unguarded descending
    * `sequence` would emit junk rows). Per-row computation only: chunking
    * never shuffles.
    */
  def chunk(
      docs: DataFrame,
      chunkLen: Int,
      stride: Int,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(stride > 0 && chunkLen >= stride, "need stride > 0 and chunkLen >= stride")
    val len = length(col(textCol))
    val nChunks = when(len <= chunkLen, lit(1))
      .otherwise(ceil((len - chunkLen).cast("double") / stride).cast("int") + 1)
    docs
      .select(col(idCol),
        posexplode(
          when(len === 0, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), nChunks - 1),
              i => col(textCol).substr(i * stride + 1, lit(chunkLen))))))
      .withColumnRenamed("pos", "chunk_ix")
      .withColumnRenamed("col", "chunk")
  }

  /** Assign documents to token-budget batches: within each `groupCol`
    * stratum (documents ordered by id), batch b holds the consecutive run
    * of documents whose EXCLUSIVE running token total lies in
    * [b·budget, (b+1)·budget) — i.e. a document starts a new batch once the
    * budget is exhausted. One window pass (shuffle by group, sort by id in
    * partition) — the same single-shuffle shape as sessionization; at
    * 100 TB the stratum is the parallelism unit.
    */
  def packBatches(
      docs: DataFrame,
      budget: Long,
      groupCol: String = "source",
      idCol: String = "doc_id",
      tokensCol: String = "n_tokens"): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("_cum_prev", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      // integer division, not floor(double/…): cumulative token totals can
      // exceed double's 53-bit mantissa long before 100 TB does
      .withColumn("batch_id", expr(s"_cum_prev div ${budget}L"))
      .drop("_cum_prev")
  }
}
