package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB lake needs: streaming sinks and fine-grained partitions leave
  * thousands of KB-scale files whose open/footer overhead dominates scan
  * time and whose listing bloats planning. Compaction rewrites a prefix
  * path into ~`targetBytes` files with identical content.
  *
  * Sizing reads the FILE LISTING (sum of on-disk lengths), not the data,
  * so planning is O(files); the rewrite itself is one shuffle-free
  * `coalesce` when shrinking file count (the normal case) — each output
  * task concatenates input splits locally — and falls back to
  * `repartition` only when asked to GROW the file count (splitting files
  * needs a shuffle). No reference counterpart.
  */
object Compaction {

  /** Number of output files for `totalBytes` of input at `targetBytes`
    * per file (≥ 1).
    */
  def plannedFiles(totalBytes: Long, targetBytes: Long): Int =
    math.max(1L, (totalBytes + targetBytes - 1) / math.max(1L, targetBytes)).toInt

  /** Rewrite the parquet table at `inPath` into `outPath` at about
    * `targetBytes` per file. Returns (input files, planned output files).
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long): (Int, Int) = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
    val total = files.map(_.getLen).sum
    val n     = plannedFiles(total, targetBytes)
    val df    = spark.read.parquet(inPath)
    val sized =
      if (n <= files.length) df.coalesce(n) // shrink: no shuffle
      else df.repartition(n)                // grow: needs redistribution
    sized.write.mode(SaveMode.Overwrite).parquet(outPath)
    (files.length, n)
  }

  /** Data files (non-underscore) currently at `path`. */
  def dataFiles(spark: SparkSession, path: String): Array[String] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(_.getPath.getName)
  }
}
