package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table plumbing — the shuffle-elimination lever for repeated
  * big-table joins at 100 TB: write both sides bucketed (and sorted) on the
  * join key once, and every subsequent equi-join on that key is exchange-
  * free (Spark recognizes the bucket spec as the required hash
  * distribution; a `merge` hint keeps the planner on the sort-merge path
  * instead of broadcasting a side that only LOOKS small at test scale).
  * PlanSpec asserts the no-Exchange plan; the judged q25 gates the values.
  */
object Bucketing {

  /** Write `df` as a parquet-backed EXTERNAL bucketed table (explicit
    * `path`), replacing any previous registration. Bucketed writes must go
    * through the session catalog (`saveAsTable`) — path-only writes cannot
    * carry a bucket spec.
    *
    * The write repartitions on the bucket key first: without it every
    * input task writes its own file into EVERY bucket (tasks × buckets
    * files — the classic bucketed-write small-file blowup); with it each
    * bucket is exactly one file. At 100 TB that is the difference between
    * a listable table and a metadata storm, and one-file-per-bucket is
    * also the precondition for Spark to trust the per-bucket sort order
    * (the read-side ordering claim itself stays off by default —
    * `spark.sql.legacy.bucketedTableScanOutputOrdering` — so plans keep a
    * cheap linear re-sort of already-sorted runs; the exchange
    * elimination is the win that matters).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      nBuckets: Int,
      key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.format("parquet").mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }
}
