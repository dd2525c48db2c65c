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
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      nBuckets: Int,
      key: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.format("parquet").mode("overwrite")
      .bucketBy(nBuckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)
  }
}
