package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session factory + fixture-table catalog.
  *
  * Replaces the reference's hand-rolled cluster bootstrap
  * (`MasterNode.java:20-30`, `Config.java:20-34`, static TCP topology) with a
  * `SparkSession`: topology, transport, scheduling and fault tolerance are
  * Spark's problem, not the engine's.
  *
  * Scale posture (100 TB): AQE on (runtime partition coalescing, skew-join
  * splitting), shuffle partitions sized for the local harness via
  * `SPARK_GRAFT_CPUS` (a real cluster deployment overrides
  * `spark.sql.shuffle.partitions` at submit time).
  */
object GraftSession {
  def builder(master: String): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.ansi.enabled", "false") // hash folds use 64-bit wraparound
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
  }

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(s"local[$cpus]").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** Typed access to the driver-generated parquet tables (`TESTDATA.md`).
  *
  * One parquet file per table under `dir`; schemas in `FIXTURES.md §B`.
  * Reads go through the vectorized parquet reader; predicate pushdown and
  * column pruning apply (verify with `.explain("formatted")` →
  * `PushedFilters` / `ReadSchema`).
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects outright; read nanos as long and truncate to micros —
    * the same coercion DuckDB applies (verified: both floor-divide by 1000).
    * Integer `div`, not `/`: epoch-nanos exceed double's 53-bit mantissa.
    */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t("events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
