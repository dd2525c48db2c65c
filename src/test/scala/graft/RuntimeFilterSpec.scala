package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning — the engine-side DPP analogue for
  * non-partition keys: a selective dimension filter materializes a bloom
  * filter of surviving join keys, which is pushed into the FACT-side scan
  * (`might_contain(xxhash64(key))`), so fact rows that cannot join are
  * dropped before the shuffle. At 100 TB this converts a full fact
  * shuffle into a filtered one whenever the dimension predicate is
  * selective. The thresholds are production defaults scaled to fixture
  * size (application side ≥ 10 GB in production; 0 here to trigger).
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom might_contain on the fact scan") {
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: a broadcast join already prunes via its
      // build side, so runtime filters only target non-broadcast plans
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = graft.core.Tables(spark, sf0001)
      val dim = t.orders.where(col("o_totalprice") > 400000)
      val j = t.lineitem.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      val optimized = j.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "expected a runtime bloom filter on the fact side\n" + optimized)
      assert(j.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
