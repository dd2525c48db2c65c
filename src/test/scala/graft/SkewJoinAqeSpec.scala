package graft

import org.apache.spark.sql.functions._

/** Proves the judged skew posture's OTHER half: [[graft.operators.Skew]]
  * salting handles skewed AGGREGATIONS; skewed JOINS are AQE's job
  * (OptimizeSkewedJoin splits oversized partitions at runtime). This test
  * manufactures one fat join key, lowers the skew thresholds to fixture
  * scale, executes, and asserts the final adaptive plan actually split it.
  */
class SkewJoinAqeSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val pad = "x" * 200
      // key 0: 50k fat rows (~10 MB post-shuffle); keys 1..199: one row each
      val left = spark.range(0, 50000)
        .select(lit(0L).as("k"), concat(lit(pad), col("id").cast("string")).as("pay"))
        .union(spark.range(1, 200).select(col("id").as("k"), lit("y").as("pay")))
      val right = spark.range(0, 200).select(col("id").as("k2"), lit(1).as("v"))
      // keep the fat payload in the join output: selecting only the key
      // would let column pruning shrink the "skewed" partition below the
      // detection threshold before the shuffle
      val j = left.join(right, col("k") === col("k2"))
        .select(col("k"), length(col("pay")).as("plen"), col("pay"))
      // collect() drives THIS dataset's own QueryExecution (count() would
      // clone a new one, leaving j's adaptive plan unexecuted/non-final)
      assert(j.collect().length == 50000 + 199)
      val finalPlan = j.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"), finalPlan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
