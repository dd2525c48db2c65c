package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation

/** `Dataset.observe` — single-pass pipeline metrics. At 100 TB a data-
  * quality audit run as a SECOND query costs a full extra scan; observe
  * attaches accumulator-backed aggregates to the existing plan, so the
  * metrics ride along with the job that was running anyway (the streaming
  * path gets the same via each microbatch's observed metrics). The judged
  * q34 quality audit is the standalone form; this pins the zero-extra-scan
  * form against an exact recompute.
  */
class ObservabilitySpec extends SparkSpec {

  test("observed metrics match an exact recompute without a second scan") {
    val li = graft.core.Tables(spark, sf0001).lineitem
    val obs = Observation("audit")
    val pipeline = li
      .observe(obs,
        count(lit(1)).as("rows_in"),
        sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("big_qty_rows"),
        min(col("l_shipdate")).as("min_ship"))
      .where(col("l_quantity") > 45) // the "real" job continues past the audit
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val kept = pipeline.collect().map(r => r.getLong(1)).sum
    val m = obs.get
    // exact recompute (what the second-scan audit would have produced)
    val expectRows = li.count()
    val expectBig  = li.where(col("l_quantity") > 45).count()
    assert(m("rows_in") == expectRows)
    assert(m("big_qty_rows") == expectBig)
    assert(kept == expectBig) // observed pre-filter metric ≡ post-filter total
    assert(m("min_ship") != null)
  }

  test("ev36: observed admission counters partition the input exactly") {
    val out = SparkEntry.allDefs("ev36_observed_metrics").fn(spark, sf0001)
      .collect().head
    val nIn = out.getLong(0)
    assert(nIn > 0)
    assert(nIn == out.getLong(1) + out.getLong(2) + out.getLong(3),
      "every input row is exactly one of {error-type, out-of-range, kept}")
    assert(out.getLong(4) > 0, "kept rows carry value mass")
  }

  test("ev37: CUPED removes the covariate component it can explain") {
    import spark.implicits._
    // y = 2x exactly for every user: theta = 2, and the adjusted means of
    // both arms collapse to the same value (all between-arm y-difference
    // was pre-period covariate imbalance) — hand-checked:
    //   x = (100, 200, 300, 400) cents, y = 2x, arms by uid % 2
    //   arm0: mean_y = 400c, adj = 400 - 2*(200-250) = 500c; arm1: same 500c
    val day = 86400L * 1000000L // micros
    val rows = (0L to 3L).flatMap { u =>
      Seq((u * 2, 0L * day, u, "view", (u + 1).toDouble, "{}"),
          (u * 2 + 1, 20L * day, u, "view", 2.0 * (u + 1), "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_cuped").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fp = 1L << 20
    val out = SparkEntry.allDefs("ev37_cuped").fn(spark, dir)
      .select($"arm", $"n_users", $"mean_y_ticks", $"mean_adj_ticks", $"theta_ticks")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L))
    assert(out.forall(_._2 == 2L))
    assert(out.forall(_._5 == 2 * fp), s"theta should be exactly 2: ${out.toSeq}")
    assert(out(0)._3 == 400 * fp && out(1)._3 == 600 * fp)
    assert(out(0)._4 == 500 * fp && out(1)._4 == 500 * fp,
      s"adjusted means must coincide: ${out.toSeq}")
  }
}
