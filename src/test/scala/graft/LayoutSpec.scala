package graft

import org.apache.spark.sql.functions._
import graft.functions.{LayoutExprs, LayoutImpl}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave16: known Morton values") {
    assert(LayoutImpl.interleave16(0L, 0L) == 0L)
    // x occupies even bits, y odd bits
    assert(LayoutImpl.interleave16(3L, 0L) == 5L)   // 0b101
    assert(LayoutImpl.interleave16(0L, 3L) == 10L)  // 0b1010
    assert(LayoutImpl.interleave16(3L, 1L) == 7L)   // 0b111
    assert(LayoutImpl.interleave16(65535L, 0L) == 0x55555555L)
    assert(LayoutImpl.interleave16(0L, 65535L) == 0xAAAAAAAAL)
    // only the low 16 bits participate
    assert(LayoutImpl.interleave16(65536L + 3L, 0L) == 5L)
  }

  test("zorder16 expression matches the JVM impl and stays codegen'd") {
    val df = spark.range(1000).select(
      (col("id") % 97).as("x"), (col("id") % 53).as("y"))
    val rows = df.select(col("x"), col("y"),
        LayoutExprs.zorder16(col("x"), col("y")).as("z"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, z) =>
      assert(z == LayoutImpl.interleave16(x, y))
    }
  }

  test("range partitioning by zorder bounds BOTH dimensions per partition") {
    // 128×128 grid → 16384 cells; 8 contiguous Morton ranges must have
    // bounding boxes totalling ~the grid area (each range is spatially
    // local), where hash/random partitioning would total ~8× the area.
    val n = 128L
    val grid = spark.range(n * n).select(
      (col("id") % n).as("x"), expr(s"id div $n").as("y"))
    val parts = grid
      .withColumn("z", LayoutExprs.zorder16(col("x"), col("y")))
      .repartitionByRange(8, col("z"))
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy(col("p"))
      .agg(min(col("x")).as("x0"), max(col("x")).as("x1"),
        min(col("y")).as("y0"), max(col("y")).as("y1"))
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(parts.length == 8)
    val totalBox = parts.map { case (_, x0, x1, y0, y1) =>
      (x1 - x0 + 1) * (y1 - y0 + 1)
    }.sum
    // exact octants total exactly n*n; allow 2× slack for the range
    // partitioner's sampled split points landing off block boundaries
    assert(totalBox <= 2 * n * n,
      s"z-range bounding boxes too large: $totalBox vs area ${n * n}")
  }
}
