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

  test("hilbert16: pinned values, curve endpoints, only low 16 bits participate") {
    // pins computed from the reference xy2d walk (exhaustively verified
    // bijective + unit-step adjacent at n = 16/64/256/1024 side lengths)
    val pins = Seq(
      (0L, 0L, 0L), (0L, 1L, 3L), (1L, 1L, 2L), (1L, 0L, 1L),
      (65535L, 0L, 4294967295L),          // the curve's LAST point: 2^32 − 1
      (0L, 65535L, 1431655765L),
      (65535L, 65535L, 2863311530L),
      (12345L, 54321L, 1555040834L),
      (54321L, 12345L, 4128246504L),
      (32768L, 32768L, 2147483648L))
    pins.foreach { case (x, y, d) =>
      assert(LayoutImpl.hilbert16(x, y) == d, s"hilbert16($x, $y)")
    }
    assert(LayoutImpl.hilbert16(65536L + 1L, 0L) == LayoutImpl.hilbert16(1L, 0L))
  }

  test("hilbert16: injective on a strided grid, range-bounded, full exhaustive 64x64 walk") {
    // full-grid injectivity sample (stride 257 covers all 16 bit patterns)
    val pts = for (i <- 0 until 255; j <- 0 until 16)
      yield (i.toLong * 257L, j.toLong * 4111L)
    val ds = pts.map { case (x, y) => LayoutImpl.hilbert16(x, y) }
    assert(ds.distinct.length == pts.length)
    assert(ds.forall(d => d >= 0L && d < (1L << 32)))
    // Hilbert adjacency on the 64x64 TOP-LEVEL grid: map each cell to the
    // index of its first curve point (x*1024, y*1024 are the cell corners
    // the top 6 bit-levels see); consecutive CELL visits must be grid
    // neighbors — the no-diagonal-jumps property Morton lacks
    val cell = Array.tabulate(64, 64)((x, y) =>
      LayoutImpl.hilbert16(x.toLong * 1024L, y.toLong * 1024L) >> 20)
    val byD = (for (x <- 0 until 64; y <- 0 until 64)
      yield (cell(x)(y), (x, y))).sortBy(_._1).map(_._2)
    assert(byD.length == 4096)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent cells at ($x1,$y1)->($x2,$y2)")
    }
  }

  test("hilbert16 expression matches the JVM impl") {
    val rows = spark.range(2000).select(
        (col("id") * 131L % 65536L).as("x"), (col("id") * 7901L % 65536L).as("y"))
      .select(col("x"), col("y"),
        LayoutExprs.hilbert16(col("x"), col("y")).as("h"))
      .as[(Long, Long, Long)].collect()
    rows.foreach { case (x, y, h) =>
      assert(h == LayoutImpl.hilbert16(x, y))
    }
  }
}
