package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregation surface (`Aggregator[IN, BUF, OUT]`,
  * registered via `functions.udaf`) — the UDAF extension point SURVEY
  * §2.1-2.9 reserves for aggregations the built-ins can't express.
  *
  * The buffer is exact decimal so the result is independent of row order
  * and partitioning (float summation would differ run-to-run under AQE);
  * the single IEEE division happens once in `finish`, mirroring the
  * oracle's CAST(... AS DOUBLE)/CAST(... AS DOUBLE).
  */
object WeightedMean
    extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
  override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
  override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1 + BigDecimal(a._1) * BigDecimal(a._2), b._2 + BigDecimal(a._2))
  override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum == 0) Double.NaN else r._1.toDouble / r._2.toDouble
  override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
    Encoders.product[(BigDecimal, BigDecimal)]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Typed-Dataset aggregator for the q30 typed-API path: row count + exact
  * integer quantity-cents per group, over [[graft.core.Schemas.LineitemQty]]
  * rows. A mergeable `Aggregator` keeps map-side partial aggregation on the
  * typed path (a `mapGroups` would not); integer cents keep the sum exact
  * and engine-portable (2-decimal doubles × 100 round to exact integers).
  */
/** One sampled row of a bottom-k sketch: the pinned hash and the carried
  * value ([[graft.operators.Sketches.sampleSketch]]'s row type).
  */
final case class SamplePair(h: Long, v: Long)

/** Aggregation buffer/result for [[BottomKSample]]: the k smallest
  * (h, v) pairs seen so far, kept sorted ascending.
  */
final case class SampleBuf(rows: Seq[SamplePair])

/** Bottom-k (h, v) sample as a typed aggregator — the STREAMING face of
  * [[graft.operators.Sketches.sampleSketch]] (the batch form plans the
  * native TopKPerKey operator, which has no streaming variant; an
  * Aggregator's buffer IS state-store state, so the sample accretes
  * across micro-batches with state bounded at k rows per group).
  *
  * merge (sorted-merge + truncate-at-k) is associative and commutative,
  * and the result is a pure function of the input row SET — batching-
  * and order-insensitive, so the run-to-completion sample is
  * bit-identical to the batch build and st35's batch DuckDB oracle
  * hash-gates the true streaming path (the st26/st27/st28 convention,
  * now for an ORDERED-TRUNCATION merge where those gate MAX/SUM/OR).
  *
  * reduce is O(1) for rows past the current kth boundary (the saturated
  * steady state) and O(k log k) for accepted rows.
  */
final class BottomKSample(k: Int)
    extends Aggregator[SamplePair, SampleBuf, SampleBuf] {
  require(k > 0, "k must be positive")
  private val ord: Ordering[SamplePair] =
    Ordering.by[SamplePair, (Long, Long)](p => (p.h, p.v))
  override def zero: SampleBuf = SampleBuf(Vector.empty)
  override def reduce(b: SampleBuf, a: SamplePair): SampleBuf =
    if (b.rows.size >= k && ord.gteq(a, b.rows.last)) b
    else SampleBuf((b.rows :+ a).sorted(ord).take(k))
  override def merge(x: SampleBuf, y: SampleBuf): SampleBuf =
    SampleBuf((x.rows ++ y.rows).sorted(ord).take(k))
  override def finish(r: SampleBuf): SampleBuf = r
  override def bufferEncoder: Encoder[SampleBuf] = Encoders.product[SampleBuf]
  override def outputEncoder: Encoder[SampleBuf] = Encoders.product[SampleBuf]
}

object CountAndQtyCents
    extends Aggregator[graft.core.Schemas.LineitemQty, (Long, Long), (Long, Long)] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: graft.core.Schemas.LineitemQty): (Long, Long) =
    (b._1 + 1L, b._2 + math.round(a.l_quantity * 100.0))
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Long)): (Long, Long) = r
  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
  override def outputEncoder: Encoder[(Long, Long)] = Encoders.product[(Long, Long)]
}
