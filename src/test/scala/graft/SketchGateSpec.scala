package graft

import org.apache.spark.sql.functions._

/** The approx-sketch bounds-gates (q31/q32) pass trivially when the sketch
  * is accurate — these cases prove the gate BITES: a sketch coarse enough
  * to drift past the tolerance drops its group, which the driver's
  * row/hash compare then fails loudly.
  */
class SketchGateSpec extends SparkSpec {
  import spark.implicits._

  test("q32's bounds-gate bites: a coarse percentile sketch fails the query") {
    // quadratic values put the median in a steep region; at accuracy 2 the
    // GK sketch's rank guarantee (ε = 1/2) is satisfied by ANY element and
    // the implementation degenerates to an extreme retained point — ~100%
    // value error, far past the 1% gate. (Moderate accuracies like 10 can
    // drift 5% or stay under 1% depending on partition merge structure —
    // not a stable spec point.)
    val df = (1 to 10000).map(i => ("A", i.toDouble * i)).toDF("g", "v")
    def gated(accuracy: Int) = df.groupBy($"g")
      .agg(
        expr(s"percentile_approx(v, 0.5, $accuracy)").as("approx_p50"),
        expr("percentile(v, 0.5)").as("exact_p50"))
      .where(abs($"approx_p50" - $"exact_p50") / $"exact_p50" <= 0.01)
    // the judged accuracy (50k ≥ n ⇒ near-exact) keeps the group…
    assert(gated(50000).count() == 1)
    // …and a degraded sketch is dropped instead of passing silently
    assert(gated(2).count() == 0,
      "coarse sketch stayed within the gate — the gate is not binding")
  }
}
