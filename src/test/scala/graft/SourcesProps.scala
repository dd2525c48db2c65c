package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.SyntheticDocs

/** Property-based checks for the DSv2 connector's pushdown/partition
  * arithmetic — pure JVM (the partition planner and runtime-filter
  * narrowing are driver-side logic), so high case counts are cheap.
  * These pin the boundary algebra the example-based SourcesSpec can't
  * sweep: arbitrary bound combinations, empty ranges, partition counts
  * exceeding the span, IN-sets fully outside the id space.
  */
object SourcesProps extends Properties("SyntheticDocs") {

  private val rows = Gen.choose(1L, 100000L)
  private val parts = Gen.choose(1, 64)

  property("runtime IN narrowing: partitions exactly cover [min, max+1) ∩ [0, rows)") =
    forAll(rows, parts, Gen.nonEmptyListOf(Gen.choose(-100L, 110000L))) { (n, p, ids) =>
      val plan = SyntheticDocs.planAfterRuntimeIn(n, p, ids.toArray).sortBy(_._1)
      val lo = math.max(0L, ids.min)
      val hi = math.min(n, ids.max + 1)
      if (hi <= lo) plan.isEmpty
      else {
        plan.head._1 == lo && plan.last._2 == hi &&
          plan.forall { case (s, e) => e > s } &&
          plan.sliding(2).forall {
            case Array(a, b) => a._2 == b._1
            case _           => true
          } &&
          plan.length <= p
      }
    }

  property("row arithmetic: token count bounds and domain membership") =
    forAll(Gen.choose(0L, 1000000L)) { id =>
      SyntheticDocs.Langs.contains(SyntheticDocs.lang(id)) &&
        SyntheticDocs.Sources.contains(SyntheticDocs.source(id)) &&
        SyntheticDocs.nTokens(id) >= 3 && SyntheticDocs.nTokens(id) <= 99 &&
        SyntheticDocs.text(id).split(" ").length.toLong == SyntheticDocs.nTokens(id)
    }
}
