package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.HashImpl

/** Property-based checks (SURVEY §5.2(2)) for the native sketch kernels —
  * pure JVM, no SparkSession, so shrinkage and high case counts are cheap.
  */
object HashImplProps extends Properties("HashImpl") {

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("the", "a", "föö", "日本", "", "x"))
  private val tokens: Gen[List[String]] = Gen.listOf(token)

  private def arr(ts: List[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  property("minhash: deterministic, length k, order-invariant on same set") =
    forAll(tokens, Gen.choose(1, 64)) { (ts, k) =>
      val a = HashImpl.minhash(arr(ts), k)
      val b = HashImpl.minhash(arr(scala.util.Random.shuffle(ts)), k)
      a.numElements() == k &&
        (0 until k).forall(i => a.getLong(i) == b.getLong(i))
    }

  property("minhash: signature entries only decrease as tokens are added") =
    forAll(tokens, token, Gen.choose(1, 32)) { (ts, extra, k) =>
      val base = HashImpl.minhash(arr(ts), k)
      val more = HashImpl.minhash(arr(extra :: ts), k)
      (0 until k).forall(i => more.getLong(i) <= base.getLong(i))
    }

  property("simhash: order-invariant; equal sets hash equal") =
    forAll(tokens) { ts =>
      HashImpl.simhash(arr(ts)) ==
        HashImpl.simhash(arr(scala.util.Random.shuffle(ts)))
    }

  property("sortedIntersectCount == set-intersection size") =
    forAll(Gen.listOf(Gen.choose(-50L, 50L)), Gen.listOf(Gen.choose(-50L, 50L))) {
      (xs, ys) =>
        val a = xs.distinct.sorted
        val b = ys.distinct.sorted
        val got = HashImpl.sortedIntersectCount(
          new GenericArrayData(a.toArray),
          new GenericArrayData(b.toArray))
        got == (a.toSet & b.toSet).size
    }

  property("firstEqIndex == naive first matching position") =
    forAll(Gen.listOf(Gen.choose(0L, 3L)), Gen.listOf(Gen.choose(0L, 3L))) {
      (xs, ys) =>
        val want = xs.zip(ys).indexWhere { case (x, y) => x == y }
        HashImpl.firstEqIndex(
          new GenericArrayData(xs.toArray),
          new GenericArrayData(ys.toArray)) == want
    }

  property("fnv64 == reference code-point fold (incl. non-BMP)") =
    forAll(Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf(Gen.asciiPrintableStr.map(_.take(3)),
        Gen.oneOf("é", "日本", "😀", ""))).map(_.mkString))) { s =>
      val ref = s.codePoints().toArray.foldLeft(-3750763034362895579L)(
        (h, cp) => (h ^ cp.toLong) * 1099511628211L)
      HashImpl.fnv64(UTF8String.fromString(s)) == ref
    }

  property("minhashBuckets: bands entries; equal token sets collide in all bands") =
    forAll(tokens, Gen.choose(1, 8), Gen.choose(1, 8)) { (ts, bands, rows) =>
      val a = HashImpl.minhashBuckets(arr(ts), bands, rows)
      val b = HashImpl.minhashBuckets(arr(scala.util.Random.shuffle(ts)), bands, rows)
      a.numElements() == bands &&
        (0 until bands).forall(i => a.getLong(i) == b.getLong(i))
    }
}
