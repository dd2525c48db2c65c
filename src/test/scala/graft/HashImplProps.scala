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

  /** Brute-force winnowing reference: gram hashes via the joined-string
    * fold the scaladoc promises, then min of every w-slice (one partial
    * slice when grams < w), distinct preserving first occurrence.
    */
  private def winnowRef(ts: List[String], k: Int, w: Int): List[Long] = {
    if (ts.length < k) return Nil
    val grams = ts.sliding(k).map(g =>
      HashImpl.fnv64(UTF8String.fromString(g.mkString(" ")))).toList
    val mins =
      if (grams.length <= w) List(grams.min)
      else grams.sliding(w).map(_.min).toList
    mins.distinct
  }

  private val nonEmptyTokens: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.oneOf(
      Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty),
      Gen.oneOf("the", "a", "föö", "日本", "x")))

  property("winnowFps == brute-force winnowing (values AND order)") =
    forAll(nonEmptyTokens, Gen.choose(1, 5), Gen.choose(1, 6)) { (ts, k, w) =>
      val got = HashImpl.winnowFps(arr(ts), k, w)
      val ref = winnowRef(ts, k, w)
      got.numElements() == ref.length &&
        ref.indices.forall(i => got.getLong(i) == ref(i))
    }

  property("winnowing guarantee: shared run of k+w-1 tokens ⇒ shared fingerprint") =
    forAll(nonEmptyTokens, nonEmptyTokens, nonEmptyTokens, Gen.choose(1, 4),
        Gen.choose(1, 5)) { (pre, run0, post, k, w) =>
      // plant the same (k+w-1)-token run inside two different contexts
      val run = Iterator.continually(run0).flatten.take(k + w - 1).toList
      val doc1 = pre ++ run ++ post
      val doc2 = post ++ run ++ pre
      def fps(ts: List[String]) = {
        val a = HashImpl.winnowFps(arr(ts), k, w)
        (0 until a.numElements()).map(a.getLong).toSet
      }
      fps(doc1).intersect(fps(doc2)).nonEmpty
    }
}
