package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{HashImpl, TextFunctions}

/** Semantic pins for the round-8 training-pipeline additions: the BPE
  * training loop (tx31) is recomputed by an independent, deliberately-naive
  * in-test reference (code-point vectors + an explicit greedy left-to-right
  * array walk — NOT the engine's double-space string-replace trick, so the
  * representation trick itself is what gets proven), and the priority
  * sample (tx30) against a driver-side recompute of every document's
  * priority. The oracle gate separately proves cross-engine bit-parity.
  */
class BpeSampleSpec extends SparkSpec {
  import spark.implicits._

  private val wsFrom = " \t\n\u000B\u000C\r"
  private val wsTo = "ĠĉĊċČč"

  /** UTF-8 binary string order — what both engines' ORDER BY uses; Java's
    * natural String order is UTF-16 and diverges above the BMP.
    */
  private val u8: Ordering[String] = (a: String, b: String) =>
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** (cnt DESC, pair ASC) — the engine's merge-selection total order. */
  private val pairOrd: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long](_._2).reverse.orElseBy(_._1)(u8)

  /** Naive reference vocabulary: pretokenization itself is spec'd
    * elsewhere (tx25) — reuse it, then hand everything downstream to
    * plain Scala. Symbols = code points (what substring(p, i, 1) yields
    * engine-side).
    */
  private def naiveVocab: Map[Vector[String], Long] = spark.read
    .parquet(s"$sf0001/documents.parquet")
    .select(explode(TextFunctions.pretokenize(col("text"))).as("p"))
    .as[String].collect()
    .map(p => p.map(c => wsFrom.indexOf(c) match {
      case -1 => c
      case i  => wsTo.charAt(i)
    }))
    .filter(p => p.codePointCount(0, p.length) >= 2)
    .map(p => p.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp))))
    .groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def pairCountsOf(ws: Map[Vector[String], Long]): Map[String, Long] =
    ws.toSeq.flatMap { case (syms, n) =>
      syms.indices.dropRight(1).map(i => s"${syms(i)} ${syms(i + 1)}" -> n)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  /** Explicit greedy left-to-right array-walk merge — deliberately NOT
    * the engine's double-space string-replace trick, so the
    * representation trick itself is what the tests prove.
    */
  private def mergeGreedyWalk(
      syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  test("tx31: three merges + final pair table match a naive greedy BPE recompute") {
    var ws = naiveVocab
    val expected = (1 to 3).map { it =>
      val (pair, cnt) = pairCountsOf(ws).toSeq.min(pairOrd)
      val Array(a, b) = pair.split(" ", 2)
      ws = ws.toSeq.map { case (s, n) => mergeGreedyWalk(s, a, b) -> n }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (s"merge$it", pair, cnt)
    }
    val expectedFinal = pairCountsOf(ws).toSeq.sorted(pairOrd).take(20)
      .map { case (p, c) => ("zfinal", p, c) }

    val got = SparkEntry.allDefs("tx31_bpe_train").fn(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.filter(_._1.startsWith("merge")).sortBy(_._1) === expected)
    assert(got.filter(_._1 == "zfinal")
      .sortBy(t => (t._2, t._3))(Ordering.Tuple2(u8, Ordering.Long))
      === expectedFinal.sortBy(t => (t._2, t._3))(Ordering.Tuple2(u8, Ordering.Long)))
  }

  test("tx32: the compression curve equals the naive recompute, strictly decreasing") {
    // independent per-round symbol totals from the same naive chain
    val vocab0 = naiveVocab
    def symTotal(ws: Map[Vector[String], Long]): Long =
      ws.map { case (s, n) => s.length * n }.sum
    var ws = vocab0
    val expected = Seq.newBuilder[(Int, String, Long)]
    expected += ((0, "", symTotal(ws)))
    (1 to 3).foreach { i =>
      val (pair, _) = pairCountsOf(ws).toSeq.min(pairOrd)
      val Array(a, b) = pair.split(" ", 2)
      ws = ws.toSeq.map { case (s, n) => mergeGreedyWalk(s, a, b) -> n }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      expected += ((i, pair, symTotal(ws)))
    }
    val got = SparkEntry.allDefs("tx32_bpe_encode").fn(spark, sf0001)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got === expected.result())
    // each merge must strictly shrink the corpus
    got.sliding(2).foreach { case Seq(p, n) =>
      assert(n._3 < p._3, s"round ${n._1} did not shrink: ${p._3} -> ${n._3}")
    }
  }

  test("tx30: the sample is exactly the 200 smallest u/w priorities") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.map { case (id, text) =>
      val u = java.lang.Math.floorMod(
        HashImpl.fnv64(UTF8String.fromString("ps#" + id)), 1L << 62)
      val w = math.max(text.codePointCount(0, text.length).toLong, 1L)
      (u.toDouble / w.toDouble, id)
    }.sorted.take(200).map(_._2).toSeq

    val got = SparkEntry.allDefs("tx30_priority_sample").fn(spark, sf0001)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === expected)
  }

  test("tx34: no near-dup pair straddles train/val") {
    // the property the operator exists for, pinned on the PAIR GRAPH
    // directly (not via the cluster labels it is built from)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val clusters = graft.operators.Dedup.dupClusters(
      graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8, maxDf = 400L),
      docs, pairsDistinct = true)
    val split = clusters.select(col("doc_id"),
      when(pmod(graft.functions.HashExprs.fnv64(
          concat(lit("split#"), col("cluster_id").cast("string"))),
        lit(10L)) < 9, "train").otherwise("val").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.operators.Dedup.jaccardPairs(docs, threshold = 0.8, maxDf = 400L)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a, $b) straddles: ${split(a)} vs ${split(b)}")
    }
    // and both splits are actually populated
    assert(split.values.toSet == Set("train", "val"))
  }

  test("tx30: heavier documents are sampled preferentially") {
    // inclusion probability must rise with weight: the sampled docs'
    // mean length should exceed the corpus mean by a wide margin
    val corpusMean = spark.read.parquet(s"$sf0001/documents.parquet")
      .agg(avg(length(col("text")))).as[Double].head()
    val sampleMean = SparkEntry.allDefs("tx30_priority_sample").fn(spark, sf0001)
      .agg(avg(col("n_chars"))).as[Double].head()
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }
}
