package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Mergeable-sketch operators ([[graft.operators.Sketches]]): register
  * content vs a hand-rolled reference, the merge laws that make each
  * sketch a one-pass corpus statistic, and the estimator guarantees
  * (HLL tolerance, CMS never-underestimates).
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** JVM reference of the pinned FNV-1a-64 over code points. */
  private def fnv(s: String): Long = {
    var h = -3750763034362895579L // 14695981039346656037 as signed
    s.codePoints().toArray.foreach { cp => h = (h ^ cp) * 1099511628211L }
    h
  }

  /** JVM reference of the murmur3 fmix64 finisher ([[Sketches.mix64]]). */
  private def H(s: String): Long = {
    var h = fnv(s)
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private val words =
    ('a' to 'z').map(_.toString) ++ (0 until 600).map(i => s"w$i")
  private val df = words.zipWithIndex
    .map { case (w, i) => (if (i % 2 == 0) "g1" else "g2", w) }
    .toDF("grp", "k")

  test("hllRegisters matches a hand-rolled HLL (p=9) register table") {
    val got = Sketches.hllRegisters(df, $"k", Seq("grp"), p = 9)
      .as[(String, Int, Int)].collect()
      .map { case (g, r, mr) => ((g, r), mr) }.toMap
    val want = words.zipWithIndex
      .map { case (w, i) => (if (i % 2 == 0) "g1" else "g2", H(w)) }
      .groupMapReduce { case (g, h) => (g, (h >>> 55).toInt) } { case (_, h) =>
        val suffix = h & ((1L << 55) - 1)
        if (suffix == 0L) 56 else 56 - java.lang.Long.toBinaryString(suffix).length
      }(math.max)
    assert(got == want)
  }

  test("hllMerge of shard sketches equals the sketch of the union") {
    val shard1 = Sketches.hllRegisters(df.where($"k" < lit("m")), $"k", Seq("grp"))
    val shard2 = Sketches.hllRegisters(df.where($"k" >= lit("m")), $"k", Seq("grp"))
    val merged = Sketches.hllMerge(shard1.unionAll(shard2), Seq("grp"))
      .as[(String, Int, Int)].collect().toSet
    val whole = Sketches.hllRegisters(df, $"k", Seq("grp"))
      .as[(String, Int, Int)].collect().toSet
    assert(merged == whole)
  }

  test("hllEstimate is within HLL tolerance of the exact distinct count") {
    val regs = Sketches.hllRegisters(df, $"k", Seq("grp"))
    val est = Sketches.hllEstimate(regs, Seq("grp"))
      .as[(String, Double)].collect().toMap
    val exact = df.distinct().groupBy($"grp").count()
      .as[(String, Long)].collect().toMap
    // standard error 1.04/sqrt(512) ≈ 4.6%; allow 4σ
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n) / n < 0.19,
        s"group $g: estimate ${est(g)} vs exact $n")
    }
  }

  test("cmsSketchFromCounts over a (key, count) aggregate equals cmsSketch over the raw stream") {
    // the sx01 contract (advisor r12): identical cells when the input is
    // well-formed — one row per key, non-null count (exactly what a
    // groupBy(key).count() feeds it)
    val rows = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i % 5 + 1)(w) }
    val occ = rows.toDF("k")
    val counts = occ.groupBy($"k").agg(count(lit(1)).as("cnt"))
    val d = 4; val w = 64
    val fromRaw = Sketches.cmsSketch(occ, $"k", d, w)
      .as[(Int, Int, Long)].collect().toSet
    val fromCounts = Sketches.cmsSketchFromCounts(counts, $"k", $"cnt", d, w)
      .as[(Int, Int, Long)].collect().toSet
    assert(fromCounts == fromRaw)
  }

  test("cmsSketch merge law and cmsLookup never underestimates") {
    // multiset: word i appears (i % 7) + 1 times
    val rows = words.zipWithIndex.flatMap { case (w, i) => Seq.fill(i % 7 + 1)(w) }
    val occ = rows.toDF("k")
    val d = 4; val w = 64 // narrow sketch → real collisions
    val whole = Sketches.cmsSketch(occ, $"k", d, w)
      .as[(Int, Int, Long)].collect().toSet
    // merge = cell-wise sum of shard sketches
    val (h1, h2s) = rows.splitAt(rows.length / 2)
    val merged = Sketches.cmsSketch(h1.toDF("k"), $"k", d, w)
      .unionAll(Sketches.cmsSketch(h2s.toDF("k"), $"k", d, w))
      .groupBy($"s", $"idx").agg(sum($"cnt").as("cnt"))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == whole)

    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = truth.keys.toSeq.toDF("k")
    val est = Sketches.cmsLookup(Sketches.cmsSketch(occ, $"k", d, w), probes, $"k", d, w)
      .as[(String, Long)].collect().toMap
    truth.foreach { case (key, n) =>
      assert(est(key) >= n, s"CMS underestimated $key: ${est(key)} < $n")
    }
    // with 626 keys in 64 buckets, at least one probe must collide
    assert(truth.exists { case (key, n) => est(key) > n },
      "no collisions in a deliberately narrow sketch — indices degenerate?")

    // never-inserted probe against a SPARSE sketch: some of its cells are
    // empty (absent rows = 0), so the correct CMS estimate is 0 — an
    // inner join would drop the probe or report only its non-empty cells
    val tiny = Sketches.cmsSketch(Seq("only-key").toDF("k"), $"k", d = 4, w = 4096)
    val unseen = Sketches.cmsLookup(tiny,
        Seq("never-inserted-key").toDF("k"), $"k", d = 4, w = 4096)
      .as[(String, Long)].collect().toMap
    assert(unseen("never-inserted-key") == 0L)
  }

  test("streaming Bloom word table equals the batch build (st28 parity)") {
    import graft.streaming.StreamOps
    val key = coalesce(col("user_id").cast("string"), lit(""))
    val src = StreamOps.parquetStream(spark, sf0001, "events.parquet")
      .select(key.as("k"))
    val streamed = StreamOps.runToMemory(spark,
        Sketches.bloomBits(src, $"k", mBits = 4096, d = 5),
        s"graft_spec_stream_bloom_${System.nanoTime()}")
      .as[(Int, Long)].collect().toSet
    val batch = Sketches.bloomBits(
        spark.read.parquet(s"$sf0001/events.parquet").select(key.as("k")),
        $"k", mBits = 4096, d = 5)
      .as[(Int, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("bloomBits matches a hand-rolled reference; merge law; probe guarantees") {
    val m = 4096; val d = 5 // narrow filter → real false positives
    def positions(k: String): Seq[Long] = {
      val h1 = H(k) & (m - 1)
      val h2 = H(k + "\u0001") & (m - 1)
      (0 until d).map(s => (h1 + s * h2) & (m - 1))
    }
    val got = Sketches.bloomBits(df, $"k", m, d)
      .as[(Int, Long)].collect().toMap
    val want = words.flatMap(positions)
      .groupMapReduce(p => (p >> 6).toInt)(p => 1L << (p & 63))(_ | _)
    assert(got == want)

    // merge = word-wise OR of shard filters
    val shard1 = Sketches.bloomBits(df.where($"k" < lit("m")), $"k", m, d)
    val shard2 = Sketches.bloomBits(df.where($"k" >= lit("m")), $"k", m, d)
    val merged = Sketches.bloomMerge(shard1.unionAll(shard2))
      .as[(Int, Long)].collect().toMap
    assert(merged == got)

    // no false negatives: every inserted key probes true
    val filter = Sketches.bloomBits(df, $"k", m, d)
    val hits = Sketches.bloomProbe(filter, words.toDF("k"), $"k", m, d)
      .as[(String, Boolean)].collect().toMap
    assert(words.forall(hits(_)), "a Bloom filter must never miss an inserted key")

    // 626 keys × 5 bits in 4096 cells → ~53% fill; absent keys must show
    // SOME false positives (the narrow filter is chosen to force them)
    // but far from all — and a sparse-table miss (absent word row) is
    // false, not an error.
    val absent = words.map(_ + "!absent")
    val fp = Sketches.bloomProbe(filter, absent.toDF("k"), $"k", m, d)
      .as[(String, Boolean)].collect().count(_._2)
    assert(fp > 0, "no false positives in a deliberately narrow filter — bits degenerate?")
    assert(fp < absent.size / 2, s"false-positive rate implausibly high: $fp/${absent.size}")

    // null keys don't count (SQL convention shared by the whole family)
    val withNull = df.unionAll(Seq(("g1", null: String)).toDF("grp", "k"))
    val fNull = Sketches.bloomBits(withNull, $"k", m, d)
      .as[(Int, Long)].collect().toMap
    assert(fNull == got)

    intercept[IllegalArgumentException] {
      Sketches.bloomBits(df, $"k", mBits = 1000, d = 5) // not a power of two
    }
  }

  test("kmvSketch keeps the k smallest distinct hashes; overlap bounds hold") {
    val sketch = Sketches.kmvSketch(df, $"k", "grp", k = 32)
    val got = sketch.as[(String, Long)].collect().groupBy(_._1)
    val wantAll = words.zipWithIndex
      .map { case (w, i) => (if (i % 2 == 0) "g1" else "g2", H(w)) }
      .distinct.groupBy(_._1)
    got.foreach { case (g, rows) =>
      assert(rows.map(_._2).sorted.toSeq ==
        wantAll(g).map(_._2).distinct.sorted.take(32).toSeq)
    }
    val ov = Sketches.kmvOverlap(sketch, "grp", k = 32)
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(ov.length == 1)
    val (a, b, nUnionK, _, nCommon, jbp) = ov.head
    assert((a, b) == ("g1", "g2"))
    assert(nUnionK == 32 && nCommon == 0 && jbp == 0) // disjoint key sets
  }

  test("streaming HLL registers equal the batch build (st26 parity)") {
    import graft.streaming.StreamOps
    val key = coalesce(col("user_id").cast("string"), lit(""))
    val src = StreamOps.parquetStream(spark, sf0001, "events.parquet")
      .select(col("event_type"), key.as("k"))
    val streamed = StreamOps.runToMemory(spark,
        Sketches.hllRegisters(src, $"k", Seq("event_type")),
        s"graft_spec_stream_hll_${System.nanoTime()}")
      .as[(String, Int, Int)].collect().toSet
    val batch = Sketches.hllRegisters(
        spark.read.parquet(s"$sf0001/events.parquet")
          .select(col("event_type"), key.as("k")),
        $"k", Seq("event_type"))
      .as[(String, Int, Int)].collect().toSet
    assert(streamed == batch)
  }

  test("streaming CMS counters equal the batch build (st27 parity)") {
    import graft.streaming.StreamOps
    val key = coalesce(col("user_id").cast("string"), lit(""))
    val src = StreamOps.parquetStream(spark, sf0001, "events.parquet")
      .select(key.as("k"))
    val streamed = StreamOps.runToMemory(spark,
        Sketches.cmsSketch(src, $"k", d = 4, w = 256),
        s"graft_spec_stream_cms_${System.nanoTime()}")
      .as[(Int, Int, Long)].collect().toSet
    val batch = Sketches.cmsSketch(
        spark.read.parquet(s"$sf0001/events.parquet").select(key.as("k")),
        $"k", d = 4, w = 256)
      .as[(Int, Int, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("kmvOverlap estimates a known Jaccard within sketch tolerance") {
    // two groups sharing half their keys: J = 1/3
    val shared  = (0 until 400).map(i => s"s$i")
    val only    = (0 until 400).map(i => s"o$i")
    val d2 = (shared.map(("a", _)) ++ only.map(("a", _)) ++
      shared.map(("b", _)) ++ only.map(w => ("b", w + "x"))).toDF("grp", "k")
    val ov = Sketches.kmvOverlap(Sketches.kmvSketch(d2, $"k", "grp", 128), "grp", 128)
      .select($"est_jacc_bp").as[Long].head()
    assert(math.abs(ov / 10000.0 - 1.0 / 3.0) < 0.15, s"est_jacc_bp $ov vs J=1/3")
  }

  // --- bottom-k sample (sx05/st35) -------------------------------------

  /** 2-group fixture: group = parity, id = "i", value = a deterministic
    * shuffle of i so value order differs from hash order.
    */
  private val sampleRows = (0 until 500).map { i =>
    (if (i % 2 == 0) "g1" else "g2", i.toString, ((i * 7919) % 500).toLong)
  }
  private def sampleDf = sampleRows.toDF("grp", "id", "v")

  test("sampleSketch is the k smallest (H(id), v) rows per group") {
    val k = 32
    val got = Sketches.sampleSketch(sampleDf, $"id", $"v", "grp", k)
      .as[(String, Long, Long)].collect().toSet
    val want = sampleRows
      .map { case (g, id, v) => (g, H(id), v) }
      .groupBy(_._1).values
      .flatMap(_.sortBy(r => (r._2, r._3)).take(k))
      .toSet
    assert(got == want)
  }

  test("sampleMerge of shard sketches equals the sketch of the union") {
    val k = 32
    val shard1 = Sketches.sampleSketch(sampleDf.where($"v" < 250), $"id", $"v", "grp", k)
    val shard2 = Sketches.sampleSketch(sampleDf.where($"v" >= 250), $"id", $"v", "grp", k)
    val merged = Sketches.sampleMerge(shard1.unionAll(shard2), "grp", k)
      .as[(String, Long, Long)].collect().toSet
    val whole = Sketches.sampleSketch(sampleDf, $"id", $"v", "grp", k)
      .as[(String, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sampleQuantiles reads the ceil-rank order statistics") {
    // a full sample (k >= n) makes the estimator exact and hand-checkable
    val sk = Sketches.sampleSketch(sampleDf, $"id", $"v", "grp", 500)
    val got = Sketches.sampleQuantiles(sk, "grp", Seq(5000, 9900))
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, q50, q99) => g -> ((n, q50, q99)) }.toMap
    val want = sampleRows.groupBy(_._1).map { case (g, rs) =>
      val vs = rs.map(_._3).sorted
      def at(bp: Long) = vs(((vs.size * bp + 9999) / 10000 - 1).toInt)
      g -> ((vs.size.toLong, at(5000), at(9900)))
    }
    assert(got == want)
  }

  test("streaming bottom-k sample equals the batch build (st35 parity)") {
    import graft.streaming.StreamOps
    import graft.functions.{BottomKSample, HashExprs}
    val k = 64
    val prep = (df: org.apache.spark.sql.DataFrame) => df
      .where(col("value").isNotNull)
      .select(col("event_type"),
        HashExprs.fnvMix64(col("event_id").cast("string")).as("h"),
        round(col("value") * 100).cast("long").as("v"))
    val bk = udaf(new BottomKSample(k))
    val streamed = StreamOps.runToMemory(spark,
        prep(StreamOps.parquetStream(spark, sf0001, "events.parquet"))
          .groupBy($"event_type").agg(bk($"h", $"v").as("s")),
        s"graft_spec_stream_bk_${System.nanoTime()}")
      .select($"event_type", explode($"s.rows").as("r"))
      .select($"event_type", $"r.h", $"r.v")
      .as[(String, Long, Long)].collect().toSet
    // the batch build over the same rows (sampleSketch itself, fed the
    // raw id so it applies the identical hash)
    val batch = Sketches.sampleSketch(
        graft.core.Tables(spark, sf0001).events
          .where(col("value").isNotNull)
          .select(col("event_type"), col("event_id"),
            round(col("value") * 100).cast("long").as("v")),
        col("event_id").cast("string"), $"v", "event_type", k)
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
  }

  test("BottomKSample reduce skips rows past a saturated boundary") {
    import graft.functions.{BottomKSample, SampleBuf, SamplePair}
    val agg = new BottomKSample(2)
    val full = agg.merge(
      agg.reduce(agg.reduce(agg.zero, SamplePair(1, 1)), SamplePair(2, 2)),
      agg.zero)
    assert(agg.reduce(full, SamplePair(5, 0)) eq full) // saturated: no-op
    val bumped = agg.reduce(full, SamplePair(0, 9))
    assert(bumped.rows == Seq(SamplePair(0, 9), SamplePair(1, 1)))
    // merge is symmetric
    val a = SampleBuf(Vector(SamplePair(1, 1), SamplePair(3, 3)))
    val b = SampleBuf(Vector(SamplePair(2, 2)))
    assert(agg.merge(a, b) == agg.merge(b, a))
  }
}
