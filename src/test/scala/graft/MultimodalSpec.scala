package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "hello", "en", "srcA", 5L),
    (2L, "", "en", "srcB", 0L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("media table schema: binary payload + metadata struct") {
    val m = Multimodal.asMediaTable(docs)
    assert(m.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
    val r = m.where($"media_id" === 1)
      .select($"payload", $"meta.n_bytes").as[(Array[Byte], Long)].head()
    assert(new String(r._1, "UTF-8") == "hello" && r._2 == 5L)
  }

  test("decode stub is deterministic and bounded") {
    val f1 = Multimodal.decodeFeatures(Multimodal.asMediaTable(docs))
      .orderBy($"media_id").collect()
    val f2 = Multimodal.decodeFeatures(Multimodal.asMediaTable(docs))
      .orderBy($"media_id").collect()
    assert(f1.sameElements(f2))
    val r = f1.head
    assert(r.getInt(2) >= 1 && r.getInt(2) <= 640)  // width
    assert(r.getInt(3) >= 1 && r.getInt(3) <= 480)  // height
    assert(r.getInt(4) == 3)                         // channels
    assert(r.getLong(1) == 5L)                       // n_bytes
  }

  test("decode stub folds CODE POINTS, so non-ASCII payloads match the oracle domain") {
    // Independent reimplementation of the stub fold over java.lang.String
    // code points — the production path decodes raw UTF-8 bytes via
    // UTF8String, so agreement here proves byte-decode == codepoint-fold
    // on multi-byte text (the mm01 oracle folds unicode(c) per character).
    def expected(text: String): Long = {
      var h = Multimodal.FakeDecoder.StubBasis
      text.codePoints().forEach(cp => h = (h ^ cp.toLong) * 1099511628211L)
      h
    }
    val texts = Seq("héllo wörld", "日本語テキスト", "emoji 😀 mix", "")
    val d = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "xx", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Multimodal.decodeFeatures(Multimodal.asMediaTable(d))
      .select($"media_id", $"checksum").as[(Long, Long)].collect().toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == expected(t), s"codepoint fold mismatch for '$t'")
    }
  }

  test("codec seam: an injected MediaCodec replaces the stub, plumbing untouched") {
    val r = Multimodal.decodeFeatures(Multimodal.asMediaTable(docs), ConstCodec)
      .where($"media_id" === 1)
      .select($"width", $"height", $"channels", $"checksum")
      .as[(Int, Int, Int, Long)].head()
    assert(r == ((7, 9, 1, 5L))) // checksum = payload length per ConstCodec
  }

  test("ImageIoCodec decodes REAL images through the seam: dims, channels, checksum") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def render(w: Int, h: Int, imgType: Int, fmt: String): Array[Byte] = {
      val img = new BufferedImage(w, h, imgType)
      // deterministic pixels so the bytes are stable per (w, h, fmt)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) & 0xFFFFFF)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK cannot write $fmt")
      bos.toByteArray
    }
    val png = render(17, 11, BufferedImage.TYPE_INT_RGB, "png")
    val bmp = render(8, 23, BufferedImage.TYPE_3BYTE_BGR, "bmp")
    val jpg = render(32, 16, BufferedImage.TYPE_INT_RGB, "jpg")
    val gray = render(5, 6, BufferedImage.TYPE_BYTE_GRAY, "png")
    val junk = Array[Byte](1, 2, 3, 4) // not an image — must tag, not throw
    def crc(b: Array[Byte]) = { val c = new java.util.zip.CRC32; c.update(b); c.getValue }
    val media = Seq(
      (1L, png), (2L, bmp), (3L, jpg), (4L, gray), (5L, junk)
    ).toDF("media_id", "payload")
      .withColumn("meta", struct(lit("image").as("kind"), lit("gen").as("source"),
        octet_length($"payload").cast("long").as("n_bytes")))
    val got = Multimodal.decodeFeatures(media, Multimodal.ImageIoCodec)
      .select($"media_id", $"width", $"height", $"channels", $"checksum")
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 17, 11, 3, crc(png))))
    assert(got(2L) == ((2L, 8, 23, 3, crc(bmp))))
    assert(got(3L) == ((3L, 32, 16, 3, crc(jpg))))
    assert(got(4L) == ((4L, 5, 6, 1, crc(gray)))) // grayscale: 1 band
    assert(got(5L) == ((5L, 0, 0, 0, crc(junk)))) // undecodable: tagged, checksummed
  }

  test("syntheticPngs → ImageIoCodec: decoded raster fold matches the known fill") {
    // the mm07 loop in miniature: encode a real PNG per id, decode it with
    // the real codec, and check the pixel fold equals w*h*(r+g+b) — the
    // exact identity the DuckDB oracle recomputes from id arithmetic
    val idVals = Seq(0L, 1L, 41L, 199L, 255L, 1234L)
    val got = Multimodal.decodeFeatures(
        Multimodal.syntheticPngs(idVals.toDF("media_id")),
        Multimodal.ImageIoCodec)
      .select($"media_id", $"width", $"height", $"channels", $"pixel_sum")
      .as[(Long, Int, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    for (id <- idVals) {
      val w = (id % 37 + 4).toInt
      val h = (id % 23 + 4).toInt
      val fill = (id % 256) + (id * 7 % 256) + (id * 13 % 256)
      assert(got(id) == ((id, w, h, 3, w.toLong * h * fill)), s"id=$id")
    }
  }

  test("aHash64 matches a hand-rolled reference; imageAHash round-trips gradient PNGs") {
    // hand-rolled: 8×8 raster (1×1 blocks), lum = x + 8y ⇒ bit set iff
    // lum > mean = 31.5 ⇒ exactly the top half of the gradient
    val lum = Array.tabulate(64)(i => (i % 8 + 8 * (i / 8)).toLong)
    val want = (0 until 64).filter(lum(_) > 31).map(1L << _).reduce(_ | _)
    assert(Multimodal.aHash64(8, 8, lum) == want)
    // degenerate rasters hash to 0 rather than throwing
    assert(Multimodal.aHash64(4, 4, Array.fill(16)(1L)) == 0L)
    // constant fill: no block exceeds the mean — all bits 0 (why mm10
    // uses gradient fixtures instead of mm07's constant fills)
    assert(Multimodal.aHash64(16, 16, Array.fill(256)(7L)) == 0L)

    // encode→decode→hash round trip: the REAL codec path equals hashing
    // the id-arithmetic raster directly (pins PNG losslessness for the
    // gradient generator, the identity mm10's oracle relies on)
    val idVals = Seq(0L, 1L, 2L, 3L, 100L, 199L)
    def lumOf(id: Long): Array[Long] = {
      val base = id / 3; val v = (id % 3).toInt
      Array.tabulate(256) { i =>
        val x = i % 16; val y = i / 16
        val r0 = (base * 37 + 11 * x) % 256
        val rr = if (v > 0 && x < 2 && y < 2) (r0 + v * 64) % 256 else r0
        rr + (base * 29 + 5 * y) % 256 + (base * 13 + 3 * x + 2 * y) % 256
      }
    }
    val got = Multimodal.imageAHash(
        Multimodal.syntheticGradientPngs(idVals.toDF("media_id")))
      .select($"media_id", $"width", $"height", $"ahash")
      .as[(Long, Int, Int, Long)].collect().map(r => r._1 -> r).toMap
    for (id <- idVals)
      assert(got(id) == ((id, 16, 16, Multimodal.aHash64(16, 16, lumOf(id)))),
        s"id=$id")

    // near-dup structure: variants of one base differ by ≤ 2 bits (the
    // perturbation touches one block); undecodable payloads tag w=h=0
    val triple = got(0L)._4 :: got(1L)._4 :: got(2L)._4 :: Nil
    for (a <- triple; b <- triple)
      assert(java.lang.Long.bitCount(a ^ b) <= 2)
    val bad = Multimodal.imageAHash(
        Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
      .select($"width", $"height", $"ahash").as[(Int, Int, Long)].head()
    assert(bad == ((0, 0, 0L)))
  }

  test("energyHash64 matches a hand-rolled reference; audioEnergyHash round-trips WAVs") {
    // hand-rolled: 128 samples, energy ramp ⇒ bits set exactly on the
    // windows whose mean energy exceeds the stream mean
    val ramp = Array.tabulate(128)(i => i)
    def reference(s: Array[Int]): Long = {
      val n = s.length
      val en = s.map(x => x.toLong * x)
      val tot = en.sum
      (0 until 64).foldLeft(0L) { (h, w) =>
        val a = w * n / 64; val b = (w + 1) * n / 64
        val we = (a until b).map(en(_)).sum
        if (we * n > tot * (b - a)) h | (1L << w) else h
      }
    }
    assert(Multimodal.energyHash64(ramp) == reference(ramp))
    // short streams: empty windows stay 0, no blanket zeroing (40-sample
    // clips must NOT all collide at hash 0)
    val short1 = Array.tabulate(40)(i => (i * 7) % 50 - 25)
    val short2 = Array.tabulate(40)(i => (i * 11) % 50 - 25)
    assert(Multimodal.energyHash64(short1) == reference(short1))
    assert(Multimodal.energyHash64(short1) != Multimodal.energyHash64(short2))
    assert(Multimodal.energyHash64(Array.empty[Int]) == 0L)

    // encode→decode→hash round trip through the REAL javax.sound PCM
    // seam equals hashing the id-arithmetic waveform directly
    val idVals = Seq(0L, 1L, 63L, 100L, 199L)
    def wave(id: Long): Array[Int] = {
      val n = (id % 101 + 40).toInt
      Array.tabulate(n)(i => ((id * 31 + i * 17) % 2048 - 1024).toInt)
    }
    val got = Multimodal.audioEnergyHash(
        Multimodal.syntheticWavs(idVals.toDF("media_id")))
      .select($"media_id", $"n_samples", $"ehash")
      .as[(Long, Int, Long)].collect().map(r => r._1 -> r).toMap
    for (id <- idVals)
      assert(got(id) == ((id, wave(id).length, reference(wave(id)))), s"id=$id")

    // undecodable payloads tag instead of throwing
    val bad = Multimodal.audioEnergyHash(
        Seq((9L, Array[Byte](1, 2, 3))).toDF("media_id", "payload"))
      .select($"n_samples", $"ehash").as[(Int, Long)].head()
    assert(bad == ((0, 0L)))
  }

  test("syntheticWavs → JavaSoundCodec: decoded PCM folds match the known waveform") {
    // the mm08 loop in miniature: write a real RIFF/WAVE per id, decode it
    // with the real javax.sound codec, and check every feature equals the
    // id arithmetic the DuckDB oracle recomputes
    val idVals = Seq(0L, 1L, 100L, 101L, 199L, 7777L)
    val got = Multimodal.decodeAudioFeatures(
        Multimodal.syntheticWavs(idVals.toDF("media_id")),
        Multimodal.JavaSoundCodec)
      .select($"media_id", $"channels", $"sample_rate", $"n_frames",
        $"sample_sum", $"sample_sq_sum")
      .as[(Long, Int, Int, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    for (id <- idVals) {
      val n = (id % 101 + 40).toInt
      val samples = (0 until n).map(i => ((id * 31 + i * 17) % 2048) - 1024)
      val (sum, sq) = (samples.sum, samples.map(s => s * s).sum)
      assert(got(id) == ((id, 1, 8000, n.toLong, sum, sq)), s"id=$id")
    }
  }

  test("JavaSoundCodec tags corrupt, truncated, and empty payloads instead of throwing") {
    val wav = Multimodal.syntheticWavs(Seq(5L).toDF("media_id"))
      .select($"payload").as[Array[Byte]].head()
    val corrupt = Seq(
      Array.emptyByteArray,                       // empty
      "not audio at all".getBytes("UTF-8"),       // garbage
      wav.take(20),                               // truncated mid-header
      { val b = wav.clone(); b(0) = 'X'.toByte; b } // broken magic
    )
    corrupt.foreach { payload =>
      val f = Multimodal.JavaSoundCodec.decode(payload)
      assert(f.channels == 0 && f.nFrames == 0L && f.sampleSum == 0L,
        "undecodable audio must tag, not throw")
    }
    // a real decode through the same seam still works after the corrupt ones
    assert(Multimodal.JavaSoundCodec.decode(wav).nFrames == (5L % 101 + 40))
  }

  test("syntheticVideoFrames → ImageIoCodec: per-frame folds and temporal deltas match") {
    // the mm09 loop in miniature: frame-row video, real per-frame decode,
    // stride sampling + max inter-frame delta — all against id arithmetic
    val id = 42L
    val decoded = Multimodal.decodeFeatures(
        Multimodal.syntheticVideoFrames(Seq(id).toDF("media_id")),
        Multimodal.ImageIoCodec)
      .select($"media_id", $"pixel_sum").as[(Long, Long)].collect()
      .map { case (k, ps) => (k % 100, ps) }.sortBy(_._1)
    val nf = (id % 7 + 4).toInt
    assert(decoded.length == nf)
    val px = (id % 21 + 4) * (id % 13 + 4)
    def ps(f: Long): Long =
      px * ((id + f * 11) % 256 + (id * 7 + f * 23) % 256 + (id * 13 + f * 37) % 256)
    decoded.foreach { case (f, got) => assert(got == ps(f), s"frame $f") }
    val sampled = (0L until nf).filter(_ % 2 == 0).map(ps)
    val wantDelta = sampled.sliding(2).map(p => (p(1) - p(0)).abs).max
    val row = SparkEntry.queries("mm09_video_frames")(spark, sf0001)
      .where($"video_id" === id).collect().head
    assert(row.getLong(1) == sampled.length && row.getLong(2) == sampled.sum
      && row.getLong(3) == wantDelta)
  }

  test("resize caps the longest side, preserves aspect, never hits 0") {
    val decoded = Seq(
      (1L, 640, 480),  // downscale: 320×240
      (2L, 100, 50),   // under cap: unchanged
      (3L, 6400, 2)    // extreme aspect: floor clamps to ≥ 1
    ).toDF("media_id", "width", "height")
    val r = Multimodal.resize(decoded, maxDim = 320)
      .select($"media_id", $"out_width", $"out_height")
      .as[(Long, Int, Int)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(r(1L) == (320, 240))
    assert(r(2L) == (100, 50))
    assert(r(3L) == (320, 1))
  }

  test("frame sampling keeps every stride-th frame") {
    val m = Multimodal.asMediaTable(
      Seq((1L, "x" * 100, "en", "s", 100L)).toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = Multimodal.sampleFrames(m, frameBytes = 10, stride = 3)
      .select($"n_frames", $"kept_frames").as[(Int, Seq[Long])].head()
    assert(r._1 == 10)
    assert(r._2 == Seq(0L, 3L, 6L, 9L))
  }

  test("aspect buckets: assignment, batch ceiling, and totals match brute force") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val decoded = Multimodal.decodeFeatures(Multimodal.asMediaTable(docs))
    val feats = decoded.select("width", "height", "n_bytes").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val ladder = Multimodal.AspectLadder
    val byBucket = feats.groupBy { case (w, h, _) =>
      // brute-force argmin with ladder-order tie-break
      ladder.zipWithIndex.minBy { case ((bw, bh), i) =>
        (math.abs(w.toDouble / h.toDouble - bw.toDouble / bh.toDouble), i)
      }._2
    }
    val got = Multimodal.aspectBuckets(decoded, batchSize = 32).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.length == byBucket.size)
    got.foreach { case (bw, bh, n, nb, tb) =>
      val i = ladder.indexOf((bw, bh))
      val exp = byBucket(i)
      assert(n == exp.length && nb == (n + 31) / 32 && tb == exp.map(_._3).sum,
        s"bucket ($bw,$bh)")
    }
  }
  test("mm12: clusters partition the media set and the keeper is the bit-argmax") {
    val labels = SparkEntry.allDefs("mm12_media_dup_clusters").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(labels.map(_._2).sum == 200L, "every media lands in exactly one cluster")
    // re-derive the per-media hash bits and check each cluster's keeper
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .where(org.apache.spark.sql.functions.col("doc_id") < 200)
      .select(org.apache.spark.sql.functions.col("doc_id").as("media_id"))
    val bits = graft.operators.Multimodal
      .imageAHash(graft.operators.Multimodal.syntheticGradientPngs(ids))
      .select(org.apache.spark.sql.functions.col("media_id"),
        org.apache.spark.sql.functions.bit_count(
          org.apache.spark.sql.functions.col("ahash")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    labels.foreach { case (cid, _, keepId, keepBits) =>
      assert(bits(keepId) == keepBits, s"cluster $cid keeper bits mismatch")
      assert(keepId >= cid, s"cluster label is the min member id")
    }
  }
}

/** Top-level (no outer capture) so the task closure serializes cleanly. */
object ConstCodec extends graft.operators.Multimodal.MediaCodec {
  def decode(payload: Array[Byte]): graft.operators.Multimodal.MediaFeatures =
    graft.operators.Multimodal.MediaFeatures(7, 9, 1, payload.length.toLong)
}
