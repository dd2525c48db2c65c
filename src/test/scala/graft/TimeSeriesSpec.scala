package graft

import org.apache.spark.sql.Row

/** Semantic pins for the round-7 trailing-window analytics (ev32/ev33)
  * and the BPE pair-count step (tx26): each query is recomputed here by an
  * independent, deliberately-naive in-test reference (per-user sequential
  * recursion, brute-force median, per-occurrence pair counting) and must
  * agree exactly — the oracle gate then separately proves cross-engine
  * bit-parity at sf0.01.
  */
class TimeSeriesSpec extends SparkSpec {

  private def events = spark.read.parquet(s"$sf0001/events.parquet")

  test("ev32: windowed fold equals the sequential per-user EWMA recursion") {
    val out = SparkEntry.allDefs("ev32_ewma_smooth").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap

    val rows = events.where("event_type = 'purchase'")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3)))
    val expected = rows.groupBy(_._1).flatMap { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.indices.map { i =>
        // bounded horizon: restart the recursion 16 events back
        val frame = ordered.slice(math.max(0, i - 15), i + 1)
        var acc = 0.0
        frame.foreach(e => acc = acc * 0.7 + 0.3 * e._4)
        ordered(i)._3 -> acc
      }
    }
    assert(out.size == expected.size)
    expected.foreach { case (id, v) =>
      assert(java.lang.Double.doubleToLongBits(out(id)) ==
        java.lang.Double.doubleToLongBits(v), s"event $id: ${out(id)} != $v")
    }
  }

  test("ev33: med/MAD/flag match a brute-force trailing recompute") {
    val out = SparkEntry.allDefs("ev33_mad_outliers").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(3), r.getDouble(4), r.getInt(5)))).toMap

    def median(s: Seq[Double]): Double = {
      val v = s.sorted; val n = v.length
      if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
    }
    val rows = events.where("event_type = 'error'")
      .select("user_id", "ts", "event_id", "value").collect()
      .map(r => (r.getLong(0), r.get(1).toString, r.getLong(2), r.getDouble(3)))
    var checked = 0
    rows.groupBy(_._1).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._2, e._3))
      ordered.indices.foreach { i =>
        val hist = ordered.slice(math.max(0, i - 20), i).map(_._4)
        if (hist.length >= 8) {
          val med = median(hist)
          val mad = median(hist.map(x => math.abs(x - med)))
          val flag = if (math.abs(ordered(i)._4 - med) > 3.0 * mad) 1 else 0
          val (m, d, f) = out(ordered(i)._3)
          assert(m == med && d == mad && f == flag, s"event ${ordered(i)._3}")
          checked += 1
        } else assert(!out.contains(ordered(i)._3), "cold-start row leaked")
      }
    }
    assert(checked == out.size && checked > 0)
  }

  test("tx27: fixed-point bigram LM scores match a sequential recompute") {
    val out = SparkEntry.allDefs("tx27_bigram_lm_score").fn(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val docBg = docs.map { case (id, t) =>
      val ts = t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (id, ts.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq)
    }.filter(_._2.nonEmpty)
    val c2 = docBg.flatMap(_._2).groupBy(identity).map { case (b, o) => (b, o.size.toLong) }
    val c1 = c2.groupBy(_._1.split(' ')(0)).map { case (w, m) => (w, m.values.sum) }
    val v  = c2.keys.map(_.split(' ')(1)).toSet.size.toLong
    val pfp = c2.map { case (b, n) =>
      (b, ((n + 1) * (1L << 20)) / (c1(b.split(' ')(0)) + v))
    }
    val expected = docBg.map { case (id, bgs) =>
      (id, bgs.length.toLong, bgs.map(pfp).sum / bgs.length)
    }.toSet
    assert(out.toSet == expected && out.nonEmpty)
  }

  test("ev34: interpolated values match a sequential two-pointer recompute") {
    val out = SparkEntry.allDefs("ev34_linear_interp").fn(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap

    val rows = graft.core.Tables(spark, sf0001).events
      .where("event_type IN ('purchase', 'error')")
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) AS t", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    var checked = 0
    rows.groupBy(_._2).foreach { case (_, evs) =>
      val ordered = evs.sortBy(e => (e._4, e._1))
      ordered.zipWithIndex.foreach { case ((id, _, kind, t, _), i) =>
        if (kind == "error") {
          val prev = ordered.take(i + 1).filter(_._3 == "purchase").lastOption
          val next = ordered.drop(i).filter(_._3 == "purchase").headOption
          (prev, next) match {
            case (Some(p), Some(n)) =>
              val exp =
                if (n._4 == p._4) p._5
                else p._5 + (n._5 - p._5) *
                  ((t - p._4).toDouble / (n._4 - p._4).toDouble)
              assert(java.lang.Double.doubleToLongBits(out(id)) ==
                java.lang.Double.doubleToLongBits(exp), s"event $id")
              checked += 1
            case _ => assert(!out.contains(id), s"boundary row $id leaked")
          }
        }
      }
    }
    assert(checked == out.size && checked > 0)
  }

  test("ev34: a NULL-valued purchase is no anchor — (t, value) stay paired") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ev34").toString
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    // P1(t=100, 5.0), P2(t=200, NULL), error(t=210), P3(t=300, 9.0):
    // interpolation must bridge P1->P3 over (100, 300), not pair P1's
    // value with P2's timestamp
    Seq(
      (1L, ts(100), 7L, "purchase", Some(5.0), "{}"),
      (2L, ts(200), 7L, "purchase", None: Option[Double], "{}"),
      (3L, ts(210), 7L, "error", Some(1.0), "{}"),
      (4L, ts(300), 7L, "purchase", Some(9.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.allDefs("ev34_linear_interp").fn(spark, dir).collect()
    assert(out.length == 1)
    val expected = 5.0 + (9.0 - 5.0) * ((210.0 - 100.0) / (300.0 - 100.0))
    assert(out(0).getDouble(2) == expected, s"got ${out(0).getDouble(2)}")
  }

  test("tx26: vocabulary-weighted pair counts equal per-occurrence counting") {
    val out = SparkEntry.allDefs("tx26_bpe_pair_counts").fn(spark, sf0001).collect()
    // naive reference: count adjacent char pairs over every pretoken
    // OCCURRENCE (no vocabulary rollup)
    val pat = graft.functions.TextFunctions.pretokenPattern.r
    val counts = collection.mutable.Map.empty[String, Long]
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().foreach { case Row(t: String) =>
        pat.findAllIn(t).foreach { p =>
          (0 until p.length - 1).foreach { i =>
            val pr = p.substring(i, i + 2)
            counts(pr) = counts.getOrElse(pr, 0L) + 1L
          }
        }
      }
    assert(out.length == counts.size)
    out.foreach { r =>
      assert(counts(r.getString(0)) == r.getLong(1), r.getString(0))
    }
    // judged order is total: (cnt DESC, pair ASC)
    val key = out.map(r => (-r.getLong(1), r.getString(0)))
    assert(key.sameElements(key.sorted))
  }
}
