package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{Funnel, Graph, QualityAudit, TableDiff}

/** Unit semantics for the round-4 pipeline operators: ordered funnel,
  * fixed-point PageRank, snapshot diff, quality audit. The judged oracle
  * queries (ev16-ev19, gr01, q34, q36) gate these on real tables; the cases
  * here pin hand-computable fixtures and the degenerate shapes the oracle
  * can't reach.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: step k counts only strictly after step k-1") {
    val ev = Seq(
      // user 1: view -> click -> purchase in order: reached 3
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:05:00")),
      (1L, "purchase", ts("2024-01-01 10:10:00")),
      // user 2: purchase BEFORE the click -> stalls at 2
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 10:01:00")),
      (2L, "click", ts("2024-01-01 10:02:00")),
      // user 3: click at EXACTLY the view time (not strictly after) -> 1
      (3L, "view", ts("2024-01-01 10:00:00")),
      (3L, "click", ts("2024-01-01 10:00:00")),
      // user 4: never views -> 0 even though it clicks
      (4L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.stepTimes(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
    val reached = out.select("user_id", "reached").as[(Long, Int)].collect().toMap
    assert(reached === Map(1L -> 3, 2L -> 2, 3L -> 1, 4L -> 0))
  }

  test("funnel: one exchange total — window passes and groupBy share it") {
    val ev = Seq((1L, "view", ts("2024-01-01 10:00:00")))
      .toDF("user_id", "event_type", "ts")
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val wasAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Funnel.stepTimes(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      val shuffles = out.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(shuffles.size === 1, out.queryExecution.executedPlan.toString)
    } finally spark.conf.set("spark.sql.adaptive.enabled", wasAqe)
  }

  test("pagerank: two-node cycle stays symmetric, star center outranks leaves") {
    // cycle: a<->b — equal ranks by symmetry
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rCycle = Graph.pageRankFixedPoint(spark, cycle, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rCycle(1L) === rCycle(2L))
    // undirected star 0-{1,2,3}: center accumulates leaf mass
    val starHalf = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val star = starHalf.union(starHalf.select($"dst".as("src"), $"src".as("dst")))
    val rStar = Graph.pageRankFixedPoint(spark, star, iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rStar(0L) > rStar(1L))
    assert(rStar(1L) === rStar(2L) && rStar(2L) === rStar(3L))
  }

  test("pagerank: rank mass is deterministic across partition counts") {
    val e = (0L until 40L).map(i => (i, (i * 7 + 1) % 40)).toDF("src", "dst")
    val r8 = Graph.pageRankFixedPoint(spark, e.repartition(8), iters = 3)
      .as[(Long, Long)].collect().toMap
    val r1 = Graph.pageRankFixedPoint(spark, e.coalesce(1), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(r8 === r1)
  }

  test("table diff: all four statuses, null-safe payload compare") {
    val v1 = Seq((1L, Option("a"), 10.0), (2L, Option("b"), 20.0),
      (3L, None: Option[String], 30.0), (4L, Option("d"), 40.0))
      .toDF("k", "s", "x")
    val v2 = Seq((1L, Option("a"), 10.0), (2L, Option("B"), 20.0),
      (3L, None: Option[String], 30.0), (5L, Option("e"), 50.0))
      .toDF("k", "s", "x")
    val out = TableDiff.diff(v1, v2, Seq("k"))
      .as[(Long, String)].collect().toMap
    assert(out === Map(
      1L -> "unchanged", 2L -> "changed",
      3L -> "unchanged", // null == null payload is unchanged (null-safe)
      4L -> "removed", 5L -> "added"))
  }

  test("incremental agg: merge of arbitrary batch splits equals full recompute") {
    import graft.operators.IncrementalAgg
    val rows = (1 to 60).map(i => (s"k${i % 4}", i * 1.07))
    val df = rows.toDF("k", "v")
    val full = IncrementalAgg.partial(df, Seq("k"), "v")
      .orderBy("k").collect().toSeq
    // three uneven batches, merged pairwise in a different order than rows
    val b = Seq(df.limit(7), df.offset(7).limit(29), df.offset(36))
      .map(IncrementalAgg.partial(_, Seq("k"), "v"))
    val merged = IncrementalAgg.merge(Seq("k"),
        IncrementalAgg.merge(Seq("k"), b(2), b(0)), b(1))
      .orderBy("k").collect().toSeq
    assert(merged === full)
  }

  test("tx22: split assignment partitions the corpus and is content-keyed") {
    val out = SparkEntry.allDefs("tx22_split_assign").fn(spark, sf0001)
      .select($"split", $"n_docs").as[(String, Long)].collect().toSeq
    val total = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.map(_._2).sum == total, "every doc is in exactly one split")
    assert(out.map(_._1).toSet == Set("train", "val", "test"))
    // content-keyed: the same text always lands in the same split, so a
    // later exact-dedup cannot move a doc across the train/test boundary.
    // Exercised through the QUERY's own assignment (not a re-derivation of
    // the hash, which would hold for any deterministic function): two
    // sources carrying identical texts must report identical per-split
    // doc counts — an id- or partition-keyed assignment could diverge.
    val tmp = "target/test_tx22_dup"
    val texts = (1 to 40).map(i => s"sample text number $i with filler")
    val dup = for (src <- Seq("s1", "s2"); t <- texts) yield (src, t)
    dup.toDF("source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val assigned = SparkEntry.allDefs("tx22_split_assign").fn(spark, tmp)
      .select($"source", $"split", $"n_docs")
      .as[(String, String, Long)].collect().toSeq
    val bySrc = assigned.groupBy(_._1)
      .map { case (s, rs) => s -> rs.map(r => (r._2, r._3)).toSet }
    assert(bySrc("s1") == bySrc("s2"),
      s"duplicate texts split differently across sources: $bySrc")
    // non-degenerate: the fixture texts span more than one split
    assert(bySrc("s1").size >= 2, bySrc.toString)
  }

  test("tx23: mixture shares are a fixed-point partition of ~1M ppm") {
    val out = SparkEntry.allDefs("tx23_mixture_weights").fn(spark, sf0001)
      .select($"share_ppm", $"budget_tokens").as[(Long, Long)].collect()
    // truncating integer division: the shares sum to 1M minus at most
    // (nSources - 1) ppm of rounding loss, never over
    val s = out.map(_._1).sum
    assert(s <= 1000000L && s > 1000000L - out.length,
      s"share_ppm sum $s out of range")
    // (10w·10⁶) div T lands in [10·((w·10⁶) div T), 10·(…)+9] — the same
    // share at 10× resolution, never disagreeing by a whole ppm
    assert(out.forall { case (ppm, bt) => bt >= ppm * 10 && bt <= ppm * 10 + 9 },
      "budget is the fixed-point share at 10M-token resolution")
  }

  test("tx47: epoch caps bind, redistribution conserves and respects caps") {
    val out = SparkEntry.allDefs("tx47_epoch_allocation").fn(spark, sf0001)
      .select($"lang", $"n_tokens", $"requested", $"shortfall",
        $"final_tokens", $"epochs_ticks")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out.nonEmpty)
    // no language past 4 epochs — the whole point of the operator
    assert(out.forall(r => r._5 <= 4 * r._2), out.toString)
    assert(out.forall(r => r._6 <= 4L * (1L << 20)), out.toString)
    // α = 0.5 over-requests low-resource languages: at 3.5×-corpus
    // budget at least one language caps (shortfall > 0) and the largest
    // (en) has headroom and absorbs redistributed mass beyond its request
    assert(out.exists(_._4 > 0), s"no cap bound: $out")
    val en = out.find(_._1 == "en").get
    assert(en._4 == 0 && en._5 > en._3 - en._4,
      s"en should absorb redistribution: $en")
    // conservation: nothing materializes from nowhere — Σ final ≤ Σ
    // requested (truncating divisions only ever lose mass)
    assert(out.map(_._5).sum <= out.map(_._3).sum, out.toString)
  }

  test("tx24: count-min estimates are one-sided (est >= exact, never under)") {
    val out = SparkEntry.allDefs("tx24_countmin").fn(spark, sf0001)
      .select($"exact_cnt", $"est_cnt").as[(Long, Long)].collect()
    assert(out.length == 30)
    assert(out.forall { case (exact, est) => est >= exact },
      "a count-min sketch can only overcount")
  }

  test("tx48: novelty partitions the gram vocabulary along the source order") {
    val out = SparkEntry.allDefs("tx48_ngram_novelty").fn(spark, sf0001)
      .select($"source", $"src_grams", $"new_grams", $"cum_grams", $"novelty_ticks")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.map(_._1).toSeq == out.map(_._1).toSeq.sorted)
    // the alphabetically-first source has never seen anything: all new
    assert(out.head._3 == out.head._2 && out.head._5 == (1L << 20))
    // first-source attribution partitions the distinct-gram vocabulary:
    // cumulative new_grams is a running total ending at the exact sum
    assert(out.last._4 == out.map(_._3).sum)
    out.foreach { case (s, src, nw, _, ticks) =>
      assert(nw <= src && ticks >= 0 && ticks <= (1L << 20), s)
    }
  }

  test("ann19: retrieval metrics cover all 50 queries with bounded ticks") {
    val out = SparkEntry.allDefs("ann19_retrieval_metrics").fn(spark, sf0001)
      .select($"label", $"n_queries", $"hits", $"mrr_ticks", $"dcg_ticks")
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.map(_._2).sum == 50)
    out.foreach { case (l, n, hits, mrr, dcg) =>
      assert(hits <= n * 10, s"label $l: more hits than ranked slots")
      assert(mrr >= 0 && mrr <= (1L << 20), s"label $l: MRR outside [0,1] ticks")
      // per-query DCG is at most k=10 relevant slots' undiscounted mass
      assert(dcg >= 0 && dcg <= 10L * (1L << 20), s"label $l: DCG out of range")
    }
  }

  test("ann20: drift ticks are exact on hand-built identical/orthogonal cohorts") {
    // label 0: the two halves' centroids are orthogonal basis vectors ->
    // cosine exactly 0.0; label 1: identical basis vectors -> exactly 1.0
    // (basis vectors make the sqrt round-trip exact, so the pins are
    // bit-deterministic, not approximate)
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.0f, 1.0f), 0),
      (2L, Seq(1.0f, 0.0f), 1), (3L, Seq(1.0f, 0.0f), 1))
    val dir = java.nio.file.Files.createTempDirectory("graft_drift").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.allDefs("ann20_centroid_drift").fn(spark, dir)
      .select($"label", $"n_a", $"n_b", $"drift_ticks")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((0, 1L, 1L, 0L), (1, 1L, 1L, 1L << 20)))
    // st32 is the same monitor with the odd cohort arriving as a stream:
    // bit-identical output on the same planted corpus
    val streamed = SparkEntry.allDefs("st32_stream_drift_monitor").fn(spark, dir)
      .select($"label", $"n_a", $"n_b", $"drift_ticks")
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    assert(streamed.toSeq == out.toSeq)
  }

  test("tx49: calibration bins partition the corpus; ECE numerator closes") {
    val fp = 1L << 20
    val out = SparkEntry.allDefs("tx49_calibration_curve").fn(spark, sf0001)
      .select($"bin", $"n", $"n_pos", $"mean_score_ticks", $"frac_pos_ticks", $"ece_num")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.nonEmpty && out.forall(b => b._1 >= 0 && b._1 <= 9))
    val nDocs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    assert(out.map(_._2).sum == nDocs, "every doc lands in exactly one bin")
    out.foreach { case (bin, n, nPos, ms, fpos, ece) =>
      assert(nPos <= n, s"bin $bin")
      assert(ms >= bin * fp / 10 && ms <= (bin + 1) * fp / 10 + 1,
        s"bin $bin mean score outside its bucket")
      assert(fpos >= 0 && fpos <= fp, s"bin $bin")
      assert(ece == math.abs(ms - fpos) * n, s"bin $bin ECE accounting")
    }
  }

  test("tx50: fertility is >= one piece per scored pretoken and OOV accounting closes") {
    val fp = 1L << 20
    val out = SparkEntry.allDefs("tx50_tokenizer_fertility").fn(spark, sf0001)
      .select($"lang", $"n_pretokens", $"n_oov", $"n_pieces", $"fertility_ticks")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (lang, np, oov, pieces, fert) =>
      assert(oov >= 0 && oov <= np, lang)
      assert(pieces >= np - oov, s"$lang: every scored pretoken has >= 1 piece")
      assert(fert >= fp, s"$lang: fertility below 1.0")
    }
    // the 2..8-char vocabulary can't cover everything: someone pays > 1
    assert(out.exists(_._5 > fp), "a non-degenerate corpus has fertility > 1.0")
  }

  test("ev38: k-anonymity accounting closes and flags the planted singleton") {
    // 6 identical-QI rows (one group of 6, safe at k=5) + 1 singleton QI
    val day = 86400L * 1000000L
    val rows = (0L until 6L).map(i => (i, 0L * day, i, "view", 11.0, "{}")) :+
      ((99L, 0L * day, 99L, "view", 91.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_kanon").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select($"event_id", timestamp_micros($"us").as("ts"),
        $"user_id", $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.allDefs("ev38_kanonymity").fn(spark, dir)
      .select($"event_type", $"n_rows", $"n_groups", $"n_small_groups",
        $"rows_at_risk", $"min_group_size")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq(("view", 7L, 2L, 1L, 1L, 1L)))
  }

  test("tx51: schedule endpoints equal the raw and balanced mixtures exactly") {
    val mix = SparkEntry.allDefs("tx38_temperature_mix").fn(spark, sf0001)
      .select($"lang", $"raw_ppm", $"share_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val sched = SparkEntry.allDefs("tx51_curriculum_schedule").fn(spark, sf0001)
      .select($"step", $"lang", $"ppm").as[(Long, String, Long)].collect()
    assert(sched.map(_._1).distinct.sorted.toSeq == Seq(0L, 1L, 2L, 3L, 4L))
    sched.foreach { case (step, lang, ppm) =>
      val (raw, share) = mix(lang)
      if (step == 0L) assert(ppm == raw, s"$lang step 0 must be the raw mixture")
      if (step == 4L) assert(ppm == share, s"$lang step 4 must be the balanced mixture")
      // linear anneal: every step lies between the two endpoints
      assert(ppm >= math.min(raw, share) && ppm <= math.max(raw, share), s"$lang@$step")
    }
  }

  test("ev39: attribution honors the 1-day lookback and click presence") {
    val h = 3600L * 1000000L // micro-hour
    // user 1: click then purchase 2h later -> attributed
    // user 2: click 30h before purchase -> outside the 1-day lookback
    // user 3: purchase with no click at all -> unattributed
    val rows = Seq(
      (1L, 0L * h, 1L, "click", 1.0, "{}"),
      (2L, 2L * h, 1L, "purchase", 10.0, "{}"),
      (3L, 0L * h, 2L, "click", 1.0, "{}"),
      (4L, 30L * h, 2L, "purchase", 20.0, "{}"),
      (5L, 2L * h, 3L, "purchase", 40.0, "{}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_attr").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(timestamp_micros($"us").as("ts"), $"event_id", $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.allDefs("ev39_attribution").fn(spark, dir)
      .select($"day".cast("string"), $"n_purchases", $"n_attributed", $"attributed_cents")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    // day 0 (epoch): purchases of users 1 and 3 -> one attributed, 1000c
    // day 1: user 2's purchase at hour 30 -> stale click, unattributed
    assert(out.toSeq == Seq(("1970-01-01", 2L, 1L, 1000L), ("1970-01-02", 1L, 0L, 0L)))
  }

  test("tx52: datasheet counts a planted duplicate and empty doc exactly") {
    val rows = Seq(
      (1L, "alpha beta", "en", "web", 10L),
      (2L, "alpha beta", "en", "web", 10L),   // exact duplicate
      (3L, "", "de", "books", 0L),            // empty doc
      (4L, "gamma", "en", "web", 5L))
    val dir = java.nio.file.Files.createTempDirectory("graft_sheet").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.allDefs("tx52_corpus_datasheet").fn(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L)        // docs, distinct
    assert(r.getLong(2) == 5L)                              // tokens: 2+2+0+1
    assert(r.getLong(3) == 25L)                             // chars from the column
    assert(r.getLong(4) == 2L && r.getLong(5) == 2L)        // langs, sources
    assert(r.getLong(6) == 1L)                              // empties
    assert(r.getLong(7) == 250000L)                         // 1 dup of 4 docs
    assert(r.getLong(8) == 5L * (1L << 20) / 4)             // mean tokens ticks
  }

  test("ev42: top paths are ranked, bounded to 5 steps, built from real event types") {
    val types = Set("click", "view", "purchase", "signup", "error")
    val out = SparkEntry.allDefs("ev42_path_analysis").fn(spark, sf0001)
      .select($"path", $"n_sessions").as[(String, Long)].collect()
    assert(out.nonEmpty && out.length <= 20)
    assert(out.map(_._2).toSeq == out.map(_._2).toSeq.sorted.reverse, "ranked by frequency")
    out.foreach { case (p, n) =>
      val steps = p.split(">")
      assert(steps.length <= 5 && steps.forall(types), s"path '$p'")
      assert(n >= 1)
    }
  }

  test("dd19: the provenance matrix accounts for every dd02 pair exactly once") {
    val cells = SparkEntry.allDefs("dd19_dup_provenance").fn(spark, sf0001)
      .select($"source_a", $"source_b", $"n_dup_pairs")
      .as[(String, String, Long)].collect()
    assert(cells.forall { case (a, b, _) => a <= b }, "unordered pair canonicalized")
    val totalPairs = SparkEntry.allDefs("dd02_jaccard_pairs").fn(spark, sf0001).count()
    assert(cells.map(_._3).sum == totalPairs,
      "matrix cells must partition the dd02 pair set")
  }

  test("ev43: type-1 quantile ranks pick the exact planted deltas") {
    // 10 users, click at t=0, purchase i hours later (i = 1..10):
    // rank = ceil(q*n/100) -> p50 = 5h, p90 = 9h, p99 = 10h exactly
    val h = 3600L * 1000000L
    val rows = (1L to 10L).flatMap { i =>
      Seq((i * 2, 0L, i, "click", 1.0, "{}"),
          (i * 2 + 1, i * h, i, "purchase", 5.0, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_lat").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(timestamp_micros($"us").as("ts"), $"event_id", $"user_id",
        $"event_type", $"value", $"props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.allDefs("ev43_conversion_latency").fn(spark, dir)
      .select($"q", $"n_conversions", $"delta_us")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((50, 10L, 5 * h), (90, 10L, 9 * h), (99, 10L, 10 * h)))
  }

  test("tx53: fragmentation falls as windows grow; window accounting closes") {
    val out = SparkEntry.allDefs("tx53_packing_sweep").fn(spark, sf0001)
      .select($"window_len", $"n_docs", $"n_windows", $"n_fragmented",
        $"n_extra_fragments", $"frag_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(128L, 512L, 2048L))
    assert(out.map(_._2).distinct.length == 1, "every config sees every doc")
    // longer context -> fewer boundary-split docs, fewer windows
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._4 >= b._4 && a._3 >= b._3 })
    out.foreach { case (c, nDocs, nWin, frag, extra, ppm) =>
      assert(extra >= frag, s"C=$c: each fragmented doc adds >= 1 extra piece")
      assert(ppm == frag * 1000000L / nDocs, s"C=$c ppm accounting")
      assert(nWin >= 1, s"C=$c")
    }
  }

  test("quality audit: nulls, cardinality, range; strings have null range") {
    val df = Seq(
      (Option(1.0), Option("x")),
      (Option(3.5), None: Option[String]),
      (None: Option[Double], Option("x"))
    ).toDF("num", "str")
    val rows = QualityAudit.audit(df, Seq("num"), Seq("str"))
      .orderBy("column").collect()
    assert(rows.length === 2)
    val Array(num, str) = rows
    assert(num === Row("num", 1L, 2L, 1.0, 3.5))
    assert(str === Row("str", 1L, 1L, null, null))
  }
}
