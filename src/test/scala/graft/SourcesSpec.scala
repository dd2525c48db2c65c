package graft

import org.apache.spark.sql.functions._
import graft.sources.SyntheticDocs

/** The custom DataSource V2 connector: row arithmetic, filter pushdown
  * (empty residual + partition-level pruning), and column pruning must
  * be REAL — observable in the executed plan and the partition count,
  * not just in the API types.
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def read(rows: Int, parts: Int) =
    spark.read.format(SyntheticDocs.Format)
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  test("rows follow the published arithmetic exactly") {
    val got = read(30, 4)
      .select($"doc_id", $"lang", $"source", $"n_tokens", $"text")
      .as[(Long, String, String, Long, String)].collect().sortBy(_._1)
    assert(got.length == 30)
    got.foreach { case (id, lang, src, nt, text) =>
      assert(lang == SyntheticDocs.lang(id) && src == SyntheticDocs.source(id))
      assert(nt == id % 97 + 3)
      assert(text == SyntheticDocs.text(id))
      assert(text.split(" ").length.toLong == nt)
    }
  }

  test("doc_id filters push into the source: no residual Filter, pruned partitions") {
    val df = read(1000, 8).where($"doc_id" >= 100 && $"doc_id" < 104)
    // pushdown consumed both bounds -> the id range is [100, 104), which
    // caps partition planning at 4 single-id slices (partition pruning)
    assert(df.rdd.getNumPartitions == 4, "pushed range must shrink the partition plan")
    assert(df.count() == 4)
    // the executed plan carries no post-scan Filter node (only the
    // scan's "RuntimeFilters: []" tag mentions the word): the residual
    // was empty, so Spark planned scan -> project directly — and the
    // scan itself advertises the narrowed id range
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Filter ("), s"expected no residual filter:\n$plan")
    assert(plan.contains("ids [100, 104)"), s"expected the pushed range:\n$plan")
  }

  test("column pruning reaches the reader: text never materializes in ReadSchema") {
    val df = read(1000, 8).groupBy($"lang").agg(sum($"n_tokens").as("t"))
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(formatted.contains("lang") && formatted.contains("n_tokens"))
    assert(!formatted.contains("text:"), s"text must be pruned from ReadSchema:\n$formatted")
  }

  test("equality pushdown degenerates to a single-row single-partition scan") {
    val df = read(100000, 16).where($"doc_id" === 54321L)
    assert(df.rdd.getNumPartitions == 1)
    val r = df.select($"doc_id", $"lang").as[(Long, String)].collect()
    assert(r.toSeq == Seq((54321L, SyntheticDocs.lang(54321L))))
  }

  test("audit sink: committed audit equals an independent recompute, any partitioning") {
    import graft.sources.AuditSink
    val df = spark.range(0, 1000).select($"id", ($"id" % 7).as("v"))
    df.repartition(8).write.format(AuditSink.Format)
      .option("name", "t_ok").mode("append").save()
    val expect = (0L until 1000L).foldLeft((0L, 0L)) { case ((n, c), id) =>
      (n + 1, c ^ AuditSink.fnv64(id))
    }
    assert(AuditSink.commits.get("t_ok").contains(expect))
    // a different partitioning commits the IDENTICAL audit
    df.repartition(3).write.format(AuditSink.Format)
      .option("name", "t_ok2").mode("append").save()
    assert(AuditSink.commits.get("t_ok2").contains(expect))
  }

  test("audit sink: a failed write publishes NOTHING (atomic commit protocol)") {
    import graft.sources.AuditSink
    AuditSink.commits.remove("t_boom")
    val df = spark.range(0, 100).select($"id")
    intercept[Exception] {
      df.repartition(4).write.format(AuditSink.Format)
        .option("name", "t_boom").option("explode", "true").mode("append").save()
    }
    // partition 0's writer died after writing 2 rows — none of them, and
    // none of the OTHER tasks' completed rows, may surface
    assert(AuditSink.commits.get("t_boom").isEmpty,
      "aborted job must publish no partial audit")
    assert(AuditSink.aborts.get("t_boom").exists(_ >= 1), "abort must be recorded")
  }

  test("micro-batch stream: admission-capped triggers cover the id space exactly once") {
    val src = spark.readStream.format(SyntheticDocs.Format)
      .option("rows", "1000").option("partitions", "4")
      .option("streamBatch", "300").load()
    val agg = src.groupBy($"lang").agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"))
    val q = agg.writeStream
      .outputMode("complete").format("memory").queryName("synth_stream_spec")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // 1000 ids at <=300/trigger -> at least 4 micro-batches ran
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      s"expected >=4 admission-capped batches, got " +
        q.recentProgress.map(_.numInputRows).mkString(","))
    val streamed = spark.table("synth_stream_spec")
      .select($"lang", $"n", $"t").as[(String, Long, Long)].collect().sortBy(_._1)
    val batch = read(1000, 4).groupBy($"lang")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("t"))
      .select($"lang", $"n", $"t").as[(String, Long, Long)].collect().sortBy(_._1)
    assert(streamed.toSeq == batch.toSeq,
      "replayed stream must equal the batch scan exactly — no gaps, no double-reads")
  }

  test("catalog plugin: identifier grammar resolves tables, read-only surface throws") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    // identifier -> table, pushdown intact through the catalog path
    val n = spark.sql(
      "SELECT count(*) AS n FROM graft_cat.ns.docs500_p2 WHERE doc_id < 100")
      .as[Long].head()
    assert(n == 100L)
    // SHOW TABLES surfaces the listing
    val listed = spark.sql("SHOW TABLES IN graft_cat.ns")
      .select($"tableName").as[String].collect()
    assert(listed.contains("docs1000"))
    // unknown identifier is a resolution error, not a silent empty table
    intercept[Exception] { spark.sql("SELECT * FROM graft_cat.ns.nope").collect() }
    // the mutation surface refuses
    intercept[Exception] { spark.sql("DROP TABLE graft_cat.ns.docs500") }
  }

  test("catalog function: fnv64 binds by identifier and matches the local fold") {
    import graft.sources.AuditSink
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val got = spark.sql(
      "SELECT doc_id, graft_cat.ns.fnv64(doc_id) AS h FROM graft_cat.ns.docs50")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(got.length == 50)
    got.foreach { case (id, h) => assert(h == AuditSink.fnv64(id), s"id $id") }
    intercept[Exception] {
      spark.sql("SELECT graft_cat.ns.nope(1)").collect()
    }
  }

  test("reported statistics drive join planning: filtered side auto-broadcasts") {
    // the pushed doc_id bound shrinks the REPORTED size under the
    // broadcast threshold, so Catalyst picks BroadcastHashJoin with no
    // hint — the CBO contract a file source gets from collected stats
    val small = read(1000000, 8).where($"doc_id" < 500)
      .select($"doc_id", $"n_tokens")
    val big = read(1000000, 8).select($"doc_id".as("k"), $"lang")
    val joined = big.join(small, $"k" === $"doc_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected stats-driven broadcast:\n$plan")
    assert(joined.count() == 500)
  }

  test("runtime V2 filtering: a delivered IN-set narrows the range and prunes partitions") {
    // the contract itself, driven exactly as Spark's DPP machinery would:
    // 1M ids over 8 slices, runtime IN {700000..700019} -> one 20-id slice
    val parts = SyntheticDocs.planAfterRuntimeIn(1000000L, 8,
      (700000L until 700020L).toArray).sortBy(_._1)
    assert(parts.head._1 == 700000L && parts.last._2 == 700020L &&
      parts.sliding(2).forall { case Array(a, b) => a._2 == b._1; case _ => true },
      s"expected contiguous cover of the IN-set span, got ${parts.toSeq}")
    assert(parts.length <= 8 && parts.map(p => p._2 - p._1).sum == 20L,
      s"the 1M-id scan must shrink to the 20-id span, got ${parts.toSeq}")
    // out-of-range IN-set -> empty partition plan, scan reads nothing
    assert(SyntheticDocs.planAfterRuntimeIn(100L, 8, Array(500L)).isEmpty)
  }

  test("runtime V2 filtering: Spark attaches the DPP filter to the scan in a join") {
    // integration evidence: the optimizer injects dynamicpruning on the
    // fact scan when joined against a selectively-filtered dim (whether
    // the runtime delivery fires is an engine cost-heuristic decision;
    // correctness never depends on it -- an ignored runtime filter just
    // reads more)
    val fact = read(1000000, 8).select($"doc_id", $"n_tokens")
    val dim = spark.read.parquet(s"$sf0001/documents.parquet")
      .where($"source" === "books").select($"doc_id")
    val joined = fact.join(dim, "doc_id")
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.contains("dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the V2 scan:\n$planned")
    val nBooks = dim.count()
    assert(joined.count() == nBooks)
  }

  test("closed-form range aggregates equal brute force on assorted ranges") {
    // the aggregate-pushdown reader is only as correct as these forms;
    // cover cycle-aligned, mid-cycle, wrapping, tiny, and empty ranges
    val ranges = Seq((0L, 97L), (0L, 1000L), (5L, 5L), (13L, 14L),
      (90L, 103L), (96L, 98L), (97L, 194L), (41L, 73L), (100000L, 100037L))
    for ((lo, hi) <- ranges if hi > lo) {
      val ids = lo until hi
      assert(SyntheticDocs.sumIds(lo, hi) == ids.sum, s"sumIds [$lo,$hi)")
      assert(SyntheticDocs.sumNTokens(lo, hi) == ids.map(SyntheticDocs.nTokens).sum,
        s"sumNTokens [$lo,$hi)")
      assert(SyntheticDocs.minNTokens(lo, hi) == ids.map(SyntheticDocs.nTokens).min,
        s"minNTokens [$lo,$hi)")
      assert(SyntheticDocs.maxNTokens(lo, hi) == ids.map(SyntheticDocs.nTokens).max,
        s"maxNTokens [$lo,$hi)")
    }
  }

  test("aggregate pushdown: no Aggregate node survives, one row moves") {
    val df = read(1000000, 16).where($"doc_id" >= 100 && $"doc_id" < 7000)
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("st"),
        min($"n_tokens").as("mnt"), max($"n_tokens").as("mxt"),
        sum($"doc_id").as("si"), min($"doc_id").as("mn"), max($"doc_id").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Aggregate"), s"aggregation must be absorbed:\n$plan")
    assert(plan.contains("AGGREGATED ids [100, 7000)"), s"expected agg scan:\n$plan")
    val r = df.as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val ids = 100L until 7000L
    assert(r == ((ids.size.toLong, ids.map(SyntheticDocs.nTokens).sum, 3L, 99L,
      ids.sum, 100L, 6999L)))
  }

  test("aggregate pushdown over an EMPTY range: count 0, sum/min/max NULL") {
    val df = read(1000, 8).where($"doc_id" < 0)
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("st"), max($"doc_id").as("mx"))
    val rows = df.collect()
    assert(rows.length == 1)
    assert(rows(0).getLong(0) == 0L && rows(0).isNullAt(1) && rows(0).isNullAt(2),
      s"un-grouped agg over empty input must be (0, null, null), got ${rows(0)}")
  }

  test("grouped aggregation is DECLINED: Spark aggregates over the pruned scan") {
    // the source only absorbs un-grouped aggregates; a groupBy must fall
    // back to a normal (pruned, partial->final) plan with correct results
    val df = read(10000, 8).groupBy($"lang").agg(count(lit(1)).as("n"))
    assert(df.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val got = df.as[(String, Long)].collect().toMap
    assert(got == (0L until 10000L).groupBy(SyntheticDocs.lang).view.mapValues(_.size.toLong).toMap)
  }

  test("LIMIT pushdown is FULL: the scan is bounded and no Limit node remains") {
    val df = read(1000000, 16).limit(2500)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ids [0, 2500)"), s"expected bounded scan:\n$plan")
    assert(!plan.contains("Limit"), s"fully-pushed limit must drop the node:\n$plan")
    assert(df.count() == 2500)
  }

  test("TopN pushdown narrows the range both directions; final sort kept") {
    val asc = read(1000000, 16).orderBy($"doc_id").limit(5)
    assert(asc.queryExecution.executedPlan.toString.contains("ids [0, 5)"))
    assert(asc.select($"doc_id").as[Long].collect().toSeq == (0L until 5L))
    val desc = read(1000000, 16).orderBy($"doc_id".desc).limit(5)
    val dplan = desc.queryExecution.executedPlan.toString
    assert(dplan.contains("ids [999995, 1000000)"), s"expected top-of-range scan:\n$dplan")
    // partial pushdown: Spark's global sort+limit still runs (order proof)
    assert(dplan.contains("TakeOrderedAndProject") || dplan.contains("Sort"),
      s"partial TopN must keep the final sort:\n$dplan")
    assert(desc.select($"doc_id").as[Long].collect().toSeq ==
      (999999L to 999995L by -1))
  }

  test("OFFSET pushdown skips ids at the source") {
    val df = read(1000, 4).offset(990)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ids [990, 1000)"), s"expected offset-narrowed scan:\n$plan")
    assert(df.select($"doc_id").as[Long].collect().sorted.toSeq == (990L until 1000L))
  }

  test("malformed reader options fail fast, naming the option") {
    for ((k, v) <- Seq("rows" -> "abc", "rows" -> "-1", "partitions" -> "0",
        "streamBatch" -> "x")) {
      val e = intercept[Exception] {
        spark.read.format(SyntheticDocs.Format).option(k, v).load().count()
      }
      def chain(t: Throwable): Seq[Throwable] =
        Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
      assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
        c.getMessage.contains(s"'$k'")), s"option $k=$v: got $e")
    }
  }

  test("micro-batch admission control honors CompositeReadLimit's tightest cap") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    // engine cap (50) tighter than streamBatch (300) inside a composite
    val composite = ReadLimit.compositeLimit(Array(
      ReadLimit.minRows(10, 0), ReadLimit.maxRows(50)))
    assert(SyntheticDocs.latestOffsetUnder(1000, 300, 100, composite) == 150L)
    // plain maxRows and allAvailable unchanged
    assert(SyntheticDocs.latestOffsetUnder(1000, 300, 100, ReadLimit.maxRows(50)) == 150L)
    assert(SyntheticDocs.latestOffsetUnder(1000, 300, 100, ReadLimit.allAvailable()) == 1000L)
    // cap never overshoots the bounded id space
    assert(SyntheticDocs.latestOffsetUnder(120, 300, 100, ReadLimit.maxRows(50)) == 120L)
  }

  test("bucketed layout: stable B partitions, one residue class each, ids covered exactly") {
    val df = spark.read.format(SyntheticDocs.Format)
      .option("rows", "1000").option("buckets", "6").load()
    assert(df.rdd.getNumPartitions == 6)
    assert(df.select($"doc_id").as[Long].collect().sorted.toSeq == (0L until 1000L),
      "bucket partitions must cover every id exactly once")
    val residues = df.select($"doc_id").rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0) % 6).toSet)).collect()
    assert(residues.forall(_.size <= 1),
      s"each bucket partition must hold a single residue class: ${residues.toSeq}")
    // a pushed filter narrows WITHIN buckets but keeps the partition-value
    // set stable (the SPJ alignment invariant); empty buckets still plan
    val f = df.where($"doc_id" >= 100 && $"doc_id" < 110)
    assert(f.rdd.getNumPartitions == 6)
    assert(f.select($"doc_id").as[Long].collect().sorted.toSeq == (100L until 110L))
    val tiny = spark.read.format(SyntheticDocs.Format)
      .option("rows", "3").option("buckets", "8").load()
    assert(tiny.rdd.getNumPartitions == 8 && tiny.count() == 3)
    // both layouts are the same TABLE: identical multisets of rows
    val range = spark.read.format(SyntheticDocs.Format)
      .option("rows", "1000").option("partitions", "6").load()
    assert(df.exceptAll(range).isEmpty && range.exceptAll(df).isEmpty)
  }

  test("catalog bucket function matches the layout's floor-mod; bad bind fails fast") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val got = spark.sql(
      "SELECT doc_id, graft_cat.ns.bucket(7, doc_id) AS b FROM graft_cat.ns.docs100")
      .as[(Long, Int)].collect()
    assert(got.length == 100)
    got.foreach { case (id, b) => assert(b == SyntheticDocs.bucketOf(7, id), s"id $id") }
    intercept[Exception] { spark.sql("SELECT graft_cat.ns.bucket(7)").collect() }
  }

  test("storage-partitioned join: co-bucketed catalog tables merge-join with NO exchange") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    // different row counts, same bucket count -> compatible key-grouped
    // partitioning; MERGE pins the strategy so the assertion is about
    // the exchange, not the join pick
    val q =
      """SELECT /*+ MERGE(b) */ a.doc_id, a.n_tokens, b.n_tokens AS bt
        |FROM graft_cat.spj.docs4000_b4 a
        |JOIN graft_cat.spj.docs3000_b4 b ON a.doc_id = b.doc_id""".stripMargin
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected a merge join:\n$plan")
    assert(!plan.contains("Exchange"),
      s"SPJ must plan the join with no shuffle on either side:\n$plan")
    // SupportsReportOrdering: partitions emit doc_id ascending, so the
    // merge join needs no Sort either — the plan is the bare join over
    // the two scans ("Sort [" is the node; SortMergeJoin doesn't match)
    assert(!plan.contains("Sort ["),
      s"reported per-partition ordering must drop the sorts:\n$plan")
    assert(df.count() == 3000L)
    // A/B: with v2 bucketing off the same query must shuffle — proof the
    // exchange-free plan came from the reported partitioning
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
    try {
      val off = spark.sql(q).queryExecution.executedPlan.toString
      assert(off.contains("Exchange"),
        s"without v2 bucketing the join must plan exchanges:\n$off")
    } finally spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    // bucket-count mismatch is NOT co-partitioned: correctness unchanged
    val mismatch = spark.sql(
      """SELECT /*+ MERGE(b) */ count(*) AS n
        |FROM graft_cat.spj.docs4000_b4 a
        |JOIN graft_cat.spj.docs3000_b8 b ON a.doc_id = b.doc_id""".stripMargin)
    assert(mismatch.as[Long].head() == 3000L)
  }

  test("storage-partitioned shuffle: only the non-bucketed join side exchanges") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    val prior = spark.conf.getOption("spark.sql.sources.v2.bucketing.shuffle.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    try {
      // bucketed table vs a plain range subquery: instead of shuffling
      // BOTH sides to hash partitioning, Spark shuffles only the range
      // side BY THE CATALOG'S bucket FUNCTION into the scan's existing
      // key-grouped layout — at 100 TB that is half the shuffle, and the
      // stored side never moves
      val df = spark.sql(
        """SELECT /*+ MERGE(r) */ count(*) AS n, sum(a.n_tokens) AS t
          |FROM graft_cat.spj.docs4000_b4 a
          |JOIN (SELECT id AS doc_id FROM range(2000)) r ON a.doc_id = r.doc_id""".stripMargin)
      val joinPlan = df.queryExecution.executedPlan.toString
        .linesIterator.dropWhile(!_.contains("SortMergeJoin")).mkString("\n")
      val exchanges = joinPlan.linesIterator.count(_.contains("Exchange"))
      assert(exchanges == 1,
        s"expected exactly ONE exchange (the non-bucketed side):\n$joinPlan")
      val r = df.as[(Long, Long)].head()
      assert(r == ((2000L, (0L until 2000L).map(SyntheticDocs.nTokens).sum)))
    } finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")
    }
  }

  test("metadata column _partition: hidden from *, ordinal matches both layouts") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    // hidden: SELECT * carries only the table schema
    assert(spark.sql("SELECT * FROM graft_cat.ns.docs100_b4").columns.toSeq ==
      SyntheticDocs.schema.fieldNames.toSeq)
    // bucketed layout: the ordinal IS the bucket id
    val bucketed = spark.sql(
      "SELECT doc_id, _partition FROM graft_cat.ns.docs1000_b4")
      .as[(Long, Int)].collect()
    assert(bucketed.length == 1000)
    bucketed.foreach { case (id, p) =>
      assert(p == SyntheticDocs.bucketOf(4, id), s"id $id") }
    // range layout: the ordinal is the slice index of the planner's
    // even split (slice i covers [rows*i/n, rows*(i+1)/n))
    val sliced = spark.sql(
      "SELECT doc_id, _partition FROM graft_cat.ns.docs1000_p4")
      .as[(Long, Int)].collect()
    sliced.foreach { case (id, p) =>
      assert(p == (id * 4 / 1000).toInt, s"id $id") }
    // a residual filter on the metadata column works like any column
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft_cat.ns.docs1000_b4 WHERE _partition = 1")
      .as[Long].head() == 250L)
  }

  test("V2 predicate pushdown: both operand orders narrow; the V1 path is bypassed") {
    // `5000 <= doc_id` keeps the literal on the LEFT — V2 predicates
    // preserve the user's operand order (a V1 Filter would have been
    // normalized), so the mirrored comparison must narrow identically
    val df = read(1000000, 8)
      .where(expr("5000 <= doc_id")).where(expr("doc_id < 5020"))
    assert(df.rdd.getNumPartitions <= 8)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ids [5000, 5020)"), s"expected narrowed scan:\n$plan")
    assert(!plan.contains("Filter ("), s"expected empty residual:\n$plan")
    assert(df.count() == 20)
    // non-consumable predicate stays residual; the range part still pushes
    val mixed = read(1000, 8).where($"doc_id" >= 990 && $"lang" === "en")
    val mplan = mixed.queryExecution.executedPlan.toString
    assert(mplan.contains("ids [990, 1000)"), s"range must push:\n$mplan")
    assert(mplan.contains("Filter ("), s"lang predicate must stay residual:\n$mplan")
    assert(mixed.count() == (990L until 1000L).count(SyntheticDocs.lang(_) == "en"))
  }

  test("bucketed-table grammar rejects zero buckets and malformed options") {
    spark.conf.set("spark.sql.catalog.graft_cat",
      classOf[graft.sources.GraftCatalog].getName)
    intercept[Exception] { spark.sql("SELECT * FROM graft_cat.ns.docs500_b0").collect() }
    val e = intercept[Exception] {
      spark.read.format(SyntheticDocs.Format)
        .option("rows", "10").option("buckets", "0").load().count()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Option(t).toSeq.flatMap(x => x +: chain(x.getCause))
    assert(chain(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("'buckets'")), s"got $e")
  }

  test("audit sink rejects a frame whose first column is not a long") {
    import graft.sources.AuditSink
    val e = intercept[Exception] {
      Seq(("a", 1L)).toDF("s", "v").write.format(AuditSink.Format)
        .option("name", "t_bad").mode("append").save()
    }
    assert(e.getMessage != null)
  }

  test("V2 join pushdown: inner doc_id equi-join is absorbed into ONE scan") {
    spark.conf.set("spark.sql.optimizer.datasourceV2JoinPushdown", "true")
    val a = read(1000, 8).where($"doc_id" >= 100 && $"doc_id" < 700)
    val b = read(500, 4).select($"doc_id", $"n_tokens", $"lang")
    val j = a.join(b, a("doc_id") === b("doc_id"))
      .select(a("doc_id"), a("lang"), b("n_tokens"), b("lang"))
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join must be absorbed into the scan:\n$plan")
    val rows = j.collect()
    // inner join of the two generators on doc_id = ids [100, 500)
    assert(rows.length == 400)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(id >= 100 && id < 500)
      assert(r.getString(1) == SyntheticDocs.lang(id))
      assert(r.getLong(2) == id % 97 + 3)
      assert(r.getString(3) == SyntheticDocs.lang(id))
    }
    // an un-grouped aggregate OVER the pushed join collapses to one
    // closed-form row: count(*) of a join, O(1), no Aggregate above scan
    val agg = a.join(b, a("doc_id") === b("doc_id"))
      .agg(count(lit(1)).as("n"), sum(b("n_tokens")).as("t"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Join"), aggPlan)
    val Array(ar) = agg.collect()
    assert(ar.getLong(0) == 400)
    assert(ar.getLong(1) == (100L until 500L).map(_ % 97 + 3).sum)
  }

  private def xorFold(ids: Range): (Long, Long) =
    ids.foldLeft((0L, 0L)) { case ((n, c), id) =>
      (n + 1, c ^ graft.sources.AuditSink.fnv64(id.toLong))
    }

  test("audit sink: overwrite REPLACES the record, append FOLDS into it") {
    import graft.sources.AuditSink
    def write(r: Range, mode: String): Unit =
      spark.range(r.start, r.end).select($"id").write.format(AuditSink.Format)
        .option("name", "t_trunc").mode(mode).save()
    write(0 until 100, "overwrite")
    assert(AuditSink.commits.get("t_trunc").contains(xorFold(0 until 100)))
    write(0 until 50, "append")
    val (nFull, cFull) = xorFold(0 until 100)
    val (nHalf, cHalf) = xorFold(0 until 50)
    assert(AuditSink.commits.get("t_trunc").contains((nFull + nHalf, cFull ^ cHalf)),
      "append must add counts and XOR checksums into the existing record")
    write(0 until 10, "overwrite")
    assert(AuditSink.commits.get("t_trunc").contains(xorFold(0 until 10)),
      "overwrite (builder truncate()) must replace the whole record")
  }

  test("write distribution/ordering: the engine clusters and sorts on the sink's demand") {
    import graft.sources.AuditSink
    // deliberately scatter the rows so that WITHOUT the demanded exchange
    // every task would see most keys and unsorted ids
    val df = spark.range(0, 5000)
      .select($"id", concat(lit("k"), $"id" % 5).as("k"))
      .repartition(11, ($"id" * 2654435761L % 97).cast("int"))
    df.write.format(AuditSink.Format)
      .option("name", "t_layout")
      .option("distributeBy", "k").option("sortBy", "id")
      .mode("overwrite").save()
    assert(AuditSink.commits.get("t_layout").contains(xorFold(0 until 5000)),
      "the inserted exchange/sort must not change the written data")
    assert(AuditSink.layout.get("t_layout").contains((Some(true), Some(true))),
      "clustered distribution must keep every key in one task, sorted within")
    // a sortBy-only demand publishes NO clustering verdict — nothing
    // measured it (review finding r12b)
    spark.range(0, 100).select($"id")
      .write.format(AuditSink.Format)
      .option("name", "t_sortonly").option("sortBy", "id")
      .mode("overwrite").save()
    assert(AuditSink.layout.get("t_sortonly").contains((None, Some(true))))
  }

  test("write layout fold: a split key or unsorted task is DETECTED, not assumed") {
    import graft.sources.{AuditFold, AuditMessage}
    val ok = AuditFold(Array(
      AuditMessage(2, 1L, Array("a"), sorted = true),
      AuditMessage(3, 2L, Array("b", "c"), sorted = true)))
    assert(ok == (5L, 3L, true, true))
    val split = AuditFold(Array(
      AuditMessage(2, 1L, Array("a"), sorted = true),
      AuditMessage(3, 2L, Array("a", "b"), sorted = true)))
    assert(!split._3, "a key seen by two tasks means clustering did NOT hold")
    val unsorted = AuditFold(Array(
      AuditMessage(2, 1L, Array("a"), sorted = false)))
    assert(!unsorted._4, "one unsorted task fails the ordering verdict")
  }

  test("streaming write: one idempotent audit commit per epoch, ledger covers the id space") {
    import graft.sources.AuditSink
    val name = s"t_stream_audit_${System.nanoTime()}"
    val out = graft.core.Workspace.dir(s"roundtrip/spec_audit_$name")
    val q = spark.readStream.format(SyntheticDocs.Format)
      .option("rows", "1000").option("partitions", "4")
      .option("streamBatch", "300").load()
      .select($"doc_id")
      .writeStream.format(AuditSink.Format)
      .option("name", name)
      .option("checkpointLocation", s"$out/ck")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ledger = AuditSink.epochCommits(name)
    val nonEmpty = ledger.filter(_._2._1 > 0)
    assert(nonEmpty.keySet == Set(0L, 1L, 2L, 3L),
      s"300-id admission over 1000 ids must commit epochs 0..3, got $ledger")
    nonEmpty.foreach { case (e, got) =>
      val lo = (e * 300).toInt
      val hi = math.min(lo + 300, 1000)
      assert(got == xorFold(lo until hi), s"epoch $e audit must equal its id slice")
    }
  }
}
