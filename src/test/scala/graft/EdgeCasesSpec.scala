package graft

import org.apache.spark.sql.functions._
import graft.operators.{Chunking, Dedup, Similarity}

/** Degenerate-input hardening: empty corpora, single rows, parameter
  * counts exceeding the data. None of these shapes appear in the judged
  * fixtures, but all of them appear in real pipelines (an empty crawl
  * batch, a filter that drops everything) — operators must return empty
  * or trivial results, not throw.
  */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def emptyDocs =
    Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("tx30/tx31 on an empty corpus return empty, not errors") {
    // an empty crawl batch through the full judged queries: the BPE
    // loop must stop on its empty top-1 (not throw), the sampler must
    // return an empty draw
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sf").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.allDefs("tx30_priority_sample").fn(spark, dir).count() == 0)
    assert(SparkEntry.allDefs("tx31_bpe_train").fn(spark, dir).count() == 0)
    // the compression curve of nothing: exactly the round-0 row, 0 symbols
    val enc = SparkEntry.allDefs("tx32_bpe_encode").fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(enc.toSeq == Seq((0, "", 0L)))
  }

  test("tx31/tx32 stop at pair exhaustion with only realized rounds") {
    // a corpus whose only repeated content is 'ab' exhausts BPE pairs
    // after two merges; the training rows and the compression curve must
    // both report exactly the realized rounds (the oracle mirrors this
    // with per-round EXISTS guards — review finding r8)
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_exh").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(1)
      .withColumn("text", lit("ab ab ab"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val train = SparkEntry.allDefs("tx31_bpe_train").fn(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(train.count(_._1.startsWith("merge")) == 2,
      s"expected 2 realized merges, got ${train.toSeq}")
    val enc = SparkEntry.allDefs("tx32_bpe_encode").fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(enc == Seq((0, "", 8L), (1, "a b", 5L), (2, "Ġ ab", 3L)), enc.toString)
  }

  test("tx35/tx36/tx37 on empty or vocab-less corpora: fixed rounds, zeros, no errors") {
    // empty corpus: no pieces to learn — training emits no stages,
    // the fixed-round compression curve reports zeros, scoring no docs
    val dir = java.nio.file.Files.createTempDirectory("graft_uni_empty").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(SparkEntry.allDefs("tx35_unigram_train").fn(spark, dir).count() == 0)
    val enc = SparkEntry.allDefs("tx36_unigram_encode").fn(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(enc.toSeq == Seq((0, 0L, 0L, 0L), (1, 0L, 0L, 0L), (2, 0L, 0L, 0L)))
    assert(SparkEntry.allDefs("tx37_unigram_score").fn(spark, dir).count() == 0)
    // a corpus whose pretokens are ALL outside the 2..8-char trainer
    // window (single chars): the EM vocabulary is empty, but scoring
    // still reports every document — all pretokens OOV, zero cost
    val dir2 = java.nio.file.Files.createTempDirectory("graft_uni_oov").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(2)
      .withColumn("text", lit("x\ny"))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    assert(SparkEntry.allDefs("tx35_unigram_train").fn(spark, dir2).count() == 0)
    val score = SparkEntry.allDefs("tx37_unigram_score").fn(spark, dir2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))
    assert(score.length == 2)
    score.foreach { case (nPre, nOov, nPieces, mean) =>
      assert(nPre == 3 && nOov == 3 && nPieces == 0L && mean == 0L)
    }
  }

  test("dedup operators on an empty corpus return empty, not errors") {
    assert(Dedup.exact(emptyDocs).count() == 0)
    assert(Dedup.exactByHash(emptyDocs).count() == 0)
    assert(Dedup.jaccardPairs(emptyDocs, 0.8).count() == 0)
    assert(Dedup.minhashDupPairs(emptyDocs, 0.8).count() == 0)
    assert(Dedup.simhashDupPairs(emptyDocs).count() == 0)
  }

  test("connected components with no edges: every node a singleton, zero rounds") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    val (labels, rounds) = Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"), nodes)
    assert(rounds == 0)
    assert(labels.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("single-document corpus yields no pairs anywhere") {
    val one = Seq((1L, "only doc here")).toDF("doc_id", "text")
    assert(Dedup.jaccardPairs(one, 0.0).count() == 0)
    assert(Dedup.minhashDupPairs(one, 0.0).count() == 0)
  }

  test("chunking an empty corpus / empty text emits no chunks") {
    assert(Chunking.chunk(emptyDocs, 200, 150).count() == 0)
    val docs = Seq((1L, ""), (2L, "non empty")).toDF("doc_id", "text")
    val ids = Chunking.chunk(docs, 200, 150).select($"doc_id")
      .as[Long].collect().toSet
    assert(ids == Set(2L)) // empty doc contributes nothing
  }

  test("ivfTopK with nCells exceeding the corpus still returns valid top-k") {
    val emb = (0L until 5L).map(i =>
        (i, Seq.tabulate(4)(d => math.cos(i * 3.0 + d))))
      .toDF("vec_id", "embedding")
    val r = Similarity.ivfTopK(emb.where($"vec_id" === 0), emb,
        k = 3, nCells = 16, nProbe = 16)
      .select($"rank", $"neighbor_id").as[(Int, Long)].collect()
    assert(r.nonEmpty && r.map(_._1).toSet.subsetOf(Set(1, 2, 3)))
  }

  test("embeddingDupPairs auto sizing survives a tiny corpus") {
    val emb = (0L until 6L).map(i =>
        (i, Seq.tabulate(4)(d => math.sin(i * 5.0 + d))))
      .toDF("vec_id", "embedding")
    // defaults: planes/tables derived from count(6) and threshold — must
    // run, emit only (a < b) pairs, and never throw on the small corpus
    val pairs = Dedup.embeddingDupPairs(emb, threshold = 0.99)
      .select($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(pairs.forall(p => p._1 < p._2))
  }

  test("round-11b operators survive empty and degenerate inputs") {
    import graft.operators.{Multimodal, Sketches}
    val emptyKeys = Seq.empty[(String, String)].toDF("grp", "k")
    // sketches: empty corpus → empty sketch tables; probing an EMPTY
    // filter answers false (absent word rows = no bits), never errors
    assert(Sketches.bloomBits(emptyKeys, $"k").count() == 0)
    val probeEmpty = Sketches.bloomProbe(
        Sketches.bloomBits(emptyKeys, $"k"), Seq("x").toDF("k"), $"k")
      .as[(String, Boolean)].collect()
    assert(probeEmpty.toSeq == Seq(("x", false)))
    // fingerprint pairing: empty and single-row inputs yield no pairs
    assert(Dedup.fingerprintDupPairs(
      Seq.empty[(Long, Long)].toDF("doc_id", "sh")).count() == 0)
    assert(Dedup.fingerprintDupPairs(
      Seq((1L, 42L)).toDF("doc_id", "sh")).count() == 0)
    // JL: empty corpus projects to empty; top-k over an empty corpus is empty
    val emptyEmb = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.jlProject(emptyEmb, 4, 2).count() == 0)
    assert(Similarity.jlTopK(emptyEmb, emptyEmb, k = 3, cand = 10,
      inDim = 4, outDim = 2).count() == 0)
    // media hashing: empty media tables, null payloads
    val nullPayload = Seq((1L, null: Array[Byte])).toDF("media_id", "payload")
    assert(Multimodal.imageAHash(nullPayload)
      .as[(Long, Int, Int, Long)].head() == ((1L, 0, 0, 0L)))
    assert(Multimodal.audioEnergyHash(nullPayload)
      .as[(Long, Int, Long)].head() == ((1L, 0, 0L)))
    // HITS: empty edge set → empty result, no division, no throw
    assert(graft.operators.Graph.hitsFixedPoint(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst"), iters = 2).count() == 0)
    // k-means curve: corpus smaller than nCells still yields a full grid
    // over the seeded cells that exist
    val tiny = (0L until 3L).map(i =>
        (i, Seq.tabulate(4)(d => math.cos(i * 3.0 + d))))
      .toDF("vec_id", "embedding")
    val curve = Similarity.kmeansTrainingCurve(tiny, nCells = 8, rounds = 2)
      .as[(Int, Int, Long, Long)].collect()
    assert(curve.map(_._1).toSet == Set(1, 2) &&
      curve.filter(_._1 == 1).map(_._3).sum == 3)
  }

  test("round-11d operators survive empty corpora") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_r11d").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.read.parquet(s"$sf0001/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    spark.read.parquet(s"$sf0001/embeddings.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    def rows(q: String): Long = SparkEntry.allDefs(q).fn(spark, dir).count()
    // per-group rollups of nothing are empty, not errors
    for (q <- Seq("tx48_ngram_novelty", "dd18_containment_dedup",
        "dd19_dup_provenance", "ev37_cuped", "ev38_kanonymity",
        "ev39_attribution", "ev42_path_analysis", "ev43_conversion_latency",
        "ann19_retrieval_metrics", "ann20_centroid_drift",
        "mm12_media_dup_clusters"))
      assert(rows(q) == 0L, s"$q on an empty corpus must be empty")
    // the datasheet of nothing is one all-zero row (global aggregate)
    val sheet = SparkEntry.allDefs("tx52_corpus_datasheet").fn(spark, dir).collect()
    assert(sheet.length == 1 && sheet.head.getLong(0) == 0L)
  }

  test("sx05/st35 sample quantiles survive empty and single-row corpora") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_sx05").toString
    spark.read.parquet(s"$sf0001/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // per-group sketches of nothing are empty, not errors — on BOTH the
    // batch build and the streaming Aggregator path
    assert(SparkEntry.allDefs("sx05_sample_quantiles").fn(spark, dir).count() == 0L)
    assert(SparkEntry.allDefs("st35_stream_sample_quantiles").fn(spark, dir).count() == 0L)
    // one row: every quantile IS that row (rank formula floor case n=1)
    val one = java.nio.file.Files.createTempDirectory("graft_one_sx05").toString
    spark.read.parquet(s"$sf0001/events.parquet")
      .where(col("value").isNotNull).limit(1)
      .write.mode("overwrite").parquet(s"$one/events.parquet")
    val r = SparkEntry.allDefs("sx05_sample_quantiles").fn(spark, one).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L)
    assert(Set(2, 3, 4, 5, 6, 7).map(r.head.getLong).size == 1,
      "all six quantile columns must equal the single row's value")
  }

  test("round-4 operators survive empty inputs") {
    import graft.operators.{FuzzyJoin, IncrementalAgg, Merge}
    assert(Dedup.dedupSpans(emptyDocs).count() == 0)
    assert(FuzzyJoin.editDistance1Pairs(emptyDocs, "doc_id", "text").count() == 0)
    val emptyState = IncrementalAgg.partial(emptyDocs, Seq("doc_id"), "doc_id")
    assert(IncrementalAgg.merge(Seq("doc_id"), emptyState, emptyState).count() == 0)
    // empty base + inserts = the inserts; empty feed handled in MergeSpec
    val ins = Seq((1L, "I", "x")).toDF("doc_id", "op", "text")
    val r = Merge.upsert(emptyDocs, ins, Seq("doc_id"))
      .as[(Long, String)].collect().toSeq
    assert(r == Seq((1L, "x")))
  }

  test("sketch operators survive empty and degenerate corpora") {
    import graft.operators.Sketches
    // empty input: every sketch is the empty table, estimators don't throw
    val e = emptyDocs.select($"text".as("k"))
    assert(Sketches.hllRegisters(emptyDocs.withColumn("g", $"text"),
      $"g", Seq("doc_id")).count() == 0)
    assert(Sketches.hllEstimate(
      Sketches.hllRegisters(e, $"k", Seq("k")), Seq("k")).count() == 0)
    assert(Sketches.cmsSketch(e, $"k").count() == 0)
    assert(Sketches.cmsLookup(Sketches.cmsSketch(e, $"k"), e, $"k").count() == 0)
    val emptyKmv = Sketches.kmvSketch(e, $"k", "k")
    assert(emptyKmv.count() == 0)
    assert(Sketches.kmvOverlap(emptyKmv, "k").count() == 0)
    // single group: overlap has no pairs, registers/cells still build
    val one = Seq(("g", "a"), ("g", "b")).toDF("grp", "k")
    assert(Sketches.kmvOverlap(Sketches.kmvSketch(one, $"k", "grp"), "grp")
      .count() == 0)
    assert(Sketches.hllRegisters(one, $"k", Seq("grp")).count() == 2)
    // null keys: hash of NULL is NULL → rows drop out of every sketch
    // instead of poisoning a register/cell (callers coalesce when a null
    // key should count, the st26/dedupSpans convention)
    val nulls = Seq((1L, null: String), (2L, "x")).toDF("doc_id", "k")
    assert(Sketches.hllRegisters(nulls, $"k", Seq("doc_id")).count() == 1)
    assert(Sketches.cmsSketch(nulls, $"k").agg(sum($"cnt")).head().getLong(0) == 4)
  }

  test("tx43 repetition: spam is cut, prose is kept, short docs pass") {
    // "spam spam ... spam" x 40: every 2-gram is the same gram ->
    // dup2 = (39-1)/39, top2 = 39/39 -> keep = 0; a distinct-token doc
    // repeats nothing -> keep = 1; a 1-token doc has no grams -> all
    // fractions 0, keep = 1 (the declared short-doc contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_tx43").toString
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
    base.limit(3).withColumn("text",
        when(col("doc_id") === base.limit(3).collect()(0).getLong(0),
          lit(Seq.fill(40)("spam").mkString(" ")))
          .when(col("doc_id") === base.limit(3).collect()(1).getLong(0),
            lit("one two three four five six seven eight"))
          .otherwise(lit("solo")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("tx43_repetition_score")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5)))
    val fp = 1L << 20
    val spam = rows.find(_._1 == 40L).get
    assert(spam._2 == fp * 38 / 39 && spam._3 == fp && spam._4 == 0L,
      s"spam doc must be cut: $spam")
    assert(rows.find(_._1 == 8L).get == ((8L, 0L, fp / 7, 1L)),
      "distinct prose repeats nothing (top2 = 1/7) and is kept")
    assert(rows.find(_._1 == 1L).get == ((1L, 0L, 0L, 1L)),
      "a gramless doc scores zero everywhere and is kept")
  }
}
