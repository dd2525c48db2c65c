package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.queries.TextQueries

/** Trained quality classifier — tx40.
  *
  * The cross-engine gate (tx40 vs the DuckDB CTE tower) pins the full
  * fixed-point GD chain bit-for-bit; these tests pin the properties a
  * hash match alone would not localize: that the student actually
  * LEARNS (accuracy beats the majority class by a wide margin — a
  * weight-update bug that froze w at 0 would still hash-match a
  * mirrored bug), score/keep internal consistency, determinism across
  * invocations, and the truncation-toward-zero division contract the
  * judged negative-numerator divisions (standardize / margin /
  * gradient / update) rely on.
  */
class ClassifierSpec extends SparkSpec {

  private val Fp = TextQueries.LogReg.Fp

  private lazy val out =
    TextQueries.defs("tx40_quality_classifier").fn(spark, sf0001).collect()

  test("student beats the majority class by >= 25 points") {
    val n = out.length.toDouble
    val pos = out.count(_.getLong(1) == 1L) / n
    val majority = math.max(pos, 1 - pos)
    val acc = out.count(r => r.getLong(1) == r.getLong(3)) / n
    assert(n >= 100, "fixture must be non-trivial")
    assert(acc >= majority + 0.25,
      s"acc=$acc must clear majority=$majority by >= 0.25 — GD learned nothing")
    assert(acc >= 0.9, s"acc=$acc below the 0.9 floor this corpus supports")
  }

  test("scores live in [0, 2^20] and keep == (score >= 2^19)") {
    out.foreach { r =>
      val (score, keep) = (r.getLong(2), r.getLong(3))
      assert(score >= 0 && score <= Fp, s"score $score out of range")
      assert(keep == (if (score >= Fp / 2) 1L else 0L))
    }
  }

  test("training is deterministic across invocations") {
    val again =
      TextQueries.defs("tx40_quality_classifier").fn(spark, sf0001).collect()
    assert(out.toSeq == again.toSeq)
  }

  test("st24 stream scoring is bit-identical to the batch tx40 output") {
    // train-offline / serve-online parity: the streaming ingest path
    // (row-local features + two 1-row stream-static broadcast joins,
    // zero streaming state) must reproduce the batch scorer exactly
    val streamed = graft.queries.StreamQueries
      .defs("st24_stream_quality_score").fn(spark, sf0001).collect()
    assert(streamed.toSeq == out.toSeq)
  }

  test("features lowercase before tokenizing (the oracle/teacher convention)") {
    // review finding r10: without lower(), an uppercase doc undercounts
    // na (tokens matching [a-z]) and ns (lowercase gopherStops hits) on
    // the Spark side only — latent on the all-lowercase fixtures, a
    // cross-engine divergence on real text. Pin with a mixed-case doc.
    import spark.implicits._
    val docs = Seq((1L, "The Data AND THE Table")).toDF("doc_id", "text")
    val r = TextQueries.logRegRaw(docs)
      .selectExpr("r4", "r5").head()
    // lowercased tokens: the, data, and, the, table — every token then
    // contains [a-z] (alpha fraction r4 = 2^20 exactly) and the distinct
    // stopword hits are {the, and} (r5 = 2·2^20/4). Without lower(),
    // AND/THE match neither [a-z] nor the stopword list: r4 = 3·2^20/5,
    // r5 = 0.
    assert(r.getLong(0) == Fp, s"r4=${r.getLong(0)} — uppercase tokens must count after lower()")
    assert(r.getLong(1) == Fp / 2, s"r5=${r.getLong(1)} — THE/AND must hit the stopword list")
  }

  test("NULL text is an empty doc: tx40 features zero, tx41 packs 1 EOS") {
    // advisor finding r10: unguarded tokenize(col("text")) diverges from
    // the oracle on NULL text (Spark's legacy size(NULL) = -1 vs DuckDB
    // len(NULL) = NULL — divergent raw features shift the trained
    // weights; in tx41 the doc stayed in the stream with len=0 while the
    // oracle dropped it). The coalesce-to-empty convention makes a NULL
    // doc an EMPTY doc in both engines: every feature 0, and exactly one
    // EOS position in the packed stream.
    import spark.implicits._
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "alpha beta"))
      .toDF("doc_id", "text")
    val r = TextQueries.logRegRaw(docs).orderBy("doc_id").collect()
    assert(r.length == 2)
    (1 to 5).foreach(i => assert(r(0).getLong(i) == 0L,
      s"null-text doc must have y=r2..r5=0, got ${r(0)}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_null_doc").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val wins = TextQueries.defs("tx41_sequence_packing").fn(spark, dir).collect()
    // stream = [EOS] ++ [alpha, beta, EOS] = 4 positions, one window
    assert(wins.length == 1)
    assert(wins(0).getLong(1) == 2L, "both docs cover window 0")
    assert(wins(0).getLong(2) == 2L, "both docs start in window 0")
    assert(wins(0).getLong(3) == 4L, "null doc contributes exactly 1 EOS")
  }

  test("tx42 curation: per-source counts cover exactly tx40's keep set") {
    val cur = TextQueries.defs("tx42_classifier_curation").fn(spark, sf0001)
      .collect()
    // composition contract: tx42's n_docs column partitions tx40's
    // keep=1 set by source — nothing dropped, nothing double-counted
    assert(cur.map(_.getLong(1)).sum == out.count(_.getLong(3) == 1L))
    // temperature shares are ppm fractions of 1: truncation loses < 1
    // ppm per source, so the sum lands in (1e6 - |sources|, 1e6]
    val share = cur.map(_.getLong(4)).sum
    assert(share <= 1000000L && share > 1000000L - cur.length,
      s"share_ppm sum $share must be 1e6 minus truncation")
    // raw vs tempered: α = 0.3 compresses the mix toward uniform, so the
    // largest source's tempered share must not exceed its raw share
    val top = cur.maxBy(_.getLong(2))
    assert(top.getLong(4) <= top.getLong(3),
      s"temperature must downweight the largest source: $top")
  }

  test("tx44 composition: yield bounded by each filter stage's keep set") {
    val rows = TextQueries.defs("tx44_modern_pipeline").fn(spark, sf0001)
      .collect()
    val nOut = rows.map(_.getLong(1)).sum
    val clsKeeps = out.count(_.getLong(3) == 1L)
    val repKeeps = TextQueries.defs("tx43_repetition_score").fn(spark, sf0001)
      .where(col("keep") === 1).count()
    assert(nOut > 0, "the composed pipeline must keep something on sf0.001")
    assert(nOut <= clsKeeps, s"$nOut docs out > $clsKeeps classifier keeps")
    assert(nOut <= repKeeps, s"$nOut docs out > $repKeeps repetition keeps")
    // chars shrink or hold under span dedup, never grow
    rows.foreach(r => assert(r.getLong(3) >= 0 && r.getLong(2) >= 0))
  }

  test("empty corpus: trains w=0 and scores nothing, no division by zero") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty_lr").toString
    spark.read.parquet(s"$sf0001/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(TextQueries.defs("tx40_quality_classifier").fn(spark, dir).count() == 0)
    // packing nothing emits no windows (and no division/sequence errors)
    assert(TextQueries.defs("tx41_sequence_packing").fn(spark, dir).count() == 0)
    // curating nothing reports no sources — the mixture tower's
    // greatest(·,1) divide guards hold (an empty per-source rollup must
    // not reach a 0/0, and the temperature crossJoins stay 0-row)
    assert(TextQueries.defs("tx42_classifier_curation").fn(spark, dir).count() == 0)
  }

  test("tx41 packing: exact fill, zero padding, stream total conserved") {
    val wins = TextQueries.defs("tx41_sequence_packing").fn(spark, sf0001).collect()
    val C = 512L
    // every window but the last is EXACTLY full (packing = no padding);
    // window ids are the contiguous prefix; token totals conserve the
    // concatenated stream length (Σ len = Σ per-window fill)
    assert(wins.nonEmpty)
    wins.init.foreach(r => assert(r.getLong(3) == C,
      s"window ${r.getLong(0)} fill=${r.getLong(3)} — interior windows must be full"))
    assert(wins.last.getLong(3) <= C && wins.last.getLong(3) > 0)
    assert(wins.map(_.getLong(0)).toSeq == wins.indices.map(_.toLong))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val toks = filter(TextFunctions.tokenize(lower(col("text"))), t => length(t) > 0)
    val total = docs.select(sum(size(toks).cast("long") + 1L)).head().getLong(0)
    assert(wins.map(_.getLong(3)).sum == total, "stream length must be conserved")
    // n_starts over all windows = number of documents
    assert(wins.map(_.getLong(2)).sum == docs.count())
  }

  test("Spark div truncates toward zero (the oracle's // contract)") {
    // The standardize / margin / gradient / update divisions all see
    // negative numerators; the hash gate holds only because Spark `div`
    // and DuckDB `//` BOTH truncate toward zero (not floor). Pin the
    // Spark half here; the DuckDB half is pinned by the gate itself.
    val r = spark.range(1)
      .select(expr("cast(-7 div 2 as bigint)").as("a"),
        expr("cast(7 div -2 as bigint)").as("b"),
        expr("cast(-7 % 2 as bigint)").as("c"))
      .head()
    assert(r.getLong(0) == -3L && r.getLong(1) == -3L && r.getLong(2) == -1L)
  }
}
