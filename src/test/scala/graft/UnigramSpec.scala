package graft

import org.apache.spark.sql.functions._
import graft.queries.TextQueries.Unigram

/** Unigram-LM (SentencePiece) trainer internals — tx35/tx36.
  *
  * The cross-engine gate (tx35/tx36 vs the DuckDB oracle) pins the full
  * chain end-to-end; these tests pin the properties a hash match alone
  * would not localize: Viterbi path validity, the shortest-piece
  * tie-break, the fixed-point log2 contract, and partitioning
  * invariance of the E-step.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def wordsDf(ws: (String, Long)*) =
    ws.toSeq.toDF("w", "freq").withColumn("n", length(col("w")).cast("long"))

  private def modelOf(pcs: (String, Long)*) =
    Unigram.stageOf(pcs.toSeq.toDF("piece", "cost"))

  test("viterbi pieces concatenate back to the word; best = path cost") {
    val words = wordsDf("hello" -> 10L, "hell" -> 5L, "lolo" -> 7L)
    val seed = Unigram.seed(words)
    val stage = Unigram.seedStage(seed)
    val costMap = Unigram.stageTable(stage).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val rows = Unigram.estep(words, stage)
      .select("w", "best", "pieces").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (w, best, pieces) =
        (r.getString(0), r.getLong(1), r.getSeq[String](2))
      assert(pieces.mkString == w, s"segmentation of $w must cover it")
      assert(pieces.map(costMap).sum == best,
        s"best($w) must equal the sum of its pieces' costs")
    }
  }

  test("cost ties break to the SHORTEST piece at each position") {
    // 'a'+'b' and 'ab' tie at 20: the smallest-j rule must pick a|b
    val m = modelOf("a" -> 10L, "b" -> 10L, "ab" -> 20L)
    val e = Unigram.estep(wordsDf("ab" -> 1L), m)
      .select("best", "pieces").collect().head
    assert(e.getLong(0) == 20L)
    assert(e.getSeq[String](1) == Seq("a", "b"))
    // break the tie in favor of the multi: it must now win
    val m2 = modelOf("a" -> 10L, "b" -> 10L, "ab" -> 19L)
    val e2 = Unigram.estep(wordsDf("ab" -> 1L), m2)
      .select("best", "pieces").collect().head
    assert(e2.getLong(0) == 19L && e2.getSeq[String](1) == Seq("ab"))
  }

  test("substrings missing from the model never beat seeded singles") {
    // only singles in the model: every word falls back to characters
    val m = modelOf("x" -> 7L, "y" -> 9L)
    val e = Unigram.estep(wordsDf("xyx" -> 3L), m)
      .select("best", "pieces").collect().head
    assert(e.getSeq[String](1) == Seq("x", "y", "x") && e.getLong(0) == 23L)
  }

  test("E-step counts are invariant to input partitioning") {
    val words = wordsDf(("abab", 4L), ("baba", 3L), ("aabb", 2L), ("bb", 9L))
    val stage = Unigram.seedStage(Unigram.seed(words))
    def cnts(in: org.apache.spark.sql.DataFrame) =
      Unigram.counts(Unigram.estep(in, stage))
        .orderBy("piece").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(cnts(words.repartition(7)) == cnts(words.coalesce(1)))
  }

  test("l2fp is monotonic and within 0.09 bits of true log2") {
    val got = spark.range(1, 4097)
      .select(col("id"), expr(Unigram.l2fp("id")).as("l2"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    var prev = Long.MinValue
    got.foreach { case (x, l2) =>
      assert(l2 >= prev, s"l2fp must be monotonic at $x")
      prev = l2
      val err = math.abs(l2.toDouble / Unigram.Fp - math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.09, s"l2fp($x) off by $err bits")
    }
    assert(got.head._2 == 0L) // l2fp(1) = 0 exactly
    // the wide-input guard: above 2^43 the naive x*2^20 would overflow
    // Long (review finding r9) — the pre-shifted form must stay finite,
    // accurate, and monotonic out to corpus-total magnitudes
    val wide = spark.range(0, 60)
      .select(expr("shiftleft(cast(1 as bigint), cast(id as int)) + id * 7").as("x"))
      .select(col("x"), expr(Unigram.l2fp("x")).as("l2"))
      .orderBy("x").collect().map(r => (r.getLong(0), r.getLong(1)))
    var prevW = Long.MinValue
    wide.foreach { case (x, l2) =>
      assert(l2 >= prevW, s"wide l2fp must be monotonic at $x"); prevW = l2
      val err = math.abs(l2.toDouble / Unigram.Fp - math.log(x.toDouble) / math.log(2.0))
      assert(err <= 0.09, s"wide l2fp($x) off by $err bits")
    }
  }

  test("the model crosses to the vocabulary as a broadcast, not a shuffle") {
    val words = wordsDf("hello" -> 10L)
    val plan = Unigram.estep(words, Unigram.seedStage(Unigram.seed(words)))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "one-row model must broadcast to the vocab")
  }

  test("tx39 Kneser-Ney fixed-point terms match the hand computation") {
    // corpus: doc A = "a b a b" (bigrams: a·b ×2, b·a), doc B = "c b".
    // c12: (a b)=2,(b a)=1,(c b)=1; c1: a=2,b=1,c=1; N1+(·b)=2, N1+(·a)=1;
    // |bigrams|=3, D=3/4, fp=2^20:
    //   p(a b) = 5fp/8 + floor(0.375fp·floor(2fp/3)/fp) = 655360+262143
    //   p(b a) = fp/4 + floor(0.75fp·floor(fp/3)/fp)    = 262144+262143
    //   p(c b) = fp/4 + floor(0.75fp·floor(2fp/3)/fp)   = 262144+524287
    val dir = java.nio.file.Files.createTempDirectory("graft_kn").toString
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .orderBy("doc_id").limit(2).collect()
    val docs = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row.fromSeq(base(0).toSeq),
        org.apache.spark.sql.Row.fromSeq(base(1).toSeq))),
      spark.read.parquet(s"$sf0001/documents.parquet").schema)
    import org.apache.spark.sql.functions._
    docs.withColumn("text",
        when(col("doc_id") === base(0).getLong(0), lit("a b a b"))
          .otherwise(lit("c b")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("tx39_kneser_ney_score")(spark, dir)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val pAB = 655360L + 262143L
    val pBA = 262144L + 262143L
    val pCB = 262144L + 524287L
    assert(got.toSeq == Seq(
      (3L, (2 * pAB + pBA) / 3),
      (1L, pCB)), got.toSeq.toString)
  }

  test("tx38 temperature sampling flattens shares monotonically (α = 0.3)") {
    val rows = SparkEntry.queries("tx38_temperature_mix")(spark, sf0001)
      .select("lang", "n_tokens", "raw_ppm", "share_ppm").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length >= 2)
    val mean = 1000000L / rows.length
    rows.foreach { case (lang, _, raw, share) =>
      // α < 1 pulls every share toward uniform: above-mean shrink,
      // below-mean grow (never crossing to the other side of raw)
      if (raw > mean) assert(share < raw, s"$lang above-mean must shrink")
      if (raw < mean) assert(share > raw, s"$lang below-mean must grow")
    }
    // the fixed-point pow is monotonic: size order is preserved
    val bySize = rows.sortBy(_._2).map(_._1).toSeq
    val byShare = rows.sortBy(_._4).map(_._1).toSeq
    assert(bySize == byShare, "α-weighting must preserve the size ordering")
  }

  test("tx37 scores every document; OOV accounting and fixed-point mean are consistent") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").count()
    val rows = SparkEntry.queries("tx37_unigram_score")(spark, sf0001).collect()
    assert(rows.length == docs, "one score row per document")
    rows.foreach { r =>
      val (nPre, nOov, nPieces, cost, mean) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nOov >= 0 && nOov <= nPre)
      assert(nPieces >= 0 && cost >= 0)
      assert(mean == cost / math.max(nPieces, 1L), "fixed-point mean")
      // an in-vocab pretoken yields at least one piece
      if (nOov < nPre) assert(nPieces >= nPre - nOov)
    }
    // the model scored the bulk of the corpus, not a sliver
    val scored = rows.map(r => r.getLong(1) - r.getLong(2)).sum.toDouble
    val total = rows.map(_.getLong(1)).sum.toDouble
    assert(scored / total > 0.5, s"only ${scored / total} of pretokens in-vocab")
  }

  test("tx35/tx36 end-to-end on sf0.001: stages complete, EM objective falls") {
    val train = SparkEntry.queries("tx35_unigram_train")(spark, sf0001).collect()
    assert(train.length == 45) // 15 pieces x 3 stages
    assert(train.map(_.getString(0)).toSet == Set("seed", "em1", "em2"))
    val curve = SparkEntry.queries("tx36_unigram_encode")(spark, sf0001)
      .orderBy("round").collect()
    assert(curve.length == 3)
    val costs = curve.map(_.getLong(4))
    assert(costs(0) >= costs(1) && costs(1) >= costs(2),
      "hard-EM total path cost must not increase across rounds")
    // every stage's token count conserves: same corpus, same words
    assert(curve.map(_.getLong(1)).distinct.length == 1)
    assert(curve.map(_.getLong(2)).distinct.length == 1)
  }
}
