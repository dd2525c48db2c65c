package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Deduplication operators for large-scale training-data pipelines: exact,
  * n-gram Jaccard (inverted index), MinHash+LSH, SimHash. No reference
  * counterpart (the reference's only dedup is groupBy-key uniqueness,
  * SURVEY §2 O17) — designed Spark-first for the 100 TB case: every
  * variant is a bounded number of hash shuffles, no cartesian products.
  */
object Dedup {

  /** Exact dedup: keep the lowest id per identical text. One hash shuffle
    * on the text (or better, on a 64-bit hash of it — at 100 TB shuffle
    * `xxhash64(text)` instead of the full payload and resolve collisions
    * with a secondary compare; here the direct groupBy is exact and the
    * planner shuffles only (text, id)).
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct whitespace tokens per doc, with a document-frequency cap.
    * The DF cap (`maxDf`) is prefix-filtering for the inverted-index join:
    * ubiquitous tokens (Zipf head — the same skew the reference's log-scale
    * partitioner fought, `MasterNode.java:154-164`) would create quadratic
    * candidate pairs; dropping them bounds per-token fan-out.
    */
  def tokenPostings(docs: DataFrame, idCol: String, textCol: String, maxDf: Long): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokenize(lower(col(textCol))))).as("tok"))
      .where(length(col("tok")) > 0)
    val dfCounts = tok.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tok.join(dfCounts.where(col("df") <= maxDf), "tok")
  }

  /** Exact token-set Jaccard near-dup pairs via inverted-index self-join:
    * explode distinct tokens → join on token → per-pair intersection count
    * → Jaccard from per-doc set sizes. Shuffles: tokenize (1), DF count
    * (1), pair count (1) — all key-hash shuffles, linear in postings.
    */
  def jaccardPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      maxDf: Long = 1000000L): DataFrame = {
    val post = tokenPostings(docs, idCol, textCol, maxDf).select(col("doc_id"), col("tok"))
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    val pairs = post.as("a")
      .join(post.as("b"), col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.select(col("doc_id").as("id_a"), col("n_tok").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_tok").as("nb")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"), col("jaccard"))
  }

  /** MinHash signatures over distinct tokens: `sig[i] = min_t xxhash64(i, t)`
    * — k independent permutations approximated by seeding Spark's codegen'd
    * `xxhash64` with the band index. All array ops; no UDFs, no shuffle
    * (per-row computation).
    */
  def minhashSignature(textCol: Column, k: Int): Column = {
    val toks = array_distinct(TextFunctions.tokenize(lower(textCol)))
    array((0 until k).map(i =>
      array_min(transform(toks, t => xxhash64(lit(i), t)))): _*)
  }

  /** LSH banding: signature (length k = bands*rowsPerBand) → one bucket key
    * per band (`xxhash64` of the band slice). Docs sharing any bucket are
    * candidates. Returns (doc_id, band, bucket).
    */
  def lshBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    docs
      .select(col(idCol).as("doc_id"),
        minhashSignature(col(textCol), k).as("sig"))
      .select(col("doc_id"), posexplode(array((0 until bands).map(b =>
        xxhash64(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)
          .cast("array<string>").cast("string"), lit(b))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")
  }

  /** MinHash+LSH near-dup candidate pairs, verified with exact token-set
    * Jaccard (so LSH is purely a recall/cost knob; emitted pairs are true
    * near-dups). Shuffles: signatures are map-side; bucket self-join is one
    * hash shuffle on (band, bucket); verification joins the (small)
    * candidate set back to token postings.
    */
  def minhashDupPairs(
      docs: DataFrame,
      threshold: Double,
      idCol: String = "doc_id",
      textCol: String = "text",
      bands: Int = 16,
      rowsPerBand: Int = 4): DataFrame = {
    val b = lshBuckets(docs, idCol, textCol, bands, rowsPerBand)
    val candidates = b.as("x")
      .join(b.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val post  = tokenPostings(docs, idCol, textCol, Long.MaxValue).select(col("doc_id"), col("tok"))
    val sizes = post.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tok"))
    candidates
      .join(post.select(col("doc_id").as("id_a"), col("tok")), "id_a")
      .join(post.select(col("doc_id").as("id_b"), col("tok").as("tok_b")), "id_b")
      .where(col("tok") === col("tok_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.select(col("doc_id").as("id_a"), col("n_tok").as("na")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("n_tok").as("nb")), "id_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na") + col("nb") - col("n_common")).cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash from per-token xxhash64: bit b of the fingerprint is
    * the sign of Σ_tokens (±1 by token-hash bit b). Pure array expressions.
    */
  def simhash64(textCol: Column): Column = {
    val hashes = transform(
      array_distinct(TextFunctions.tokenize(lower(textCol))),
      t => xxhash64(t))
    // bit b of the fingerprint = sign of Σ ±1; fold MSB→LSB as acc*2+bit
    // (top-bit wrap is intended two's-complement behavior; ANSI off).
    val bitSums = array((63 to 0 by -1).map(b =>
      aggregate(hashes, lit(0L),
        (acc, h) => acc +
          when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))): _*)
    aggregate(bitSums, lit(0L),
      (acc, s) => acc * lit(2L) + when(s > 0, 1L).otherwise(0L))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming (≤ 3 by
    * default): pigeonhole blocking on 4×16-bit chunks (any pair within
    * distance 3 shares at least one exact chunk) → equi-join per chunk →
    * exact `bit_count(xor)` verify. One shuffle per chunk key; no cartesian.
    */
  def simhashDupPairs(
      docs: DataFrame,
      maxHamming: Int = 3,
      idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), simhash64(col(textCol)).as("sh"))
    val chunked = sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sh"), c * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ckey")
    chunked.as("x")
      .join(chunked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs: exact cosine over all pairs — correctness
    * baseline; the scale path replaces the self-join with
    * [[Similarity.lshCandidatePairs]] blocking.
    */
  def embeddingDupPairs(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
    e.as("a").join(e.as("b"), col("a.vid") < col("b.vid"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
      .where(col("cos") >= threshold)
  }
}
