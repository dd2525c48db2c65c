package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`) — no
  * reference counterpart; built Spark-first:
  *
  *  - dot / norm / cosine as `zip_with` + `aggregate` folds (codegen'd
  *    higher-order functions; computed in DOUBLE, left-to-right, so results
  *    are deterministic and engine-portable),
  *  - brute-force top-k as broadcast(queries) ⋈ corpus + per-query top-k —
  *    the exact baseline, linear in corpus size, no corpus shuffle,
  *  - random-hyperplane LSH bucketing as the approximate scale path
  *    (candidates share a bucket; one hash shuffle, no cartesian).
  */
object Similarity {

  /** Left-fold dot product in double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm2(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))

  /** Cosine similarity as one native codegen'd loop
    * ([[graft.functions.CosineSim]]) — same left-to-right fold (and thus
    * bit-identical doubles) as the `zip_with`+`aggregate` formulation and
    * DuckDB's `list_cosine_similarity`, but ~2 ops/dim instead of
    * interpreted lambda dispatch; matters on the O(pairs) rescore paths.
    */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorExprs.cosineSim(a, b)

  /** Exact top-k cosine neighbors for each query row.
    *
    * Plan shape: queries (small) are broadcast; the corpus is scanned once,
    * each partition computes scores locally; ranking shuffles only
    * (query, score, id) tuples — at 100 TB the corpus never moves.
    * For very large k·|queries|, swap row_number for a per-partition
    * bounded heap (TakeOrderedAndProject does this for global top-k).
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Sign-random-projection LSH: `nPlanes` hyperplane sign bits folded into
    * one bucket id. Hyperplane components are deterministic hashes folded
    * to [-1, 1) (reproducible with no RNG state — SURVEY §5 determinism);
    * the whole bucket is one native loop ([[graft.functions.SrpBucket]]),
    * bit-identical to the per-plane `zip_with` fold it replaces.
    * `planeOffset` shifts the plane index space so multiple independent
    * tables can be derived from the same formula.
    */
  def srpBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    graft.functions.VectorExprs.srpBucket(vec, nPlanes, planeOffset)

  /** Per-row array of `nTables` SRP bucket ids (position = table index).
    * Bucket values live in [0, 2^nPlanes) for every table; the table index
    * is carried alongside (join on (table, bucket)), so identical values in
    * different tables never collide.
    */
  private[operators] def srpBucketArray(vec: Column, nPlanes: Int, nTables: Int): Column =
    array((0 until nTables).map(t =>
      srpBucket(vec, nPlanes, planeOffset = t * nPlanes)): _*)

  /** LSH candidate pairs: `nTables` independent sign-projection tables;
    * pairs sharing any (table, bucket). One hash shuffle on the bucket key,
    * carrying only (vid, bucket-array) — never the vectors. A pair that
    * collides in several tables is kept only where the FIRST colliding
    * table equals the current one (`first_eq_index`, same per-row dedup as
    * [[Dedup.minhashDupPairs]]) — no `distinct()` shuffle of the candidate
    * stream.
    */
  def lshCandidatePairs(
      emb: DataFrame,
      nPlanes: Int = 12,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val buckets = emb
      .select(col(idCol).as("vid"),
        srpBucketArray(col(vecCol).cast("array<double>"), nPlanes, nTables).as("bk"))
      .select(col("vid"), col("bk"), posexplode(col("bk")))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    buckets.as("a")
      .join(buckets.as("b"),
        col("a.table") === col("b.table") && col("a.bucket") === col("b.bucket") &&
          col("a.vid") < col("b.vid"))
      .where(graft.functions.HashExprs.firstEqIndex(col("a.bk"), col("b.bk")) === col("a.table"))
      .select(col("a.vid").as("id_a"), col("b.vid").as("id_b"))
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCells` Voronoi cells around fixed seed centroids, then search each
    * query only in the `nProbe` cells whose centroids are nearest to it,
    * rescoring candidates with exact cosine.
    *
    * Centroids are the embeddings of the first `nCells` corpus ids —
    * deterministic seeds rather than trained k-means means (no iterative
    * fitting in a pure-DataFrame pipeline; at scale you would precompute
    * centroids offline and broadcast them the same way). Plan shape: the
    * centroid table broadcasts twice (cell assignment for corpus and
    * queries); the corpus shuffles ONCE on cell id; candidate generation is
    * an equi-join on cell id — no corpus × query product.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val centroids = corpus.orderBy(col(idCol)).limit(nCells)
      .select(row_number().over(Window.orderBy(col(idCol))).as("cell"),
        col(vecCol).cast("array<double>").as("mv"))
    // nearest centroid per corpus vector (cell assignment)
    val wc = Window.partitionBy(col("neighbor_id")).orderBy(col("cos_c").desc, col("cell"))
    val assigned = c.join(broadcast(centroids))
      .select(col("neighbor_id"), col("cv"), col("cell"), cosine(col("cv"), col("mv")).as("cos_c"))
      .withColumn("rn", row_number().over(wc)).where(col("rn") === 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))
    // nProbe nearest cells per query
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cos_q").desc, col("cell"))
    val probes = q.join(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"), cosine(col("qv"), col("mv")).as("cos_q"))
      .withColumn("rn", row_number().over(wq)).where(col("rn") <= nProbe)
      .select(col("query_id"), col("qv"), col("cell"))
    // search only the probed cells; exact rescore
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    probes.join(assigned, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Approximate top-k via LSH candidates, exact-rescored with cosine.
    * Recall depends on (nPlanes, nTables); exactness of emitted scores does
    * not (candidates are rescored exactly).
    *
    * Plan shape: the (small) query side — ids, vectors, bucket arrays,
    * exploded per table — is broadcast; the corpus is scanned once, its
    * bucket explosion and the candidate join stay map-side, and
    * multi-table collisions are dropped per-row (`first_eq_index` == the
    * joined table) BEFORE rescoring, so there is no `distinct()` and no
    * corpus vector ever crosses an exchange. The only shuffle is the final
    * per-query top-k over (query_id, neighbor_id, cos) triples.
    *
    * `broadcastQueries = true` (the default) hints that shape explicitly —
    * right for the interactive case (a bounded query batch against a huge
    * corpus). A LARGE query set (queries × nTables rows, vectors included)
    * would OOM as a broadcast instead of degrading; pass
    * `broadcastQueries = false` to leave the join unhinted so AQE picks
    * broadcast vs shuffled hash join from runtime stats (the same policy
    * as the dedup verification joins).
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nPlanes: Int = 8,
      nTables: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      broadcastQueries: Boolean = true): DataFrame = {
    val qb = queries
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"),
        srpBucketArray(col(vecCol).cast("array<double>"), nPlanes, nTables).as("qbk"))
      .select(col("query_id"), col("qv"), col("qbk"), posexplode(col("qbk")))
      .withColumnRenamed("pos", "table").withColumnRenamed("col", "bucket")
    val cb = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"),
        srpBucketArray(col(vecCol).cast("array<double>"), nPlanes, nTables).as("cbk"))
      .select(col("neighbor_id"), col("cv"), col("cbk"), posexplode(col("cbk")))
      .withColumnRenamed("pos", "ctable").withColumnRenamed("col", "cbucket")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cb.join(if (broadcastQueries) broadcast(qb) else qb,
        col("table") === col("ctable") && col("bucket") === col("cbucket") &&
          col("query_id") =!= col("neighbor_id"))
      .where(graft.functions.HashExprs.firstEqIndex(col("qbk"), col("cbk")) === col("ctable"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
