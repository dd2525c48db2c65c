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

  /** Deterministic seed centroids: the embeddings of the first `nCells`
    * corpus ids, numbered 1..nCells.
    */
  def seedCentroids(
      corpus: DataFrame,
      nCells: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    corpus.orderBy(col(idCol)).limit(nCells)
      .select(row_number().over(Window.orderBy(col(idCol))).as("cell"),
        col(vecCol).cast("array<double>").as("mv"))

  /** Fixed-point quantization scale for k-means sums: 2²⁰ ticks per unit.
    * Integer sums are associative and commutative EXACTLY, so the per-cell
    * mean is independent of partition order / parallelism — the property
    * that makes trained centroids reproducible across engines and runs
    * (floating-point Σ would differ by summation order). floor(x·Q + 0.5)
    * (round-half-up) rather than round(): both engines define floor
    * identically on doubles, while round() ties differ cross-engine.
    */
  final val KmeansQuantScale = 1L << 20

  /** Deterministic Lloyd's k-means over cosine similarity, seeded from
    * [[seedCentroids]]: each round assigns every corpus vector to its
    * nearest centroid (ties to the lowest cell) and recomputes each cell's
    * centroid as the element-wise mean via quantized integer sums (see
    * [[KmeansQuantScale]]); empty cells keep their previous centroid.
    *
    * Scale shape per round: centroids broadcast; assignment is map-side;
    * the mean is one (cell, dim)-keyed hash aggregate — partial map-side,
    * 64·nCells final rows. The new centroid table (nCells rows — model
    * parameters, not data) is collected to the driver and re-literalized,
    * which truncates lineage without checkpoint machinery; at 100 TB run
    * the rounds on a deterministic sample (e.g. [[graft.functions
    * .TextFunctions.fingerprint64]]-mod sampling) and train offline.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      nCells: Int,
      rounds: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
    var cent = seedCentroids(corpus, nCells, idCol, vecCol)
    for (_ <- 1 to rounds) {
      val wc = Window.partitionBy(col("vid")).orderBy(col("cos_c").desc, col("cell"))
      val assigned = c.join(broadcast(cent))
        .select(col("vid"), col("v"), col("cell"), cosine(col("v"), col("mv")).as("cos_c"))
        .withColumn("rn", row_number().over(wc)).where(col("rn") === 1)
        .select(col("cell"), col("v"))
      val sums = assigned
        .select(col("cell"), posexplode(col("v")))
        .select(col("cell"), col("pos").as("dim"),
          floor(col("col") * lit(KmeansQuantScale.toDouble) + lit(0.5)).cast("long").as("q"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      val trained = sums
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("dim"),
          (col("s").cast("double") / col("n").cast("double") /
            lit(KmeansQuantScale.toDouble)).as("m")))).as("dm"))
        .select(col("cell"), transform(col("dm"), x => x.getField("m")).as("mv"))
      val next = cent.as("c0").join(trained.as("t"), Seq("cell"), "left")
        .select(col("cell"), coalesce(col("t.mv"), col("c0.mv")).as("mv"))
      // nCells rows of model parameters — re-literalize to cut lineage
      val rows = next.collect().toSeq
      cent = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), next.schema)
    }
    cent
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCells` Voronoi cells around centroids, then search each query only
    * in the `nProbe` cells whose centroids are nearest to it, rescoring
    * candidates with exact cosine.
    *
    * Centroids, in preference order: `centroids` (an offline-trained table
    * (cell, mv: array<double>) — the production path at 100 TB: train on a
    * sample, broadcast the result), else `trainRounds` > 0 deterministic
    * k-means rounds ([[kmeansCentroids]]), else the first-`nCells` seed
    * embeddings ([[seedCentroids]]). Plan shape: the centroid table
    * broadcasts twice (cell assignment for corpus and queries); the corpus
    * shuffles ONCE on cell id; candidate generation is an equi-join on
    * cell id — no corpus × query product.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      trainRounds: Int = 0,
      centroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val centroidTable = centroids.getOrElse(
      if (trainRounds > 0) kmeansCentroids(corpus, nCells, trainRounds, idCol, vecCol)
      else seedCentroids(corpus, nCells, idCol, vecCol))
    // nearest centroid per corpus vector (cell assignment)
    val wc = Window.partitionBy(col("neighbor_id")).orderBy(col("cos_c").desc, col("cell"))
    val assigned = c.join(broadcast(centroidTable))
      .select(col("neighbor_id"), col("cv"), col("cell"), cosine(col("cv"), col("mv")).as("cos_c"))
      .withColumn("rn", row_number().over(wc)).where(col("rn") === 1)
      .select(col("neighbor_id"), col("cv"), col("cell"))
    // nProbe nearest cells per query
    val wq = Window.partitionBy(col("query_id")).orderBy(col("cos_q").desc, col("cell"))
    val probes = q.join(broadcast(centroidTable))
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
