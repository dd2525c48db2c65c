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
    * Plan shape: queries (small) are broadcast; the corpus is scanned
    * once, each partition computes scores locally; then the native
    * [[graft.plans.TopKPerKey]] heaps pre-select per-partition — so the
    * ranking exchange carries AT MOST partitions×|queries|×k (query,
    * score, id) triples, not one row per scored candidate. At 100 TB
    * that is the difference between shuffling |corpus|×|queries| scored
    * rows and shuffling a few thousand: the corpus never moves, and now
    * neither does the candidate stream. The row_number window that
    * assigns ranks runs AFTER the heaps, over ≤ |queries|×k survivors —
    * same (cos DESC, neighbor_id) order, bit-identical output.
    */
  /** Shared ranking epilogue for the exact-scoring family: native
    * [[graft.plans.TopKPerKey]] heaps bound the ranking exchange at
    * partitions×|queries|×k rows, then the row_number window assigns
    * ranks over the ≤|queries|×k survivors — ONE definition of the
    * (cos DESC, neighbor_id) ranking contract for [[bruteForceTopK]],
    * [[hardNegatives]] and [[labeledTopK]] (review r11d: three copies
    * could drift on the tie-break).
    */
  private def rankTopK(scored: DataFrame, k: Int, out: Seq[String]): DataFrame = {
    val pre = graft.plans.TopKPerKey.perKey(scored, Seq("query_id"),
      Seq(("cos", true), ("neighbor_id", false)), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pre.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(out.map(col): _*)
  }

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
    rankTopK(scored, k, Seq("query_id", "rank", "neighbor_id", "cos"))
  }

  /** Hard-negative mining for contrastive training: for each query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that actually move a metric-learning / dense-retrieval
    * loss (ANCE/DPR-style), where uniformly drawn negatives are mostly
    * easy and uninformative. The label-mismatch predicate rides the
    * broadcast join (evaluated before any cosine leaves the scan stage),
    * so same-label candidates — including the query itself — are dropped
    * map-side and never scored past the join.
    *
    * Plan contract identical to [[bruteForceTopK]]: queries broadcast,
    * corpus never crosses an exchange, native [[graft.plans.TopKPerKey]]
    * heaps bound the ranking exchange at partitions×|queries|×k triples
    * regardless of corpus size.
    */
  def hardNegatives(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"), col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"), col(labelCol).as("n_label"))
    val scored = c.join(broadcast(q), col("q_label") =!= col("n_label"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k, Seq("query_id", "rank", "neighbor_id", "cos"))
  }

  /** [[bruteForceTopK]] with both sides' labels carried through the
    * ranking — the input shape for retrieval-quality evaluation (MRR /
    * precision@k / DCG with label-match relevance), where the metric
    * layer needs to know, per ranked neighbor, whether it was a "hit".
    *
    * Same plan contract as [[bruteForceTopK]]: queries broadcast, corpus
    * scanned once and never exchanged, native [[graft.plans.TopKPerKey]]
    * heaps bound the ranking exchange at partitions×|queries|×k rows.
    * Carrying the two label columns through the heaps costs two extra
    * scan columns — strictly cheaper than the alternative of joining
    * labels back onto the ranked list with a second corpus scan.
    */
  def labeledTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"), col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"), col(labelCol).as("n_label"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("q_label"), col("neighbor_id"),
        col("n_label"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k,
      Seq("query_id", "q_label", "rank", "neighbor_id", "n_label", "cos"))
  }

  /** Exact cosine radius (range) search: every corpus vector within
    * `minCos` of each query — the threshold sibling of [[bruteForceTopK]]
    * for "all sufficiently-similar", where a fixed k would either truncate
    * dense neighborhoods or pad sparse ones.
    *
    * Plan shape: same as top-k's scan side — queries broadcast, corpus
    * scanned once, scores computed partition-locally — with NO window and
    * NO exchange at all. Catalyst pushes the threshold INTO the join
    * predicate (verified in the executed plan), so the cosine evaluates
    * once per candidate pair at the join and non-matches never leave the
    * stage; the output projection then re-evaluates it once per SURVIVOR
    * to emit the score column. That per-survivor recompute is the cost of
    * streaming (the alternative is a materialization barrier between
    * score and filter, which writes every candidate's score); it is
    * bounded by 2× in the degenerate all-pairs-match case and negligible
    * under a selective radius, where survivors ≪ candidates. At 100 TB
    * this is the cheapest exact streaming form; the IVF/LSH variants
    * ([[ivfTopK]], [[lshCandidatePairs]]) are the approximate scale path
    * when even one corpus scan per query batch is too much.
    */
  def radiusSearch(
      queries: DataFrame,
      corpus: DataFrame,
      minCos: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .where(col("cos") >= minCos)
  }

  /** MaxSim late-interaction scoring (the ColBERT retrieval form): both
    * sides are MULTI-vector documents (`docCol` groups `vecCol` rows), and
    * score(q, d) = Σ_{qv ∈ q} max_{dv ∈ d} cosine(qv, dv) — each query
    * vector matches its best document vector, no pooling to one embedding.
    *
    * Determinism/parity: vectors are collected per document SORTED by
    * vector id, the max is order-independent, and the outer sum folds the
    * sorted query array left-to-right inside ONE row-local `aggregate`
    * HOF — the same per-row sequential-fold parity the ann04 norms pin
    * (DuckDB `list_sum` over an `ORDER BY`-built list) — so scores are
    * bit-identical cross-engine with no decimal quantization.
    *
    * Plan shape: corpus vectors cross exactly ONE exchange (the per-doc
    * collect); query docs (few) broadcast; scoring is map-side; the final
    * top-k ranks O(|Q|·|C|) score rows, never vectors. At 100 TB the
    * collect exchange is the unavoidable doc-assembly cost — bucket the
    * corpus by `docCol` at write time and it disappears too.
    */
  def maxSimTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      docCol: String = "doc_id",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    def docs(df: DataFrame, dc: String, vc: String) = df
      .select(col(docCol).as(dc), col(idCol).as("vid"),
        col(vecCol).cast("array<double>").as("v"))
      .groupBy(col(dc))
      .agg(transform(sort_array(collect_list(struct(col("vid"), col("v")))),
        s => s.getField("v")).as(vc))
    val q = docs(queries, "q_doc", "qvs")
    val c = docs(corpus, "c_doc", "cvs")
    val scored = c.join(broadcast(q), col("q_doc") =!= col("c_doc"))
      .select(col("q_doc"), col("c_doc"),
        aggregate(col("qvs"), lit(0.0),
          (acc, qv) => acc + array_max(transform(col("cvs"),
            cv => cosine(qv, cv)))).as("maxsim"))
    val w = Window.partitionBy(col("q_doc"))
      .orderBy(col("maxsim").desc, col("c_doc"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_doc"), col("rank"), col("c_doc"), col("maxsim"))
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

  /** Collect a centroid table (cell, mv) to the driver — nCells rows of
    * MODEL PARAMETERS, not data; the one justified `.collect()` in this
    * package. Literalizing the centroids is what lets every nearest-cell
    * assignment run as a per-row expression with no join and no exchange.
    */
  private def collectCentroids(centroids: DataFrame): Seq[(Int, Seq[Double])] =
    centroids.select(col("cell").cast("int"), col("mv")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toIndexedSeq: Seq[Double]))
      .sortBy(_._1).toSeq

  /** Per-row centroid score array: one struct(cos, -cell) per literalized
    * centroid. `array_max`/`array_sort` over it order by (cosine, then
    * LOWEST cell) — the same deterministic tie-break the ann05 oracle's
    * `ORDER BY cos DESC, cell` encodes — and the whole computation is a
    * single projection: no join against a centroid table, no window, and
    * therefore no exchange carrying the vector column.
    */
  private def centroidScores(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    array(cents.map { case (cell, mv) =>
      struct(cosine(v, typedLit(mv)).as("c"), lit(-cell).as("negcell"))
    }: _*)

  /** Nearest-centroid cell id as a map-side expression (ties → lowest cell). */
  private def nearestCell(v: Column, cents: Seq[(Int, Seq[Double])]): Column =
    -array_max(centroidScores(v, cents)).getField("negcell")

  /** The `nProbe` nearest cells, best first, as a map-side expression. */
  private def nearestCells(v: Column, cents: Seq[(Int, Seq[Double])], nProbe: Int): Column =
    transform(
      slice(reverse(array_sort(centroidScores(v, cents))), 1, nProbe),
      s => -s.getField("negcell"))

  /** Deterministic Lloyd's k-means over cosine similarity, seeded from
    * [[seedCentroids]]: each round assigns every corpus vector to its
    * nearest centroid (ties to the lowest cell) and recomputes each cell's
    * centroid as the element-wise mean via quantized integer sums (see
    * [[KmeansQuantScale]]); empty cells keep their previous centroid.
    *
    * Scale shape per round: the current centroids are nCells rows of model
    * parameters held on the driver and LITERALIZED into the assignment
    * expression ([[nearestCell]]), so assignment is genuinely map-side —
    * the corpus crosses no exchange at all; the only shuffle is the
    * (cell, dim)-keyed hash aggregate of quantized longs, reduced
    * map-side to ≤ nCells·dims rows per partition before the exchange.
    * The per-round (cell, dim, Σq, n) aggregate (≤ nCells·dims rows) comes
    * back to the driver and the means are folded there — the same
    * `s / n / Q` double ops the previous in-plan version (and the ann05
    * oracle's CTE chain) computes, so trained centroids are bit-identical.
    * At 100 TB run the rounds on a deterministic sample (e.g.
    * [[graft.functions.TextFunctions.fingerprint64]]-mod sampling) and
    * train offline.
    */
  def kmeansCentroids(
      corpus: DataFrame,
      nCells: Int,
      rounds: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(vecCol).cast("array<double>").as("v"))
    var cents = collectCentroids(seedCentroids(corpus, nCells, idCol, vecCol))
    for (_ <- 1 to rounds) {
      val sums = c
        .select(nearestCell(col("v"), cents).as("cell"), posexplode(col("v")))
        .select(col("cell"), col("pos").as("dim"),
          floor(col("col") * lit(KmeansQuantScale.toDouble) + lit(0.5)).cast("long").as("q"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
        .collect() // ≤ nCells·dims aggregated rows — model parameters
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cell, mv0) =>
        byCell.get(cell) match {
          case Some(rows) =>
            // same op order as the oracle: CAST(s AS DOUBLE) / n / Q
            (cell, rows.sortBy(_.getInt(1)).map(r =>
              r.getLong(2).toDouble / r.getLong(3).toDouble /
                KmeansQuantScale.toDouble).toIndexedSeq: Seq[Double])
          case None => (cell, mv0) // empty cell keeps its previous centroid
        }
      }
    }
    cents.toDF("cell", "mv")
  }

  /** K-means training with its CONVERGENCE CURVE exposed: the same
    * deterministic Lloyd rounds as [[kmeansCentroids]] (seeded from the
    * first-`nCells` embeddings, fixed-point integer centroid sums,
    * empty cells keep their previous centroid), returning one row per
    * (round, cell) with the assignment count and the cell's summed
    * assignment cosine in integer 2^-20 ticks (`floor(cos·2^20)` —
    * monotone in clustering tightness, integer so the corpus-order-free
    * sum is bit-identical cross-engine). This is the pre-deployment
    * acceptance artifact for every consumer of the trainer (ann05/ann06
    * indexes, ann14 sampling): rising per-round cos_ticks IS the
    * convergence evidence, and a judged gate on it pins the whole
    * training loop — assignment, tie-breaks, update arithmetic — not
    * just the final index's recall (ann12's angle).
    *
    * Scale shape: identical to [[kmeansCentroids]] — one corpus pass per
    * round (assignment is a literalized map-side projection, no join, no
    * vector exchange), and the per-round stats ride the SAME
    * cells×dims rollup the update already collects (the dim-0 slice
    * carries per-cell n and cos_ticks) — zero extra passes, zero extra
    * exchanges for the curve.
    */
  def kmeansTrainingCurve(
      corpus: DataFrame,
      nCells: Int,
      rounds: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val c = corpus.select(col(vecCol).cast("array<double>").as("v"))
    var cents = collectCentroids(seedCentroids(corpus, nCells, idCol, vecCol))
    val curve = scala.collection.mutable.ArrayBuffer[(Int, Int, Long, Long)]()
    for (r <- 1 to rounds) {
      val best = array_max(centroidScores(col("v"), cents))
      val sums = c
        .select((-best.getField("negcell")).as("cell"),
          floor(best.getField("c") * lit(KmeansQuantScale.toDouble))
            .cast("long").as("cq"),
          posexplode(col("v")))
        .select(col("cell"), col("cq"), col("pos").as("dim"),
          floor(col("col") * lit(KmeansQuantScale.toDouble) + lit(0.5))
            .cast("long").as("q"))
        .groupBy(col("cell"), col("dim"))
        .agg(sum(col("q")).as("s"), count(lit(1)).as("n"),
          sum(col("cq")).as("ct"))
        .collect() // ≤ nCells·dims aggregated rows — model parameters
      curve ++= sums.filter(_.getInt(1) == 0).map(row =>
        (r, row.getInt(0), row.getLong(3), row.getLong(4)))
      val byCell = sums.groupBy(_.getInt(0))
      cents = cents.map { case (cell, mv0) =>
        byCell.get(cell) match {
          case Some(rows) =>
            (cell, rows.sortBy(_.getInt(1)).map(row =>
              row.getLong(2).toDouble / row.getLong(3).toDouble /
                KmeansQuantScale.toDouble).toIndexedSeq: Seq[Double])
          case None => (cell, mv0)
        }
      }
    }
    curve.toSeq.toDF("round", "cell", "n", "cos_ticks")
  }

  /** Embedding-space class-separation audit — the label-quality report a
    * training pipeline runs BEFORE trusting labels (fine-tune splits,
    * classifier distillation, hard-negative mining all assume labels
    * cluster): per-label centroids from exact integer tick sums (the
    * kmeans update arithmetic — `floor(v·2^20 + 0.5)` summed, one
    * `s / n / Q` double per dim so both engines fold the same values),
    * then for every vector the cosine to its OWN label centroid vs the
    * best OTHER-label centroid, both in `floor(cos·2^20)` integer ticks,
    * rolled up per label with the count of MARGIN VIOLATIONS (own ≤ best
    * other — the vectors a relabeling / pruning pass would inspect).
    *
    * Scale shape: the centroid rollup is one (label, dim)-keyed hash
    * aggregate reduced map-side to ≤ |labels|·dims rows; the collected
    * centroids are literalized model parameters, so the audit pass is a
    * pure map-side projection over the corpus plus a |labels|-row
    * rollup — vectors never cross an exchange in either pass.
    */
  def classMarginAudit(
      corpus: DataFrame,
      vecCol: String = "embedding",
      labelCol: String = "label"): DataFrame = {
    val qs = KmeansQuantScale.toDouble
    val c = corpus.select(col(labelCol).cast("int").as("label"),
      col(vecCol).cast("array<double>").as("v"))
    val sums = c.select(col("label"), posexplode(col("v")))
      .select(col("label"), col("pos").as("dim"),
        floor(col("col") * lit(qs) + lit(0.5)).cast("long").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))
      .collect() // ≤ |labels|·dims aggregated rows — model parameters
    val cents: Seq[(Int, Seq[Double])] = sums.groupBy(_.getInt(0)).toSeq
      .map { case (l, rows) =>
        (l, rows.sortBy(_.getInt(1)).map(r =>
          r.getLong(2).toDouble / r.getLong(3).toDouble / qs)
          .toIndexedSeq: Seq[Double])
      }.sortBy(_._1)
    val scores = array(cents.map { case (l, mv) =>
      struct(
        floor(cosine(col("v"), typedLit(mv)) * lit(qs)).cast("long").as("ct"),
        lit(l).as("clabel"))
    }: _*)
    c.select(col("label"), scores.as("sc"))
      .select(col("label"),
        element_at(
          filter(col("sc"), s => s.getField("clabel") === col("label")), 1)
          .getField("ct").as("own_t"),
        array_max(
          transform(
            filter(col("sc"), s => s.getField("clabel") =!= col("label")),
            s => s.getField("ct"))).as("other_t"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        sum(col("own_t")).as("own_ticks"),
        sum(col("other_t")).as("other_ticks"),
        sum(when(col("own_t") <= col("other_t"), 1L).otherwise(0L))
          .as("n_violations"))
  }

  /** IVF (inverted-file) approximate top-k: partition the corpus into
    * `nCells` Voronoi cells around centroids, then search each query only
    * in the `nProbe` cells whose centroids are nearest to it, rescoring
    * candidates with exact cosine.
    *
    * Centroids, in preference order: `centroids` (an offline-trained table
    * (cell, mv: array<double>) — the production path at 100 TB: train on a
    * sample, ship the result), else `trainRounds` > 0 deterministic
    * k-means rounds ([[kmeansCentroids]]), else the first-`nCells` seed
    * embeddings ([[seedCentroids]]).
    *
    * Plan shape: the centroid table is nCells rows of model parameters —
    * collected once and LITERALIZED into per-row assignment expressions
    * ([[nearestCell]] / [[nearestCells]]), so corpus cell-assignment and
    * query probing are pure projections. The (small) probe side is
    * broadcast for the cell equi-join, so the CORPUS NEVER CROSSES AN
    * EXCHANGE at all: its vectors are scored where they are scanned, and
    * the only shuffle in the whole query is the final per-query top-k over
    * (query_id, neighbor_id, cos) triples (PlanSpec asserts no shuffle
    * carries an array column). No corpus × query product anywhere.
    */
  /** IVF top-k SERVING on a query STREAM (train-offline / serve-online,
    * the st24 convention for retrieval): `centroids` is an
    * offline-trained table ([[kmeansCentroids]]) — literalized into
    * map-side assignment expressions exactly like [[ivfTopK]] — the
    * static corpus is cell-assigned once, and each arriving query row
    * probes its `nProbe` nearest cells via ONE stream-static equi-join
    * (no stream-stream state, no watermark). The per-query top-k is a
    * Complete-mode aggregate collecting each query's candidates into a
    * sorted bounded slice: state is per-IN-FLIGHT-query and bounded by
    * the probed cells' fan-in — the always-on retrieval endpoint shape.
    * Returns the aggregated streaming frame (query_id, top:
    * array<struct<nc, neighbor_id>>), `nc = -cos` so ascending struct
    * order IS (cos DESC, neighbor_id ASC) — run it to completion and
    * explode batch-side (posexplode → rank); bit-identical to the batch
    * [[ivfTopK]] under the same centroids, which is what lets st29 reuse
    * ann05's oracle text verbatim.
    */
  def ivfTopKStreaming(
      queryStream: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      k: Int,
      nProbe: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val cents = collectCentroids(centroids)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", nearestCell(col("cv"), cents))
    val q = queryStream.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("cell", explode(nearestCells(col("qv"), cents, nProbe)))
    q.join(c, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .groupBy(col("query_id"))
      .agg(slice(array_sort(collect_list(struct(
        (-col("cos")).as("nc"), col("neighbor_id")))), 1, k).as("top"))
  }

  /** IVF operating curve — recall@k and scanned-candidate volume as
    * `nProbe` sweeps: the tuning table an ANN deployment reads to pick
    * its latency/recall point (the per-index analog of ann16's k-means
    * convergence curve). ONE corpus cell-assignment and ONE candidate
    * scoring pass at the LARGEST probe count serve every swept point:
    * each candidate carries the probe rank `rn` of its cell, a probe
    * config keeps the candidates with `rn <= p`, and the per-config
    * top-k is a window over the shared scored stream — no per-config
    * corpus scan, no re-scoring. Ground truth is [[bruteForceTopK]];
    * output is one row per swept probe count, integer ticks.
    */
  def ivfOperatingCurve(
      queries: DataFrame,
      corpus: DataFrame,
      centroids: DataFrame,
      k: Int,
      probes: Seq[Int],
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(probes.nonEmpty, "probes must name at least one nProbe config")
    val maxP = probes.max
    val cents = collectCentroids(centroids)
    val c = corpus.select(col(idCol).as("neighbor_id"),
        col(vecCol).cast("array<double>").as("cv"))
      .withColumn("cell", nearestCell(col("cv"), cents))
    val q = queries.select(col(idCol).as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .select(col("query_id"), col("qv"),
        posexplode(nearestCells(col("qv"), cents, maxP)))
      .select(col("query_id"), col("qv"),
        (col("pos") + 1).as("rn"), col("col").as("cell"))
    val cand = c.join(broadcast(q), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("rn"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    // fan each scored candidate out to the configs it serves (rn <= p)
    val sub = cand
      .select(col("*"), explode(array(probes.map(lit): _*)).as("nprobe"))
      .where(col("rn") <= col("nprobe"))
    val nCand = sub.groupBy(col("nprobe"))
      .agg(count(lit(1)).as("n_candidates"))
    val w = Window.partitionBy(col("nprobe"), col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val topk = sub.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("nprobe"), col("query_id"), col("neighbor_id"))
    val exact = bruteForceTopK(queries, corpus, k, idCol, vecCol)
      .select(col("query_id"), col("neighbor_id"))
    val hits = topk.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hits"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    nCand.join(hits, Seq("nprobe"), "left")
      .crossJoin(broadcast(nExact))
      .select(col("nprobe"), col("n_candidates"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"), col("n_exact"),
        expr("(coalesce(n_hits, cast(0 as bigint)) * cast(1048576 as bigint)) div n_exact")
          .as("recall_ticks"))
      .orderBy(col("nprobe"))
  }

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
    val cents = collectCentroids(centroidTable)
    // map-side cell assignment (corpus) and nProbe nearest cells (queries)
    val assigned = c.select(
      col("neighbor_id"), col("cv"), nearestCell(col("cv"), cents).as("cell"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(nearestCells(col("qv"), cents, nProbe)).as("cell"))
    // search only the probed cells; exact rescore. The scored candidate
    // stream is still corpus-FRACTION-sized (≈ nProbe/nCells of the
    // corpus), so the native TopKPerKey heaps pre-select before the
    // ranking exchange — ≤ partitions×|queries|×k triples cross the
    // wire (the bruteForceTopK argument); the rank window then runs
    // over ≤ |queries|×k survivors.
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val pre = graft.plans.TopKPerKey.perKey(scored, Seq("query_id"),
      Seq(("cos", true), ("neighbor_id", false)), k)
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    pre.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Squared L2 distance as a left fold — the PQ sub-quantizer metric
    * (same op order as DuckDB's `list_reduce(list_prepend(0.0, …))`
    * mirror, so distances — and therefore argmin code assignments — are
    * bit-identical cross-engine).
    */
  private def pqSqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, d) => acc + d)

  /** PQ code of subspace `s`: argmin_j ‖v_s − c_sj‖² as one `array_max`
    * over struct(−dist, −j) — ties to the LOWEST j, the same total order
    * the oracle's `ORDER BY dist ASC, j ASC` row_number encodes.
    */
  private def pqCodeOf(
      v: Column, s: Int, cb: IndexedSeq[IndexedSeq[Seq[Double]]], sub: Int): Column =
    -array_max(array(cb(s).indices.map(j =>
      struct((-pqSqDist(slice(v, s * sub + 1, sub), typedLit(cb(s)(j)))).as("nd"),
        lit(-j).as("nj"))): _*)).getField("nj")

  /** Deterministic per-subspace PQ codebook: seeded from the first `kSub`
    * corpus vectors sliced per subspace, then refined by `rounds` Lloyd's
    * k-means rounds under squared-L2 — the proper trained quantizer
    * (first-k-rows is NOT a codebook: quantization error, and therefore
    * ADC ranking quality, would depend on corpus ordering — review
    * finding r9). Same exact-arithmetic discipline as [[kmeansCentroids]]:
    * assignment ties to the lowest code, per-(subspace, code, dim) means
    * via quantized INTEGER sums ([[KmeansQuantScale]], order-independent,
    * so Spark's parallel aggregation and a serial oracle produce
    * bit-identical codebooks), empty codes keep their previous centroid.
    *
    * Scale shape per round: the codebook is nSub·kSub·(dims/nSub) = dims·kSub
    * doubles of MODEL PARAMETERS literalized into the assignment
    * expression, so every corpus vector computes its nSub codes map-side —
    * the corpus crosses no exchange; the only shuffle is the
    * (subspace, code, dim)-keyed aggregate of quantized longs, map-side
    * combined to ≤ nSub·kSub·subDims rows per partition. At 100 TB train
    * on a deterministic sample offline (the [[kmeansCentroids]] argument)
    * and ship the codebook.
    */
  def pqCodebook(
      corpus: DataFrame,
      nSub: Int,
      kSub: Int,
      rounds: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val seedVecs = corpus.orderBy(col(idCol)).limit(kSub)
      .select(col(vecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toIndexedSeq).toIndexedSeq
    val dims = seedVecs.head.length
    val sub  = dims / nSub
    var cb: IndexedSeq[IndexedSeq[Seq[Double]]] =
      (0 until nSub).map(s => seedVecs.map(v => v.slice(s * sub, (s + 1) * sub): Seq[Double]))
    if (rounds > 0) {
      val c = corpus.select(col(vecCol).cast("array<double>").as("v"))
      for (_ <- 1 to rounds) {
        val cbNow = cb
        // ONE job per round: each row emits its nSub (subspace, code,
        // subvector) assignments; ≤ nSub·kSub·sub aggregated rows of model
        // parameters come back to the driver
        val sums = c.select(explode(array((0 until nSub).map { s =>
            struct(lit(s).as("s"), pqCodeOf(col("v"), s, cbNow, sub).as("j"),
              slice(col("v"), s * sub + 1, sub).as("sv"))
          }: _*)).as("e"))
          .select(col("e.s").as("s"), col("e.j").as("j"), posexplode(col("e.sv")))
          .select(col("s"), col("j"), col("pos").as("dim"),
            floor(col("col") * lit(KmeansQuantScale.toDouble) + lit(0.5))
              .cast("long").as("q"))
          .groupBy(col("s"), col("j"), col("dim"))
          .agg(sum(col("q")).as("sm"), count(lit(1)).as("n"))
          .collect()
        val bySJ = sums.groupBy(r => (r.getInt(0), r.getInt(1)))
        cb = (0 until nSub).map { s =>
          (0 until kSub).map { j =>
            bySJ.get((s, j)) match {
              case Some(rows) =>
                // same op order as the oracle: CAST(sm AS DOUBLE) / n / Q
                rows.sortBy(_.getInt(2)).map(r =>
                  r.getLong(3).toDouble / r.getLong(4).toDouble /
                    KmeansQuantScale.toDouble).toIndexedSeq: Seq[Double]
              case None => cbNow(s)(j) // empty code keeps its previous centroid
            }
          }
        }
      }
    }
    cb
  }

  /** IVF+PQ approximate top-k (the FAISS IVFADC layout, Spark-first):
    * coarse inverted-file cells bound WHERE to search, product-quantization
    * codes bound WHAT each candidate costs to score.
    *
    *  - Coarse: corpus vectors assign to [[seedCentroids]] cells and
    *    queries probe their `nProbe` nearest — both as literalized
    *    map-side expressions ([[nearestCell]]/[[nearestCells]]), so the
    *    candidate join is an equi-join on cell id (no nested loop, no
    *    product).
    *  - Fine: each corpus vector is encoded as `nSub` sub-codes — per
    *    subspace, the L2-nearest of `kSub` seed sub-centroids (argmin as
    *    an `array_max` fold, ties to the lowest code) — 8 codes ≈ 8 bytes
    *    standing in for 256 bytes of floats at scale. Scoring is
    *    ASYMMETRIC (ADC): the full-precision query against the DECODED
    *    corpus vector (its sub-centroids concatenated); with an
    *    inner-product-family metric, Σ_s q_s·c_[code_s] = q·decoded, so
    *    ADC is ONE native cosine fold against the decoded array — the
    *    same left-to-right fold the oracle's `list_cosine_similarity`
    *    computes, which is what makes IVFPQ oracle-gateable at all.
    *  - Exact: the top `nCand` per query by ADC are re-fetched (hash
    *    joins on id — query side broadcast, corpus side AQE-planned) and
    *    rescored with exact cosine; emitted scores are exact.
    *
    * Shuffles: the candidate ranking and final top-k windows move only
    * (query_id, neighbor_id, score) triples; corpus vectors cross no
    * exchange (codes and decoded arrays are computed where scanned, and
    * the exact-rescore fetch is the same AQE-planned id join as
    * [[Dedup.embeddingDupPairs]]). The PQ codebook is TRAINED —
    * `pqTrainRounds` deterministic per-subspace k-means rounds
    * ([[pqCodebook]]); the coarse quantizer stays seeded (it only bounds
    * WHERE to search — recall is dominated by the fine quantizer, and the
    * exact rescore repairs ranking within the probed cells). At 100 TB
    * train both quantizers offline on a sample (same argument as
    * [[kmeansCentroids]]) and pass them in.
    */
  def ivfPqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 6,
      nSub: Int = 8,
      kSub: Int = 16,
      nCand: Int = 16,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      pqTrainRounds: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("qv"))
    val coarse = collectCentroids(seedCentroids(corpus, nCells, idCol, vecCol))
    // PQ codebook: seed slices, refined by `pqTrainRounds` deterministic
    // per-subspace k-means rounds (0 = the raw seed — only for fixtures
    // pinned to the old behavior; judged ann06 trains)
    val pqCent = pqCodebook(corpus, nSub, kSub, pqTrainRounds, idCol, vecCol)
    val sub = pqCent.head.head.length
    def codeOf(v: Column, s: Int): Column = pqCodeOf(v, s, pqCent, sub)
    def decoded(v: Column): Column = concat((0 until nSub).map { s =>
      element_at(
        typedLit(pqCent(s).zipWithIndex.map { case (cj, j) => j -> cj }.toMap),
        codeOf(v, s))
    }: _*)
    val assigned = c.select(col("neighbor_id"),
      nearestCell(col("cv"), coarse).as("cell"), decoded(col("cv")).as("dv"))
    val probes = q.select(col("query_id"), col("qv"),
      explode(nearestCells(col("qv"), coarse, nProbe)).as("cell"))
    // ADC candidates are corpus-fraction-sized — heap pre-selection
    // (native TopKPerKey) bounds the candidate exchange at
    // partitions×|queries|×nCand rows (the bruteForceTopK argument)
    val cand = graft.plans.TopKPerKey.perKey(
        assigned.join(broadcast(probes), Seq("cell"))
          .where(col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("qv"), col("dv")).as("approx")),
        Seq("query_id"), Seq(("approx", true), ("neighbor_id", false)), nCand)
      .select(col("query_id"), col("neighbor_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand
      .join(broadcast(q), "query_id")
      .join(c, "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(wTop))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * cluster embeddings into `nCells` Voronoi cells, then flag as
    * duplicates rows that have a LOWER-id neighbor in the SAME cell with
    * cosine ≥ `threshold` — the greedy keep-first rule, cell-blocked so
    * the quadratic runs per cell, never across the corpus.
    *
    * Output: one row per input vector — (vec_id, cell, kept).
    *
    * Plan shape: centroids are literalized ([[nearestCell]]) so cell
    * assignment is map-side; the within-cell pair join is an equi-join on
    * cell id (one exchange of (id, cell, vector); no cartesian); the flag
    * aggregate is keyed on vec_id (partial map-side). At 100 TB grow
    * nCells with the corpus (cells of ~10³–10⁴ rows keep the per-cell
    * quadratic bounded — that sizing is the whole SemDeDup trade) and
    * train centroids offline ([[kmeansCentroids]] on a sample); 16 seed
    * cells here match the fixture and the oracle's CTE mirror.
    */
  def semanticDedup(
      corpus: DataFrame,
      nCells: Int = 0,
      threshold: Double = 0.3,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    // nCells ≤ 0 = auto: cells of ~128 rows (floor 16), so the within-cell
    // quadratic stays bounded as the corpus grows — the sizing rule the
    // Scaladoc above prescribes, applied by default instead of left to the
    // caller. The count is parquet-metadata cheap; the sf0.1→sf1 scaling
    // run measured the fixed-16 form at ~600× for 10× rows (cell occupancy
    // ×10 ⟹ pairs ×100, plus skew), auto-sizing restores ~linear.
    val cells = if (nCells > 0) nCells else math.max(16L, c.count() / 128L).toInt
    val cents = collectCentroids(seedCentroids(corpus, cells, idCol, vecCol))
    val assigned = c.select(col("vec_id"), col("v"), nearestCell(col("v"), cents).as("cell"))
    val lowerDups = assigned.as("a")
      .join(assigned.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") > col("b.vec_id"))
      .where(cosine(col("a.v"), col("b.v")) >= threshold)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(count(lit(1)).as("n_lower"))
    assigned.join(lowerDups, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"), col("n_lower").isNull.as("kept"))
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
    // LSH candidates are design-bounded but still corpus-proportional at
    // fixed plane counts — heap pre-selection (native TopKPerKey) keeps
    // the ranking exchange at partitions×|queries|×k triples (the
    // bruteForceTopK argument)
    val scored = cb.join(if (broadcastQueries) broadcast(qb) else qb,
        col("table") === col("ctable") && col("bucket") === col("cbucket") &&
          col("query_id") =!= col("neighbor_id"))
      .where(graft.functions.HashExprs.firstEqIndex(col("qbk"), col("cbk")) === col("ctable"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val pre = graft.plans.TopKPerKey.perKey(scored, Seq("query_id"),
      Seq(("cos", true), ("neighbor_id", false)), k)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    pre.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Int8 scalar quantization (SQ) + exact rescore — the third
    * compression point on the memory/recall curve beside SRP-LSH
    * ([[lshTopK]]) and IVF+PQ ([[ivfPqTopK]]), and the one real vector
    * stores deploy first (FAISS `SQ8`, Lucene/Elasticsearch
    * `int8_hnsw`, pgvector `halfvec`/SQ): quantize every dimension to
    * an unsigned byte against per-dimension corpus min/max, search on
    * the 4×-smaller codes with an EXACT integer L2², then rescore only
    * the top `cand` candidates per query with the full-precision
    * cosine.
    *
    * Contract (mirrored in the ann13 oracle):
    *  - per-dimension corpus stats: one aggregate pass → (min_d, max_d)
    *    per dimension, assembled into two model-parameter arrays (the
    *    1-row broadcast convention — nothing collected);
    *  - code(v)_d = clamp(floor((v_d − min_d) · 255 / (max_d − min_d)),
    *    0, 255), constant dimensions code to 0; queries quantize
    *    against the CORPUS stats (asymmetric to corpus distribution,
    *    the standard SQ deployment);
    *  - candidate metric: integer Σ_d (qa_d − qb_d)² — EXACT cross-
    *    engine, no floating point until the rescore; ties to the lowest
    *    neighbor id;
    *  - rescore: full-precision [[cosine]] over the float vectors of
    *    the ≤ `cand` survivors per query, final top-k by
    *    (cos DESC, id).
    *
    * Scale shape: the scan reads 1 byte/dim instead of 4 (the whole
    * point at 100 TB — the code table is the thing that fits in
    * executor memory), queries broadcast, the corpus never shuffles —
    * only (query, dist, id) tuples cross the wire for ranking, then the
    * tiny candidate set joins back BY ID for float vectors (at scale
    * that's an index fetch, not a second scan — here the same parquet
    * read, which Spark prunes to the candidate ids' row groups).
    * Quantization error is bounded per dim by range/510, so int-L2
    * ordering tracks true L2 far more tightly than PQ's codebook ADC —
    * recall@5 vs [[bruteForceTopK]] is audited in SimilaritySpec and
    * SCALING.md.
    *
    * Documented decision — min/max vs quantile clipping: production SQ
    * (FAISS `QT_8bit` vs `QT_8bit_uniform`) often clips at per-dimension
    * percentiles so a single outlier can't stretch the range and crush
    * resolution for the mass of the distribution. Here the stats are
    * exact min/max because (a) the fixture embeddings are bounded
    * synthetic floats with no heavy tails (recall@5 = 1.0 — nothing to
    * fix), and (b) percentile stats are a drop-in swap: the q56
    * histogram-crossing rank machinery computes exact per-dimension
    * quantiles in one extra pass without a global sort, feeding the same
    * two 1-row arrays. Revisit if a real corpus's recall audit degrades.
    */
  def sqTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cand: Int = 20,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    // one corpus pass: per-dimension min/max, reassembled dim-ordered
    // into two 1-row arrays (zero collect; the tx35 model-as-row shape)
    val stats = c.select(posexplode(col("cv")).as(Seq("d", "x")))
      .groupBy(col("d")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .agg(
        expr("transform(array_sort(collect_list(struct(d, mn))), s -> s.mn)")
          .as("mns"),
        expr("transform(array_sort(collect_list(struct(d, mx))), s -> s.mx)")
          .as("mxs"))
    val quant = // (x, i) -> int8 code; Spark lambda index is 0-based
      "transform(%s, (x, i) -> CASE WHEN mxs[i] = mns[i] THEN 0 " +
        "ELSE least(greatest(cast(floor((x - mns[i]) * 255.0D / " +
        "(mxs[i] - mns[i])) as int), 0), 255) END)"
    val cq = c.crossJoin(broadcast(stats))
      .select(col("neighbor_id"), expr(quant.format("cv")).as("cq"))
    val qq = q.crossJoin(broadcast(stats))
      .select(col("query_id"), expr(quant.format("qv")).as("qq"))
    // int8 candidate metric over the whole corpus — heap pre-selection
    // (native TopKPerKey) keeps the candidate exchange at
    // partitions×|queries|×cand rows (the bruteForceTopK argument)
    val cands = graft.plans.TopKPerKey.perKey(
        cq.join(broadcast(qq), col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            expr("aggregate(zip_with(qq, cq, (a, b) -> cast((a - b) * (a - b) as bigint)), " +
              "cast(0 as bigint), (s, x) -> s + x)").as("dist")),
        Seq("query_id"), Seq(("dist", false), ("neighbor_id", false)), cand)
      .select(col("query_id"), col("neighbor_id"))
    // rescore the tiny survivor set at full precision
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** MMR (maximal-marginal-relevance) diversified top-k: greedily select
    * `k` corpus vectors maximizing
    * `λ·cos(q, c) − (1−λ)·max_{s ∈ selected} cos(c, s)` — the classic
    * retrieval re-ranker that trades relevance against redundancy (a
    * plain top-k returns k near-duplicates of the best hit; MMR spreads
    * the set). Ties break to the lowest id.
    *
    * Scale shape: inherently sequential in k, but each of the k steps is
    * ONE distributed pass — the selected set is ≤k MODEL-PARAMETER
    * vectors literalized into the scoring expression (the
    * [[kmeansCentroids]] pattern), the per-step winner is a global
    * top-1 (`TakeOrderedAndProject`, no full sort), and only that one
    * row comes back to the driver. The corpus is scanned k times; at
    * 100 TB run MMR on a pre-filtered candidate pool (e.g.
    * [[bruteForceTopK]]/[[ivfTopK]] top-N, N ≫ k), which is the standard
    * two-stage retrieve-then-rerank deployment.
    *
    * ROUTING GUARD (review finding r9 — k sequential corpus scans must
    * not be the accidental default at scale): a pool of ≤ `rerankPoolMax`
    * rows routes to [[mmrRerank]] — ONE collect job, bit-identical
    * result (SimilaritySpec pins parity and the routing) — and a larger
    * corpus REFUSES to run unless `allowCorpusScan = true`, pointing the
    * caller at the retrieve-then-rerank shape instead.
    */
  def mmrTopK(
      corpus: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      lambda: Double = 0.5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      rerankPoolMax: Long = 1L << 16,
      allowCorpusScan: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // allowCorpusScan IS the route: an opted-in caller goes straight to
    // the k-pass loop with no routing count() — the count's result was
    // unused on that path and cost an extra job per call (advisor
    // finding r10). Un-opted callers pay one count (parquet-metadata
    // cheap on a scan) to route: ≤ rerankPoolMax rows of 64-dim doubles
    // is ≤ ~34 MB on the driver — pool-sized, not corpus-sized.
    if (!allowCorpusScan) {
      val n = corpus.count()
      require(n <= rerankPoolMax,
        s"mmrTopK over a $n-row corpus would run $k sequential full corpus " +
          "scans; retrieve a bounded candidate pool first (bruteForceTopK/" +
          "ivfTopK top-N into mmrRerank), or opt in with allowCorpusScan=true")
      return mmrRerank(corpus, queryVec, k, lambda, idCol, vecCol)
    }
    val c = corpus
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("rel", cosine(col("v"), typedLit(queryVec)))
    var selected = Vector.empty[(Int, Long, Seq[Double], Double)]
    var exhausted = false
    for (r <- 1 to k if !exhausted) {
      val penalty =
        if (selected.isEmpty) lit(0.0)
        else if (selected.size == 1) cosine(col("v"), typedLit(selected.head._3))
        else greatest(selected.map(s => cosine(col("v"), typedLit(s._3))): _*)
      val score = lit(lambda) * col("rel") - lit(1.0 - lambda) * penalty
      val remaining =
        if (selected.isEmpty) c
        else c.where(!col("id").isin(selected.map(_._2): _*))
      // global top-1: TakeOrderedAndProject; ONE model-parameter row
      // (id, vector, score) returns to the driver per step
      val top = remaining.select(col("id"), col("v"), score.as("score"))
        .orderBy(col("score").desc, col("id")).limit(1).collect()
      if (top.isEmpty) exhausted = true // k exceeds the pool: return what exists
      else selected :+= ((r, top(0).getLong(0),
        top(0).getSeq[Double](1).toIndexedSeq: Seq[Double], top(0).getDouble(2)))
    }
    selected.map { case (r, id, _, s) => (r, id, s) }
      .toDF("rank", "neighbor_id", "score")
  }

  /** One-job MMR over a BOUNDED candidate pool: collect the pool once
    * (≤N rows, N ≫ k but tiny — the output of a first-stage
    * [[bruteForceTopK]]/[[ivfTopK]] retrieve) and run the greedy loop
    * driver-side. This is the documented 100 TB deployment shape of
    * [[mmrTopK]]: the corpus-direct form pays k sequential Spark jobs,
    * which is right when the pool IS the corpus, but a rerank over an
    * already-retrieved pool should cost ONE job (the pool collect), not
    * k. Bit-identical to [[mmrTopK]] on the same pool: the cosine loop
    * mirrors [[graft.functions.VectorImpl.cosine]] op-for-op
    * (left-to-right dot/norm folds, `dot / (√na · √nb)`), the score is
    * the same `λ·rel − (1−λ)·max_sel` expression order, ties break to
    * the lowest id (pinned by SimilaritySpec on the ann11 pool).
    */
  def mmrRerank(
      pool: DataFrame,
      queryVec: Seq[Double],
      k: Int,
      lambda: Double = 0.5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val spark = pool.sparkSession
    import spark.implicits._
    // same IEEE op order as VectorImpl.cosine (ArrayData-free copy)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = queryVec.toArray
    val rows = pool
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val rel = rows.map { case (id, v) => (id, v, cos(v, q)) }
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Array[Double], Double)]
    val chosen = scala.collection.mutable.Set.empty[Long]
    for (r <- 1 to k if chosen.size < rows.length) {
      var bestId = Long.MinValue; var bestScore = Double.NegativeInfinity
      var bestVec: Array[Double] = null; var found = false
      for ((id, v, rl) <- rel if !chosen.contains(id)) {
        val penalty =
          if (selected.isEmpty) 0.0
          else selected.iterator.map(s => cos(v, s._3)).max
        val score = lambda * rl - (1.0 - lambda) * penalty
        // ties to the lowest id, matching mmrTopK's (score DESC, id ASC)
        if (!found || score > bestScore || (score == bestScore && id < bestId)) {
          found = true; bestId = id; bestScore = score; bestVec = v
        }
      }
      if (found) { selected += ((r, bestId, bestVec, bestScore)); chosen += bestId }
    }
    selected.map { case (r, id, _, s) => (r, id, s) }.toSeq
      .toDF("rank", "neighbor_id", "score")
  }

  /** Cluster-balanced diversity sampling — the embedding-space coreset
    * draw a curation pipeline runs to keep a budget's worth of data
    * SPREAD across semantic clusters instead of mirroring the corpus
    * skew (cf. Sorscher et al. 2022, "Beyond neural scaling laws": the
    * uniform-per-cluster form of prototypicality sampling):
    *
    *  1. assign every vector to its nearest seed centroid — the ann08
    *     map-side blocking (literalized centroids, no join, and only
    *     (id, cell) rows past this point — vectors never shuffle);
    *  2. give each cluster a sqrt-flattened share of the budget:
    *     b_c = budget·⌊√n_c⌋ div Σ⌊√n_c⌋ (integer arithmetic; IEEE sqrt
    *     is correctly rounded so both engines floor the same double —
    *     the tx38 α=0.5 flattening, cluster-space instead of
    *     language-space);
    *  3. pick each cluster's b_c members deterministically by avalanche
    *     hash of the id ([[graft.functions.HashExprs.fnvMix64]]) — a
    *     uniform draw that needs no RNG state and re-picks identically
    *     on re-runs. The pre-selection is the native TopKPerKey heap
    *     operator at k = max budget, so the per-cell exchange carries at
    *     most max-budget rows per cell; the exact per-cell rank runs on
    *     those bounded survivors.
    *
    * Output: (cell, n_cell, budget, pick_rank, vec_id). Σ picks ≤ budget
    * (truncating division; clusters with b_c = 0 contribute nothing).
    */
  def clusterSample(
      corpus: DataFrame,
      budget: Long,
      nCells: Int = 0,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).cast("array<double>").as("v"))
    // FIXED default cell count, unlike semanticDedup's n/128 auto-sizing:
    // dedup must bound within-cell PAIRS (quadratic in occupancy), but
    // sampling has no pair stage — its only corpus-sized cost is the
    // assignment itself, n·cells cosines, so cells growing with n would
    // make the op quadratic (measured: auto-sized 156 cells at sf1 ran
    // 11× the 10×-rows cost; fixed cells restore linear). At 100 TB the
    // production shape is the same: train a FIXED k on a sample
    // ([[kmeansCentroids]]), assignment stays one map-side projection.
    val cells = if (nCells > 0) nCells else 64
    val cents = collectCentroids(seedCentroids(corpus, cells, idCol, vecCol))
    val assigned = c.select(col("vec_id"), nearestCell(col("v"), cents).as("cell"))
    val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_cell"))
      .withColumn("w", floor(sqrt(col("n_cell").cast("double"))).cast("long"))
    val budgets = sizes
      .crossJoin(broadcast(sizes.agg(sum(col("w")).as("wt"))))
      .select(col("cell"), col("n_cell"),
        expr(s"(${budget}L * w) div wt").as("budget"))
    // heap bound for the native top-k: every b_c ≤ budget (w_c ≤ Σw), so
    // the total budget is a safe static k — no extra job to compute the
    // exact max (an earlier version collected max(budget) and paid a full
    // assignment pass for it). A budget far above per-cell occupancy just
    // means heaps that never fill; typical curation budgets ≪ corpus.
    val k = budget.min(Int.MaxValue.toLong).toInt
    val hashed = assigned.withColumn("h",
      graft.functions.HashExprs.fnvMix64(col("vec_id").cast("string")))
    val pre = graft.plans.TopKPerKey.perKey(hashed, Seq("cell"),
      Seq(("h", false), ("vec_id", false)), k)
    val w = Window.partitionBy(col("cell")).orderBy(col("h"), col("vec_id"))
    pre.join(broadcast(budgets), "cell")
      .withColumn("pick_rank", row_number().over(w))
      .where(col("pick_rank") <= col("budget"))
      .select(col("cell"), col("n_cell"), col("budget"),
        col("pick_rank").cast("long").as("pick_rank"), col("vec_id"))
  }

  /** Johnson-Lindenstrauss random projection (Achlioptas 2003's ±1
    * database-friendly form): compress `vecCol` from `inDim` to `outDim`
    * dimensions via a deterministic sign matrix, `out_j = Σ_i s(i,j)·v_i`
    * with `s(i,j) = ±1` drawn from the repo's pinned hash
    * ([[graft.functions.HashImpl.fnvMix64]] of `"jl:i:j"`, low bit) — no
    * RNG state, so the matrix is identical on every executor, every run,
    * and every ENGINE (the DuckDB oracle regenerates it from the same
    * hash).
    *
    * Determinism: inputs are first quantized to integer 2^-20 ticks
    * (`floor(x·2^20 + 0.5)` — same asymmetric formula both engines), so
    * every projected coordinate is a sum of INTEGERS carried in doubles:
    * |q_i| ≤ ~2^21, 64-term sums ≤ 2^27·2^21 ≪ 2^53 — exact integer
    * arithmetic, associative, bit-identical under ANY fold order or
    * partitioning. Cosines over the projected vectors are then dots/norms
    * of exact integers (≤ 2^53) — also bit-exact cross-engine, which is
    * what lets ann15 hash-gate projected-space ranks instead of
    * bounds-gating them.
    *
    * Plan shape: one native codegen'd loop per row
    * ([[graft.functions.JlProject]] — the memoized sign matrix lives in
    * the kernel, NOT in the plan: a first literalized-Column version was
    * a 2 048-node expression tree that fell out of whole-stage codegen
    * and ran the sf0.1 audit in 16 s; the kernel form runs it in ~1 s):
    * no lambda dispatch, no join, no shuffle — the projection is a pure
    * map over the corpus scan. At 100 TB this is the
    * dimensionality-reduction pass that makes a 2×-smaller ANN index; the
    * quantization costs one floor per term and preserves ~6 significant
    * digits of the unit-scale fixture embeddings.
    */
  def jlProject(
      df: DataFrame,
      inDim: Int,
      outDim: Int,
      vecCol: String = "embedding",
      projCol: String = "proj"): DataFrame = {
    require(inDim >= 1 && outDim >= 1 && outDim <= inDim,
      s"need 1 <= outDim <= inDim, got inDim=$inDim outDim=$outDim")
    df.withColumn(projCol, graft.functions.VectorExprs.jlProject(
      col(vecCol).cast("array<double>"), inDim, outDim))
  }

  /** JL-compressed top-k: candidate generation by cosine in the
    * [[jlProject]]ed space (top `cand` per query), then full-precision
    * cosine rescore of the survivors — the [[sqTopK]] two-stage shape
    * with dimensionality reduction instead of scalar quantization as the
    * compressed first pass. At outDim = inDim/2 the candidate scan reads
    * half the floats of a brute-force pass (and the projected table is
    * the only thing that needs to be resident); the exact pass touches
    * only |queries|·cand vectors.
    *
    * Both stages are deterministic bit-exact cross-engine: the projected
    * cosines are ratios of exact integers (see [[jlProject]]) and the
    * rescore is the pinned ann01 cosine — so the CANDIDATE SET, not just
    * the final ranks, is reproducible, and ann15's oracle gates the
    * whole pipeline.
    */
  def jlTopK(
      queries: DataFrame,
      corpus: DataFrame,
      k: Int,
      cand: Int = 100,
      inDim: Int = 64,
      outDim: Int = 32,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val cp = jlProject(c, inDim, outDim, vecCol = "cv", projCol = "cp")
      .select(col("neighbor_id"), col("cp"))
    val qp = jlProject(q, inDim, outDim, vecCol = "qv", projCol = "qp")
      .select(col("query_id"), col("qp"))
    // candidate pre-selection through the native heaps: the projected
    // scores are the corpus-sized stream here — the heap keeps the
    // exchange at partitions×|queries|×cand rows (the bruteForceTopK
    // argument, one stage earlier)
    val cands = graft.plans.TopKPerKey.perKey(
        cp.join(broadcast(qp), col("query_id") =!= col("neighbor_id"))
          .select(col("query_id"), col("neighbor_id"),
            cosine(col("qp"), col("cp")).as("pcos")),
        Seq("query_id"), Seq(("pcos", true), ("neighbor_id", false)), cand)
      .select(col("query_id"), col("neighbor_id"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    c.join(broadcast(cands), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
      .withColumn("rank", row_number().over(wC))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
