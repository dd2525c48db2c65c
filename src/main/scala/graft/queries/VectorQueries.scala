package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{QueryDef, Tables}
import graft.operators.{Dedup, Similarity}

/** Similarity-search surface over the `embeddings` table (64-dim float
  * vectors). Cosine math runs in DOUBLE as a left fold (deterministic;
  * DuckDB's list_cosine_similarity over DOUBLE[] folds the same way —
  * verified empirically for bit-equality before wiring the oracle).
  */
object VectorQueries {

  /** MMR-diversified top-4 ([[Similarity.mmrTopK]], λ = 0.5) for one
    * query vector: greedy relevance-vs-redundancy re-ranking, each of the
    * k steps one distributed top-1 pass with the selected set literalized
    * as model parameters. The oracle unrolls the same greedy recursion as
    * k chained single-row CTEs — identical IEEE score arithmetic
    * (0.5·rel − 0.5·max-cos, greatest over the selected set), identical
    * (score DESC, id) tie-break — so ranks, ids, and scores hash-match.
    */
  private def annMmr(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val qv = emb.where(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toIndexedSeq
    // explicit route (advisor finding r10): the oracle scores the WHOLE
    // corpus each greedy step, so a pre-filtered pool can't be used
    // without changing semantics — opt into the k-pass corpus loop
    // (each step one distributed top-1, no routing count, works at any
    // corpus size) instead of the size-gated default that would throw
    // on a fixture above rerankPoolMax.
    Similarity.mmrTopK(emb.where(col("vec_id") > 0), qv, k = 4, lambda = 0.5,
        allowCorpusScan = true)
      .orderBy(col("rank"))
  }
  private val annMmrSql = {
    def penal(prev: Seq[Int]): String =
      if (prev.isEmpty) "0.5 * 0.0"
      else if (prev.size == 1)
        s"0.5 * list_cosine_similarity(v, (SELECT v FROM s${prev.head}))"
      else
        "0.5 * greatest(" + prev.map(i =>
          s"list_cosine_similarity(v, (SELECT v FROM s$i))").mkString(", ") + ")"
    def step(i: Int): String = {
      val prev = 1 until i
      val excl =
        if (prev.isEmpty) ""
        else s" WHERE vec_id NOT IN (${prev.map(j => s"(SELECT vec_id FROM s$j)").mkString(", ")})"
      s"""s$i AS (SELECT vec_id, v, score FROM (
         |  SELECT vec_id, v, 0.5 * rel - ${penal(prev)} AS score FROM c$excl) t
         |ORDER BY score DESC, vec_id LIMIT 1)""".stripMargin
    }
    val steps = (1 to 4).map(step).mkString(",\n")
    val out = (1 to 4).map(i =>
      s"SELECT $i AS rank, vec_id AS neighbor_id, score FROM s$i").mkString("\nUNION ALL ")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |q AS (SELECT v FROM emb WHERE vec_id = 0),
       |c AS (SELECT vec_id, v, list_cosine_similarity(v, (SELECT v FROM q)) AS rel
       |      FROM emb WHERE vec_id > 0),
       |$steps
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** Exact brute-force top-5 cosine neighbors for the first 10 vectors —
    * the ANN correctness baseline. Queries broadcast; corpus never
    * shuffles; ranking moves only (query, score, id).
    */
  private def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for the first
    * 10 vectors, the top-5 most-similar corpus vectors with a DIFFERENT
    * label — the contrastive-training negatives a dense-retrieval
    * pipeline mines (easy random negatives teach nothing; the near-miss
    * wrong-label ones carry the gradient). Same exact-cosine contract as
    * ann01, so the oracle is ann01's window with the label-mismatch
    * predicate on the join.
    */
  private def annHardNeg(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.hardNegatives(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }
  /** Embedding drift monitor: per-label centroid cosine between the two
    * vec_id-parity halves of the corpus (the stand-in for "last epoch vs
    * this epoch" — in production the split key is the ingest batch). A
    * drift tick far below 2^20 on a label says its embedding
    * distribution moved between cohorts — re-index / re-train signal.
    * Unlike ann18 nothing is collected or literalized: centroids are
    * compared only to EACH OTHER, so the whole query is declarative —
    * one map-side-expanded (label, half, dim) integer rollup (output ≤
    * |labels|·2·dims rows at any corpus size), centroid arrays
    * re-assembled in dim order, and the ann18-verified left-fold cosine
    * (bit-identical to DuckDB's list_cosine_similarity) per label.
    */
  /** (label, dim) → exact integer centroid moments (quantized sum +
    * count) of an embedding frame — the domain-bounded rollup both the
    * batch (ann20) and streaming (st32) drift monitors reduce a cohort
    * to; output ≤ |labels|·dims rows at any corpus size, and as a
    * STREAMING aggregation its state is bounded the same way.
    */
  private[queries] def centroidMoments(df: DataFrame): DataFrame =
    df.select(col("label").cast("int").as("label"),
        posexplode(col("embedding").cast("array<double>")))
      .select(col("label"), col("pos").as("dim"),
        floor(col("col") * lit(1048576L) + lit(0.5)).cast("long").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("s"), count(lit(1)).as("n"))

  /** Moments → per-label dim-ordered centroid array (the s/n/2^20 double
    * fold shared with ann18's arithmetic) + cohort size. */
  private[queries] def centroidFrame(moments: DataFrame): DataFrame =
    moments.select(col("label"), col("dim"), col("n"),
        (col("s").cast("double") / col("n").cast("double") / lit(1048576L).cast("double")).as("c"))
      .groupBy(col("label"))
      .agg(
        transform(array_sort(collect_list(struct(col("dim"), col("c")))),
          s => s.getField("c")).as("cv"),
        // max, not first: first() is partitioning-dependent, and on a
        // ragged corpus (some vectors shorter) per-dim counts differ —
        // max matches the oracle's max(n) deterministically
        max(col("n")).as("nv"))

  /** Per-label drift ticks between two centroid frames (left fold cosine
    * — bit-identical to DuckDB's list_cosine_similarity). */
  private[queries] def driftJoin(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("label"), col("cv").as("cva"), col("nv").as("n_a"))
      .join(b.select(col("label"), col("cv").as("cvb"), col("nv").as("n_b")), "label")
      .select(col("label"), col("n_a"), col("n_b"),
        floor(Similarity.cosine(col("cva"), col("cvb")) * lit(1048576L)).cast("long")
          .as("drift_ticks"))
      .orderBy(col("label"))

  private def annCentroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    def half(h: Int) = emb.where(pmod(col("vec_id"), lit(2L)) === h)
    // the two cohorts' moment rollups are IDENTICAL exchange subtrees up
    // to the parity filter; at 100 TB the split key is the ingest batch
    // and each cohort is its own (much smaller) scan
    driftJoin(centroidFrame(centroidMoments(half(0))),
      centroidFrame(centroidMoments(half(1))))
  }
  private[queries] val annCentroidDriftSql =
    """WITH v AS (SELECT vec_id, label, vec_id % 2 AS half,
      |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dims AS (SELECT label, half, unnest(generate_series(1, len(v))) AS dim, v FROM v),
      |qsum AS (SELECT label, half, dim,
      |    CAST(sum(CAST(floor(v[dim] * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS s,
      |    count(*) AS n
      |  FROM dims GROUP BY 1, 2, 3),
      |cent AS (SELECT label, half,
      |    list(CAST(s AS DOUBLE) / n / 1048576.0 ORDER BY dim) AS c,
      |    max(n) AS nv
      |  FROM qsum GROUP BY 1, 2)
      |SELECT a.label, CAST(a.nv AS BIGINT) AS n_a, CAST(b.nv AS BIGINT) AS n_b,
      |  CAST(floor(list_cosine_similarity(a.c, b.c) * 1048576) AS BIGINT) AS drift_ticks
      |FROM cent a JOIN cent b ON a.label = b.label AND a.half = 0 AND b.half = 1
      |ORDER BY a.label""".stripMargin

  /** Retrieval-quality audit ([[Similarity.labeledTopK]]): hits, MRR and
    * log2-discounted DCG at k=10 over the first 50 query vectors, with
    * label-match relevance, rolled up per query label — the offline eval
    * an embedding-training pipeline runs after every checkpoint. All
    * metrics are integer 2^-20 ticks; the DCG discount reuses the ONE
    * shared fixed-point log2 ([[TextQueries.Unigram.l2fp]], the unigram /
    * temperature-mix contract), so per-label sums hash-match DuckDB
    * bit-exactly. Plan: one corpus scan (queries broadcast, TopKPerKey
    * heaps bound the ranking exchange), then two tiny rollups — the
    * metric stage is |queries|-sized regardless of corpus size.
    */
  private def annRetrievalMetrics(spark: SparkSession, dir: String): DataFrame = {
    import TextQueries.Unigram.{Fp, l2fp}
    val emb = Tables(spark, dir).embeddings
    val ranked = Similarity.labeledTopK(emb.where(col("vec_id") < 50), emb, k = 10)
    val rel = col("q_label") === col("n_label")
    val perQ = ranked.groupBy(col("query_id"), col("q_label"))
      .agg(
        sum(when(rel, lit(1L)).otherwise(lit(0L))).as("hits"),
        min(when(rel, col("rank").cast("long"))).as("first_rel"),
        sum(when(rel,
            expr(s"cast(${Fp * Fp} as bigint) div ${l2fp("cast(rank + 1 as bigint)")}"))
          .otherwise(lit(0L))).as("dcg_ticks"))
    perQ
      .select(col("q_label"), col("hits"), col("dcg_ticks"),
        expr(s"coalesce(cast($Fp as bigint) div first_rel, cast(0 as bigint))").as("rr"))
      .groupBy(col("q_label"))
      .agg(count(lit(1)).as("n_queries"), sum(col("hits")).as("hits"),
        expr("sum(rr) div count(1)").as("mrr_ticks"),
        expr("sum(dcg_ticks) div count(1)").as("dcg_ticks"))
      .select(col("q_label").as("label"), col("n_queries"), col("hits"),
        col("mrr_ticks"), col("dcg_ticks"))
      .orderBy(col("label"))
  }
  private val annRetrievalMetricsSql = {
    import TextQueries.Unigram.l2fpSql
    s"""WITH ranked AS (
       |  SELECT query_id, q_label, rank, n_label FROM (
       |    SELECT q.vec_id AS query_id, q.label AS q_label, c.label AS n_label,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                   CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 50) t
       |  WHERE rank <= 10),
       |perq AS (
       |  SELECT query_id, q_label,
       |    CAST(sum(CASE WHEN n_label = q_label THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |    CAST(min(CASE WHEN n_label = q_label THEN rank END) AS BIGINT) AS first_rel,
       |    CAST(sum(CASE WHEN n_label = q_label
       |      THEN 1099511627776 // (${l2fpSql("((rank + 1)::BIGINT)")})
       |      ELSE 0 END) AS BIGINT) AS dcg_ticks
       |  FROM ranked GROUP BY 1, 2)
       |SELECT q_label AS label, count(*)::BIGINT AS n_queries,
       |  CAST(sum(hits) AS BIGINT) AS hits,
       |  CAST(sum(coalesce(1048576 // first_rel, 0)) AS BIGINT) // count(*) AS mrr_ticks,
       |  CAST(sum(dcg_ticks) AS BIGINT) // count(*) AS dcg_ticks
       |FROM perq GROUP BY q_label ORDER BY label""".stripMargin
  }

  /** Class-separation margin audit ([[Similarity.classMarginAudit]]):
    * per-label centroid cosines in integer 2^-20 ticks — own-label vs
    * best other-label — with margin-violation counts. The oracle rebuilds
    * the identical centroids (same `floor(v·2^20+0.5)` sums, same
    * `s/n/2^20` fold order) and the same tick floors, so counts AND tick
    * sums hash-match bit-exactly.
    */
  private def annClassMargin(spark: SparkSession, dir: String): DataFrame =
    Similarity.classMarginAudit(Tables(spark, dir).embeddings)
      .orderBy(col("label"))
  private val annClassMarginSql =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |dims AS (SELECT label, unnest(generate_series(1, len(v))) AS dim, v FROM v),
      |q AS (SELECT label, dim,
      |    CAST(sum(CAST(floor(v[dim] * 1048576 + 0.5) AS BIGINT)) AS BIGINT) AS s,
      |    count(*) AS n
      |  FROM dims GROUP BY 1, 2),
      |cent AS (SELECT label, list(CAST(s AS DOUBLE) / n / 1048576.0 ORDER BY dim) AS c
      |  FROM q GROUP BY label),
      |scored AS (
      |  SELECT a.vec_id, a.label AS vlabel, ce.label AS clabel,
      |    CAST(floor(list_cosine_similarity(a.v, ce.c) * 1048576) AS BIGINT) AS ct
      |  FROM v a CROSS JOIN cent ce),
      |per AS (
      |  SELECT vec_id, vlabel,
      |    max(CASE WHEN clabel = vlabel THEN ct END) AS own_t,
      |    max(CASE WHEN clabel <> vlabel THEN ct END) AS other_t
      |  FROM scored GROUP BY 1, 2)
      |SELECT vlabel AS label, count(*) AS n,
      |  CAST(sum(own_t) AS BIGINT) AS own_ticks,
      |  CAST(sum(other_t) AS BIGINT) AS other_ticks,
      |  CAST(sum(CASE WHEN own_t <= other_t THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  private val annHardNegSql =
    """SELECT query_id, rank, neighbor_id, cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.label <> c.label
      |  WHERE q.vec_id < 10) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  private val annBruteSql =
    """SELECT query_id, rank, neighbor_id, cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |  WHERE q.vec_id < 10) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** FILTERED vector search — the production RAG shape: top-k among only
    * the corpus vectors passing a metadata predicate (label ≤ 4 here;
    * tenant/language/recency in practice). PRE-filtering is the correct
    * form: the predicate pushes to the corpus scan, the search runs over
    * survivors, and recall is exact over the filtered set — where a
    * post-filtered ANN index drops below k results whenever the predicate
    * is selective inside the returned candidates. At IVF scale the same
    * predicate applies before cell assignment, shrinking every posting
    * list it touches.
    */
  private def annFiltered(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.bruteForceTopK(
        emb.where(col("vec_id") < 10),
        emb.where(col("label") <= 4), k = 5)
      .orderBy(col("query_id"), col("rank"))
  }
  private val annFilteredSql =
    """SELECT query_id, rank, neighbor_id, cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(c.embedding AS DOUBLE[])) AS cos,
      |    row_number() OVER (PARTITION BY q.vec_id
      |      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                 CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
      |  FROM embeddings q JOIN embeddings c
      |    ON q.vec_id <> c.vec_id AND c.label <= 4
      |  WHERE q.vec_id < 10) t
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** LSH-bucketed approximate top-3 — the scale path (one bucket-key
    * shuffle instead of a corpus × queries product). The SRP hyperplanes
    * are deterministic (hash-derived), so the oracle interpolates the SAME
    * 48×64 plane matrix as SQL literals ([[VectorImpl.planeComponent]]),
    * recomputes buckets with identical left-to-right double folds, and
    * mirrors candidate-set → exact-rescore → top-k — fully hash-gated
    * (was rows-only). Recall vs brute force additionally asserted in
    * SimilaritySpec.
    */
  private val lshPlanes = 4
  private val lshTables = 12
  private def annLsh(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.lshTopK(emb.where(col("vec_id") < 10), emb, k = 3,
      nPlanes = lshPlanes, nTables = lshTables)
      .orderBy(col("query_id"), col("rank"))
  }
  private val annLshSql: String = {
    val dims = 64 // embeddings fixture dimensionality (TESTDATA.md)
    val rows = for { t <- 0 until lshTables; p <- 0 until lshPlanes } yield {
      val comps = (0 until dims)
        .map(d => graft.functions.VectorImpl.planeComponent(t * lshPlanes + p, d))
      s"($t,$p,[${comps.mkString(",")}])"
    }
    s"""WITH planes(tbl, p, comps) AS (VALUES ${rows.mkString(",\n")}),
       |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |projs AS (
       |  SELECT e.vec_id, pl.tbl, pl.p,
       |    list_reduce(list_prepend(0.0,
       |      list_transform(list_zip(e.v, pl.comps), x -> x[1]*x[2])),
       |      (a,b) -> a+b) AS proj
       |  FROM emb e CROSS JOIN planes pl),
       |buckets AS (
       |  SELECT vec_id, tbl,
       |    CAST(sum(CASE WHEN proj >= 0 THEN (1<<p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM projs GROUP BY vec_id, tbl),
       |cand AS (
       |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
       |  FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
       |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
       |scored AS (
       |  SELECT cand.query_id, cand.neighbor_id,
       |    list_cosine_similarity(qe.v, ce.v) AS cos,
       |    row_number() OVER (PARTITION BY cand.query_id
       |      ORDER BY list_cosine_similarity(qe.v, ce.v) DESC, cand.neighbor_id) AS rank
       |  FROM cand JOIN emb qe ON qe.vec_id = cand.query_id
       |            JOIN emb ce ON ce.vec_id = cand.neighbor_id)
       |SELECT query_id, rank, neighbor_id, cos FROM scored
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** Embedding near-dup pairs above a cosine threshold — SRP-LSH blocked
    * candidates + exact cosine rescore (no cartesian in the plan; asserted
    * in PlanSpec). EXPLICIT 2 planes × 16 tables: deterministically
    * 100%-recall on every fixture corpus at threshold 0.35, so the output
    * still matches the exact all-pairs oracle (0.35 is below sign-LSH's
    * economical range — the auto sizing would trade that exactness for
    * selectivity; see [[Dedup.embeddingDupPairs]]).
    */
  private def embDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingDupPairs(Tables(spark, dir).embeddings, threshold = 0.35,
        nPlanes = 2, nTables = 16)
      .select(col("id_a"), col("id_b"), col("cos"))
      .orderBy(col("id_a"), col("id_b"))
  private val embDupSql =
    """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |  list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                         CAST(b.embedding AS DOUBLE[])) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |        CAST(b.embedding AS DOUBLE[])) >= 0.35
      |ORDER BY id_a, id_b""".stripMargin

  /** Vector norms + per-label centroid magnitude — aggregate over array
    * columns (`aggregate`/`zip_with` folds, no UDFs).
    */
  private def vecStats(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
    emb.select(col("label"),
        Similarity.norm2(col("v")).as("nrm"),
        element_at(col("v"), 1).as("first_dim"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        min(col("nrm")).as("min_norm"),
        max(col("nrm")).as("max_norm"),
        max(col("first_dim")).as("max_first_dim"))
      .orderBy(col("label"))
  }
  private val vecStatsSql =
    """SELECT label, count(*) AS n,
      |  min(nrm) AS min_norm, max(nrm) AS max_norm,
      |  max(first_dim) AS max_first_dim
      |FROM (SELECT label,
      |        sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS nrm,
      |        CAST(embedding[1] AS DOUBLE) AS first_dim
      |      FROM embeddings) t
      |GROUP BY label ORDER BY label""".stripMargin

  /** IVF-bucketed approximate top-3 over TRAINED centroids: 5
    * deterministic k-means rounds ([[Similarity.kmeansCentroids]]) from
    * the first-nCells seeds, then corpus partitioned into Voronoi cells
    * and queries probe the nearest cells only. Every stage is
    * SQL-expressible and hash-gated: centroid means go through quantized
    * INTEGER sums (order-independent, so Spark's parallel aggregation and
    * DuckDB's serial one produce bit-identical centroids), assignment
    * ties break to the lowest cell, and cosine folds are bit-identical
    * cross-engine — the oracle below mirrors each training round as a CTE
    * chain. Trained-vs-seed recall is asserted in SimilaritySpec.
    */
  private val ivfRounds = 5
  private val ivfCells  = 16
  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 3,
      nCells = ivfCells, nProbe = 6, trainRounds = ivfRounds)
      .orderBy(col("query_id"), col("rank"))
  }
  /** The shared IVF CTE tower (k-means training, corpus assignment,
    * query probes WITH their probe rank `rn` kept through) — ONE
    * definition consumed by ann05, ann12 (which wraps ann05), and
    * ann21's probe sweep, so the trained index can't drift between its
    * judged consumers. `maxProbe` bounds the probes CTE.
    */
  private[queries] def ivfTowerCtes(maxProbe: Int): String = {
    val dims = 64 // embeddings fixture dimensionality (TESTDATA.md)
    val q = Similarity.KmeansQuantScale // 2^20 fixed-point ticks
    def roundCtes(r: Int): String =
      s"""assign$r AS (
         |  SELECT cell, v FROM (
         |    SELECT e.v, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.mv) DESC, c.cell) AS rn
         |    FROM emb e CROSS JOIN cent${r - 1} c) t WHERE rn = 1),
         |sums$r AS (
         |  SELECT cell, dim,
         |    sum(CAST(floor(v[dim] * $q.0 + 0.5) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM assign$r CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS dim) d
         |  GROUP BY cell, dim),
         |cent$r AS (
         |  SELECT c0.cell, coalesce(t.mv, c0.mv) AS mv
         |  FROM cent${r - 1} c0 LEFT JOIN (
         |    SELECT cell,
         |      list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / $q.0 ORDER BY dim) AS mv
         |    FROM sums$r GROUP BY cell) t ON c0.cell = t.cell)""".stripMargin
    val rounds = (1 to ivfRounds).map(roundCtes).mkString(",\n")
    s"""emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS mv
       |  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT $ivfCells) s),
       |$rounds,
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, cv, cell FROM (
       |    SELECT c.vec_id, c.v AS cv, ct.cell,
       |      row_number() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_cosine_similarity(c.v, ct.mv) DESC, ct.cell) AS rn
       |    FROM emb c CROSS JOIN cent$ivfRounds ct) t WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, qv, cell, rn FROM (
       |    SELECT q.vec_id, q.v AS qv, ct.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, ct.mv) DESC, ct.cell) AS rn
       |    FROM emb q CROSS JOIN cent$ivfRounds ct WHERE q.vec_id < 10) t
       |  WHERE rn <= $maxProbe)""".stripMargin
  }
  private[queries] val annIvfSql: String =
    s"""WITH ${ivfTowerCtes(6)}
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT p.query_id, a.neighbor_id, list_cosine_similarity(p.qv, a.cv) AS cos,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY list_cosine_similarity(p.qv, a.cv) DESC, a.neighbor_id) AS rank
       |  FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE p.query_id <> a.neighbor_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** ann21: the IVF operating curve ([[Similarity.ivfOperatingCurve]]) —
    * recall@3 and scanned-candidate volume at nProbe ∈ {1,2,4,8} over
    * the ann05-trained index: the tuning table that picks a deployment's
    * latency/recall point. One corpus assignment + one scoring pass at
    * nProbe=8 serves all four configs (candidates carry their cell's
    * probe rank; each config is a filter + window over the shared
    * stream). The oracle sweeps the same shared tower.
    */
  private def annNprobeCurve(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val cents = Similarity.kmeansCentroids(emb, nCells = ivfCells, rounds = ivfRounds)
    Similarity.ivfOperatingCurve(emb.where(col("vec_id") < 10), emb, cents,
      k = 3, probes = Seq(1, 2, 4, 8))
  }
  private val annNprobeCurveSql: String =
    s"""WITH ${ivfTowerCtes(8)},
       |cand AS (
       |  SELECT p.query_id, p.rn, a.neighbor_id,
       |    list_cosine_similarity(p.qv, a.cv) AS cos
       |  FROM probes p JOIN assigned a ON p.cell = a.cell
       |  WHERE p.query_id <> a.neighbor_id),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                   CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 10) t WHERE rank <= 3),
       |net AS (SELECT count(*)::BIGINT AS n_exact FROM exact),
       |ps AS (SELECT unnest([1, 2, 4, 8]) AS nprobe),
       |sub AS (SELECT ps.nprobe, c.query_id, c.neighbor_id, c.cos
       |        FROM ps JOIN cand c ON c.rn <= ps.nprobe),
       |ncand AS (SELECT nprobe, count(*)::BIGINT AS n_candidates
       |          FROM sub GROUP BY nprobe),
       |topk AS (SELECT nprobe, query_id, neighbor_id FROM (
       |    SELECT nprobe, query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY nprobe, query_id
       |        ORDER BY cos DESC, neighbor_id) AS rnk FROM sub) t
       |  WHERE rnk <= 3),
       |hits AS (SELECT t.nprobe, count(*)::BIGINT AS n_hits
       |         FROM topk t JOIN exact e USING (query_id, neighbor_id)
       |         GROUP BY t.nprobe)
       |SELECT nc.nprobe, nc.n_candidates,
       |  coalesce(h.n_hits, 0)::BIGINT AS n_hits, net.n_exact,
       |  CAST((coalesce(h.n_hits, 0) * 1048576) // net.n_exact AS BIGINT) AS recall_ticks
       |FROM ncand nc LEFT JOIN hits h ON nc.nprobe = h.nprobe CROSS JOIN net
       |ORDER BY nc.nprobe""".stripMargin

  /** IVF+PQ approximate top-3 ([[Similarity.ivfPqTopK]] — the FAISS
    * IVFADC layout): coarse cells bound the search, an 8×16 PQ codebook
    * TRAINED by [[pqRounds]] deterministic per-subspace k-means rounds
    * ([[Similarity.pqCodebook]] — quantized integer sums, ties to the
    * lowest code, so the trained codebook is bit-identical cross-engine)
    * compresses the fine scoring, ADC = one cosine fold against the
    * decoded vector, exact rescore of the top 16. Every stage is
    * deterministic and SQL-expressible — the oracle mirrors the training
    * rounds as a CTE tower (assign → quantized sums → means, the annIvf
    * pattern), then encode (argmin per subspace), decode (ordered
    * sub-centroid concat), coarse assign/probe, ADC ranking, and the
    * exact rescore.
    */
  private val pqRounds = 3
  private def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.ivfPqTopK(emb.where(col("vec_id") < 10), emb, k = 3,
        pqTrainRounds = pqRounds)
      .orderBy(col("query_id"), col("rank"))
  }
  private val annIvfPqSql: String = {
    val q = Similarity.KmeansQuantScale // 2^20 fixed-point ticks
    def fold(cRef: String) =
      "list_reduce(list_prepend(0.0, list_transform(list_zip(sv, " + cRef +
        "), x -> (x[1]-x[2])*(x[1]-x[2]))), (a,b) -> a+b)"
    // one training round: assign every (vector, subspace) to its nearest
    // code under pqcent{r-1} (ties to the lowest j), then per-(s, j, dim)
    // quantized-integer means; codes nobody chose keep their centroid
    def trainCtes(r: Int): String =
      s"""pcodes$r AS (
         |  SELECT vec_id, s, j, sv FROM (
         |    SELECT e.vec_id, p.s, p.j, sl.sv,
         |      row_number() OVER (PARTITION BY e.vec_id, p.s
         |        ORDER BY ${fold("p.c")} ASC, p.j ASC) AS rn
         |    FROM (SELECT vec_id, v FROM emb) e
         |    CROSS JOIN pqcent${r - 1} p
         |    CROSS JOIN LATERAL (SELECT e.v[p.s*8+1 : p.s*8+8] AS sv) sl) t
         |  WHERE rn = 1),
         |psums$r AS (
         |  SELECT s, j, dim,
         |    sum(CAST(floor(sv[dim] * $q.0 + 0.5) AS BIGINT)) AS sm,
         |    count(*) AS n
         |  FROM pcodes$r CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS dim) d
         |  GROUP BY s, j, dim),
         |pqcent$r AS MATERIALIZED (
         |  SELECT c0.s, c0.j, coalesce(t.c, c0.c) AS c
         |  FROM pqcent${r - 1} c0 LEFT JOIN (
         |    SELECT s, j,
         |      list(CAST(sm AS DOUBLE) / CAST(n AS DOUBLE) / $q.0 ORDER BY dim) AS c
         |    FROM psums$r GROUP BY s, j) t ON c0.s = t.s AND c0.j = t.j)""".stripMargin
    val training = (1 to pqRounds).map(trainCtes).mkString(",\n")
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |seed16 AS (SELECT row_number() OVER (ORDER BY vec_id) AS rn, v
       |           FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 16) t),
       |pqcent0 AS (
       |  SELECT sub.s, rn - 1 AS j, v[sub.s*8+1 : sub.s*8+8] AS c
       |  FROM seed16 CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) sub),
       |$training,
       |pqcent AS (SELECT s, j, c FROM pqcent$pqRounds),
       |codes AS (
       |  SELECT vec_id, s, j FROM (
       |    SELECT e.vec_id, p.s, p.j,
       |      row_number() OVER (PARTITION BY e.vec_id, p.s
       |        ORDER BY ${fold("p.c")} ASC, p.j ASC) AS rn
       |    FROM (SELECT vec_id, v FROM emb) e
       |    CROSS JOIN pqcent p
       |    CROSS JOIN LATERAL (SELECT e.v[p.s*8+1 : p.s*8+8] AS sv) sl) t
       |  WHERE rn = 1),
       |decoded AS (
       |  SELECT codes.vec_id, flatten(list(p.c ORDER BY codes.s)) AS dv
       |  FROM codes JOIN pqcent p ON p.s = codes.s AND p.j = codes.j
       |  GROUP BY codes.vec_id),
       |cent0 AS (SELECT rn AS cell, v AS mv FROM seed16),
       |assigned AS (
       |  SELECT vec_id AS neighbor_id, cell FROM (
       |    SELECT e.vec_id, ct.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, ct.mv) DESC, ct.cell) AS rn
       |    FROM emb e CROSS JOIN cent0 ct) t WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, v AS qv, cell FROM (
       |    SELECT q.vec_id, q.v, ct.cell,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, ct.mv) DESC, ct.cell) AS rn
       |    FROM emb q CROSS JOIN cent0 ct WHERE q.vec_id < 10) t WHERE rn <= 6),
       |cand AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT p.query_id, a.neighbor_id,
       |      row_number() OVER (PARTITION BY p.query_id
       |        ORDER BY list_cosine_similarity(p.qv, d.dv) DESC, a.neighbor_id) AS rn
       |    FROM probes p JOIN assigned a ON p.cell = a.cell
       |    JOIN decoded d ON d.vec_id = a.neighbor_id
       |    WHERE p.query_id <> a.neighbor_id) t WHERE rn <= 16)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT c2.query_id, c2.neighbor_id,
       |    list_cosine_similarity(qe.v, ne.v) AS cos,
       |    row_number() OVER (PARTITION BY c2.query_id
       |      ORDER BY list_cosine_similarity(qe.v, ne.v) DESC, c2.neighbor_id) AS rank
       |  FROM cand c2
       |  JOIN emb qe ON qe.vec_id = c2.query_id
       |  JOIN emb ne ON ne.vec_id = c2.neighbor_id) t
       |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** SemDeDup-style semantic dedup ([[Similarity.semanticDedup]]):
    * cell-blocked greedy keep-first over cosine ≥ 0.30. The oracle
    * mirrors the seed-centroid assignment (same argmax/tie-break as
    * ann05/ann06) and the lower-id flag rule over exact within-cell
    * cosines, so blocking AND dedup policy are both hash-gated. Cell
    * count is auto-sized (max(16, n/128), mirrored by the oracle's
    * subquery LIMIT) so within-cell quadratic work stays bounded as the
    * corpus grows — fixed 16 cells measured ~600× cost for 10× rows on
    * the sf1 scaling run.
    */
  private def semDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(Tables(spark, dir).embeddings,
        threshold = 0.30)
      .orderBy(col("vec_id"))
  private val semDedupSql =
    """WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS mv
      |          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id
      |                LIMIT (SELECT greatest(16, count(*)//128) FROM emb)) s),
      |assigned AS (
      |  SELECT vec_id, v, cell FROM (
      |    SELECT e.vec_id, e.v, c.cell,
      |      row_number() OVER (PARTITION BY e.vec_id
      |        ORDER BY list_cosine_similarity(e.v, c.mv) DESC, c.cell) AS rn
      |    FROM emb e CROSS JOIN cent0 c) t WHERE rn = 1),
      |lower_dups AS (
      |  SELECT a.vec_id, count(*) AS n_lower
      |  FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id > b.vec_id
      |  WHERE list_cosine_similarity(a.v, b.v) >= 0.30
      |  GROUP BY a.vec_id)
      |SELECT vec_id, cell, (n_lower IS NULL) AS kept
      |FROM assigned LEFT JOIN lower_dups USING (vec_id)
      |ORDER BY vec_id""".stripMargin

  /** Exact cosine radius search ([[Similarity.radiusSearch]]): all corpus
    * vectors within minCos of each query — no window, no exchange; the
    * threshold predicate streams out of the broadcast-join scan stage.
    * The oracle computes the same cosine with DuckDB's
    * list_cosine_similarity (bit-agreement pinned by ann01 since round 1).
    */
  private def annRadius(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.radiusSearch(emb.where(col("vec_id") < 5), emb, minCos = 0.30)
      .orderBy(col("query_id"), col("neighbor_id"))
  }
  private val annRadiusSql =
    """SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                         CAST(c.embedding AS DOUBLE[])) AS cos
      |FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      |WHERE q.vec_id < 5
      |  AND list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                             CAST(c.embedding AS DOUBLE[])) >= 0.30
      |ORDER BY query_id, neighbor_id""".stripMargin

  /** MaxSim late-interaction scoring ([[Similarity.maxSimTopK]]): the
    * embeddings fixture grouped into 10-vector documents (`vec_id div 10`
    * — replica key strides are multiples of 10, so sf-scaled ids group
    * within their replica). Bit-parity via per-row sorted-order folds on
    * both engines — see the operator scaladoc.
    */
  private def annMaxSim(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
      .withColumn("doc_id", expr("vec_id div 10"))
    Similarity.maxSimTopK(emb.where(col("doc_id") < 2), emb, k = 5)
      .orderBy(col("q_doc"), col("rank"))
  }
  private val annMaxSimSql =
    """WITH v AS (
      |  SELECT vec_id // 10 AS doc_id, vec_id, CAST(embedding AS DOUBLE[]) AS v
      |  FROM embeddings),
      |docs AS (
      |  SELECT doc_id, list(v ORDER BY vec_id) AS vs FROM v GROUP BY doc_id),
      |scored AS (
      |  SELECT q.doc_id AS q_doc, c.doc_id AS c_doc,
      |    list_sum(list_transform(q.vs, qv ->
      |      list_max(list_transform(c.vs, cv ->
      |        list_cosine_similarity(qv, cv))))) AS maxsim
      |  FROM docs q JOIN docs c ON q.doc_id <> c.doc_id
      |  WHERE q.doc_id < 2)
      |SELECT q_doc, rank, c_doc, maxsim FROM (
      |  SELECT q_doc, c_doc, maxsim,
      |    row_number() OVER (PARTITION BY q_doc
      |      ORDER BY maxsim DESC, c_doc) AS rank
      |  FROM scored) t
      |WHERE rank <= 5 ORDER BY q_doc, rank""".stripMargin

  /** IVF recall audit (ann12) — the evaluation primitive every ANN
    * deployment runs before trusting an index: recall@k of the IVF
    * search (ann05's exact configuration) against the brute-force
    * ground truth, per query. At 100 TB this runs over a sampled query
    * set while the index serves traffic — here the judged query IS the
    * audit, so a recall regression in the index machinery flips a
    * hash gate, not just a dashboard. Integer outputs only (hit counts,
    * not ratios) keep the gate bit-exact.
    *
    * Scale shape: both sides reuse the operators' own plans (queries
    * broadcast, corpus never shuffles); the audit join moves only
    * (query_id, neighbor_id) pairs — 10 x 3 rows here, sample-sized
    * always.
    */
  private def annIvfRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val queries = emb.where(col("vec_id") < 10)
    val approx = Similarity.ivfTopK(queries, emb, k = 3,
        nCells = ivfCells, nProbe = 6, trainRounds = ivfRounds)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 3)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), lit(3L).as("k"), col("n_hits"))
      .orderBy(col("query_id"))
  }
  private val annIvfRecallSql: String =
    s"""WITH approx AS (SELECT query_id, neighbor_id FROM ($annIvfSql) a),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                   CAST(c.embedding AS DOUBLE[])) DESC, c.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 10) t
       |  WHERE rank <= 3)
       |SELECT e.query_id, CAST(3 AS BIGINT) AS k,
       |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hits
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin

  /** ann13: int8 scalar quantization + exact rescore
    * ([[Similarity.sqTopK]]) — search on 4×-smaller integer codes
    * (EXACT int L2², no float until the rescore), then full-precision
    * cosine over the top-20 survivors. Same query set / output shape as
    * ann01, so SimilaritySpec can audit recall@5 directly.
    */
  private def annSq(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.sqTopK(emb.where(col("vec_id") < 10), emb, k = 5, cand = 20)
      .orderBy(col("query_id"), col("rank"))
  }
  private val annSqSql: String = {
    val dims = 64
    val quant = "list_transform(%s, (x, i) -> CASE WHEN mxs[i] = mns[i] THEN 0 " +
      "ELSE least(greatest(floor((x - mns[i]) * 255.0 / (mxs[i] - mns[i]))::INT, 0), 255) END)"
    s"""WITH emb AS MATERIALIZED (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |st AS MATERIALIZED (
       |  SELECT list(mn ORDER BY dim) AS mns, list(mx ORDER BY dim) AS mxs
       |  FROM (SELECT dim, min(v[dim]) AS mn, max(v[dim]) AS mx
       |        FROM emb CROSS JOIN
       |          (SELECT unnest(generate_series(1, $dims)) AS dim) d
       |        GROUP BY dim)),
       |cq AS MATERIALIZED (
       |  SELECT vec_id, ${quant.format("v")} AS q FROM emb, st),
       |dist AS (
       |  SELECT qq.vec_id AS query_id, cc.vec_id AS neighbor_id,
       |    list_sum(list_transform(range(1, ${dims + 1}),
       |      i -> ((qq.q[i] - cc.q[i]) * (qq.q[i] - cc.q[i]))::BIGINT))::BIGINT AS dist
       |  FROM cq qq JOIN cq cc ON qq.vec_id <> cc.vec_id
       |  WHERE qq.vec_id < 10),
       |cands AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT query_id, neighbor_id,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY dist, neighbor_id) AS rn
       |    FROM dist) t WHERE rn <= 20)
       |SELECT query_id, rank, neighbor_id, cos FROM (
       |  SELECT c.query_id, c.neighbor_id,
       |    list_cosine_similarity(q.v, n.v) AS cos,
       |    row_number() OVER (PARTITION BY c.query_id
       |      ORDER BY list_cosine_similarity(q.v, n.v) DESC, c.neighbor_id) AS rank
       |  FROM cands c
       |  JOIN emb q ON q.vec_id = c.query_id
       |  JOIN emb n ON n.vec_id = c.neighbor_id) t
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** Cluster-balanced diversity sampling ([[Similarity.clusterSample]]):
    * nearest-seed-centroid assignment (ann08's map-side blocking, FIXED
    * 64 cells — sampling has no pair stage, so cells must not grow with
    * n or the assignment itself turns quadratic; see the operator doc), a
    * sqrt-flattened integer budget per cluster, picks by avalanche hash
    * of the id. Budget auto-scales with the corpus (max(60, n/100)) so
    * the draw stays non-degenerate across sf. The oracle
    * replays assignment, allocation, and the hash draw exactly — every
    * pick and rank hash-gated.
    */
  private def annClusterSample(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val budget = math.max(60L, emb.count() / 100L)
    Similarity.clusterSample(emb, budget)
      .orderBy(col("cell"), col("pick_rank"))
  }
  private val annClusterSampleSql =
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS mv
       |          FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 64) s),
       |assigned AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT e.vec_id, c.cell,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY list_cosine_similarity(e.v, c.mv) DESC, c.cell) AS rn
       |    FROM emb e CROSS JOIN cent0 c) t WHERE rn = 1),
       |sizes AS (SELECT cell, count(*)::BIGINT AS n_cell,
       |                 CAST(floor(sqrt(count(*))) AS BIGINT) AS w
       |          FROM assigned GROUP BY cell),
       |tot AS (SELECT sum(w) AS wt FROM sizes),
       |bud AS (SELECT (SELECT greatest(60, count(*)//100) FROM emb)::BIGINT AS b),
       |alloc AS (SELECT cell, n_cell, ((b * w) // wt)::BIGINT AS budget
       |          FROM sizes, tot, bud),
       |hashed0 AS (SELECT vec_id, cell,
       |  ${TextQueries.fnvFoldSql("CAST(vec_id AS VARCHAR)")} AS h0 FROM assigned),
       |hashedm AS (SELECT vec_id, cell, ${SketchQueries.mixSqlExpr("h0")} AS hm
       |  FROM hashed0),
       |hashed AS (SELECT vec_id, cell,
       |  (CASE WHEN hm >= 9223372036854775808::HUGEINT
       |        THEN hm - 18446744073709551616::HUGEINT ELSE hm END)::BIGINT AS h
       |  FROM hashedm),
       |ranked AS (SELECT cell, vec_id,
       |  row_number() OVER (PARTITION BY cell ORDER BY h, vec_id) AS rk
       |  FROM hashed)
       |SELECT r.cell, a.n_cell, a.budget, r.rk::BIGINT AS pick_rank, r.vec_id
       |FROM ranked r JOIN alloc a ON a.cell = r.cell
       |WHERE r.rk <= a.budget
       |ORDER BY r.cell, pick_rank""".stripMargin

  /** JL-compressed retrieve-then-rescore recall audit
    * ([[Similarity.jlTopK]] — Achlioptas ±1 matrix off the pinned hash,
    * inputs quantized to integer 2^-20 ticks so projected sums AND
    * projected cosines are exact integer arithmetic in doubles,
    * bit-identical cross-engine under any fold order): top-100
    * candidates by cosine in the 32-dim projected space, full-precision
    * rescore to top-5, integer hit counts vs the exact 64-dim top-5 per
    * query (the ann12 audit shape, for the dimensionality-reduction
    * operator instead of the IVF index). The oracle regenerates the SAME
    * sign matrix from the same hash and replays the same
    * quantize→project→candidate→rescore chain, so the CANDIDATE SET, not
    * just the final ranks, is hash-gated. Raw 32-dim ranking alone is
    * chance-level on this near-isotropic fixture (measured: recall@3 ≈
    * 0 at outDim=16) — which is exactly why the operator is the
    * two-stage form; the audit reports the pipeline's true recall
    * (~0.7–0.8 here) the way ann06's PQ audit honestly reports 0.63.
    */
  private def annJlRecall(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    val queries = emb.where(col("vec_id") < 10)
    val approx = Similarity.jlTopK(queries, emb, k = 5, cand = 100,
        inDim = 64, outDim = 32)
      .select(col("query_id"), col("neighbor_id"), lit(1).as("hit"))
    val exact = Similarity.bruteForceTopK(queries, emb, k = 5)
      .select(col("query_id"), col("neighbor_id"))
    exact.join(approx, Seq("query_id", "neighbor_id"), "left")
      .groupBy(col("query_id"))
      .agg(count(col("hit")).as("n_hits"))
      .select(col("query_id"), lit(5L).as("k"), col("n_hits"),
        (col("n_hits") * 2000L).as("recall_bp"))
      .orderBy(col("query_id"))
  }
  private val annJlRecallSql: String = {
    val keyExpr = "concat('jl:', (i - 1)::VARCHAR, ':', j::VARCHAR)"
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |dims AS (SELECT unnest(generate_series(1, 64)) AS i),
       |odims AS (SELECT unnest(generate_series(0, 31)) AS j),
       |sgn0 AS (
       |  SELECT i, j, ${TextQueries.fnvFoldSql(keyExpr)} AS h0
       |  FROM dims, odims),
       |signs AS (
       |  SELECT i, j,
       |    CASE WHEN (${SketchQueries.mixSqlExpr("h0")}) % 2 = 0
       |         THEN 1.0 ELSE -1.0 END AS sgn
       |  FROM sgn0),
       |qe AS (
       |  SELECT e.vec_id, d.i, floor(e.v[d.i] * 1048576.0 + 0.5) AS q
       |  FROM emb e, dims d),
       |proj AS (
       |  SELECT qe.vec_id, s.j, sum(s.sgn * qe.q) AS pv
       |  FROM qe JOIN signs s ON s.i = qe.i
       |  GROUP BY qe.vec_id, s.j),
       |pvecs AS (SELECT vec_id, list(pv ORDER BY j) AS pv FROM proj GROUP BY vec_id),
       |cands AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.pv, c.pv) DESC, c.vec_id) AS crank
       |    FROM pvecs q JOIN pvecs c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 10) t
       |  WHERE crank <= 100),
       |approx AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT cd.query_id, cd.neighbor_id,
       |      row_number() OVER (PARTITION BY cd.query_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, cd.neighbor_id) AS rank
       |    FROM cands cd
       |    JOIN emb q ON q.vec_id = cd.query_id
       |    JOIN emb c ON c.vec_id = cd.neighbor_id) t
       |  WHERE rank <= 5),
       |exact AS (
       |  SELECT query_id, neighbor_id FROM (
       |    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id) AS rank
       |    FROM emb q JOIN emb c ON q.vec_id <> c.vec_id
       |    WHERE q.vec_id < 10) t
       |  WHERE rank <= 5)
       |SELECT e.query_id, CAST(5 AS BIGINT) AS k,
       |  CAST(count(a.neighbor_id) AS BIGINT) AS n_hits,
       |  CAST(count(a.neighbor_id) * 2000 AS BIGINT) AS recall_bp
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
       |GROUP BY e.query_id ORDER BY e.query_id""".stripMargin
  }

  /** K-means convergence curve ([[Similarity.kmeansTrainingCurve]] — 8
    * cells, 3 Lloyd rounds): one gated row per (round, cell) with the
    * assignment count and fixed-point summed assignment cosine. The
    * oracle replays seed → assign → integer-sum update for every round
    * (the ann05 CTE machinery, with the per-round stats surfaced), so the
    * gate pins the ENTIRE training trajectory — assignment tie-breaks,
    * empty-cell holds, update arithmetic — not just a final artifact.
    * Training telemetry as a first-class, cross-engine-verified query.
    */
  private def annKmeansCurve(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansTrainingCurve(Tables(spark, dir).embeddings,
        nCells = 8, rounds = 3)
      .select(col("round").cast("long").as("round"),
        col("cell").cast("long").as("cell"), col("n"), col("cos_ticks"))
      .orderBy(col("round"), col("cell"))
  private val annKmeansCurveSql: String = {
    val q = Similarity.KmeansQuantScale
    val dims = 64
    def roundCtes(r: Int): String =
      s"""best$r AS MATERIALIZED (
         |  SELECT vec_id, v, cell, cos FROM (
         |    SELECT e.vec_id, e.v, c.cell,
         |      list_cosine_similarity(e.v, c.mv) AS cos,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY list_cosine_similarity(e.v, c.mv) DESC, c.cell) AS rn
         |    FROM emb e CROSS JOIN cent${r - 1} c) t WHERE rn = 1),
         |stat$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, cell, count(*)::BIGINT AS n,
         |    CAST(sum(CAST(floor(cos * $q.0) AS BIGINT)) AS BIGINT) AS cos_ticks
         |  FROM best$r GROUP BY cell),
         |sums$r AS (
         |  SELECT cell, dim,
         |    sum(CAST(floor(v[dim] * $q.0 + 0.5) AS BIGINT)) AS s,
         |    count(*) AS n
         |  FROM best$r CROSS JOIN (SELECT unnest(generate_series(1, $dims)) AS dim) d
         |  GROUP BY cell, dim),
         |cent$r AS MATERIALIZED (
         |  SELECT c0.cell, coalesce(t.mv, c0.mv) AS mv
         |  FROM cent${r - 1} c0 LEFT JOIN (
         |    SELECT cell,
         |      list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / $q.0 ORDER BY dim) AS mv
         |    FROM sums$r GROUP BY cell) t ON c0.cell = t.cell)""".stripMargin
    s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |cent0 AS (
       |  SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS mv
       |  FROM (SELECT vec_id, v FROM emb ORDER BY vec_id LIMIT 8) s),
       |${(1 to 3).map(roundCtes).mkString(",\n")}
       |SELECT round, cell, n, cos_ticks
       |FROM (SELECT * FROM stat1 UNION ALL SELECT * FROM stat2
       |      UNION ALL SELECT * FROM stat3)
       |ORDER BY round, cell""".stripMargin
  }

  val defs: Map[String, QueryDef] = Map(
    "ann19_retrieval_metrics" -> QueryDef(annRetrievalMetrics, Some(annRetrievalMetricsSql), benchmark = true),
    "ann20_centroid_drift"  -> QueryDef(annCentroidDrift, Some(annCentroidDriftSql), benchmark = true),
    "ann21_nprobe_curve"    -> QueryDef(annNprobeCurve, Some(annNprobeCurveSql), benchmark = true),
    "ann18_class_margin"    -> QueryDef(annClassMargin, Some(annClassMarginSql), benchmark = true),
    "ann17_hard_negatives"  -> QueryDef(annHardNeg, Some(annHardNegSql), benchmark = true),
    "ann16_kmeans_curve"    -> QueryDef(annKmeansCurve, Some(annKmeansCurveSql), benchmark = true),
    "ann15_jl_recall"       -> QueryDef(annJlRecall, Some(annJlRecallSql), benchmark = true),
    "ann14_cluster_sample"  -> QueryDef(annClusterSample, Some(annClusterSampleSql), benchmark = true),
    "ann13_sq_rescore"      -> QueryDef(annSq, Some(annSqSql), benchmark = true),
    "ann12_ivf_recall"      -> QueryDef(annIvfRecall, Some(annIvfRecallSql), benchmark = true),
    "ann11_mmr_topk"        -> QueryDef(annMmr, Some(annMmrSql)),
    "ann10_maxsim"          -> QueryDef(annMaxSim, Some(annMaxSimSql)),
    "ann09_radius_search"   -> QueryDef(annRadius, Some(annRadiusSql)),
    "ann08_semantic_dedup"  -> QueryDef(semDedup, Some(semDedupSql), benchmark = true),
    "ann06_ivfpq_topk"      -> QueryDef(annIvfPq, Some(annIvfPqSql)),
    "ann01_bruteforce_topk" -> QueryDef(annBrute, Some(annBruteSql), benchmark = true),
    "ann07_filtered_topk"   -> QueryDef(annFiltered, Some(annFilteredSql)),
    "ann02_lsh_topk"        -> QueryDef(annLsh, Some(annLshSql), benchmark = true),
    "ann05_ivf_topk"        -> QueryDef(annIvf, Some(annIvfSql)),
    "ann03_embedding_dups"  -> QueryDef(embDup, Some(embDupSql)),
    "ann04_vector_stats"    -> QueryDef(vecStats, Some(vecStatsSql)),
  )
}
