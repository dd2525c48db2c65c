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

  /** Exact brute-force top-5 cosine neighbors for the first 10 vectors —
    * the ANN correctness baseline. Queries broadcast; corpus never
    * shuffles; ranking moves only (query, score, id).
    */
  private def annBrute(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.bruteForceTopK(emb.where(col("vec_id") < 10), emb, k = 5)
      .orderBy(col("query_id"), col("rank"))
  }
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
    * in PlanSpec). 2 planes × 16 tables is deterministically 100%-recall on
    * every fixture corpus at threshold 0.35, so the output still matches
    * the exact all-pairs oracle.
    */
  private def embDup(spark: SparkSession, dir: String): DataFrame =
    Dedup.embeddingDupPairs(Tables(spark, dir).embeddings, threshold = 0.35)
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

  /** IVF-bucketed approximate top-3: corpus partitioned into Voronoi cells
    * around seed centroids, queries probe the nearest cells only. The
    * centroid seeds are deterministic (first nCells corpus ids) and cosine
    * folds are bit-identical cross-engine, so the WHOLE pipeline — cell
    * assignment, probe choice, rescored top-k — is SQL-expressible and
    * hash-gated by the DuckDB oracle below (it mirrors each stage).
    */
  private def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables(spark, dir).embeddings
    Similarity.ivfTopK(emb.where(col("vec_id") < 10), emb, k = 3,
      nCells = 16, nProbe = 6)
      .orderBy(col("query_id"), col("rank"))
  }
  private val annIvfSql =
    """WITH centroids AS (
      |  SELECT row_number() OVER (ORDER BY vec_id) AS cell,
      |         CAST(embedding AS DOUBLE[]) AS mv
      |  FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 16) s),
      |assigned AS (
      |  SELECT vec_id AS neighbor_id, cv, cell FROM (
      |    SELECT c.vec_id, CAST(c.embedding AS DOUBLE[]) AS cv, ct.cell,
      |      row_number() OVER (PARTITION BY c.vec_id
      |        ORDER BY list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), ct.mv) DESC,
      |                 ct.cell) AS rn
      |    FROM embeddings c CROSS JOIN centroids ct) t WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, qv, cell FROM (
      |    SELECT q.vec_id, CAST(q.embedding AS DOUBLE[]) AS qv, ct.cell,
      |      row_number() OVER (PARTITION BY q.vec_id
      |        ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), ct.mv) DESC,
      |                 ct.cell) AS rn
      |    FROM embeddings q CROSS JOIN centroids ct WHERE q.vec_id < 10) t WHERE rn <= 6)
      |SELECT query_id, rank, neighbor_id, cos FROM (
      |  SELECT p.query_id, a.neighbor_id, list_cosine_similarity(p.qv, a.cv) AS cos,
      |    row_number() OVER (PARTITION BY p.query_id
      |      ORDER BY list_cosine_similarity(p.qv, a.cv) DESC, a.neighbor_id) AS rank
      |  FROM probes p JOIN assigned a ON p.cell = a.cell
      |  WHERE p.query_id <> a.neighbor_id) t
      |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  val defs: Map[String, QueryDef] = Map(
    "ann01_bruteforce_topk" -> QueryDef(annBrute, Some(annBruteSql), benchmark = true),
    "ann02_lsh_topk"        -> QueryDef(annLsh, Some(annLshSql), benchmark = true),
    "ann05_ivf_topk"        -> QueryDef(annIvf, Some(annIvfSql)),
    "ann03_embedding_dups"  -> QueryDef(embDup, Some(embDupSql)),
    "ann04_vector_stats"    -> QueryDef(vecStats, Some(vecStatsSql)),
  )
}
