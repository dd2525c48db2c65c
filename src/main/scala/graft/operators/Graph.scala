package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph algorithms beyond connected components
  * ([[Dedup.connectedComponents]]): PageRank in fixed-point integer
  * arithmetic, so results are bit-reproducible across engines and across
  * partition counts (double summation order varies with partitioning;
  * long sums do not — the same trick as the IVF k-means trainer).
  *
  * Rank unit: micro-ranks (1 rank = 1,000,000). The damping update is
  *   r' = 150000 + (850 * Σ contrib) div 1000,   contrib = r div outdeg
  * — all Long ops, truncating division on non-negative operands, so DuckDB
  * (`//`) and Spark (`div`) agree exactly. Max |Σ| ≈ n·10⁶·850 keeps far
  * inside Long for any n < 10¹⁰ nodes.
  *
  * Scale shape per iteration: one shuffle — ranks join edges on src
  * (edges pre-partitioned by src are reused every round; the rank table is
  * n rows, usually broadcastable), then groupBy(dst) with map-side partial
  * sums. Driver holds no data. For iteration counts beyond ~10, truncate
  * lineage with `localCheckpoint`/`checkpoint` exactly as
  * [[Dedup.connectedComponents]] does (`spark.graft.checkpoint.dir`).
  */
object Graph {

  /** PageRank over a directed edge list `(src, dst)` for a fixed number of
    * iterations. Every node appearing as a src or dst gets a rank; dangling
    * nodes (no out-edges) leak their mass — the convention of the original
    * formulation, mirrored exactly by the oracle.
    */
  def pageRankFixedPoint(
      spark: SparkSession,
      edges: DataFrame, // columns: src, dst (Long)
      iters: Int): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    var ranks = nodes.select(col("node"), lit(1000000L).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = ranks
        .join(outdeg, ranks("node") === outdeg("src"), "inner")
        .select(col("node").as("cnode"), expr("rank div outdeg").as("contrib"))
        .join(e, col("cnode") === e("src"))
        .select(col("dst"), col("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("mass"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left_outer")
        .select(col("node"),
          (lit(150000L) + expr("(850 * coalesce(mass, 0L)) div 1000")).as("rank"))
    }
    ranks
  }
}
