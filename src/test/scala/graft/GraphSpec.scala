package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  // Directed path 1→2→3→4→5→6 plus a cycle 1→7→1 to prove revisits stop.
  private def pathEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (1L, 7L), (7L, 1L)
  ).toDF("src", "dst")

  test("hopDistances: BFS min distance, bounded by maxHops") {
    val seeds = Seq(1L).toDF("node")
    val d = Graph.hopDistances(spark, pathEdges, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 7L -> 1L))
    // nodes 5, 6 are beyond the hop bound and must be absent
  }

  test("hopDistances: cycle back to a seed keeps the seed at dist 0") {
    val seeds = Seq(7L).toDF("node")
    val d = Graph.hopDistances(spark, pathEdges, seeds, maxHops = 4)
      .as[(Long, Long)].collect().toMap
    assert(d(7L) == 0L && d(1L) == 1L && d(2L) == 2L)
  }

  test("hopDistances: early exit when the frontier drains before maxHops") {
    // 10→11 only: frontier is empty after hop 1; maxHops=100 must not loop
    val e = Seq((10L, 11L)).toDF("src", "dst")
    val seeds = Seq(10L).toDF("node")
    val d = Graph.hopDistances(spark, e, seeds, maxHops = 100)
      .as[(Long, Long)].collect().toMap
    assert(d == Map(10L -> 0L, 11L -> 1L))
  }

  test("gr05 composition: components + sizes on two disjoint cliques and a path") {
    // clique {1,2,3}, path 10-11, isolated-by-derivation nodes absent
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val nodes = pairs.select($"src".as("node"))
      .union(pairs.select($"dst".as("node"))).distinct()
    val labels = graft.operators.Dedup.dupClusters(pairs, nodes,
        idCol = "node", aCol = "src", bCol = "dst", pairsDistinct = true)
    val sizes = labels.groupBy($"cluster_id").count()
      .as[(Long, Long)].collect().toMap
    val byNode = labels.as[(Long, Long)].collect().toMap
    assert(byNode == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(sizes == Map(1L -> 3L, 10L -> 2L))
  }
}
