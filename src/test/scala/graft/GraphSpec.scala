package graft

import graft.operators.Graph
import org.apache.spark.sql.functions.{count, lit, sum}

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

  test("personalizedPageRank: exact hand-computed trajectory on a 2-cycle") {
    // 1 ↔ 2, seed {1}: after round 1 the seed holds only its teleport and
    // node 2 the damped full mass; after round 2 the mass flows back
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val r1 = Graph.personalizedPageRank(spark, e, seeds, iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000000L, 2L -> 850000000L), r1.toString)
    val r2 = Graph.personalizedPageRank(spark, e, seeds, iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 872500000L, 2L -> 127500000L), r2.toString)
  }

  test("personalizedPageRank: scores concentrate around the seed community") {
    // two 3-cliques joined by one bridge; seeds in clique A only — every
    // A node must outrank every B node, and the far B corner least of all
    val cliqueA = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val cliqueB = Seq((4L, 5L), (5L, 6L), (4L, 6L))
    val bridge  = Seq((3L, 4L))
    val base = (cliqueA ++ cliqueB ++ bridge).toDF("src", "dst")
    val e = base.union(base.select($"dst".as("src"), $"src".as("dst")))
    val seeds = Seq(1L, 2L).toDF("node")
    val r = Graph.personalizedPageRank(spark, e, seeds, iters = 4)
      .as[(Long, Long)].collect().toMap
    val aMin = Seq(1L, 2L, 3L).map(r).min
    val bMax = Seq(4L, 5L, 6L).map(r).max
    assert(aMin > bMax, r.toString)
    assert(Seq(5L, 6L).map(r).max < r(4L), s"bridge head outranks the far corner: $r")
  }

  test("personalizedPageRank: empty graph / empty cohort return empty, not errors") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(Graph.personalizedPageRank(spark, e.limit(0), Seq(1L).toDF("node"), 2).count() == 0)
    assert(Graph.personalizedPageRank(spark, e, Seq.empty[Long].toDF("node"), 2).count() == 0)
  }

  test("personalizedPageRank is partition-count invariant") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 3L)).toDF("src", "dst")
    val seeds = Seq(3L).toDF("node")
    val a = Graph.personalizedPageRank(spark, base, seeds, 3)
      .as[(Long, Long)].collect().toMap
    val b = Graph.personalizedPageRank(spark, base.repartition(11), seeds, 3)
      .as[(Long, Long)].collect().toMap
    assert(a === b && a.nonEmpty)
  }

  test("kCore: peeling cascades, and the fixture converges inside the 8 rounds") {
    // 4-clique (1-4) + a tail 5-6-7 with (1,5),(2,5): node 5 starts at
    // degree 3 and falls below k only AFTER round 1 peels 6 (degree 2) —
    // a single filter pass would wrongly keep it, so this fixture proves
    // the CASCADE, not just the degree filter. The 3-core is exactly the
    // clique, every member at in-core degree 3.
    val cliq = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val pairs = (cliq ++ Seq((1L, 5L), (2L, 5L), (5L, 6L), (6L, 7L)))
      .toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val core = Graph.kCore(spark, edges, k = 3, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"node 5 must fall only AFTER 6 is peeled; got $core")

    // judged-graph convergence: one more round changes nothing, so the
    // gated 8-round output IS the true 3-core
    val ev = graft.core.Tables(spark, sf0001).events
    val p = ev.where($"event_type" === "purchase")
      .select(org.apache.spark.sql.functions.expr(
        "unix_micros(ts) div 600000000").as("b"), $"user_id".as("u"))
      .distinct()
    val cop = p.as("a").join(p.as("b"), $"a.b" === $"b.b" && $"a.u" < $"b.u")
      .select($"a.u".as("src"), $"b.u".as("dst")).distinct()
    val bidir = cop.union(cop.select($"dst".as("src"), $"src".as("dst")))
    val r8 = Graph.kCore(spark, bidir, k = 3, rounds = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r9 = Graph.kCore(spark, bidir, k = 3, rounds = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r8 == r9, "fixture graph should converge within 8 peels")
  }

  test("kCore peel: survivor join broadcasts under the size gate, sort-merges above it") {
    val cliq = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val pairs = cliq.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    // under the gate (4 survivors × Graph.KCoreNodeBytes = 48 B ≪ 10 MB
    // default): both survivor filters must be broadcast joins — the edge
    // set crosses no exchange
    val under = Graph.peelOnce(spark, edges, 3, nKeep = 4L)
      .queryExecution.executedPlan.toString
    assert(under.contains("BroadcastHashJoin"), under)
    assert(!under.contains("SortMergeJoin"), under)
    // above the gate (survivor count × KCoreNodeBytes over the threshold):
    // a forced
    // broadcast would collect a cluster-sized node set to the driver —
    // the round must degrade to a sort-merge join instead
    val savedThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      val over = Graph.peelOnce(spark, edges, 3, nKeep = 1000L)
        .queryExecution.executedPlan.toString
      assert(over.contains("SortMergeJoin"), over)
      assert(!over.contains("BroadcastHashJoin"), over)
      // a DISABLED threshold (-1) must also never broadcast, whatever the count
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val disabled = Graph.peelOnce(spark, edges, 3, nKeep = 1L)
        .queryExecution.executedPlan.toString
      assert(!disabled.contains("BroadcastHashJoin"), disabled)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh)
    // both shapes produce the identical 3-core rows
    val core = Graph.kCore(spark, edges, k = 3, rounds = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core)
    val savedThresh2 = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = Graph.kCore(spark, edges, k = 3, rounds = 8)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(shuffled == core, s"shuffle-path peel diverged: $shuffled")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThresh2)
  }

  test("kCore converges early: identity rounds are skipped with identical output") {
    // the 4-clique IS its own 3-core: the stats probe sees no node fall in
    // round 1 and must stop immediately — rounds=100 must not run 100 jobs
    val cliq = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val pairs = cliq.toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val core = Graph.kCore(spark, edges, k = 3, rounds = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val jobsRun = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - jobsBefore
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core)
    assert(jobsRun < 20, s"a converged graph must not pay 100 rounds of jobs (ran $jobsRun)")
  }

  test("labelPropagation: two triangles over a bridge split into two communities") {
    // triangle {1,2,3} — bridge 3-4 — triangle {4,5,6}: ONE connected
    // component (gr05 would label all six together), but LPA resolves the
    // two locally-dense triangles into separate communities. Hand-traced:
    // r1 {1→2,2→1,3→1,4→3,5→4,6→4}, r2 {1→1,2→1,3→1,4→4,5→3,6→3},
    // r3 {1,1,1,4:3? ...} → stabilizes by r4 at {1,2,3}→1, {4,5,6}→3.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val lab = Graph.labelPropagation(spark, edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(lab == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L), lab)
  }

  test("labelPropagation matches a brute-force reference across round counts") {
    def refLpa(bidir: Seq[(Long, Long)], rounds: Int): Map[Long, Long] = {
      val adj = bidir.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var lab = adj.keys.map(n => n -> n).toMap
      for (_ <- 1 to rounds) lab = adj.map { case (n, ns) =>
        n -> ns.groupBy(lab).toSeq
          .map { case (l, g) => (-g.size, l) }.min._2
      }
      lab
    }
    // deterministic pseudo-random graph: 20 nodes, LCG-derived edges
    val raw = (0L until 20L).flatMap(i =>
      Seq(i -> ((i * 7 + 3) % 20), i -> ((i * 13 + 5) % 20)))
      .filter { case (a, b) => a != b }
    val bidir = (raw ++ raw.map(_.swap)).distinct
    val edges = bidir.toDF("src", "dst")
    for (r <- Seq(1, 2, 3)) {
      val got = Graph.labelPropagation(spark, edges, rounds = r)
        .as[(Long, Long)].collect().toMap
      assert(got == refLpa(bidir, r), s"round count $r diverged")
    }
  }

  test("labelPropagation is partition-count invariant") {
    // vote counts and the (cnt, -label) arg-max are exact integers, so
    // the result must not depend on how the edge list is split — the
    // same guard PipelineOpsSpec pins for fixed-point PageRank
    val raw = (0L until 20L).flatMap(i =>
      Seq(i -> ((i * 7 + 3) % 20), i -> ((i * 13 + 5) % 20)))
      .filter { case (a, b) => a != b }
    val bidir = (raw ++ raw.map(_.swap)).distinct
    val e = bidir.toDF("src", "dst")
    val wide = Graph.labelPropagation(spark, e.repartition(8), rounds = 3)
      .as[(Long, Long)].collect().toMap
    val narrow = Graph.labelPropagation(spark, e.coalesce(1), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(wide == narrow)
  }

  test("hub-capped LPA recovers planted communities a hub epidemic destroys") {
    // two 4-cliques {1..4} and {5..8}, plus hub 0 adjacent to EVERYONE:
    // plain synchronous LPA floods label 0 through the hub in one round
    // and the whole graph collapses to a single community — the dense-
    // graph degeneracy gr07's scaladoc documents on the raw co-purchase
    // graph. Capping voters at degree ≤ 5 silences the hub (degree 8);
    // the planted cliques survive as two communities (hand-traced: clique
    // A stabilizes on label 1, clique B on 5, the hub ties 1-vs-5 and
    // takes the min)
    val cliqA = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val cliqB = for { a <- 5L to 8L; b <- 5L to 8L if a < b } yield (a, b)
    val hub = (1L to 8L).map(n => (0L, n))
    val pairs = (cliqA ++ cliqB ++ hub).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val plain = Graph.labelPropagation(spark, edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(plain.values.toSet.size == 1, s"expected the hub epidemic: $plain")
    val capped = Graph.labelPropagationHubCapped(spark, edges, rounds = 4, hubCap = 5)
      .as[(Long, Long)].collect().toMap
    assert(capped == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 5L, 8L -> 5L), capped)
  }

  test("hub-capped LPA: a node whose only neighbours are hubs keeps its own label") {
    // pure star: hub 0 — leaves 1..8. With the hub silenced every leaf
    // has ZERO voters; the zero-count self-vote must hold each leaf at
    // its own label instead of dropping it from the result (the hub
    // still receives the leaves' votes and takes their minimum)
    val pairs = (1L to 8L).map(n => (0L, n)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val capped = Graph.labelPropagationHubCapped(spark, edges, rounds = 3, hubCap = 5)
      .as[(Long, Long)].collect().toMap
    val expected = (1L to 8L).map(n => n -> n).toMap + (0L -> 1L)
    assert(capped == expected, capped)
  }

  test("gr08 composition: exact-integer modularity of the two-triangle split") {
    // same graph as the LPA test; after 4 rounds communities are
    // {1,2,3}→1 and {4,5,6}→3. Hand computation: m=7 undirected edges so
    // 2m=14 directed; each triangle has e2_c=6 directed intra edges and
    // degree_sum 2+2+3=7, so q_num = 14·6 − 7² = 35 per community and
    // Q = (35+35)/14² = 70/196 ≈ 0.357 > 0 — a genuine community split.
    val pairs = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst".as("src"), $"src".as("dst")))
    val labels = Graph.labelPropagation(spark, edges, rounds = 4)
    val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("deg"))
    val degc = deg.join(labels, "node")
      .groupBy($"label").agg(sum($"deg").as("d_c"))
    val ls = labels.select($"node".as("src"), $"label".as("ls"))
    val ld = labels.select($"node".as("dst"), $"label".as("ld"))
    val intra = edges.join(ls, "src").join(ld, "dst")
      .where($"ls" === $"ld")
      .groupBy($"ls".as("label")).agg(count(lit(1)).as("e2"))
    val m2 = edges.count()
    val q = degc.join(intra, "label")
      .select($"label", $"e2", $"d_c",
        (lit(m2) * $"e2" - $"d_c" * $"d_c").as("q_num"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(q == Set((1L, 6L, 7L, 35L), (3L, 6L, 7L, 35L)), q)
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

  test("hitsFixedPoint matches a hand-rolled HITS reference; hubs and authorities diverge") {
    // 1 and 2 both point at 3 and 4; 3 points at 5. Hubs: 1,2 (point at
    // the strong authorities); authorities: 3,4 (pointed at by the strong
    // hubs). 5 has no out-edges (hub 0); 1,2 no in-edges (auth 0).
    val edges = Seq((1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 5L))
    val One = 1048576L
    def reference(iters: Int): Map[Long, (Long, Long)] = {
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var h = nodes.map(_ -> One).toMap
      var a = Map.empty[Long, Long]
      for (_ <- 1 to iters) {
        val ar = nodes.map(n => n -> edges.filter(_._2 == n).map(e => h(e._1)).sum).toMap
        val am = math.max(ar.values.max, 1L)
        a = ar.map { case (n, v) => n -> v * One / am }
        val hr = nodes.map(n => n -> edges.filter(_._1 == n).map(e => a(e._2)).sum).toMap
        val hm = math.max(hr.values.max, 1L)
        h = hr.map { case (n, v) => n -> v * One / hm }
      }
      nodes.map(n => n -> ((h(n), a(n)))).toMap
    }
    val got = graft.operators.Graph.hitsFixedPoint(
        spark, edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, hub, auth) => n -> ((hub, auth)) }.toMap
    assert(got == reference(3))
    // structure: 1,2 are the max hubs with zero authority; 3,4 the max
    // authorities; 3 carries SOME hub mass (it points at 5) — two-sided
    assert(got(1L) == ((One, 0L)) && got(2L) == ((One, 0L)))
    assert(got(3L)._2 == One && got(4L)._2 == One)
    assert(got(3L)._1 > 0L && got(5L)._1 == 0L)
    // partition-count invariance (the fixed-point-integer contract)
    val re = graft.operators.Graph.hitsFixedPoint(
        spark, edges.toDF("src", "dst").repartition(5), iters = 3)
      .as[(Long, Long, Long)].collect()
      .map { case (n, hub, auth) => n -> ((hub, auth)) }.toMap
    assert(re == got)
  }
}
