package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graph.pageRank: fixed-point integer ranks — hand-computable on a
  * small graph, bit-stable under repartitioning (the property float
  * PageRank cannot give), base term preserved for nodes with no
  * in-edges. */
class GraphSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration on a two-node cycle is exact") {
    // 1→2, 2→1, scale 1e9: rank = 150e6 + 85% of the full incoming 1e9
    assert(ranks(Seq((1L, 2L), (2L, 1L)), 1) ===
      Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("fan-in beats fan-out; source keeps only the base term") {
    // 1→2, 1→3, 3→2: node 2 absorbs two streams, node 1 gets no in-edges
    val r = ranks(Seq((1L, 2L), (1L, 3L), (3L, 2L)), 1)
    assert(r(1L) === 150000000L) // base only: floor(1e9·15/100)
    // node 2: base + 85%·(1e9/2 + 1e9/1); node 3: base + 85%·(1e9/2)
    assert(r(2L) === 150000000L + 85L * (500000000L + 1000000000L) / 100L)
    assert(r(3L) === 150000000L + 85L * 500000000L / 100L)
  }

  test("duplicate edge rows collapse before degree counting") {
    val dup = Seq((1L, 2L), (1L, 2L), (2L, 1L))
    assert(ranks(dup, 3) === ranks(dup.distinct, 3))
  }

  test("bit-identical under repartitioning — the fixed-point guarantee") {
    val edges = (0L until 400L).map(i => (i % 40, (i * 7) % 40)).filter(e => e._1 != e._2)
    val df1 = edges.toDF("src", "dst")
    val df8 = edges.toDF("src", "dst").repartition(8, col("dst"))
    val a = Graph.pageRank(df1, "src", "dst", 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(df8, "src", "dst", 6).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("personalized restart: seeds dominate, non-reachable nodes stay at zero") {
    // 1→2→3 chain plus isolated cycle 8↔9; seed = node 1 only
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (8L, 9L), (9L, 8L))
    val pr = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", isSeed = n => n === 1L, iterations = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the seed's component carries all the mass; the 8↔9 cycle gets no
    // restart and no inflow from the seed — it decays to exactly zero
    assert(pr(8L) === 0L && pr(9L) === 0L)
    // the seed's whole cycle carries mass (it circulates 1→2→3→1)
    assert(pr(1L) > 0L && pr(2L) > 0L && pr(3L) > 0L)
  }

  test("personalized ranks are bit-identical under repartitioning") {
    val edges = (0L until 400L).map(i => (i % 40, (i * 7) % 40)).filter(e => e._1 != e._2)
    val seed: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      n => n % 5 === 0
    val a = Graph.personalizedPageRank(edges.toDF("src", "dst"),
        "src", "dst", seed, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.personalizedPageRank(
        edges.toDF("src", "dst").repartition(8, col("dst")),
        "src", "dst", seed, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("deep runs stay plannable: 60 iterations cross the periodic barrier") {
    // crosses the every-25-pass localCheckpoint twice; a converged cycle
    // is exact at any depth, so correctness pins the barrier's
    // transparency while the run itself pins bounded analysis cost
    assert(ranks(Seq((1L, 2L), (2L, 1L)), 60) ===
      Map(1L -> 1000000000L, 2L -> 1000000000L))
  }

  test("zero iterations returns the uniform seed") {
    val r = ranks(Seq((1L, 2L), (2L, 3L)), 0)
    assert(r === Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))
  }

  private def tri(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("K4 has four triangles, each counted once at its min apex") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    // equal degrees → orientation by id → apexes are the two smallest ids
    assert(tri(k4) === Map(1L -> 3L, 2L -> 1L))
  }

  test("paths and stars are triangle-free") {
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    assert(tri(Seq((1L, 2L), (1L, 3L), (1L, 4L))) === Map.empty)
  }

  test("triangle count ignores duplicates, direction, and self-loops") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L))
    assert(tri(messy).values.sum === 1L)
  }

  test("triangle count is stable under repartitioning") {
    val edges = (0L until 300L).map(i => (i % 25, (i * 7 + 3) % 25)).filter(e => e._1 != e._2)
    val a = tri(edges)
    val b = Graph.triangleCount(edges.toDF("src", "dst").repartition(8), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  private def sssp(edges: Seq[(Long, Long, Long)], source: Long, iters: Int,
      probeEvery: Int = 0): Map[Long, Long] =
    Graph.shortestPaths(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        source, iters, probeEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("shortest paths pick the cheap detour over the direct edge") {
    // 1→3 costs 10 direct, but 1→2→3 costs 2+3=5
    val g = Seq((1L, 3L, 10L), (1L, 2L, 2L), (2L, 3L, 3L))
    assert(sssp(g, 1L, 3) === Map(1L -> 0L, 2L -> 2L, 3L -> 5L))
  }

  test("parallel edges keep the cheapest weight") {
    val g = Seq((1L, 2L, 9L), (1L, 2L, 4L), (1L, 2L, 7L))
    assert(sssp(g, 1L, 1) === Map(1L -> 0L, 2L -> 4L))
  }

  test("unreachable nodes are absent, not infinite") {
    val g = Seq((1L, 2L, 1L), (3L, 4L, 1L))
    assert(sssp(g, 1L, 4) === Map(1L -> 0L, 2L -> 1L))
  }

  test("round-bounded: a path needing 3 hops is invisible at 2 rounds") {
    val chain = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(sssp(chain, 1L, 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(sssp(chain, 1L, 3)(4L) === 3L)
  }

  test("early-stop probe matches the fixed-round answer past convergence") {
    val g = Seq((1L, 2L, 2L), (2L, 3L, 3L), (1L, 3L, 10L), (3L, 1L, 1L))
    assert(sssp(g, 1L, 40, probeEvery = 2) === sssp(g, 1L, 6))
  }

  test("shortest paths are bit-identical under repartitioning") {
    val edges = (0L until 300L)
      .map(i => (i % 25, (i * 7 + 3) % 25, i % 5 + 1))
      .filter(e => e._1 != e._2)
    val a = sssp(edges, 0L, 8)
    val b = Graph.shortestPaths(
        edges.toDF("src", "dst", "w").repartition(8, col("dst")),
        "src", "dst", "w", 0L, 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Reference simulation: synchronous rounds, (−votes, label) pick. */
  private def lpaBrute(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(e => e._1 != e._2).distinct
    val nbrs = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    var lab = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lab = nbrs.map { case (n, ns) =>
        val votes = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        n -> votes.toSeq.minBy { case (l, v) => (-v, l) }._1
      }
    }
    lab
  }

  test("two cliques joined by one bridge resolve to two communities") {
    val cliqueA = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val g = cliqueA ++ cliqueB :+ ((3L, 10L))
    val got = lpa(g, 5)
    assert(got === lpaBrute(g, 5))
    // everyone in clique A converges to min label 0; clique B to 10
    assert((0L to 3L).forall(got(_) === 0L))
    assert((11L to 13L).forall(got(_) === 10L))
  }

  test("labels match the brute-force simulation on a random graph") {
    val edges = (0L until 200L).map(i => (i % 30, (i * 11 + 5) % 30))
      .filter(e => e._1 != e._2)
    for (iters <- Seq(0, 1, 3))
      assert(lpa(edges, iters) === lpaBrute(edges, iters))
  }

  test("label propagation ignores direction, duplicates, and self-loops") {
    val g = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L))
    assert(lpa(g, 2) === lpaBrute(g, 2))
    assert(!lpa(g, 2).contains(4L)) // absent node stays absent
  }

  private def kcore(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] =
    Graph.kCore(edges.toDF("src", "dst"), "src", "dst", k, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute-force synchronous peel to a fixpoint (or `rounds`). */
  private def kcoreBrute(edges: Seq[(Long, Long)], k: Int, rounds: Int): Map[Long, Long] = {
    var e = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .filter(x => x._1 != x._2).distinct
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size }
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(x => keep(x._1) && keep(x._2))
    }
    e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
  }

  test("path graph peels one layer per round — the multi-round cascade") {
    // 0-1-2-3-4-5 path, k=2: endpoints fall each round until nothing is left
    val path = (0L until 5L).map(i => (i, i + 1))
    for (r <- 0 to 3) assert(kcore(path, 2, r) === kcoreBrute(path, 2, r))
    assert(kcore(path, 2, 3) === Map.empty) // fully peeled
    // a 4-cycle bolted onto the path survives as the 2-core
    val g = path ++ Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), (5L, 10L))
    val core = kcore(g, 2, 6)
    assert(core.keySet === Set(10L, 11L, 12L, 13L))
    assert(core.values.forall(_ === 2L))
  }

  test("k-core matches brute force on a random graph at several round counts") {
    val edges = (0L until 260L).map(i => (i % 28, (i * 13 + 3) % 28))
      .filter(e => e._1 != e._2)
    for (k <- Seq(2, 8, 12); r <- Seq(0, 1, 3))
      assert(kcore(edges, k, r) === kcoreBrute(edges, k, r))
  }

  test("k-core is bit-identical under repartitioning") {
    val edges = (0L until 300L).map(i => (i % 25, (i * 7 + 3) % 25))
      .filter(e => e._1 != e._2)
    val a = kcore(edges, 6, 3)
    val b = Graph.kCore(edges.toDF("src", "dst").repartition(8, col("dst")),
        "src", "dst", 6, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("label propagation is bit-identical under repartitioning") {
    val edges = (0L until 300L).map(i => (i % 25, (i * 7 + 3) % 25))
      .filter(e => e._1 != e._2)
    val a = lpa(edges, 4)
    val b = Graph.labelPropagation(
        edges.toDF("src", "dst").repartition(8, col("dst")),
        "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  // ---- two-phase (large-star/small-star) connected components ------

  private def cc2(edges: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] =
    Graph.connectedComponentsTwoPhase(edges.toDF("src", "dst"),
        "src", "dst", maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Union-find ground truth: node -> min id in its component. */
  private def ccBrute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  test("two-phase CC: deep chain resolves to its minimum in few rounds") {
    // a 200-node path — diameter 199, where label propagation would
    // need ~200 rounds; the star rewrite must finish well inside 20
    val chain = (0L until 199L).map(i => (i, i + 1))
    assert(cc2(chain) === chain.flatMap(e => Seq(e._1, e._2)).distinct
      .map(_ -> 0L).toMap)
  }

  test("two-phase CC matches union-find on a multi-component graph") {
    val edges = (0L until 300L).map(i => ((i * 17 + 5) % 90, (i * 31 + 2) % 90))
      .filter(e => e._1 != e._2) ++
      Seq((1000L, 1001L), (1002L, 1001L), (2000L, 2003L))
    assert(cc2(edges) === ccBrute(edges))
  }

  test("two-phase CC agrees with label-propagation CC and is repartition-stable") {
    val edges = (0L until 240L).map(i => (i % 60, (i * 13 + 7) % 60))
      .filter(e => e._1 != e._2)
    val viaLp = Dedup.connectedComponents(
        edges.toDF("id1", "id2"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc2(edges) === viaLp)
    val shuffled = Graph.connectedComponentsTwoPhase(
        edges.toDF("src", "dst").repartition(8, col("dst")), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shuffled === viaLp)
  }

  test("two-phase CC: empty and self-loop-only inputs yield no rows") {
    assert(cc2(Seq.empty) === Map.empty)
    assert(cc2(Seq((5L, 5L), (9L, 9L))) === Map.empty)
  }

  test("two-phase CC result is digest-cadence-invariant") {
    // the cadence only sets how often the convergence probe runs; at
    // the star fixpoint extra rounds are no-ops, so every cadence must
    // land on the same components as the per-round probe
    val edges = (0L until 260L).map(i => ((i * 19 + 3) % 80, (i * 23 + 11) % 80))
      .filter(e => e._1 != e._2) ++ Seq((500L, 501L), (502L, 501L))
    val perRound = Graph.connectedComponentsTwoPhase(
        edges.toDF("src", "dst"), "src", "dst", maxIter = 20, digestEvery = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (cadence <- Seq(2, 3, 7)) {
      val got = Graph.connectedComponentsTwoPhase(
          edges.toDF("src", "dst"), "src", "dst", maxIter = 20,
          digestEvery = cadence)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === perRound, s"cadence $cadence diverged")
    }
    assert(perRound === ccBrute(edges))
  }

  private def hitsMap(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("HITS on a tiny bipartite graph is hand-computable, both rounds") {
    // hubs 1,2 → auths 10,11: 1→10, 1→11, 2→10
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L))
    // round 1: h(1)=2e6, h(2)=1e6 → norm 1e6, 5e5; a(10)=1.5e6,
    // a(11)=1e6 → norm 1e6, 666666
    val r1 = hitsMap(e, 1)
    assert(r1(1L) === ((1000000L, 0L)))
    assert(r1(2L) === ((500000L, 0L)))
    assert(r1(10L) === ((0L, 1000000L)))
    assert(r1(11L) === ((0L, 666666L)))
    // round 2: h(1)=1666666, h(2)=1e6 → norm 1e6, 600000;
    // a(10)=1.6e6, a(11)=1e6 → norm 1e6, 625000
    val r2 = hitsMap(e, 2)
    assert(r2(1L) === ((1000000L, 0L)))
    assert(r2(2L) === ((600000L, 0L)))
    assert(r2(10L) === ((0L, 1000000L)))
    assert(r2(11L) === ((0L, 625000L)))
  }

  test("HITS is bit-identical under repartitioning and dedups edges") {
    val edges = (0L until 500L).map(i => ((i * 7) % 50, 100 + (i * 13) % 40))
      .filter(e => e._1 != e._2)
    val a = hitsMap(edges, 3)
    val b = Graph.hits(edges.toDF("src", "dst").repartition(8, col("dst")),
        "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a === b)
    assert(hitsMap(edges ++ edges.take(100), 3) === a)
    // max normalization pins the top hub and top authority at scale
    assert(a.values.map(_._1).max === 1000000L)
    assert(a.values.map(_._2).max === 1000000L)
  }

  test("co-occurrence projection: shared counts, canonical pairs, hub cap audited") {
    // src 1 → {10,11,12}, src 2 → {10,11}, src 3 (hub, deg 4 > cap 3)
    val edges = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 11L),
      (2L, 10L), // duplicate edge must collapse
      (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L))
    val (pairs, audit) = Graph.cooccurrenceProject(
      edges.toDF("src", "dst"), "src", "dst", minShared = 1L, maxDeg = 3L)
    val got = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // src 3 dropped entirely: only 1 and 2 contribute
    assert(got === Map((10L, 11L) -> 2L, (10L, 12L) -> 1L, (11L, 12L) -> 1L))
    assert(audit.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 4L)))
    // minShared prunes the singleton pairs; empty audit when cap is high
    val (p2, a2) = Graph.cooccurrenceProject(
      edges.toDF("src", "dst"), "src", "dst", minShared = 2L, maxDeg = 100L)
    val g2 = p2.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // src 3 now contributes: (10,11) has sources {1,2,3}, (10,12)/(11,12)
    // have {1,3}; 13's pairs appear only under src 3 → pruned by minShared
    assert(g2 === Map((10L, 11L) -> 3L, (10L, 12L) -> 2L, (11L, 12L) -> 2L))
    assert(a2.count() === 0L)
  }

  private def layers(edges: Seq[(Long, Long)], iters: Int,
      probeEvery: Int = 0): Map[Long, Long] =
    Graph.longestPathLayers(edges.toDF("src", "dst"), "src", "dst",
        iters, probeEvery)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("longest-path layers: diamond DAG takes the LONG arm") {
    // 1→2→3→4 and the shortcut 1→4: layer(4) must be 3, not 1
    val dag = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    assert(layers(dag, 5) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // under-iterated runs are the round-bounded prefix, never garbage
    assert(layers(dag, 1) === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("longest-path layers: forest roots stay 0; probe stops at the fixed point") {
    // two chains 1→2→3, 10→11 plus isolated-ish source structure
    val dag = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val exact = Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 10L -> 0L, 11L -> 1L)
    assert(layers(dag, 3) === exact)
    // 50 rounds with probing converges early to the same answer
    assert(layers(dag, 50, probeEvery = 2) === exact)
  }

  test("longest-path layers: bit-identical under repartitioning") {
    val dag = (0L until 300L).map(i => (i % 60, 60 + (i * 7) % 60))
      .filter(e => e._1 != e._2) ++ (0L until 50L).map(i => (60 + i, 120 + i))
    val a = layers(dag, 4)
    val b = Graph.longestPathLayers(
        dag.toDF("src", "dst").repartition(8, col("dst")), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("resource-allocation scores: inverse-degree weighting, cap audited") {
    // witnesses: 1 → {10,11}  (deg 2 after symmetrization: 10, 11)
    //            2 → {10,11,12} (deg 3), hub 3 → {10..13} (deg 4 > cap)
    val edges = Seq((1L, 10L), (1L, 11L),
      (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 10L), (3L, 11L), (3L, 12L), (3L, 13L))
    val (pairs, audit) = Graph.resourceAllocationScores(
      edges.toDF("src", "dst"), "src", "dst",
      minScore = 1L, maxDeg = 3L, scale = 1000000L)
    val got = pairs.collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // witness 1 (deg 2) contributes 500000 to (10,11); witness 2
    // (deg 3) contributes 333333 to its three pairs; hub 3 is dropped.
    // Items are ALSO witnesses after symmetrization: 10 has neighbors
    // {1,2,3} (deg 3) → contributes 333333 to (1,2),(1,3),(2,3); same
    // for 11; 12 has {2,3} → 500000 to (2,3); 13 has {3} (deg 1, no pair)
    assert(got((10L, 11L)) === 500000L + 333333L)
    assert(got((10L, 12L)) === 333333L)
    assert(got((11L, 12L)) === 333333L)
    assert(got((1L, 2L)) === 333333L * 2)   // via witnesses 10 and 11
    assert(got((2L, 3L)) === 333333L * 2 + 500000L) // via 10, 11, 12
    assert(audit.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((3L, 4L)))
  }

  test("resource-allocation scores: minScore prunes, dedup + symmetry hold") {
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L),
      (1L, 10L)) // duplicate must collapse
    val rev = edges.map(_.swap)    // reversed edges: same undirected graph
    val (p1, a1) = Graph.resourceAllocationScores(
      edges.toDF("src", "dst"), "src", "dst", minScore = 1L, maxDeg = 10L)
    val (p2, _) = Graph.resourceAllocationScores(
      rev.toDF("src", "dst"), "src", "dst", minScore = 1L, maxDeg = 10L)
    val m1 = p1.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val m2 = p2.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(m1 === m2)
    assert(a1.count() === 0L)
    // raising minScore above every score empties the output
    val (p3, _) = Graph.resourceAllocationScores(
      edges.toDF("src", "dst"), "src", "dst", minScore = 10000000L, maxDeg = 10L)
    assert(p3.count() === 0L)
  }

  test("random walks: every step follows an out-edge, picks replay the hash") {
    import spark.implicits._
    // small directed graph with a hub (1 -> 2..5), a chain, and a sink (9)
    val edges = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L,
      2L -> 6L, 3L -> 6L, 4L -> 6L, 5L -> 6L, 6L -> 9L).toDF("src", "dst")
    val out = Graph.randomWalks(edges, "src", "dst", nWalks = 3, steps = 4,
      seed = "spec-walk")
    val rows = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val edgeSet = Seq(1L -> 2L, 1L -> 3L, 1L -> 4L, 1L -> 5L, 2L -> 6L,
      3L -> 6L, 4L -> 6L, 5L -> 6L, 6L -> 9L).toSet
    // step-0 rows: one per (node-with-out-edges, walk)
    assert(rows.count(_._3 == 0) === 6 * 3)
    // consecutive positions within a walk are edges of the graph
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, walkRows) =>
      walkRows.sortBy(_._3).map(_._4).sliding(2).foreach {
        case Array(u, v) => assert(edgeSet(u -> v), s"$u -> $v not an edge")
        case _           =>
      }
    }
    // a walk that reaches the sink (9) ends there: no row follows it
    rows.groupBy(r => (r._1, r._2)).foreach { case (_, walkRows) =>
      val sorted = walkRows.sortBy(_._3)
      sorted.zipWithIndex.foreach { case (r, i) =>
        if (r._4 == 9L) assert(i == sorted.length - 1)
      }
      // steps are contiguous from 0 (a walk never skips a step)
      assert(sorted.map(_._3).toSeq == (0 until sorted.length).toSeq)
    }
  }

  test("MIS: independent, maximal, and equal to sequential greedy by priority") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val edgeSeq = (0 until 400).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
    val edges = edgeSeq.toDF("src", "dst")
    val out = Graph.maximalIndependentSet(edges, "src", "dst", rounds = 12,
      seed = "spec-mis")
    val mis = out.collect().map(_.getLong(0)).toSet
    val sym = edgeSeq.flatMap(p => Seq(p, p.swap)).toSet
    val nodes = sym.map(_._1)
    // independent: no edge inside the set
    assert(!sym.exists { case (a, b) => mis(a) && mis(b) })
    // maximal: every non-member has a member neighbor
    assert((nodes -- mis).forall(n => sym.exists {
      case (a, b) => a == n && mis(b)
    }))
    // Luby with STATIC priorities converges to the lexicographically-
    // first MIS of the priority permutation — sequential greedy replay
    def h64(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val greedy = scala.collection.mutable.Set[Long]()
    val blocked = scala.collection.mutable.Set[Long]()
    nodes.toSeq.sortBy(n => (h64(s"spec-mis-$n"), n)).foreach { n =>
      if (!blocked(n)) {
        greedy += n
        sym.foreach { case (a, b) => if (a == n) blocked += b }
      }
    }
    assert(mis == greedy.toSet)
    // deterministic under repartitioning
    val again = Graph.maximalIndependentSet(edges.repartition(11),
      "src", "dst", rounds = 12, seed = "spec-mis")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(again == out.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
  }

  test("Kahn layers: DAG waves exact, cycles and their captives report -1") {
    import spark.implicits._
    // chain 1→2→3→4, a diamond 10→{11,12}→13, a 3-cycle 20→21→22→20,
    // and 22→23 (captive: locked behind the cycle forever)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 10L -> 12L, 11L -> 13L, 12L -> 13L,
      20L -> 21L, 21L -> 22L, 22L -> 20L, 22L -> 23L).toDF("src", "dst")
    val got = Graph.kahnLayers(edges, "src", "dst", rounds = 6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(
      1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4,
      10L -> 1, 11L -> 2, 12L -> 2, 13L -> 3,
      20L -> -1, 21L -> -1, 22L -> -1, 23L -> -1))
    // with too few rounds, deep DAG tails degrade to -1 — never wrong
    val shallow = Graph.kahnLayers(edges, "src", "dst", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(shallow(1L) == 1 && shallow(2L) == 2 &&
      shallow(3L) == -1 && shallow(4L) == -1)
  }

  test("random walks: bit-identical under repartitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val edges = (0 until 300).map(_ =>
      (rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.randomWalks(df, "src", "dst", nWalks = 2, steps = 3)
        .collect().map(r =>
          (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(run(edges) == run(edges.repartition(13)))
  }
}
