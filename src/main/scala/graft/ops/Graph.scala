package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.Ckpt.CkptSyntax

/** Iterative graph analytics as join–aggregate loops.
  *
  * Training-corpus pipelines need link analysis (domain authority for
  * quality weighting, citation rank for sampling weights) over graphs
  * far too large for any single machine, so the loop body must be pure
  * shuffle-parallel relational algebra: one equi-join edge⋈rank and one
  * reduce per iteration, nothing driver-side but the loop counter.
  */
object Graph {

  /** PageRank in FIXED-POINT integer arithmetic.
    *
    * Float PageRank sums partial contributions in nondeterministic
    * order, so two runs (or two engines) disagree in the last ulp —
    * untestable cross-engine and unstable under AQE re-planning. This
    * variant keeps every rank as a scaled long (`scale` = 1.0): integer
    * sums are associative, so the result is bit-identical regardless of
    * partitioning, and replayable in ANSI SQL (gate g1's recursive-CTE
    * oracle):
    *
    *   rank₀(v)   = scale
    *   rankᵢ₊₁(v) = (scale·(den−num)) div den
    *                + (num · Σ_{u→v} rankᵢ(u) div outdeg(u)) div den
    *
    * Truncation loses < den per edge per iteration — at the default
    * scale of 1e9 that is a relative error < 1e-7·outdeg, far below any
    * ranking-relevant difference, and identical on every engine.
    *
    * Scale posture: the edge list and its out-degrees are joined ONCE
    * up front and the (src, dst, deg) triple reused every iteration;
    * each iteration is one shuffle on dst (the contribution reduce)
    * plus one shuffle on node (the dangling-node left join) — no
    * driver-side state. Each rank table has exactly one consumer, so
    * the lineage is LINEAR in `iterations` and needs no checkpoint
    * barrier; for unusually long runs (hundreds of iterations) callers
    * can re-introduce a periodic localCheckpoint to bound Catalyst's
    * plan-analysis cost.
    *
    * Nodes with no out-edges contribute nothing (their mass evaporates,
    * the standard simplification); nodes with no in-edges keep the base
    * term via the left join.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(scale > 0 && dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"need scale > 0 and 0 <= dampNum <= dampDen, got $scale, $dampNum/$dampDen")

    // the deduped edge list is read by the degree pass AND the node
    // spine: materialize it once — recomputing the distinct per
    // consumer would rescan the source for each of them
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .ckpt
    // out-degree as a COUNT window over the src partitioning: one
    // exchange yields (src, dst, deg) already hash-partitioned on src —
    // exactly the layout every iteration's join wants — where a
    // groupBy+join would cost two exchanges for the same table
    val ed = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .ckpt
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .ckpt

    val base = scale * (dampDen - dampNum) / dampDen
    var rank = nodes.select(col("node"), lit(scale).as("pr_rank"))
    for (i <- 1 to iterations) {
      // nodes enter the reduce as zero-contribution rows, so one
      // shuffle (the groupBy) serves both the contribution sum AND
      // dangling-node retention — a left join against the node spine
      // would cost a second exchange per iteration
      val contrib = ed
        .join(rank.select(col("node").as("src"), col("pr_rank")), Seq("src"))
        .select(col("dst").as("node"), expr("pr_rank div deg").as("c"))
      // no per-iteration checkpoint: each rank table has exactly ONE
      // consumer (the next contribution join), so the lineage is linear
      // and the whole iteration chain plans as a single query — a
      // materialization barrier every pass adds a store/load round-trip
      // (measured ~15% of the gate's wall clock). But Catalyst analysis
      // cost still grows with plan depth, so a PERIODIC checkpoint every
      // 25 passes bounds it for large iteration counts without paying
      // the barrier in the common 10-20-iteration case
      rank = contrib
        .unionAll(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node").agg(sum("c").as("s"))
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * s) div $dampDen")).as("pr_rank"))
      if (i % 25 == 0 && i < iterations)
        rank = rank.ckpt
    }
    rank
  }

  /** PERSONALIZED PageRank (Jeh & Widom WWW'03; the TrustRank trick,
    * Gyöngyi et al. VLDB'04): the teleport mass restarts ONLY into the
    * seed set, so ranks measure authority RELATIVE to trusted nodes —
    * the standard crawl-quality upgrade over global PageRank, where
    * link farms inflate themselves but cannot reach seed-restart mass.
    *
    * Identical physical shape (and fixed-point determinism) to
    * [[pageRank]]: one contribution join + one zero-union reduce per
    * round, linear lineage, periodic checkpoint. The restart vector is
    * a pure `when` PROJECTION over the reduce output (seed membership
    * is a predicate on the node id), so personalization adds zero
    * exchanges. Seeds start at `scale`, everything else at 0; ranks
    * are unnormalized fixed-point integers (ordering and convergence
    * match the normalized form).
    *
    * @param isSeed predicate Column over the node id (e.g.
    *               `n => n < 1000000 && n % 10 === 0`) — a predicate
    *               rather than a DataFrame so the restart vector stays
    *               a projection; wrap a small seed TABLE via
    *               `isin(...)` literals if membership isn't computable
    */
  def personalizedPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      isSeed: Column => Column,
      iterations: Int,
      scale: Long = 1000000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    require(scale > 0 && dampNum >= 0 && dampDen > 0 && dampNum <= dampDen,
      s"need scale > 0 and 0 <= dampNum <= dampDen, got $scale, $dampNum/$dampDen")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .distinct()
      .ckpt
    val ed = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .ckpt
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .ckpt

    val base = scale * (dampDen - dampNum) / dampDen
    def restart(node: Column): Column =
      when(isSeed(node), lit(base)).otherwise(lit(0L))
    var rank = nodes.select(col("node"),
      when(isSeed(col("node")), lit(scale)).otherwise(lit(0L)).as("pr_rank"))
    for (i <- 1 to iterations) {
      val contrib = ed
        .join(rank.select(col("node").as("src"), col("pr_rank")), Seq("src"))
        .select(col("dst").as("node"), expr("pr_rank div deg").as("c"))
      rank = contrib
        .unionAll(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node").agg(sum("c").as("s"))
        .select(col("node"),
          (restart(col("node")) + expr(s"($dampNum * s) div $dampDen")).as("pr_rank"))
      if (i % 25 == 0 && i < iterations)
        rank = rank.ckpt
    }
    rank
  }

  /** Single-source shortest paths by synchronous Bellman–Ford rounds
    * in INTEGER weights — the distributed `WITH RECURSIVE` shortest
    * path.
    *
    * Each round relaxes every edge once: dist_{i+1}(v) = min over
    * incoming edges (u,v,w) of dist_i(u) + w. A weight-0 self-loop is
    * added per node so the carry-forward term (`min` with the previous
    * round's own distance) rides the SAME join–aggregate as the
    * relaxation — the distance table is referenced exactly ONCE per
    * round, keeping lineage linear in `iterations` (no exponential
    * plan growth, no per-round checkpoint barrier). With
    * `iterations >=` the graph's hop diameter the result is the exact
    * SSSP; below it, it is exactly round-`iterations` Bellman–Ford,
    * which the g3 oracle replays verbatim (recursive CTE with the same
    * self-loop trick), so the gate holds at ANY round count.
    *
    * Scale posture: the deduped min-weight edge list (+self-loops) is
    * built once (one shuffle) and reused every round; each round is one
    * equi-join edge⋈dist plus one min-reduce on dst — shuffle-parallel,
    * driver state = loop counter and (optionally) one convergence
    * scalar. Integer sums/mins are associative, so the result is
    * bit-identical under any partitioning. Unreached nodes are simply
    * absent (no +inf sentinel on the wire).
    *
    * @param probeEvery if > 0, every `probeEvery` rounds run a
    *   one-row (count, sum) probe over the distance table and stop
    *   early when it is unchanged — sound because a Bellman–Ford
    *   fixed point can only stay fixed, so the early answer equals the
    *   full-`iterations` answer. 0 disables the probe (gate mode:
    *   fixed rounds, zero extra actions).
    * @return (node, dist) for every node reachable in <= iterations hops
    */
  def shortestPaths(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      weightCol: String,
      sourceId: Long,
      iterations: Int,
      probeEvery: Int = 0): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")

    // parallel edges keep the cheapest weight. Negative weights are
    // fine for fixed-round semantics (it's round-bounded Bellman–Ford
    // either way) but the early-stop probe assumes a monotone
    // relaxation — pass probeEvery = 0 if weights can be negative
    val raw = edges.select(
      col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      col(weightCol).cast("long").as("w"))
    val e = raw.groupBy("src", "dst").agg(min("w").as("w"))
    val nodes = raw.select(col("src").as("n"))
      .union(raw.select(col("dst").as("n")))
      .distinct()
    val e2 = e
      .unionAll(nodes.select(col("n").as("src"), col("n").as("dst"),
        lit(0L).as("w")))
      .ckpt // reused by every round's join

    var dist = e2.sparkSession.range(1)
      .select(lit(sourceId).as("node"), lit(0L).as("dist"))
    var lastProbe: Option[(Long, java.math.BigDecimal)] = None
    var converged = false
    var i = 1
    while (i <= iterations && !converged) {
      dist = e2
        .join(dist.select(col("node").as("src"), col("dist")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(min(col("dist") + col("w")).as("dist"))
      if (probeEvery > 0 && i % probeEvery == 0 && i < iterations) {
        // materialize the round so the probe isn't thrown away, then
        // compare a (count, exact decimal sum) fingerprint — distances
        // only ever decrease or appear, so an unchanged fingerprint
        // means a fixed point
        dist = dist.localCheckpoint(eager = true)
        val row = dist.agg(count(lit(1)), sum(col("dist").cast("decimal(38,0)")))
          .head()
        val probe = (row.getLong(0), row.getDecimal(1).stripTrailingZeros)
        if (lastProbe.contains(probe)) converged = true
        lastProbe = Some(probe)
      }
      i += 1
    }
    dist
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara, Phys. Rev. E 76, 2007, public) with DETERMINISTIC
    * tie-breaking — the cheap clustering pass a corpus pipeline runs
    * over its domain/link graph to group related sources before
    * per-community sampling or quality weighting.
    *
    *   label₀(v)   = v
    *   labelᵢ₊₁(v) = argmax_ℓ |{u ∈ N(v) : labelᵢ(u) = ℓ}|,
    *                 ties broken toward the SMALLEST label
    *
    * Classic LPA breaks ties randomly and updates asynchronously, which
    * is untestable; this variant is synchronous with a total (−votes,
    * label) pick order, so round-R output is a pure function of the
    * edge list — bit-identical under any partitioning and replayable in
    * SQL (gate g4's unrolled oracle). Synchronous LPA can oscillate on
    * bipartite structures instead of converging; round-bounded
    * semantics make that a feature (the gate holds at ANY round count),
    * and callers wanting a fixed point run with higher `iterations` and
    * compare successive rounds.
    *
    * Scale posture: the symmetrized deduped edge list is built once
    * (one shuffle) and reused every round; each round is one equi-join
    * edge⋈labels (on the edge list's existing src partitioning) plus
    * two hash aggregates — (node, label) vote counts, then the per-node
    * pick via `min_by` over the (−votes, label) order (hash aggregate,
    * no window sort). Every label table has exactly one consumer, so
    * lineage stays linear in `iterations` with no checkpoint barrier;
    * driver state is the loop counter.
    *
    * Self-loops are dropped; isolated nodes (no non-loop edges) are
    * absent from the output. After symmetrization every remaining node
    * has >= 1 neighbor, so no keep-own-label spine join is needed.
    *
    * @return (node, label) — nodes sharing a label form one community
    */
  def labelPropagation(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val raw = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val e = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .ckpt // reused by every round's join
    var lab = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
    for (_ <- 1 to iterations) {
      val votes = e
        .join(lab.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("v"))
      lab = votes.groupBy("node")
        .agg(min_by(col("label"),
          struct((-col("v")).as("nv"), col("label").as("lb"))).as("label"))
    }
    lab
  }

  /** Round-bounded k-core decomposition by synchronous degree peeling
    * (Seidman, Social Networks 1983, public): each round computes every
    * node's degree in the CURRENT subgraph and removes all nodes with
    * degree < k at once; the surviving subgraph after enough rounds is
    * the k-core. Corpus pipelines use it to strip low-engagement
    * fringe (spam domains, drive-by links) from the link graph before
    * authority scoring — a cheap structural quality filter.
    *
    * Synchronous whole-round peeling makes round-R output a pure
    * function of the edge list (bit-identical under any partitioning,
    * replayable by g5's unrolled SQL oracle); peeling is monotone —
    * removed nodes can never re-qualify — so round-R output for R >=
    * the peel depth IS the exact k-core (spec-checked against a
    * brute-force fixpoint).
    *
    * Scale posture: each round is one degree hash-aggregate plus two
    * semi-join-shaped equi-joins restricting the edge list to
    * surviving endpoints. The edge list branches three ways per round
    * (degree pass + both endpoint filters), so each round ends in a
    * [[Ckpt]] barrier — without it the plan would grow 3^R. Driver
    * state is the loop counter.
    *
    * @return (node, degree) of surviving nodes with their degree in
    *         the surviving subgraph
    */
  def kCore(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 0, s"rounds must be >= 0, got $rounds")
    val raw = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    var e = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .ckpt
    for (_ <- 1 to rounds) {
      // symmetric edge list: out-degree IS the undirected degree
      val keep = e.groupBy("src").agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("src").as("n"))
      e = e.join(keep.select(col("n").as("src")), Seq("src"))
        .join(keep.select(col("n").as("dst")), Seq("dst"))
        .select("src", "dst")
        .ckpt
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("degree"))
  }

  /** Triangle counting with degree orientation — the standard trick
    * that makes distributed triangle enumeration feasible (Suri &
    * Vassilvitskii, WWW'11 "Counting Triangles and the Curse of the
    * Last Reducer", public): orient every undirected edge from its
    * lower-(degree, id) endpoint to its higher one, enumerate wedges
    * only from each node's OUT-neighborhood, and close them against the
    * oriented edge list. Orientation bounds every out-degree by
    * O(√edges) even on power-law graphs, so the wedge set is
    * O(edges^1.5) instead of Σ deg² — the high-degree hub that would
    * otherwise produce billions of wedges fans out nothing.
    *
    * Physical shape: dedupe edges (one shuffle), degree count (one
    * aggregate over the exploded endpoints), two broadcast-eligible
    * joins to attach degrees, then wedge self-join on the apex and one
    * closing equi-join on (v1, v2). Every triangle is counted exactly
    * once, at its minimum-(degree, id) apex.
    *
    * @return (node, n_triangles) for every apex with >= 1 triangle
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges
      .select(least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .ckpt // feeds degrees AND both join sides
    val deg = e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // orient each edge toward the higher (degree, id) endpoint
    val withDeg = e
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
        .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
        .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"), col("o.dv").as("dv"))
      .ckpt // wedge sides + closing join

    val w1 = oriented.select(col("u"), col("v").as("v1"), col("dv").as("dv1"))
    val w2 = oriented.select(col("u"), col("v").as("v2"), col("dv").as("dv2"))
    val wedges = w1.join(w2, Seq("u"))
      .filter(col("dv1") < col("dv2") ||
        (col("dv1") === col("dv2") && col("v1") < col("v2")))
    wedges
      .join(oriented.select(col("u").as("v1"), col("v").as("v2")), Seq("v1", "v2"))
      .groupBy(col("u").as("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Connected components by alternating LARGE-STAR / SMALL-STAR
    * rounds (Kiveris et al., SoCC'14 "Connected Components in
    * MapReduce and Beyond", public) — the O(log² n)-round alternative
    * to min-label propagation, whose round count is the component
    * DIAMETER. On a 100 TB web graph the diameter can be hundreds of
    * hops while log² n is ~25: the label-propagation loop
    * ([[graft.ops.Dedup.connectedComponents]]) is the right tool for
    * the shallow near-dup clusters LSH emits, THIS is the right tool
    * for deep path-shaped graphs (link chains, citation threads).
    *
    * Each round rewrites the edge set itself (there is no separate
    * label table):
    *
    *   large-star(u): every neighbor v > u re-attaches to
    *                  m = min(N(u) ∪ {u})
    *   small-star(u): every neighbor v < u, and u itself, re-attach
    *                  to m
    *
    * Both phases are one groupBy(node) min-aggregate plus one
    * join-back over the symmetrized edge list — pure shuffle-parallel
    * relational algebra, no driver state but the loop counter. The
    * edge multiset strictly shrinks toward the star fixpoint (every
    * node directly linked to its component minimum), so convergence is
    * detected by an exact (count, Σnode, Σmin) digest going stable.
    * `digestEvery = 1` (default) probes every round: PLANS.md records
    * the measured rejection of cadence 2 (12.7 s vs 8.6 s at sf0.1 —
    * with rounds materialized by the [[Ckpt]] barrier the digest is
    * cheap, so a sparser cadence only defers convergence detection by
    * up to digestEvery−1 wasted no-op rounds). The RESULT is identical
    * at any cadence (spec-pinned).
    *
    * @return (node, component) — component = min node id reachable
    */
  def connectedComponentsTwoPhase(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 20,
      digestEvery: Int = 1): DataFrame = {
    require(maxIter >= 1, s"maxIter must be >= 1, got $maxIter")
    require(digestEvery >= 1, s"digestEvery must be >= 1, got $digestEvery")
    val raw = edges.select(
      col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
    // undirected: keep one canonical (min, max) copy per edge
    var e = raw.select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .ckpt

    def digest(df: DataFrame): (Long, java.math.BigDecimal) = {
      val r = df.agg(count(lit(1)),
        sum((col("a") + col("b")).cast("decimal(38,0)"))).collect()(0)
      (r.getLong(0),
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
    }
    var prev: Option[(Long, java.math.BigDecimal)] = None
    var i = 0
    var converged = false
    val wU = org.apache.spark.sql.expressions.Window.partitionBy(col("u"))
    while (!converged && i < maxIter) {
      // one symmetrized view serves both phases' neighbor-min pass.
      // The neighborhood minimum rides a WINDOW over the u
      // partitioning (the pageRank out-degree trick): ONE exchange
      // yields every row already annotated with its node's min, where
      // the groupBy+join formulation pays three (agg, probe, join) —
      // measured ~35% of g7's per-round wall at sf0.1
      val nbrs = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
        .withColumn("m", least(col("u"), min(col("v")).over(wU)))

      // LARGE-STAR: (v, m_u) for v > u — strictly-larger neighbors
      // re-attach to u's minimum. m_u <= u < v, so no self loops.
      val large = nbrs.filter(col("v") > col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .distinct()
        .ckpt

      // SMALL-STAR over the large-star output: (v, m_u) for v < u,
      // plus (u, m_u) linking u to its own minimum (emitted per row,
      // deduplicated by the round-end distinct)
      val nbrs2 = large.select(col("a").as("u"), col("b").as("v"))
        .unionAll(large.select(col("b").as("u"), col("a").as("v")))
        .withColumn("m", least(col("u"), min(col("v")).over(wU)))
      e = nbrs2.filter(col("v") < col("u"))
        .select(col("m").as("a"), col("v").as("b"))
        .unionAll(nbrs2.select(col("m").as("a"), col("u").as("b")))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .distinct()
        .ckpt

      i += 1
      // digest cadence: probe on the cadence grid (and at the round
      // bound); between probes, rounds stay lazy — the next digest
      // materializes the ≤ digestEvery-round lineage in one job
      if (i % digestEvery == 0 || i == maxIter) {
        val d = digest(e)
        converged = prev.contains(d)
        prev = Some(d)
      }
    }

    // at the star fixpoint every edge is (component_min, node); nodes
    // that were only ever a minimum appear solely on the `a` side
    e.select(col("b").as("node"), col("a").as("component"))
      .unionAll(e.select(col("a").as("node"), col("a").as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }

  /** HITS hubs-and-authorities (Kleinberg JACM'99, public) in
    * FIXED-POINT integer arithmetic — the link-analysis complement to
    * [[pageRank]]: a good HUB points at good authorities, a good
    * AUTHORITY is pointed at by good hubs. On a supplier→part (or
    * domain→document) bipartite graph this separates "broad curators"
    * from "widely-sourced items", the pair of signals a crawl-quality
    * weighting actually wants.
    *
    *   h(u) = Σ_{u→v} a(v)      then  h ← (h · scale) div max(h)
    *   a(v) = Σ_{u→v} h(u)      then  a ← (a · scale) div max(a)
    *
    * The power iteration needs per-step normalization or the values
    * explode geometrically; the float version normalizes by the L2
    * norm, which no two engines agree on bitwise. This variant
    * normalizes by the MAX (an exact integer, associative to reduce),
    * so every half-round is integer-only: sums are associative → the
    * iterate is bit-identical under any partitioning and replayable in
    * ANSI SQL via a window MAX (gate g8's oracle). Convergence and
    * final ORDERING match the L2-normalized textbook form (both are
    * scalar rescalings of the same power iterate).
    *
    * Scale posture: mirrors [[pageRank]] — the deduped edge list is
    * checkpointed once and each half-round is ONE equi-join + ONE
    * hash-reduce (shuffle on the aggregation key) + a zero-union
    * against the node spine so sink/source nodes keep rows. The
    * normalizing max is a SCALAR aggregate per half-round (the same
    * blessed driver panel as g7's convergence digest — one long, not
    * data); the iterate sits behind a [[Ckpt]] barrier each half-round
    * because the max action and the next join both consume it.
    *
    * @return (node, hub, auth) fixed-point scores scaled to [0, scale]
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(scale > 0, s"scale must be > 0, got $scale")
    val e = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .ckpt
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .ckpt

    // one sum-reduce + zero-union spine pass, then max-normalize; the
    // scalar max is collected (one long) and folded back as a literal
    def step(score: DataFrame, joinKey: String, outKey: String): DataFrame = {
      val summed = e
        .join(score.select(col("node").as(joinKey), col("x")), Seq(joinKey))
        .select(col(outKey).as("node"), col("x"))
        .unionAll(nodes.select(col("node"), lit(0L).as("x")))
        .groupBy("node").agg(sum("x").as("x"))
        .ckpt
      val mx = summed.agg(max("x")).collect()(0).getLong(0)
      if (mx <= 0L) summed
      else summed.select(col("node"), expr(s"(x * $scale) div $mx").as("x"))
        .ckpt
    }

    var auth = nodes.select(col("node"), lit(scale).as("x"))
    var hub = auth
    for (_ <- 1 to iterations) {
      // h(u) = Σ a(dst): join on dst, reduce on src — then a(v) from
      // the FRESH hubs (the standard in-round update order)
      hub = step(auth, "dst", "src")
      auth = step(hub, "src", "dst")
    }
    hub.select(col("node"), col("x").as("hub"))
      .join(auth.select(col("node"), col("x").as("auth")), Seq("node"))
  }

  /** Bipartite co-occurrence projection: project (source → item) edges
    * onto item–item pairs weighted by the number of SHARED sources —
    * co-citation / co-purchase / "documents linked by the same page"
    * graph construction (Small 1973's co-citation measure, public),
    * the standard precursor to clustering or similarity scoring over
    * a layer the raw graph never connects directly.
    *
    * The projection is inherently quadratic per source (a source of
    * degree d emits C(d, 2) pairs), and hub sources carry the least
    * signal per pair (a supplier selling EVERYTHING co-locates nothing
    * meaningfully) — so sources with degree > `maxDeg` are dropped
    * ENTIRELY before pairing, bounding the pair shuffle at
    * Σ min(d, maxDeg)² ≤ maxDeg·|E| and the audit DataFrame makes the
    * loss observable (empty audit certifies the projection is exact) —
    * the same audited-cap contract as the LSH/containment candidate
    * stages. Pairs are canonical (a < b); `minShared` prunes
    * singleton co-occurrences before they leave the aggregate.
    *
    * @return (pairs (a, b, shared), audit (src, deg) of dropped hubs)
    */
  def cooccurrenceProject(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      minShared: Long = 2L,
      maxDeg: Long = 1000L): (DataFrame, DataFrame) = {
    require(minShared >= 1 && maxDeg >= 1,
      s"need minShared >= 1 and maxDeg >= 1, got $minShared, $maxDeg")
    // deduped edges feed the degree pass AND both self-join sides
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .ckpt
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val dropped = deg.filter(col("deg") > maxDeg)
    // left-semi on the kept sources: only (src) ids ride the filter join
    val kept = e.join(
      deg.filter(col("deg") <= maxDeg).select("src"), Seq("src"), "left_semi")
      .ckpt
    val pairs = kept.select(col("src"), col("dst").as("a"))
      .join(kept.select(col("src"), col("dst").as("b")), Seq("src"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    (pairs, dropped)
  }

  /** Longest-path layering of a DAG (the parallel-batch schedule /
    * critical-path depth): layer(v) = length in edges of the longest
    * path ending at v, i.e. the earliest round in which v can run when
    * every round executes all currently-unblocked work — the
    * topological level a dependency-ordered backfill or DAG scheduler
    * partitions its work by.
    *
    * Round-bounded max-relaxation (the Bellman–Ford recurrence with
    * (max, +1) instead of (min, +w)):
    *
    *   layer₀(v)   = 0
    *   layerᵢ₊₁(v) = max(0, max_{u→v} layerᵢ(u) + 1)
    *
    * On a DAG the sequence is monotone non-decreasing and reaches the
    * exact longest-path layering once `iterations` ≥ the longest path
    * length; the optional fingerprint probe (count, Σ layer — both
    * monotone) detects that fixed point and stops early, exactly like
    * [[shortestPaths]]' probe. On a CYCLIC input the recurrence never
    * converges (layers on the cycle grow every round) — round-bounded
    * semantics make that observable rather than divergent, and a
    * caller can detect cyclicity by probing twice at the end.
    *
    * Scale posture: the deduped edge list is materialized once and
    * reused every round; each round is one equi-join edges⋈layers on
    * src plus one max-reduce on dst plus the node-spine left join that
    * keeps source nodes at layer ≥ 0 — pure shuffle-parallel
    * relational algebra, driver state is the loop counter. Layer
    * tables have one consumer each → linear lineage, no checkpoint
    * barrier needed at practical depths.
    *
    * @return (node, layer) for every node appearing in the edge list
    */
  def longestPathLayers(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      probeEvery: Int = 0): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0, got $iterations")
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .distinct()
      .ckpt
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .ckpt

    var layers = nodes.select(col("node"), lit(0L).as("layer"))
    var lastProbe: Option[(Long, java.math.BigDecimal)] = None
    var converged = false
    var i = 1
    while (i <= iterations && !converged) {
      val incoming = e
        .join(layers.select(col("node").as("src"), col("layer")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(max(col("layer") + 1L).as("in_layer"))
      layers = nodes.join(incoming, Seq("node"), "left")
        .select(col("node"), coalesce(col("in_layer"), lit(0L)).as("layer"))
      if (probeEvery > 0 && i % probeEvery == 0 && i < iterations) {
        // layers only grow on a DAG, so an unchanged (count, exact sum)
        // fingerprint certifies the fixed point
        layers = layers.localCheckpoint(eager = true)
        val row = layers.agg(count(lit(1)), sum(col("layer").cast("decimal(38,0)")))
          .head()
        val probe = (row.getLong(0), row.getDecimal(1).stripTrailingZeros)
        if (lastProbe.contains(probe)) converged = true
        lastProbe = Some(probe)
      }
      i += 1
    }
    layers
  }

  /** Common-neighbor link prediction by the Resource Allocation index
    * (Zhou, Lü & Zhang, Eur. Phys. J. B 71, 2009, public — the
    * integer-friendly sibling of Adamic–Adar) in FIXED-POINT
    * arithmetic: for every node pair (a, b) sharing ≥ 1 neighbor,
    *
    *   score(a, b) = Σ_{z ∈ N(a) ∩ N(b)}  scale div deg(z)
    *
    * — shared neighbors count more when they are selective. Rare shared
    * neighbors signal a real link; a hub everyone touches signals
    * nothing, and its C(d, 2) pair explosion costs the most — so, as in
    * [[cooccurrenceProject]], witnesses with degree > `maxDeg` are
    * dropped BEFORE pairing (bounding the pair shuffle at maxDeg·|E|)
    * and returned in an audit DataFrame; an empty audit certifies the
    * scores are exact. Integer div makes the sum associative → output
    * is bit-identical under any partitioning and replayable in ANSI
    * SQL (gate g11's oracle replays the cap and the div).
    *
    * The graph is symmetrized first (neighbors = union of in and out),
    * self-loops dropped; pairs are canonical (a < b); `minScore`
    * prunes noise pairs inside the aggregate before they ship.
    *
    * @return (pairs (a, b, score), audit (node, deg) of dropped hubs)
    */
  def resourceAllocationScores(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      minScore: Long = 1L,
      maxDeg: Long = 1000L,
      scale: Long = 1000000L): (DataFrame, DataFrame) = {
    require(maxDeg >= 1 && scale > 0,
      s"need maxDeg >= 1 and scale > 0, got $maxDeg, $scale")
    val raw = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // symmetrize + dedup once; (witness z = src, neighbor = dst)
    val e = raw.unionAll(raw.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .ckpt
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val dropped = deg.filter(col("deg") > maxDeg)
      .select(col("src").as("node"), col("deg"))
    // each kept witness carries its inverse-degree weight into pairing
    val kept = e.join(deg.filter(col("deg") <= maxDeg), Seq("src"))
      .select(col("src"), col("dst"), expr(s"${scale}L div deg").as("w"))
      .ckpt
    val pairs = kept.select(col("src"), col("dst").as("a"), col("w"))
      .join(kept.select(col("src"), col("dst").as("b")), Seq("src"))
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(sum(col("w")).as("score"))
      .filter(col("score") >= minScore)
    (pairs, dropped)
  }

  /** Round-bounded Kahn topological layering WITH a cycle audit — the
    * scheduler-facing complement of [[longestPathLayers]] (which
    * assumes a DAG): round r peels every node with no remaining
    * incoming edge and stamps it layer r; whatever survives `rounds`
    * peels is ON or DOWNSTREAM-LOCKED-BY a cycle (or deeper than the
    * bound) and reports layer −1 — the audit a dependency scheduler
    * needs before trusting the waves. On a DAG with depth ≤ `rounds`
    * the −1 set is empty and layers are exactly Kahn's. One
    * zero-in-degree anti-join + one source-removal anti-join per
    * round, linear lineage.
    *
    * @return (node, layer) — layer ≥ 1 peeled wave, −1 unresolved
    */
  def kahnLayers(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .ckpt
    var active = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
      .ckpt
    var out = active.select(col("node"), lit(0).as("layer")).limit(0)
    for (r <- 1 to rounds) {
      val sources = active
        .join(e.select(col("dst").as("node")), Seq("node"), "left_anti")
        .ckpt // out, edge-prune, node-prune
      out = out.unionAll(sources.select(col("node"), lit(r).as("layer")))
      active = active.join(sources, Seq("node"), "left_anti")
        .ckpt
      e = e.join(sources.select(col("node").as("src")), Seq("src"), "left_anti")
        .ckpt
    }
    out.unionAll(active.select(col("node"), lit(-1).as("layer")))
  }

  /** Round-bounded maximal independent set — Luby's algorithm with
    * STATIC salted-hash priorities, which makes it deterministic: the
    * converged result is exactly the lexicographically-first MIS of the
    * priority permutation (what sequential greedy over nodes sorted by
    * (h64(seed-node), node) yields — spec-proven), reached in parallel
    * rounds instead of a sequential scan. Per round, every node whose
    * priority beats all its ACTIVE neighbors joins the set and knocks
    * its neighbors out; expected O(log n) rounds under hash-random
    * priorities. The conflict-free batching primitive: schedule updates
    * touching adjacent entities (same file, same account, same shard)
    * in independent waves.
    *
    * Round r exact at any bound (the kCore contract): `rounds` ≥ the
    * convergence count gives the exact MIS; fewer gives the first r
    * waves. One equi-join + one min-reduce + one anti-join per round,
    * linear lineage. Nodes appear with the ROUND they were selected —
    * the wave id a scheduler consumes directly. Isolated nodes never
    * enter (no edges): they are trivially independent, add them
    * upstream if needed.
    *
    * @return (node, round) — MIS members only
    */
  def maximalIndependentSet(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      rounds: Int,
      seed: String = "graft-mis"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val raw = edges.select(col(srcCol).cast("long").as("a"),
      col(dstCol).cast("long").as("b"))
    val e = raw.unionAll(raw.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
      .ckpt
    var active = e.select(col("a").as("node")).distinct()
      .withColumn("h", graft.functions.TextFunctions.h64(
        concat_ws("-", lit(seed), col("node"))))
      .ckpt
    var mis = active.select(col("node"), lit(0).as("round")).limit(0)
    for (r <- 1 to rounds) {
      // best (h, node) among each node's ACTIVE neighbors
      val nbrBest = e
        .join(active.select(col("node").as("b"), col("h").as("bh")), Seq("b"))
        .groupBy("a").agg(min(struct(col("bh"), col("b"))).as("nb"))
        .select(col("a").as("node"), col("nb"))
      val winners = active
        .join(nbrBest, Seq("node"), "left")
        .filter(col("nb").isNull || struct(col("h"), col("node")) < col("nb"))
        .select("node")
        .ckpt // consumed thrice: mis, losers, anti
      val losers = e.join(winners.select(col("node").as("a")), Seq("a"))
        .select(col("b").as("node")).distinct()
      mis = mis.unionAll(winners.select(col("node"), lit(r).as("round")))
      active = active
        .join(winners.unionAll(losers), Seq("node"), "left_anti")
        .ckpt
    }
    mis
  }

  /** Seeded deterministic random walks — the DeepWalk/node2vec (p=q=1)
    * corpus generator: `nWalks` walks start at every node with out-
    * edges; at step t a walk at node u moves to u's out-neighbor in
    * slot `h64(seed-start-walk-t) mod outdeg(u)` of u's dst-sorted
    * adjacency. The pick is a pure salted hash of the walk identity —
    * no RNG state — so walks are bit-identical under reruns,
    * repartitioning, and engine change (gate g12 replays every step in
    * SQL). A walk reaching a sink (no out-edges) simply ends.
    *
    * Physical shape per step: the frontier joins the degree panel
    * (computes the slot pick), then ONE equi-join on the UNIQUE
    * (src, slot) adjacency key — no hub fan-out: a node of degree 10⁶
    * contributes one row per incoming walk, never 10⁶ candidate rows
    * (the naive cur=src join then slot filter would). Linear lineage
    * (localCheckpoint per step), `steps` rounds total, walk rows only
    * on the wire — at 100 TB-graph scale the corpus emitted is
    * O(nodes·nWalks·steps) rows of three longs.
    *
    * @return (start, walk, step, node) — step 0 is the start row
    */
  def randomWalks(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      nWalks: Int,
      steps: Int,
      seed: String = "graft-walk"): DataFrame = {
    require(nWalks >= 1 && steps >= 1,
      s"need nWalks >= 1 and steps >= 1, got $nWalks, $steps")
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col(srcCol).cast("long").as("src"),
        col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    // dst-sorted slots + outdegree from the SAME window shuffle;
    // (src, slot) is unique — the fan-out-free step-join key
    val w = Window.partitionBy("src")
    // dst-sorted slots + outdegree of src from one window shuffle; the
    // outdegree of DST rides along (one build-time self-join) so every
    // step needs ONE equi-join on the unique (src, slot) key — the
    // frontier always carries the degree it needs for its next pick
    val slotted = e
      .withColumn("slot", row_number().over(w.orderBy("dst")) - 1)
      .withColumn("deg", count(lit(1)).over(w))
      .ckpt
    val degs = slotted.select(col("src").as("node"), col("deg")).distinct()
    val adj = slotted
      .join(degs.select(col("node").as("dst"), col("deg").as("dstdeg")),
        Seq("dst"), "left")
      .select(col("src"), col("slot"), col("dst"),
        coalesce(col("dstdeg"), lit(0L)).as("dstdeg")) // 0 = sink
      .ckpt
    var frontier = degs.select(col("node").as("start"), col("deg"))
      .withColumn("walk", explode(sequence(lit(0), lit(nWalks - 1))))
      .withColumn("cur", col("start"))
    var out = frontier.select(col("start"), col("walk"),
      lit(0).as("step"), col("cur").as("node"))
    for (t <- 1 to steps) {
      frontier = frontier
        .filter(col("deg") > 0) // sinks end their walk
        .withColumn("slot", pmod(graft.functions.TextFunctions.h64(
          concat_ws("-", lit(seed), col("start"), col("walk"), lit(t))),
          col("deg")))
        .select(col("start"), col("walk"), col("cur").as("src"), col("slot"))
        .join(adj, Seq("src", "slot"))
        .select(col("start"), col("walk"), col("dst").as("cur"),
          col("dstdeg").as("deg"))
        .ckpt
      out = out.unionAll(frontier.select(col("start"), col("walk"),
        lit(t).as("step"), col("cur").as("node")))
    }
    out
  }
}
