package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * driver-side state, no lineage growth (localCheckpoint truncates
    * per iteration, blocks freed by the ContextCleaner as the previous
    * rank table becomes unreachable).
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
      .localCheckpoint(eager = false)
    // out-degree as a COUNT window over the src partitioning: one
    // exchange yields (src, dst, deg) already hash-partitioned on src —
    // exactly the layout every iteration's join wants — where a
    // groupBy+join would cost two exchanges for the same table
    val ed = e
      .withColumn("deg", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
      .localCheckpoint(eager = false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(eager = false)

    val base = scale * (dampDen - dampNum) / dampDen
    var rank = nodes.select(col("node"), lit(scale).as("pr_rank"))
    for (_ <- 1 to iterations) {
      // nodes enter the reduce as zero-contribution rows, so one
      // shuffle (the groupBy) serves both the contribution sum AND
      // dangling-node retention — a left join against the node spine
      // would cost a second exchange per iteration
      val contrib = ed
        .join(rank.select(col("node").as("src"), col("pr_rank")), Seq("src"))
        .select(col("dst").as("node"), expr("pr_rank div deg").as("c"))
      rank = contrib
        .unionAll(nodes.select(col("node"), lit(0L).as("c")))
        .groupBy("node").agg(sum("c").as("s"))
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * s) div $dampDen")).as("pr_rank"))
        .localCheckpoint(eager = false)
    }
    rank
  }
}
