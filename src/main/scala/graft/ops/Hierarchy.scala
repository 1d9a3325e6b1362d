package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy analytics over (node, parent) forests — org charts,
  * category trees, thread/reply graphs. The SQL-side idiom is a
  * recursive CTE, which Spark lacks; the distributed equivalent is
  * POINTER DOUBLING: each pass replaces every node's ancestor pointer
  * with that ancestor's own pointer while accumulating the hop count,
  * so pointer chains halve every round and a depth-d forest resolves in
  * O(log d) join passes — not O(d) like naive parent-walking.
  */
object Hierarchy {

  /** Root and depth for every node of a forest. Roots are self-parented
    * (`parent == node`); every non-root's parent must appear as a node.
    *
    * Each pass is one equi-join (state ⋈ state on pointer = node) plus
    * a convergence aggregate over the summed distances — a strictly
    * increasing quantity that fixes exactly when every pointer has
    * reached its root. localCheckpoint truncates lineage per pass (the
    * plan would otherwise double every iteration); blocks are freed by
    * the ContextCleaner as each superseded state table drops out of
    * scope. No driver-side state beyond the loop counter.
    *
    * @return (node, root, depth)
    */
  def rootAndDepth(
      parents: DataFrame,
      nodeCol: String,
      parentCol: String,
      maxIters: Int = 30): DataFrame = {
    var state = parents
      .select(col(nodeCol).cast("long").as("node"),
        col(parentCol).cast("long").as("ptr"))
      .withColumn("d", when(col("ptr") === col("node"), lit(0L)).otherwise(lit(1L)))
      .localCheckpoint(eager = false)

    def distSum(df: DataFrame) = Dedup.convergenceSum(df, "d")

    var prev = distSum(state)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val hop = state.select(col("node").as("ptr"),
        col("ptr").as("ptr2"), col("d").as("d2"))
      val next = state.join(hop, Seq("ptr"))
        .select(col("node"), col("ptr2").as("ptr"), (col("d") + col("d2")).as("d"))
        .localCheckpoint(eager = false)
      val sum2 = distSum(next)
      converged = sum2.compareTo(prev) == 0
      prev = sum2
      state = next
      i += 1
    }
    state.select(col("node"), col("ptr").as("root"), col("d").as("depth"))
  }
}
