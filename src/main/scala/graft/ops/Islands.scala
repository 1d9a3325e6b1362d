package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ckpt.CkptSyntax

/** Gaps-and-islands: maximal runs of consecutive integer keys.
  *
  * The textbook formulation (`k − ROW_NUMBER() OVER (ORDER BY k)`) needs
  * one GLOBAL sort — a single reducer at 100 TB. This operator instead
  * partitions the key space into fixed ranges, finds island fragments
  * inside each range with an ordinary partitioned window (one exchange,
  * local sorts), and merges fragments that touch across range
  * boundaries with [[Dedup.connectedComponents]] — the boundary-link
  * graph has at most one link per range, so the merge is vanishingly
  * small next to the data. Result is identical to the single-sort
  * formulation (which remains the DuckDB oracle for gate q56).
  */
object Islands {

  /** @param keys        one column of integer keys (duplicates allowed)
    * @param keyCol      the key column name
    * @param bucketWidth key-range width per fragment partition
    * @return (island_start, island_end, island_len), one row per island
    */
  def islands(keys: DataFrame, keyCol: String, bucketWidth: Long = 1 << 20): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val k = keys.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("bkt", expr(s"k div ${bucketWidth}L"))
    // fragments: contiguous runs within a range partition share
    // (bkt, k - row_number) — the window shuffles once on bkt and
    // sorts locally, never globally
    val w = Window.partitionBy("bkt").orderBy("k")
    val frags = k.withColumn("grp", col("k") - row_number().over(w))
      .groupBy("bkt", "grp")
      .agg(min("k").as("fs"), max("k").as("fe"))
      .select("fs", "fe")
      .ckpt // both link sides + the final join
    // a fragment chains to the next iff no gap separates them; same-
    // bucket fragments can never chain (they would be one fragment), so
    // links exist only at range boundaries — O(#ranges) rows
    val links = frags.as("a")
      .join(frags.as("b"), col("a.fe") + 1 === col("b.fs"))
      .select(col("a.fs").as("id1"), col("b.fs").as("id2"))
    val comps = Dedup.connectedComponents(links)
    frags
      .join(comps.select(col("node").as("fs"), col("cluster_rep")), Seq("fs"), "left")
      .select(coalesce(col("cluster_rep"), col("fs")).as("rep"), col("fs"), col("fe"))
      .groupBy("rep")
      .agg(min("fs").as("island_start"), max("fe").as("island_end"))
      .select(col("island_start"), col("island_end"),
        (col("island_end") - col("island_start") + 1).as("island_len"))
  }
}
