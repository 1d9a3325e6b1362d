package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Top-k rows per group WITHOUT a global window sort.
  *
  * `row_number() OVER (PARTITION BY g ORDER BY …) <= k` is the textbook
  * formulation and the 100 TB anti-pattern: every row shuffles, every
  * group fully sorts, and all but k rows per group are discarded after
  * the sort. [[graft.functions.TopKStructs]] turns the same question
  * into ordinary two-phase aggregation — per-map-task bounded heaps,
  * then a ≤ k·partitions-rows-per-group shuffle — which is the plan
  * you want when groups are millions of rows wide.
  */
object TopK {

  /** The k rows with the LARGEST `(orderCols…, payload order)` struct
    * value per group, emitted with a 1-based `rank` column
    * (largest = rank 1). `orderCols` should end with a unique
    * tiebreaker for a deterministic result; descending ranking on a
    * column is expressed by negating it (or, for the common
    * "largest first" case, just listing it — largest survive).
    */
  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      orderCols: Seq[Column],
      k: Int): DataFrame = {
    require(groupCols.nonEmpty, "perGroup needs at least one group column")
    val sortStruct = struct(orderCols: _*)
    df.groupBy(groupCols.map(col): _*)
      .agg(graft.functions.topK(sortStruct, k).as("graft_top"))
      .select(groupCols.map(col) :+
        posexplode(col("graft_top")).as(Seq("graft_pos", "graft_row")): _*)
      .select(groupCols.map(col) :+
        (col("graft_pos") + 1).cast("long").as("rank") :+
        col("graft_row.*"): _*)
  }
}
