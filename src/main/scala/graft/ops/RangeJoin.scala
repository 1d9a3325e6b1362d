package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join — the temporal/spatial primitive
  * Spark has no shuffle-based builtin for: attach to every point row
  * the interval rows with the same key whose `[start, end]` contains
  * the point.
  *
  * Spark-first physical shape: a raw range condition (`p.ts BETWEEN
  * i.start AND i.end`) next to an equi-key degrades to a per-key row
  * explosion, and with no equi-key at all Catalyst picks a broadcast
  * nested loop — both infeasible at 100 TB. Instead both sides are
  * mapped onto fixed-width time buckets: each interval EXPLODES into
  * the buckets it overlaps (ceil(len/width)+1 rows, small for bounded
  * intervals), each point lands in exactly ONE bucket, and the join
  * becomes a plain hash equi-join on (key, bucket) followed by the
  * exact containment filter. One shuffle, codegen throughout, no
  * duplicate elimination needed — a point's single bucket meets each
  * overlapping interval exactly once.
  *
  * Choose `bucketWidth` ≈ the typical interval length: too small
  * multiplies interval replication, too large packs unrelated rows
  * into one bucket (the filter still keeps results exact either way).
  */
object RangeJoin {

  /** @param points    point side; `ptsCol` must be a numeric column
    *                  (e.g. epoch seconds — cast timestamps first)
    * @param intervals interval side with numeric `startCol`/`endCol`
    *                  (inclusive bounds), same unit as `ptsCol`
    * @param keyCol    equi-key present on both sides
    * @param bucketWidth bucket width in the same unit
    */
  def pointInInterval(
      points: DataFrame,
      ptsCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      keyCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")

    val p = points.withColumn("graft_bucket", bucket(col(ptsCol)))
    val iv = intervals
      .withColumn("graft_bucket",
        explode(sequence(bucket(col(startCol)), bucket(col(endCol)))))

    p.join(iv, Seq(keyCol, "graft_bucket"))
      .filter(col(ptsCol) >= col(startCol) && col(ptsCol) <= col(endCol))
      .drop("graft_bucket")
  }

  /** Interval-overlap join: pair every left interval `[lStart, lEnd]`
    * with the right intervals `[rStart, rEnd]` under the same key that
    * OVERLAP it (inclusive bounds). The generalization of
    * [[pointInInterval]] both sides of which are ranges — session
    * overlap, campaign attribution, availability windows.
    *
    * Same bucketed shape: both sides explode into the fixed-width
    * buckets they span, the join is a hash equi-join on (key, bucket),
    * and the exact overlap test filters after. A pair overlapping
    * several shared buckets would match once per bucket, so each pair is
    * CLAIMED by exactly one bucket — the bucket containing the overlap's
    * start, `floor(max(lStart, rStart) / width)` — making the join
    * duplicate-free without a distinct (no extra shuffle).
    */
  def intervalOverlap(
      left: DataFrame,
      lStart: String,
      lEnd: String,
      right: DataFrame,
      rStart: String,
      rEnd: String,
      keyCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def bucket(c: Column): Column = floor(c / lit(bucketWidth)).cast("long")

    val l = left.withColumn("graft_bucket",
      explode(sequence(bucket(col(lStart)), bucket(col(lEnd)))))
    val r = right.withColumn("graft_bucket",
      explode(sequence(bucket(col(rStart)), bucket(col(rEnd)))))

    l.join(r, Seq(keyCol, "graft_bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("graft_bucket") === bucket(greatest(col(lStart), col(rStart))))
      .drop("graft_bucket")
  }
}
