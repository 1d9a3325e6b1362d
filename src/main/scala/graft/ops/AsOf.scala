package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series primitive Spark has no builtin
  * for (DuckDB: `ASOF JOIN`; kdb: `aj`): for every left row, attach the
  * latest right row with the same key and `right.ts <= left.ts`.
  *
  * Spark-first physical shape: NO range-condition join (a range theta-
  * join explodes to a broadcast nested loop, or per-key row explosion
  * at 100 TB). Instead both sides union into one stream tagged
  * left/right, ONE shuffle on the key sorts by (ts, tag), and a
  * last-non-null window carries the most recent right payload forward
  * into each left row — linear work, one exchange, whole-stage codegen
  * throughout.
  *
  * Ties: a right row at exactly left.ts matches (tag orders right rows
  * first); multiple right rows on one (key, ts) are reduced to their
  * maximum payload struct first (lexicographic field order), keeping
  * the result deterministic.
  */
object AsOf {

  /** @param payloadCols right-side columns carried onto left rows,
    *                    emitted as `prefix+name` (right's ts is always
    *                    included as `prefix+tsCol`)
    * @param direction   "backward" (latest right at-or-before, the
    *                    default) or "forward" (earliest right
    *                    at-or-after); forward flips the tag order, the
    *                    window frame, and the per-(key, ts) reduction
    *                    (min-struct instead of max-struct) — same single
    *                    exchange either way
    * @param withinGap   optional tolerance (pandas `merge_asof
    *                    (tolerance=...)`): a predicate over (left ts,
    *                    matched right ts) — a match outside it is
    *                    nulled, exactly as if no right row existed. A
    *                    predicate rather than a duration so the caller
    *                    controls the gap arithmetic's type (integer
    *                    `unix_micros` for timestamps — a double-seconds
    *                    subtraction would round at the boundary). Pure
    *                    post-projection: the plan shape (one exchange)
    *                    is unchanged
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_",
      direction: String = "backward",
      withinGap: Option[(org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val backward = direction == "backward"
    val rFields = (tsCol +: payloadCols).distinct
    val payloadT = right.select(struct(rFields.map(col): _*).as("p"))
      .schema.head.dataType
    val lStructT = left.select(struct(left.columns.toSeq.map(c => col(s"`$c`")): _*).as("l"))
      .schema.head.dataType

    // one deterministic payload per (key, ts) on the right
    val rStruct = struct(rFields.map(col): _*)
    val (rTag, lTag) = if (backward) (0, 1) else (1, 0)
    val rReduced = right
      .groupBy(col(keyCol).as("graft_k"), col(tsCol).as("graft_t"))
      .agg((if (backward) max(rStruct) else min(rStruct)).as("graft_r"))
      .select(col("graft_k"), col("graft_t"), lit(rTag).as("graft_tag"),
        lit(null).cast(lStructT).as("graft_l"), col("graft_r"))

    val lTagged = left.select(
      col(keyCol).as("graft_k"), col(tsCol).as("graft_t"), lit(lTag).as("graft_tag"),
      struct(left.columns.toSeq.map(c => col(s"`$c`")): _*).as("graft_l"),
      lit(null).cast(payloadT).as("graft_r"))

    // backward: right rows sort BEFORE left rows at equal ts and the
    // last non-null right payload so far carries forward ("<=");
    // forward: right rows sort AFTER left rows and the first non-null
    // right payload from here on carries back (">=")
    val wBase = Window.partitionBy("graft_k")
      .orderBy(col("graft_t"), col("graft_tag"))
    val (w, pick) =
      if (backward)
        (wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow),
          last(col("graft_r"), ignoreNulls = true))
      else
        (wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing),
          first(col("graft_r"), ignoreNulls = true))

    val base = lTagged.unionAll(rReduced)
      .withColumn("graft_match", pick.over(w))
      .filter(col("graft_tag") === lTag)
      .select(col("graft_l.*") +:
        rFields.map(f => col(s"graft_match.`$f`").as(s"$prefix$f")): _*)
    withinGap.fold(base) { within =>
      val keep = col(s"`$prefix$tsCol`").isNotNull &&
        within(col(s"`$tsCol`"), col(s"`$prefix$tsCol`"))
      rFields.foldLeft(base) { (df, f) =>
        df.withColumn(s"$prefix$f",
          when(keep, col(s"`$prefix$f`")).otherwise(lit(null)))
      }
    }
  }
}
