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
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val rFields = (tsCol +: payloadCols).distinct
    val payloadT = right.select(struct(rFields.map(col): _*).as("p"))
      .schema.head.dataType
    val lStructT = left.select(struct(left.columns.toSeq.map(c => col(s"`$c`")): _*).as("l"))
      .schema.head.dataType

    // one deterministic payload per (key, ts) on the right
    val rReduced = right
      .groupBy(col(keyCol).as("graft_k"), col(tsCol).as("graft_t"))
      .agg(max(struct(rFields.map(col): _*)).as("graft_r"))
      .select(col("graft_k"), col("graft_t"), lit(0).as("graft_tag"),
        lit(null).cast(lStructT).as("graft_l"), col("graft_r"))

    val lTagged = left.select(
      col(keyCol).as("graft_k"), col(tsCol).as("graft_t"), lit(1).as("graft_tag"),
      struct(left.columns.toSeq.map(c => col(s"`$c`")): _*).as("graft_l"),
      lit(null).cast(payloadT).as("graft_r"))

    // right rows sort before left rows at equal ts → "<=" semantics
    val w = Window.partitionBy("graft_k")
      .orderBy(col("graft_t"), col("graft_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionAll(rReduced)
      .withColumn("graft_match", last(col("graft_r"), ignoreNulls = true).over(w))
      .filter(col("graft_tag") === 1)
      .select(col("graft_l.*") +:
        rFields.map(f => col(s"graft_match.`$f`").as(s"$prefix$f")): _*)
  }
}
