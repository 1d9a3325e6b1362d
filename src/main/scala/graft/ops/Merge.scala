package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changeset application (CDC merge / upsert): produce the next snapshot
  * of a keyed table from the current snapshot plus a batch of changes
  * (upserts and deletes) — the maintenance primitive behind every
  * incrementally-refreshed 100 TB table.
  *
  * Physical shape: ONE full-outer join on the key; each output column is
  * a coalesce favoring the change side. No windows, no per-key loops —
  * at scale this is a single co-partitioned shuffle (or exchange-free
  * entirely if both sides are bucketed on the key via
  * [[graft.ops.Bucketing]]).
  */
object Merge {

  /** @param snapshot  current state, unique per `keyCol`
    * @param changes   change batch, unique per `keyCol`; same schema as
    *                  `snapshot` plus a boolean `deleteCol`
    * @param keyCol    the merge key
    * @param deleteCol boolean column on `changes`: true = remove the key
    * @return the next snapshot (snapshot columns, change rows winning)
    */
  def applyChanges(
      snapshot: DataFrame,
      changes: DataFrame,
      keyCol: String,
      deleteCol: String = "is_delete"): DataFrame = {
    val dataCols = snapshot.columns.filterNot(_ == keyCol).toSeq
    val s = snapshot.select(col(keyCol).as("graft_k"),
      struct(dataCols.map(col): _*).as("graft_s"))
    val c = changes.select(col(keyCol).as("graft_k"),
      struct(dataCols.map(col): _*).as("graft_c"),
      col(deleteCol).cast("boolean").as("graft_del"))
    s.join(c, Seq("graft_k"), "full_outer")
      .filter(!coalesce(col("graft_del"), lit(false)))
      .select(col("graft_k").as(keyCol) +:
        dataCols.map(f =>
          when(col("graft_del").isNotNull, col(s"graft_c.`$f`"))
            .otherwise(col(s"graft_s.`$f`")).as(f)): _*)
  }

  /** Slowly-changing-dimension type-2 history: turn a stream of
    * attribute observations (key, attrs, ts) into validity intervals —
    * one row per attribute CHANGE, carrying `valid_from` / `valid_to`
    * (null while current) and `is_current`. The lineage primitive behind
    * every versioned dimension and training-data snapshot table.
    *
    * Physical shape: one shuffle on the key serves BOTH window passes
    * (the change filter preserves partitioning, so the `lead` reuses the
    * first pass's Exchange — no second shuffle); no joins, no driver
    * state. `seqCol` breaks timestamp ties deterministically.
    *
    * @param df      observations; need not be deduplicated
    * @param keyCol  entity key
    * @param tsCol   numeric/timestamp observation time (ordering major key)
    * @param seqCol  unique tiebreak within equal timestamps
    * @param attrCols tracked attributes: a row opens a new version iff
    *                 any of them differs from the key's previous row
    */
  def scd2(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      seqCol: String,
      attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(seqCol))
    val attrs = struct(attrCols.map(col): _*)
    // <=> so an all-null attr row does not reopen a version forever
    val changed = df
      .withColumn("graft_prev", lag(attrs, 1).over(w))
      .filter(col("graft_prev").isNull || !(attrs <=> col("graft_prev")))
      .drop("graft_prev")
    changed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop(tsCol)
  }
}
