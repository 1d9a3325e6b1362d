package graft.ops

import org.apache.spark.sql.DataFrame
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
}
