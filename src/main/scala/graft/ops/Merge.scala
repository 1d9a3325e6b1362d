package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Ckpt.CkptSyntax

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

  /** Incremental aggregate maintenance: combine a stored per-group
    * (count, decimal-sum) state with a signed changeset — inserts carry
    * sign +1, deletes -1 — WITHOUT rescanning the base table. The
    * incremental-view-maintenance primitive: at 100 TB the base scan is
    * the cost, and algebraic aggregates (count/sum, and avg = sum/count)
    * merge exactly, so the result is bit-identical to a full recompute
    * (decimal arithmetic is associative).
    *
    * Physical shape: the delta aggregates first (map-side combined — the
    * shuffle carries one row per touched group), then ONE outer join
    * against the state on the group key. Groups whose count reaches 0
    * are dropped.
    *
    * @param state per-group state with columns (`keyCol`, n, total)
    * @param delta change rows with (`keyCol`, `valueCol`, `signCol` ±1)
    */
  def incrementalAgg(
      state: DataFrame,
      delta: DataFrame,
      keyCol: String,
      valueCol: String,
      signCol: String): DataFrame = {
    val d = delta.groupBy(keyCol).agg(
      sum(col(signCol)).as("graft_dn"),
      sum(col(valueCol).cast("decimal(18,2)") * col(signCol)).as("graft_dtotal"))
    state.join(d, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col("n"), lit(0L)) + coalesce(col("graft_dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(BigDecimal(0)).cast("decimal(18,2)")) +
          coalesce(col("graft_dtotal"), lit(BigDecimal(0)).cast("decimal(18,2)")))
          .as("total"))
      .filter(col("n") > 0)
  }

  /** Change-data feed between two snapshots of a keyed table — the
    * inverse of [[applyChanges]]: emit one row per differing key with
    * `op` = I (insert: key only in `next`), U (update: both sides,
    * values differ), or D (delete: key only in `prev`); identical rows
    * are omitted. U/I rows carry the new values, D rows the old.
    * Round-trip law (spec-verified):
    * `applyChanges(prev, changeFeed(prev, next)) == next`.
    *
    * ONE full-outer join on the key; the null-safe struct compare keeps
    * the filter inside codegen — no distinct, no second pass. */
  def changeFeed(
      prev: DataFrame,
      next: DataFrame,
      keyCol: String): DataFrame = {
    require(prev.columns.toSet == next.columns.toSet,
      s"snapshots must share a schema: ${prev.columns.toSeq} vs ${next.columns.toSeq}")
    val dataCols = next.columns.filterNot(_ == keyCol).toSeq
    val p = prev.select(col(keyCol).as("graft_k"),
      struct(dataCols.map(col): _*).as("graft_p"))
    val n = next.select(col(keyCol).as("graft_k"),
      struct(dataCols.map(col): _*).as("graft_n"))
    p.join(n, Seq("graft_k"), "full_outer")
      .withColumn("op",
        when(col("graft_p").isNull, lit("I"))
          .when(col("graft_n").isNull, lit("D"))
          .when(!(col("graft_p") <=> col("graft_n")), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("graft_k").as(keyCol) +: col("op") +:
        dataCols.map(f =>
          coalesce(col(s"graft_n.`$f`"), col(s"graft_p.`$f`")).as(f)): _*)
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
    require(attrCols.nonEmpty, "need at least one tracked attribute")
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

  /** Incremental maintenance of a materialized JOIN view
    * `V = A ⋈_{bKey} B` (A the fact side, keyed by `aKey`; B a
    * dimension unique per `bKey`), given the POST-change tables and the
    * key sets that changed — the delta-join rule behind incrementally
    * refreshed join views:
    *
    *   affected = ΔA-keys ∪ { aKey of A' rows whose bKey ∈ ΔB-keys }
    *   V' = (V ∖ affected)  ∪  (A'|affected ⋈ B')
    *
    * Only affected fact rows are re-joined: an update to one dimension
    * row re-derives just that dimension's fact rows, an untouched fact
    * row's view row is reused verbatim, and ΔA deletes disappear
    * because A' no longer carries them while the anti-join removes
    * their old view rows. Cost is O(|Δ| + |affected|) join work plus
    * the view anti-join — and the anti-join's rewrite-vs-reuse split
    * is exactly what [[graft.ops.Layout]]'s manifest pruning turns
    * into file-level reuse at 100 TB (q77's posture: files whose key
    * range misses `affected` are copied, not rewritten).
    *
    * Inner-join semantics: a fact row whose dimension key matches
    * nothing contributes no view row (and is dropped from V' if it
    * previously matched). Correct under the same contract the full
    * join has: B unique per bKey, A unique per aKey.
    *
    * @return V' with exactly `view`'s column order
    */
  /** @param broadcastKeys broadcast the affected-key set into the
    *        anti/semi joins (default). The delta-join rule only pays
    *        off when Δ ≪ table — in that regime the key set is
    *        delta-scale by construction and broadcasting it is the
    *        POINT: the view and fact tables are never re-exchanged.
    *        Without the hint, Catalyst's pre-materialization estimate
    *        of the semi-joined key set GROWS WITH THE FACT TABLE and
    *        eventually flips these joins to sort-merge, silently
    *        shuffling the whole view (observed: 0.1 MB → 44 MB on a
    *        2× fact table, before AQE can demote the already-written
    *        map side). Pass false only for a delta so large it
    *        approaches the table — at which point a full rebuild is
    *        usually cheaper anyway. */
  def incrementalJoinView(
      view: DataFrame,
      aNew: DataFrame,
      bNew: DataFrame,
      deltaAKeys: DataFrame,
      deltaBKeys: DataFrame,
      aKey: String,
      bKey: String,
      broadcastKeys: Boolean = true): DataFrame = {
    val affectedFromB = aNew
      .join(broadcast(deltaBKeys.select(col(bKey))), Seq(bKey), "left_semi")
      .select(col(aKey))
    val affectedPlain = deltaAKeys.select(col(aKey))
      .unionAll(affectedFromB)
      .distinct()
      // two consumers (anti-join + semi-join): compute the set once
      .ckpt
    val affected =
      if (broadcastKeys) broadcast(affectedPlain) else affectedPlain
    val rebuilt = aNew.join(affected, Seq(aKey), "left_semi")
      .join(bNew, Seq(bKey))
      .select(view.columns.map(col).toSeq: _*)
    view.join(affected, Seq(aKey), "left_anti")
      .unionAll(rebuilt)
  }

  /** Refresh a grouped (count, min, max) view after a DELETE — the
    * maintenance case signed folds cannot cover: count/sum are
    * invertible (fold a −1 retraction, see [[incrementalAgg]]), but
    * when a group's current MIN or MAX row is deleted the new extremum
    * exists only in the base table. The delta-join rule: recompute ONLY
    * the groups the delete touched (the distinct keys of the deleted
    * rows — delta-scale, broadcast) from the post-delete base, and
    * reuse every untouched view row VERBATIM (spec proves reuse by
    * poisoning an untouched row). Groups whose rows are all deleted
    * vanish — the recompute emits nothing for them and the anti-join
    * already dropped the stale row.
    *
    * Cost: one semi-joined base scan (the broadcast key set prunes via
    * the runtime Bloom path; a key-range layout prunes at file level)
    * plus an O(view) anti join — never an O(table) re-aggregation.
    *
    * @param view        current (keyCol, n, min_v, max_v) rows
    * @param baseNew     base table AFTER the delete
    * @param deletedKeys keys with at least one deleted row (dups fine)
    */
  def refreshAggAfterDelete(
      view: DataFrame,
      baseNew: DataFrame,
      deletedKeys: DataFrame,
      keyCol: String,
      valueCol: String): DataFrame = {
    val affected = broadcast(deletedKeys.select(col(keyCol)).distinct()
      .ckpt) // two consumers: anti + semi
    val recomputed = baseNew.join(affected, Seq(keyCol), "left_semi")
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
    view.join(affected, Seq(keyCol), "left_anti")
      .unionAll(recomputed)
  }

  /** The CANONICAL aggregate-view state: one row per group with the
    * full (count, sum, min, max) panel — what [[refreshHybridView]]
    * maintains incrementally and what [[graft.plans.MvRewrite]] answers
    * queries from. Defining it once keeps the three consumers
    * bit-compatible: build the state with this, roll it forward with
    * `refreshHybridView`, and register the persisted rows for rewrite.
    * For exact sum/avg rewrites the value column must be integral or
    * decimal (cast a double measure first — floating sums are
    * order-dependent, and the rewrite refuses them). */
  def aggView(base: DataFrame, keyCol: String, valueCol: String): DataFrame =
    aggView(base, Seq(keyCol), valueCol)

  /** Multi-key [[aggView]] — production views are usually keyed by a
    * compound dimension (day × source, shard × language). */
  def aggView(base: DataFrame, keyCols: Seq[String],
      valueCol: String): DataFrame =
    base.groupBy(keyCols.map(col): _*).agg(
      count(lit(1)).as("n"),
      sum(col(valueCol)).as("total"),
      min(col(valueCol)).as("min_v"),
      max(col(valueCol)).as("max_v"))

  /** HYBRID view maintenance for the full (count, sum, min, max) state
    * under a MIXED signed changeset — the production IVM discipline
    * that routes each aggregate down its cheapest correct path:
    *
    *   - count/sum fold algebraically for EVERY group ([[incrementalAgg]]'s
    *     retraction math — deletes subtract exactly);
    *   - min/max fold for groups whose delta is INSERT-ONLY
    *     (`least`/`greatest` against the stored bound — a new value can
    *     only tighten outward), which covers the append-mostly bulk of
    *     a training-data feed;
    *   - ONLY groups holding at least one delete recompute, from their
    *     own post-change base rows (a retracted row may have BEEN the
    *     bound — non-invertible, the q94 case).
    *
    * Cost: O(delta) for the fold + O(rows of delete-touched groups)
    * for the recompute; groups untouched by the delta pass through
    * verbatim with ZERO base access, insert-only groups with zero base
    * access too (spec-proven by handing the op a base slice holding
    * only the delete-touched groups' rows). Never a base re-scan.
    *
    * @param state   per-group (`keyCol`, n, total, min_v, max_v)
    * @param delta   change rows (`keyCol`, `valueCol`, `signCol` ±1)
    * @param baseNew the post-change base table (only delete-touched
    *                groups' rows are ever read from it)
    */
  def refreshHybridView(
      state: DataFrame,
      delta: DataFrame,
      baseNew: DataFrame,
      keyCol: String,
      valueCol: String,
      signCol: String): DataFrame =
    refreshHybridView(state, delta, baseNew, Seq(keyCol), valueCol, signCol)

  /** Multi-key [[refreshHybridView]] — same routing, the group key is a
    * compound dimension ([[aggView]]'s multi-key state). */
  def refreshHybridView(
      state: DataFrame,
      delta: DataFrame,
      baseNew: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      signCol: String): DataFrame = {
    // one pass over the delta: algebraic pieces + insert-side bounds +
    // the per-group "has a delete" routing bit (map-side combined)
    val d = delta.groupBy(keyCols.map(col): _*).agg(
      sum(col(signCol)).as("graft_dn"),
      sum(col(valueCol).cast("decimal(18,2)") * col(signCol))
        .as("graft_dtotal"),
      min(when(col(signCol) > 0, col(valueCol))).as("graft_imin"),
      max(when(col(signCol) > 0, col(valueCol))).as("graft_imax"),
      max(when(col(signCol) < 0, lit(1)).otherwise(lit(0)))
        .as("graft_del")).ckpt // two consumers: routing + fold
    val touched = broadcast(
      d.filter(col("graft_del") === 1).select(keyCols.map(col): _*))
    // delete-touched groups: full recompute over THEIR rows only
    val recomputed = baseNew.join(touched, keyCols, "left_semi")
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("total"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))
    // everyone else: algebraic fold; min/max tighten outward via
    // null-skipping least/greatest (new groups coalesce from zero)
    val folded = state.join(touched, keyCols, "left_anti")
      .join(d.filter(col("graft_del") === 0), keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) +
          coalesce(col("graft_dn"), lit(0L))).as("n"),
        (coalesce(col("total"), lit(BigDecimal(0)).cast("decimal(18,2)")) +
          coalesce(col("graft_dtotal"),
            lit(BigDecimal(0)).cast("decimal(18,2)"))).as("total"),
        least(col("min_v"), col("graft_imin")).as("min_v"),
        greatest(col("max_v"), col("graft_imax")).as("max_v")): _*)
      .filter(col("n") > 0)
    folded.unionAll(recomputed)
  }
}
