package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout.snapshotDiff: change-data extraction between two
  * (manifest, DV) versions. Pins the contracts the doc makes:
  * (1) the diff APPLIES — old-live rows plus inserts minus deletes
  * equals new-live rows, across appends, file drops and DV deltas;
  * (2) identical versions diff to empty;
  * (3) the scan set is exactly the changed files — an unchanged file
  * contributes zero I/O (asserted via inputFiles);
  * (4) an un-delete (DV shrinkage on a shared file) REFUSES. */
class SnapshotDiffSpec extends AnyFunSuite with SparkTestBase {

  private def writeTable(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-sdiff").toString
    spark.range(1000)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def liveKeys(spark0: org.apache.spark.sql.SparkSession,
      dir: String, m: DataFrame, dv: DataFrame): Set[Long] =
    Layout.snapshotReadWithDeletes(spark0, dir, m, dv)
      .select("k").collect().map(_.getLong(0)).toSet

  test("diff applies: oldLive + inserts - deletes == newLive") {
    val dir = writeTable()
    val m1 = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv1 = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 3))
    spark.range(1000, 1400)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(2, col("k"))
      .write.mode("append").parquet(dir)
    val m2 = Ckpt.pinned(Layout.extendManifest(spark, dir, m1, Seq("k")))
    val dv2 = Ckpt.pinned(dv1.unionAll(
      Layout.deletionVectors(spark, dir, col("v") === 5)))

    val diff = Layout.snapshotDiff(spark, dir, m1, m2, dv1, dv2)
    val ins = diff.filter(col("_change_type") === "insert")
      .select("k").collect().map(_.getLong(0)).toSet
    val del = diff.filter(col("_change_type") === "delete")
      .select("k").collect().map(_.getLong(0)).toSet

    val oldLive = liveKeys(spark, dir, m1, dv1)
    val newLive = liveKeys(spark, dir, m2, dv2)
    assert(ins.nonEmpty && del.nonEmpty)
    assert((oldLive ++ ins -- del) === newLive)
    assert(ins.intersect(oldLive).isEmpty, "inserts must be new rows")
    assert(del.subsetOf(oldLive), "deletes must have been live")
  }

  test("identical versions diff to empty") {
    val dir = writeTable()
    val m = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 0))
    assert(Layout.snapshotDiff(spark, dir, m, m, dv, dv).count() === 0L)
  }

  test("file drops report their old-live rows as deletes") {
    val dir = writeTable()
    val m2full = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 3))
    // old version tracks everything; new version drops one file
    val dropped = m2full.select("file").limit(1)
      .collect().map(_.getString(0)).head
    val m2 = Ckpt.pinned(m2full.filter(col("file") =!= dropped))
    val diff = Layout.snapshotDiff(spark, dir, m2full, m2, dv, dv)
    val del = diff.filter(col("_change_type") === "delete")
    val ins = diff.filter(col("_change_type") === "insert")
    assert(ins.count() === 0L)
    val expected = spark.read.parquet(dropped).filter(col("v") =!= 3)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(del.select("k").collect().map(_.getLong(0)).toSet === expected)
  }

  test("scan set is exactly the changed files") {
    val dir = writeTable()
    val m1 = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv0 = Ckpt.pinned(Layout.deletionVectors(spark, dir, lit(false)))
    spark.range(1000, 1200)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(1)
      .write.mode("append").parquet(dir)
    val m2 = Ckpt.pinned(Layout.extendManifest(spark, dir, m1, Seq("k")))
    // DV delta touches exactly the files holding v==6 rows of epoch 1
    val dv2 = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 6))
    val diff = Layout.snapshotDiff(spark, dir, m1, m2, dv0, dv2)

    def norm(p: String) = java.net.URI.create(p).getPath
    val oldFiles = m1.select("file").collect().map(r => norm(r.getString(0))).toSet
    val newFiles = m2.select("file").collect().map(r => norm(r.getString(0))).toSet
    val added = newFiles -- oldFiles
    val dvTouched = dv2.filter(col("file").isNotNull)
      .select("file").distinct().collect()
      .map(r => norm(r.getString(0))).toSet.intersect(oldFiles)
    val scanned = diff.inputFiles.map(norm).toSet
    assert(scanned.nonEmpty)
    assert(scanned.subsetOf(added ++ dvTouched),
      s"scanned unchanged files: ${scanned -- added -- dvTouched}")
  }

  test("change feed folds a materialized agg view to the v2 recompute") {
    val dir = writeTable()
    val m1 = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv1 = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 3))
    val view1 = Ckpt.pinned(
      Layout.snapshotReadWithDeletes(spark, dir, m1, dv1)
        .groupBy("v")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("decimal(18,2)")).as("total")))
    spark.range(1000, 1400)
      .select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(2, col("k"))
      .write.mode("append").parquet(dir)
    val m2 = Ckpt.pinned(Layout.extendManifest(spark, dir, m1, Seq("k")))
    val dv2 = Ckpt.pinned(dv1.unionAll(
      Layout.deletionVectors(spark, dir, col("v") === 5)))
    val delta = Layout.snapshotDiff(spark, dir, m1, m2, dv1, dv2)
      .withColumn("sign",
        when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
    val rolled = Merge.incrementalAgg(view1, delta, "v", "k", "sign")
    val recomputed = Layout.snapshotReadWithDeletes(spark, dir, m2, dv2)
      .groupBy("v")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("decimal(18,2)")).as("total"))
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("v"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(canon(rolled) === canon(recomputed))
    // v==5 was fully deleted at v2: the rolled view drops the group
    assert(!canon(rolled).exists(_._1 == 5L))
  }

  test("diff across a compactDeletes boundary: equal-row churn, net-zero fold") {
    val dir = writeTable()
    val m1 = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv1 = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 3))
    val view1 = Ckpt.pinned(
      Layout.snapshotReadWithDeletes(spark, dir, m1, dv1)
        .groupBy("v")
        .agg(count(lit(1)).as("n"),
          sum(col("k").cast("decimal(18,2)")).as("total")))
    // compaction rewrites hot files minus their deletes and re-addresses
    // the cold files' residual DV rows in a NEW dir — every file changes
    // identity, so the rewritten files leave the shared set and the
    // grow-only audit composes (no refusal)
    val dir2 = dir + "-compacted"
    val dv2 = Ckpt.pinned(
      Layout.compactDeletes(spark, dir, dir2, dv1, rewriteRatio = 0.05))
    val m2 = Ckpt.pinned(Layout.statsManifest(spark, dir2, Seq("k")))
    val diff = Layout.snapshotDiff(spark, dir, m1, m2, dv1, dv2)

    def multiset(df: DataFrame) = df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(identity)
      .view.mapValues(_.length).toMap
    val ins = multiset(diff.filter(col("_change_type") === "insert"))
    val del = multiset(diff.filter(col("_change_type") === "delete"))
    // rewrite churn: delete+insert of EQUAL rows (files changed identity,
    // content did not) — exactly production CDF for a rewrite not
    // flagged dataChange=false
    assert(ins.nonEmpty && ins === del)
    val oldLive = liveKeys(spark, dir, m1, dv1)
    val newLive = liveKeys(spark, dir2, m2, dv2)
    assert(oldLive === newLive, "compaction must not change live rows")
    // and the churn nets to ZERO on a folded agg view
    val delta = diff.withColumn("sign",
      when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
    val rolled = Merge.incrementalAgg(view1, delta, "v", "k", "sign")
    def canon(df: DataFrame) = df
      .select(col("v"), col("n"), col("total").cast("double"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    assert(canon(rolled) === canon(view1))
  }

  test("DV shrinkage on a shared file refuses") {
    val dir = writeTable()
    val m = Ckpt.pinned(Layout.statsManifest(spark, dir, Seq("k")))
    val dv1 = Ckpt.pinned(Layout.deletionVectors(spark, dir, col("v") === 3))
    val dv2 = Ckpt.pinned(dv1.limit(0)) // the un-delete
    val ex = intercept[IllegalArgumentException] {
      Layout.snapshotDiff(spark, dir, m, m, dv1, dv2)
    }
    assert(ex.getMessage.contains("grow-only"))
  }
}
