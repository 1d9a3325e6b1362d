package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** optimizeZorder / optimizeZorderDelta: clustering as a catalog
  * operation. Pins:
  *   - content parity: the optimized version's snapshot equals the
  *     pre-optimize merge-on-read rows exactly (clustering must never
  *     change WHAT a version holds, only its layout);
  *   - the optimized version drops its DV artifact (deletes fold in);
  *   - skipping: after clustering, a predicate on EITHER dimension
  *     admits a strict subset of files through the manifest, where the
  *     row-ordered layout admitted everything on the second dimension;
  *   - the delta pass re-clusters only appended files (base files stay
  *     byte-identical in the new manifest), carries base-file DV
  *     addresses forward, applies delta-file addresses, and refuses
  *     when there is nothing to cluster.
  */
class ClusterOptimizeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-zopt").toString

  /** 1024 rows = one per cell of a 32×32 (x, y) grid, written in
    * id order (y = id/32 varies slowly) — so y is clustered and x is
    * scattered across every file. */
  private def grid(): DataFrame =
    spark.range(1024).select(col("id"),
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))

  private def admitted(manifest: DataFrame, colName: String,
      lo: Long, hi: Long): Long =
    manifest.filter(col(s"max_$colName") >= lo &&
      col(s"min_$colName") <= hi).count()

  test("optimizeZorder: parity, DV fold, two-dimensional skipping") {
    val root = freshDir()
    val t = s"$root/t"
    grid().repartitionByRange(16, col("id")).write.parquet(t)
    Layout.statsManifest(spark, t, Seq("x", "y")).write.parquet(s"$root/m1")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(1024).filter(col("id") % 11 === 0).select("id"), "id")
      .write.parquet(s"$root/dv1")
    Catalog.commit(spark, s"$root/cat",
      Map("manifest" -> s"$root/m1", "dv" -> s"$root/dv1"))
    val before = Layout.snapshotReadWithDeletes(spark, t,
        spark.read.parquet(s"$root/m1"), spark.read.parquet(s"$root/dv1"))
      .select("id").as[Long].collect().sorted.toSeq

    val m1 = spark.read.parquet(s"$root/m1")
    // row-major layout (y = id/32 varies slowly): x-band predicates
    // admit every file, only y prunes
    assert(admitted(m1, "x", 3, 4) == 16)

    val v2 = Layout.optimizeZorder(spark, t, s"$root/cat", root,
      "x", "y", bits = 5, numFiles = 16, statsCols = Seq("x", "y"))
    assert(v2 == 2)
    val refs2 = Catalog.resolve(spark, s"$root/cat", 2)
    assert(!refs2.contains("dv"), "optimize must fold the DV in")
    val m2 = spark.read.parquet(refs2("manifest"))
    val after = Layout.snapshotRead(spark, t, m2)
      .select("id").as[Long].collect().sorted.toSeq
    assert(after == before, "clustering changed the version's rows")
    // z-clustering makes BOTH dimensions selective
    assert(admitted(m2, "x", 3, 4) < 16)
    assert(admitted(m2, "y", 3, 4) < 16,
      "second dimension must prune after z-order")
    // and the old version still reads its own world (time travel)
    assert(Layout.snapshotReadWithDeletes(spark, t,
        spark.read.parquet(Catalog.resolve(spark, s"$root/cat", 1)("manifest")),
        spark.read.parquet(s"$root/dv1"))
      .select("id").as[Long].collect().sorted.toSeq == before)
  }

  test("optimizeZorderDelta: clusters only appends, carries base DV addresses") {
    val root = freshDir()
    val t = s"$root/t"
    // v1: even-id half, already z-clustered
    Layout.zorderLayout(grid().filter(col("id") % 2 === 0),
        "x", "y", bits = 5, numFiles = 8)
      .write.parquet(t)
    Layout.statsManifest(spark, t, Seq("x", "y")).write.parquet(s"$root/m1")
    val m1 = spark.read.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    // append the odd half row-ordered, extend, add a DV wave spanning
    // BOTH the base files and the fresh appends
    grid().filter(col("id") % 2 === 1)
      .repartitionByRange(8, col("id")).write.mode("append").parquet(t)
    Layout.extendManifest(spark, t, m1, Seq("x", "y"))
      .write.parquet(s"$root/m2")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(1024).filter(col("id") % 11 === 0).select("id"), "id")
      .write.parquet(s"$root/dv2")
    Catalog.commit(spark, s"$root/cat",
      Map("manifest" -> s"$root/m2", "dv" -> s"$root/dv2"))
    val expect = (0L until 1024L).filter(_ % 11 != 0).toSeq

    val v3 = Layout.optimizeZorderDelta(spark, t, s"$root/cat", root,
      baseVersion = 1, "x", "y", bits = 5, numFiles = 8,
      statsCols = Seq("x", "y"))
    assert(v3 == 3)
    val refs3 = Catalog.resolve(spark, s"$root/cat", 3)
    val m3 = spark.read.parquet(refs3("manifest"))
    // base files are untouched: every v1 manifest row survives verbatim
    val v1Files = m1.select("file").as[String].collect().toSet
    val v3Files = m3.select("file").as[String].collect().toSet
    assert(v1Files.subsetOf(v3Files), "delta pass must not rewrite base files")
    // base-file DV addresses carried (11, 33, ... are odd multiples of
    // 11 in the delta — applied; evens like 0, 22, 44 live in base
    // files — must still subtract via the carried DV)
    assert(refs3.contains("dv"), "base-file addresses must carry forward")
    val live = Layout.snapshotReadWithDeletes(spark, t, m3,
        spark.read.parquet(refs3("dv")))
      .select("id").as[Long].collect().sorted.toSeq
    assert(live == expect)
    // the carried DV holds ONLY base-file addresses
    val dvFiles = spark.read.parquet(refs3("dv"))
      .select("file").as[String].collect().toSet
    assert(dvFiles.subsetOf(v1Files),
      s"delta-file addresses must be applied, not carried: " +
        s"${dvFiles.diff(v1Files).take(2)}")
    // y-band admission over the delta files is now bounded: the
    // re-clustered appends admit fewer files than a full-table scan
    assert(admitted(m3, "y", 3, 4) < m3.count())
  }

  test("zorderValueN: n=2 equals the pinned 2-D interleave; 3-D makes every dim selective") {
    // delegation parity: q35's oracle pins the 2-D bit layout, so the
    // N-dim generalization must reproduce it exactly
    val probe = spark.range(500).select(
      Layout.zorderValueN(Seq(col("id") % 32, (col("id") * 7) % 32),
        5).as("zn"),
      Layout.zorderValue(col("id") % 32, (col("id") * 7) % 32, 5).as("z2"))
    assert(probe.filter(col("zn") =!= col("z2")).count() == 0L)

    // symmetric 16×16×16 grid (integer dims — a double-typed cluster
    // column would truncate in the z-code but store fractional stats)
    val root = freshDir()
    val t = s"$root/t"
    Layout.zorderLayoutN(
        spark.range(4096).select(col("id"), (col("id") % 16).as("x"),
          ((col("id") / 16).cast("long") % 16).as("y"),
          (col("id") / 256).cast("long").as("w")),
        Seq("x", "y", "w"), bits = 4, numFiles = 16)
      .write.parquet(t)
    val m = Layout.statsManifest(spark, t, Seq("x", "y", "w"))
    assert(admitted(m, "x", 2, 3) < 16)
    assert(admitted(m, "y", 2, 3) < 16)
    assert(admitted(m, "w", 1, 1) < 16)
  }

  test("the optimized (DV-free) version re-qualifies for metadata-only aggregates") {
    val root = freshDir()
    val t = s"$root/t"
    grid().repartitionByRange(8, col("id")).write.parquet(t)
    Layout.statsManifest(spark, t, Seq("x", "y")).write.parquet(s"$root/m1")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(1024).filter(col("id") % 7 === 0).select("id"), "id")
      .write.parquet(s"$root/dv1")
    Catalog.commit(spark, s"$root/cat",
      Map("manifest" -> s"$root/m1", "dv" -> s"$root/dv1"))
    // v1 carries a live DV — MetaAggRewrite must refuse it
    intercept[IllegalArgumentException] {
      graft.plans.MetaAggRewrite.registerFromCatalog(spark, "zmeta_v1",
        t, s"$root/cat", Seq("x"), version = Some(1))
    }
    val v2 = Layout.optimizeZorder(spark, t, s"$root/cat", root,
      "x", "y", bits = 5, numFiles = 8, statsCols = Seq("x", "y"))
    // the rewrite purged the deletes, so v2 registers — and the global
    // panel now answers from the manifest with zero data I/O
    graft.plans.MetaAggRewrite.registerFromCatalog(spark, "zmeta_v2",
      t, s"$root/cat", Seq("x"), version = Some(v2))
    try {
      val refs = Catalog.resolve(spark, s"$root/cat", v2)
      val q = Layout.snapshotRead(spark, t, spark.read.parquet(refs("manifest")))
        .agg(count(lit(1)).as("n"), max(col("x")).as("max_x"))
      q.queryExecution.optimizedPlan // pin
      val roots = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.map(_.toString)
            case _ => Seq.empty[String]
          }
      }.flatten
      assert(roots.nonEmpty && roots.forall(_.contains("/m-zorder-")),
        s"meta-agg rewrite should answer from the manifest: $roots")
      val row = q.collect().head
      assert(row.getLong(0) == 1024L - 1024L / 7 - 1)
      assert(row.getLong(1) == 31L)
    } finally graft.plans.MetaAggRewrite.unregister("zmeta_v2")
  }

  test("optimizeZorderDelta refuses when no files were added") {
    val root = freshDir()
    val t = s"$root/t"
    grid().repartitionByRange(4, col("id")).write.parquet(t)
    Layout.statsManifest(spark, t, Seq("x", "y")).write.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    val e = intercept[IllegalArgumentException] {
      Layout.optimizeZorderDelta(spark, t, s"$root/cat", root,
        baseVersion = 1, "x", "y", bits = 5, numFiles = 4,
        statsCols = Seq("x", "y"))
    }
    assert(e.getMessage.contains("nothing to cluster"))
  }

  test("maintainClustering: the manifest picks none/delta/full by unclustered fraction") {
    val root = freshDir()
    val t = s"$root/t"
    grid().repartitionByRange(8, col("id")).write.parquet(t)
    Layout.statsManifest(spark, t, Seq("x", "y")).write.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    var lastOpt = Layout.optimizeZorder(spark, t, s"$root/cat", root,
      "x", "y", bits = 5, numFiles = 8, statsCols = Seq("x", "y"))
    def maintain() = Layout.maintainClustering(spark, t, s"$root/cat",
      root, "x", "y", bits = 5, numFiles = 8,
      statsCols = Seq("x", "y"), lastOptimizedVersion = lastOpt)
    def appendWave(rows: org.apache.spark.sql.DataFrame, nf: Int): Unit = {
      val add = Layout.commitAppend(spark, rows, t, Seq("x", "y"))
      val curV = Versions.current(s"$root/cat")(spark)
      val m = spark.read.parquet(
        Catalog.ref(spark, s"$root/cat", curV, "manifest"))
      val mDir = s"$root/m-wave-${curV + 1}"
      m.unionByName(add).write.parquet(mDir)
      Catalog.commit(spark, s"$root/cat", Map("manifest" -> mDir))
    }
    // nothing new since the optimize: zero work, version unchanged
    val (a0, v0) = maintain()
    assert((a0, v0) === (("none", lastOpt)))
    // 1 new file of 8+1 -> fraction 0.11, delta pass
    appendWave(spark.range(1024, 1152).select(col("id"),
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .coalesce(1), 1)
    val (a1, v1) = maintain()
    assert(a1 === "delta")
    lastOpt = v1
    // content survives both passes
    val mNow = spark.read.parquet(
      Catalog.ref(spark, s"$root/cat", v1, "manifest"))
    assert(Layout.snapshotRead(spark, t, mNow).count() === 1152)
    // 8 new files over ~17 -> fraction ~0.47, full rewrite
    appendWave(spark.range(1152, 2176).select(col("id"),
      (col("id") % 32).as("x"), (col("id") / 32).cast("long").as("y"))
      .repartition(8), 8)
    val (a2, v2) = maintain()
    assert(a2 === "full")
    val mEnd = spark.read.parquet(
      Catalog.ref(spark, s"$root/cat", v2, "manifest"))
    assert(Layout.snapshotRead(spark, t, mEnd).count() === 2176)
  }
}
