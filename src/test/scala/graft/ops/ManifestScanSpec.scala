package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The zero-listing read path: manifests record exact `bytes`
  * (`_metadata.file_size`) at build time, and snapshot/pruned reads
  * plan through [[graft.io.ManifestFileIndex]] with no per-query
  * listing. Pins: plan shape (the custom index actually serves the
  * scan), result parity with the listing read, `_metadata.file_path`
  * RENDERING parity (the DV anti-join joins on those strings — a
  * silent mismatch would un-delete rows), scan-prune registration over
  * the new plan shape, and the legacy-manifest fallback. */
class ManifestScanSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mfscan").toString

  private def usesManifestIndex(df: DataFrame): Boolean =
    df.queryExecution.analyzed.exists {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.isInstanceOf[graft.io.ManifestFileIndex]
          case _ => false
        }
      case _ => false
    }

  test("manifest records exact bytes; snapshotRead plans through ManifestFileIndex with row parity") {
    val root = freshDir()
    spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(4, col("k")).write.parquet(s"$root/t")
    val m = Layout.statsManifest(spark, s"$root/t", Seq("k"))
    assert(m.columns.contains("bytes"))
    // bytes are EXACT lengths (the parquet footer is found from them)
    val byPath = m.select("file", "bytes").collect()
      .map(r => (new org.apache.hadoop.fs.Path(r.getString(0))
        .toUri.getPath, r.getLong(1))).toMap
    new java.io.File(s"$root/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).foreach { f =>
        assert(byPath(f.getAbsolutePath) === f.length(),
          s"recorded bytes for ${f.getName} differ from the real length")
      }
    val got = Layout.snapshotRead(spark, s"$root/t", m)
    assert(usesManifestIndex(got), "snapshotRead did not use the zero-listing path")
    assert(got.count() === 1000)
    assert(got.orderBy("k").collect().toSeq ===
      spark.read.parquet(s"$root/t").orderBy("k").collect().toSeq)
  }

  test("_metadata.file_path renders identically to a listing scan — the DV join contract") {
    val root = freshDir()
    spark.range(100).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$root/t")
    val m = Layout.statsManifest(spark, s"$root/t", Seq("k"))
    val viaManifest = Layout.snapshotRead(spark, s"$root/t", m)
      .select(col("_metadata.file_path").as("p")).distinct()
      .as[String].collect().toSet
    val viaListing = spark.read.parquet(s"$root/t")
      .select(col("_metadata.file_path").as("p")).distinct()
      .as[String].collect().toSet
    assert(viaManifest === viaListing,
      "file_path rendering diverged between index types — DV anti-joins would silently miss")
  }

  test("DV subtraction composes with the zero-listing read end to end") {
    val root = freshDir()
    spark.range(500).select(col("id").as("k"), (col("id") * 3).as("v"))
      .repartitionByRange(3, col("k")).write.parquet(s"$root/t")
    val m = Layout.statsManifest(spark, s"$root/t", Seq("k"))
    val dv = Layout.deletionVectors(spark, s"$root/t", col("k") % 5 === 0)
    val got = Layout.snapshotReadWithDeletes(spark, s"$root/t", m, dv)
    assert(usesManifestIndex(got))
    assert(got.count() === 400)
    assert(got.filter(col("k") % 5 === 0).isEmpty)
  }

  test("prunedRead and scan-prune registration work over the manifest-planned scan") {
    val root = freshDir()
    spark.range(1000).select(col("id").as("k"), (col("id") % 7).as("v"))
      .repartitionByRange(8, col("k")).write.parquet(s"$root/t")
    val m = Layout.statsManifest(spark, s"$root/t", Seq("k"))
    m.write.parquet(s"$root/m")
    val pr = Layout.prunedRead(spark, s"$root/t",
      spark.read.parquet(s"$root/m"), "k", lit(100L), lit(120L))
    assert(usesManifestIndex(pr))
    assert(pr.inputFiles.length < 8, "pruned read must admit a file subset")
    assert(pr.count() === 21)
    // optimizer-rule path: registration anchors on the relation and the
    // InSet/file swap still happens over the zero-listing base
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m"))
    graft.plans.ScanPruneRewrite.registerFromCatalog(spark, "mfscan1",
      s"$root/t", s"$root/cat", version = Some(1))
    try {
      val q = Layout.snapshotRead(spark, s"$root/t",
          spark.read.parquet(s"$root/m"))
        .filter(col("k").between(100L, 120L))
      assert(q.count() === 21)
      val scanned = q.queryExecution.optimizedPlan.collect {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.inputFiles.length
            case _ => 0
          }
      }.sum
      assert(scanned < 8, s"rule did not prune: scanned $scanned of 8")
      // and the cheap probe path serves the same rows
      assert(graft.plans.ScanPruneRewrite.scan(spark, "mfscan1")
        .filter(col("k").between(100L, 120L)).count() === 21)
    } finally graft.plans.ScanPruneRewrite.unregister("mfscan1")
  }

  test("legacy manifests (no bytes) fall back to the listing read; extend upgrades in place") {
    val root = freshDir()
    spark.range(200).select(col("id").as("k"))
      .repartitionByRange(2, col("k")).write.parquet(s"$root/t")
    val legacy = Layout.statsManifest(spark, s"$root/t", Seq("k"))
      .drop("bytes") // a manifest persisted before the bytes column
    val got = Layout.snapshotRead(spark, s"$root/t", legacy)
    assert(!usesManifestIndex(got), "bytes-less manifest must use the listing path")
    assert(got.count() === 200)
    // extend over the legacy manifest: new rows carry bytes, old rows
    // upgrade to NULL bytes — read falls back, nothing breaks
    spark.range(200, 300).select(col("id").as("k"))
      .coalesce(1).write.mode("append").parquet(s"$root/t")
    val extended = Layout.extendManifest(spark, s"$root/t", legacy, Seq("k"))
    assert(extended.columns.contains("bytes"))
    val got2 = Layout.snapshotRead(spark, s"$root/t", extended)
    assert(!usesManifestIndex(got2))
    assert(got2.count() === 300)
  }

  test("zero-row files carry their real footer length") {
    val root = freshDir()
    spark.range(100).select(col("id").as("k")).coalesce(1)
      .write.parquet(s"$root/t")
    spark.range(0).select(col("id").as("k")).coalesce(1)
      .write.mode("append").parquet(s"$root/t")
    val m = Layout.statsManifest(spark, s"$root/t", Seq("k"))
    val zero = m.filter(col("n_rows") === 0)
    assert(zero.count() === 1)
    assert(!zero.head().isNullAt(zero.columns.indexOf("bytes")))
    assert(zero.head().getLong(zero.columns.indexOf("bytes")) > 0L)
    // the all-bytes-known invariant holds, so the read stays zero-listing
    val got = Layout.snapshotRead(spark, s"$root/t", m)
    assert(usesManifestIndex(got))
    assert(got.count() === 100)
  }
}
