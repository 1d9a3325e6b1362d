package graft.plans

import graft.SparkTestBase
import graft.ops.{Catalog, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** JoinSkipRewrite: automatic join-driven file skipping. A registered
  * fact scan inside an inner equi-join gets a lossless InSet conjunct
  * from the dim side's evaluated keys; ScanPruneRewrite then swaps the
  * file index. Result identical to the unassisted join; plan reads a
  * strict file subset; caps and idempotency hold. */
class JoinSkipRewriteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-jsr").toString

  /** fact(k, payload): 1000 rows, 8 range-clustered files, catalog'd
    * and prune-registered under `name`. */
  private def fixture(name: String): (String, String) = {
    val root = freshDir()
    spark.range(1000)
      .select(col("id").as("k"), (col("id") % 7).as("payload"))
      .repartitionByRange(8, col("k")).write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("k"))
      .write.parquet(s"$root/m")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m"))
    ScanPruneRewrite.registerFromCatalog(spark, name, s"$root/t",
      s"$root/cat", version = Some(1))
    (root, s"$root/t")
  }

  private def factRead(root: String): DataFrame =
    Layout.snapshotRead(spark, s"$root/t",
      spark.read.parquet(s"$root/m"))

  private def scannedFiles(q: DataFrame, dataDir: String): Long =
    q.queryExecution.optimizedPlan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if fs.location.rootPaths.exists(_.toString.contains(dataDir)) =>
            fs.location.inputFiles.length.toLong
          case _ => 0L
        }
    }.sum

  private def hasInSet(q: DataFrame): Boolean =
    q.queryExecution.optimizedPlan.exists {
      case org.apache.spark.sql.catalyst.plans.logical.Filter(c, _) =>
        c.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.InSet])
      case _ => false
    }

  test("inner equi-join over a registered scan prunes files and keeps rows exact") {
    val (root, t) = fixture("jsr1")
    JoinSkipRewrite.register(spark, "jsr1", "k")
    try {
      val dim = Seq((10L, "a"), (20L, "b"), (990L, "c")).toDF("dk", "tag")
      val q = factRead(root).join(dim, col("k") === col("dk"))
      assert(hasInSet(q), "rule did not inject the key conjunct")
      val n = scannedFiles(q, t)
      assert(n > 0 && n < 8, s"scanned $n of 8 files")
      // row-identical to the unassisted join
      JoinSkipRewrite.unregister("jsr1")
      val plain = factRead(root).join(dim, col("k") === col("dk"))
      JoinSkipRewrite.register(spark, "jsr1", "k")
      assert(q.orderBy("k").collect().toSeq
        === plain.orderBy("k").collect().toSeq)
    } finally ScanPruneRewrite.unregister("jsr1")
  }

  test("flipped condition and dim-side filters still match; key cache serves re-optimization") {
    val (root, t) = fixture("jsr2")
    JoinSkipRewrite.register(spark, "jsr2", "k")
    try {
      val dim = spark.range(100)
        .select((col("id") * 10).as("dk"), (col("id") % 50).as("grp"))
      // dim filtered to 2 keys; condition written dim-first
      val q = dim.filter(col("grp") === 1)
        .join(factRead(root), col("dk") === col("k"))
      assert(hasInSet(q))
      assert(scannedFiles(q, t) < 8)
      assert(q.count() === 2) // ids 1 and 51 -> keys 10, 510
      // a second optimization of the same shape must hit the cache and
      // produce the same stable plan (fixpoint-safe)
      val q2 = dim.filter(col("grp") === 1)
        .join(factRead(root), col("dk") === col("k"))
      assert(q2.count() === 2)
    } finally ScanPruneRewrite.unregister("jsr2")
  }

  test("maxKeys cap declines the rewrite; kill switch declines everything") {
    val (root, t) = fixture("jsr3")
    JoinSkipRewrite.register(spark, "jsr3", "k", maxKeys = 5)
    try {
      val wide = spark.range(500).select(col("id").as("dk"))
      val q = factRead(root).join(wide, col("k") === col("dk"))
      assert(!hasInSet(q), "cap exceeded — rule must decline")
      assert(scannedFiles(q, t) === 8)
      assert(q.count() === 500)
      // kill switch
      JoinSkipRewrite.unregister("jsr3")
      JoinSkipRewrite.register(spark, "jsr3", "k")
      spark.conf.set(JoinSkipRewrite.EnabledConf, "false")
      try {
        val small = Seq(1L).toDF("dk")
        val q2 = factRead(root).join(small, col("k") === col("dk"))
        assert(!hasInSet(q2))
      } finally spark.conf.unset(JoinSkipRewrite.EnabledConf)
    } finally ScanPruneRewrite.unregister("jsr3")
  }

  test("self-join of the registered scan and non-key joins are left alone") {
    val (root, _) = fixture("jsr4")
    JoinSkipRewrite.register(spark, "jsr4", "k")
    try {
      val f1 = factRead(root)
      val f2 = factRead(root).select(col("k").as("k2"))
      val selfJ = f1.join(f2, col("k") === col("k2"))
      assert(!hasInSet(selfJ), "self-join must decline (ambiguous)")
      assert(selfJ.count() === 1000)
      val dim = Seq(3L).toDF("dp")
      val nonKey = f1.join(dim, col("payload") === col("dp"))
      assert(!hasInSet(nonKey), "join on a non-registered column declines")
    } finally ScanPruneRewrite.unregister("jsr4")
  }

  test("bloom-backed key: automatic join skipping under adverse clustering") {
    val root = freshDir()
    // h is a hash of the row id — scattered across every file, so range
    // stats on h are useless and only the bloom admission can skip
    spark.range(2000)
      .select(col("id").as("k"), xxhash64(col("id")).as("h"))
      .repartitionByRange(8, col("k")).write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("k"))
      .write.parquet(s"$root/m")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m"))
    ScanPruneRewrite.registerFromCatalog(spark, "jsr6", s"$root/t",
      s"$root/cat", version = Some(1))
    ScanPruneRewrite.registerBloomsSelf(spark, "jsr6", "h",
      Layout.bloomIndexSized(spark, s"$root/t", "h"))
    JoinSkipRewrite.register(spark, "jsr6", "h")
    try {
      val dim = spark.range(2)
        .select(xxhash64(col("id") * 7).as("dh"), col("id").as("tag"))
      val q = factRead(root).join(dim, col("h") === col("dh"))
      assert(hasInSet(q), "rule did not inject on the bloom-backed key")
      val n = scannedFiles(q, s"$root/t")
      assert(n < 8, s"bloom admission kept $n of 8 files for 2 keys")
      assert(q.count() === 2)
    } finally ScanPruneRewrite.unregister("jsr6")
  }

  test("dim append invalidates the key cache: re-read dim serves fresh keys") {
    val (root, _) = fixture("jsr7")
    JoinSkipRewrite.register(spark, "jsr7", "k")
    try {
      val dimDir = s"$root/dim"
      Seq((10L, "a")).toDF("dk", "tag").write.parquet(dimDir)
      val q1 = factRead(root)
        .join(spark.read.parquet(dimDir), col("k") === col("dk"))
      assert(hasInSet(q1))
      assert(q1.count() === 1)
      // append a new dim key, re-read the SAME directory: relation
      // equality is by root-path set, so only the file-listing part of
      // the cache key can tell the two reads apart — a stale hit would
      // drop fact row k=20 and the rewrite would no longer be lossless
      Seq((20L, "b")).toDF("dk", "tag").write.mode("append").parquet(dimDir)
      val q2 = factRead(root)
        .join(spark.read.parquet(dimDir), col("k") === col("dk"))
      assert(hasInSet(q2))
      assert(q2.count() === 2,
        "stale dim-key cache dropped the appended key's fact row")
    } finally ScanPruneRewrite.unregister("jsr7")
  }

  test("registration guards: unknown scan, unskippable column") {
    intercept[IllegalArgumentException] {
      JoinSkipRewrite.register(spark, "nope", "k")
    }
    val (_, _) = fixture("jsr5")
    try {
      val e = intercept[IllegalArgumentException] {
        JoinSkipRewrite.register(spark, "jsr5", "payload")
      }
      assert(e.getMessage.contains("neither manifest stats nor a bloom"))
    } finally ScanPruneRewrite.unregister("jsr5")
  }
}
