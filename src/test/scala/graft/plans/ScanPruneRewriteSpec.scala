package graft.plans

import graft.SparkTestBase
import graft.ops.{Catalog, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ScanPruneRewrite: filters over a registered catalog-version scan
  * read only manifest-admitted files. Pins:
  *   - the rewrite FIRES (optimized plan's scan holds a strict subset
  *     of the snapshot's files) and results are bit-identical to the
  *     un-rewritten filter;
  *   - admission per predicate family: =, range, BETWEEN, IN, IS NULL /
  *     IS NOT NULL (sparse column), OR of ranges, != single-value file,
  *     and an untranslatable conjunct pruning by its translatable peer;
  *   - losslessness: all-null files admit IS NULL, never `= v`;
  *   - empty admission → zero-file LocalRelation, zero rows;
  *   - DV composition: merge-on-read reads prune the base side only;
  *   - refusals: raw-dir scans and other versions never match; the conf
  *     kill switch; no-prune predicates leave the plan untouched;
  *   - exprId preservation: a join above the pruned filter still works;
  *   - the pure-SQL path (graft_prune_register + graft_catalog_read).
  */
class ScanPruneRewriteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-prune").toString

  private def pinPlan(df: DataFrame): DataFrame = {
    df.queryExecution.optimizedPlan
    df
  }

  /** every parquet path scanned by the OPTIMIZED plan (the rewrite
    * swaps the relation in the optimizer, so analyzed-plan helpers
    * like Dataset.inputFiles cannot see it). */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  /** 4 range-files on id 0..199 (+ key = id % 5, v = id, s = str,
    * sparse = non-null only for id < 50, all of which land in file 1);
    * returns (dataDir, catalogPath). */
  private def fixture(): (String, String) = {
    val root = freshDir()
    val t = s"$root/t"
    spark.range(200).select(col("id"),
        (col("id") % 5).as("k"), col("id").as("v"),
        format_string("s%04d", col("id")).as("s"),
        when(col("id") < 50, col("id")).as("sparse"))
      .repartitionByRange(4, col("id"))
      .write.parquet(t)
    Layout.statsManifest(spark, t, Seq("id", "s", "sparse"))
      .write.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    (t, s"$root/cat")
  }

  private def snapshot(t: String, cat: String, v: Int = 1): DataFrame = {
    val m = spark.read.parquet(Catalog.ref(spark, cat, v, "manifest"))
    Layout.snapshotRead(spark, t, m)
  }

  private def withReg(t: String, cat: String, name: String)(
      body: => Unit): Unit = {
    ScanPruneRewrite.registerFromCatalog(spark, name, t, cat)
    try body finally ScanPruneRewrite.unregister(name)
  }

  test("point predicate scans one file, result identical") {
    val (t, cat) = fixture()
    withReg(t, cat, "p1") {
      val q = pinPlan(snapshot(t, cat).filter(col("id") === 137L))
      val roots = scanRoots(q)
      assert(roots.size == 1, s"expected 1 admitted file, scanned $roots")
      assert(q.collect().map(_.getLong(0)).toSeq == Seq(137L))
    }
    // same filter unregistered: all 4 files
    val q2 = pinPlan(snapshot(t, cat).filter(col("id") === 137L))
    assert(scanRoots(q2).size == 4)
  }

  test("re-registration purges cached pruned relations: the new version's file is served") {
    val (t, cat) = fixture()
    val root = new java.io.File(t).getParent
    ScanPruneRewrite.registerFromCatalog(spark, "rereg", t, cat)
    try {
      // warm the admit cache with a point predicate against v1
      val q1 = pinPlan(ScanPruneRewrite.scan(spark, "rereg")
        .filter(col("id") === 42L).select("id"))
      assert(scanRoots(q1).size == 1)
      assert(q1.count() == 1L)
      // v2: append a file that ALSO carries id=42, extend, commit
      spark.range(40, 46).select(col("id"), (col("id") % 5).as("k"),
          col("id").as("v"), format_string("s%04d", col("id")).as("s"),
          when(col("id") < 50, col("id")).as("sparse"))
        .coalesce(1).write.mode("append").parquet(t)
      val m1 = spark.read.parquet(Catalog.ref(spark, cat, 1, "manifest"))
      Layout.extendManifest(spark, t, m1, Seq("id", "s", "sparse"))
        .write.parquet(s"$root/m2")
      Catalog.commit(spark, cat, Map("manifest" -> s"$root/m2"))
      // re-register the SAME name against v2 — the natural refresh.
      // The canonicalized predicate below equals the warmed one, so a
      // stale admit-cache entry would silently serve v1's file set and
      // report 1 row instead of 2.
      ScanPruneRewrite.registerFromCatalog(spark, "rereg", t, cat)
      val q2 = pinPlan(ScanPruneRewrite.scan(spark, "rereg")
        .filter(col("id") === 42L).select("id"))
      assert(q2.count() == 2L,
        "re-registration must not serve the old version's cached pruning")
      assert(scanRoots(q2).size == 2) // old id-range file + appended file
    } finally ScanPruneRewrite.unregister("rereg")
  }

  test("partitioned registration: stats admission composes with partition pruning") {
    val root = freshDir()
    val t = s"$root/t"
    spark.range(200).select(col("id"), (col("id") % 4).cast("int").as("p"))
      .repartitionByRange(2, col("id"))
      .write.partitionBy("p").parquet(t)
    graft.ops.Layout.statsManifest(spark, t, Seq("id"))
      .write.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    ScanPruneRewrite.registerFromCatalog(spark, "ppart", t, s"$root/cat")
    try {
      val q = pinPlan(ScanPruneRewrite.scan(spark, "ppart")
        .filter(col("id") < 50L && col("p") === 2))
      assert(q.collect().map(_.getLong(0)).sorted.toSeq ===
        (0L until 50L).filter(_ % 4 == 2),
        "pruned result must equal the unpruned filter")
      // stats admission dropped the high-id files (strict subset)…
      val roots = scanRoots(q)
      assert(roots.nonEmpty && roots.size < 8,
        s"stats admission must drop files on a partitioned scan: $roots")
      // …and partition pruning then keeps only p=2's admitted files,
      // from RECORDED tuples (the swap is a ManifestFileIndex)
      val exec = q.queryExecution.executedPlan.collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.getOrElse(fail("no file scan"))
      assert(exec.relation.location.isInstanceOf[graft.io.ManifestFileIndex])
      assert(exec.metrics("numFiles").value ===
        roots.count(_.contains("p=2")).toLong)
      assert(exec.metrics("numFiles").value < roots.size)
    } finally ScanPruneRewrite.unregister("ppart")
  }

  test("range, BETWEEN, IN, != admission") {
    val (t, cat) = fixture()
    withReg(t, cat, "p2") {
      val snap = snapshot(t, cat)
      val r1 = pinPlan(snap.filter(col("id") < 50L))
      assert(scanRoots(r1).size == 1)
      assert(r1.count() == 50L)
      val r2 = pinPlan(snap.filter(col("id").between(90L, 110L)))
      assert(scanRoots(r2).size <= 2 && scanRoots(r2).size < 4)
      assert(r2.count() == 21L)
      val r3 = pinPlan(snap.filter(col("id").isin(3L, 7L, 199L)))
      assert(scanRoots(r3).size == 2)
      assert(r3.count() == 3L)
      // large IN list → optimizer converts to InSet; still prunes
      val big = (0L until 15L).map(java.lang.Long.valueOf)
      val r4 = pinPlan(snap.filter(col("id").isin(big: _*)))
      assert(scanRoots(r4).size == 1)
      assert(r4.count() == 15L)
      // != only drops a single-valued file — here none are, so no-op
      val r5 = pinPlan(snap.filter(col("id") =!= 3L))
      assert(scanRoots(r5).size == 4)
      assert(r5.count() == 199L)
    }
  }

  test("string equality and OR of ranges prune") {
    val (t, cat) = fixture()
    withReg(t, cat, "p3") {
      val snap = snapshot(t, cat)
      val r1 = pinPlan(snap.filter(col("s") === "s0042"))
      assert(scanRoots(r1).size == 1)
      assert(r1.select("id").as[Long].collect().toSeq == Seq(42L))
      val r2 = pinPlan(snap.filter(col("id") < 20L || col("id") > 190L))
      assert(scanRoots(r2).size == 2)
      assert(r2.count() == 29L)
      // OR with an untranslatable branch admits everything
      val r3 = pinPlan(snap.filter(col("id") < 20L || col("id") % 7 === 0))
      assert(scanRoots(r3).size == 4)
      // LIKE 'pfx%' (StartsWith after optimization) prunes on the
      // string range: s = s0000..s0199 clustered with id
      val r4 = pinPlan(snap.filter(col("s").startsWith("s000")))
      assert(scanRoots(r4).size == 1, s"prefix: ${scanRoots(r4)}")
      assert(r4.count() == 10L)
      val r5 = pinPlan(snap.filter(col("s").like("s019%")))
      assert(scanRoots(r5).size == 1)
      assert(r5.count() == 10L)
      // a prefix past every value prunes everything
      val r6 = pinPlan(snap.filter(col("s").startsWith("t")))
      assert(scanRoots(r6).isEmpty && r6.count() == 0L)
    }
  }

  test("sparse column: IS NOT NULL prunes to the non-null file, IS NULL keeps the rest") {
    val (t, cat) = fixture()
    withReg(t, cat, "p4") {
      val snap = snapshot(t, cat)
      val r1 = pinPlan(snap.filter(col("sparse").isNotNull))
      assert(scanRoots(r1).size == 1,
        s"nulls_c = n_rows files must drop: ${scanRoots(r1)}")
      assert(r1.count() == 50L)
      val r2 = pinPlan(snap.filter(col("sparse").isNull))
      assert(scanRoots(r2).size == 3)
      assert(r2.count() == 150L)
      // a value predicate on the sparse column drops the all-null files
      val r3 = pinPlan(snap.filter(col("sparse") === 10L))
      assert(scanRoots(r3).size == 1)
      assert(r3.count() == 1L)
    }
  }

  test("untranslatable conjunct still prunes via its translatable peer") {
    val (t, cat) = fixture()
    withReg(t, cat, "p5") {
      // the contains() conjunct is opaque to the translator (and, being
      // on another column, safe from constant propagation) — the eq
      // conjunct still prunes, the opaque one still filters rows
      val q = pinPlan(snapshot(t, cat)
        .filter(col("s").contains("3") && col("id") === 137L))
      assert(scanRoots(q).size == 1)
      assert(q.count() == 1L)
      val q2 = pinPlan(snapshot(t, cat)
        .filter(col("s").contains("9") && col("id") === 137L))
      assert(scanRoots(q2).size == 1)
      assert(q2.count() == 0L) // s0137 has no '9' — residual filter applies
    }
  }

  test("empty admission yields a zero-file plan and zero rows") {
    val (t, cat) = fixture()
    withReg(t, cat, "p6") {
      val q = pinPlan(snapshot(t, cat).filter(col("id") === 1000L))
      assert(scanRoots(q).isEmpty, s"expected no file scan: ${scanRoots(q)}")
      assert(q.count() == 0L)
    }
  }

  test("merge-on-read: the DV anti-join's base side prunes, deletes still apply") {
    val (t, cat) = fixture()
    val root = t.stripSuffix("/t")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(200).filter(col("id") % 10 === 7).select("id"), "id")
      .write.parquet(s"$root/dv")
    Catalog.commit(spark, cat, Map(
      "manifest" -> s"$root/m1", "dv" -> s"$root/dv"))
    withReg(t, cat, "p7") {
      val m = spark.read.parquet(s"$root/m1")
      val dv = spark.read.parquet(s"$root/dv")
      val q = pinPlan(Layout.snapshotReadWithDeletes(spark, t, m, dv)
        .filter(col("id").between(100L, 120L)))
      val dataRoots = scanRoots(q).filterNot(_.contains("/dv"))
      assert(dataRoots.size < 4 && dataRoots.nonEmpty,
        s"base side should prune: ${scanRoots(q)}")
      val got = q.select("id").as[Long].collect().sorted.toSeq
      assert(got == (100L to 120L).filterNot(_ % 10 == 7))
    }
  }

  test("raw-dir scans and foreign tables never match") {
    val (t, cat) = fixture()
    withReg(t, cat, "p8") {
      val raw = pinPlan(spark.read.parquet(t).filter(col("id") === 3L))
      assert(scanRoots(raw).map(_.stripPrefix("file:")) == Seq(t))
      val other = freshDir()
      spark.range(10).select(col("id")).write.parquet(s"$other/u")
      val q = pinPlan(spark.read.parquet(s"$other/u")
        .filter(col("id") === 3L))
      assert(scanRoots(q).map(_.stripPrefix("file:")) == Seq(s"$other/u"))
    }
  }

  test("conf kill switch disables pruning") {
    val (t, cat) = fixture()
    withReg(t, cat, "p9") {
      spark.conf.set(ScanPruneRewrite.EnabledConf, "false")
      try {
        val q = pinPlan(snapshot(t, cat).filter(col("id") === 137L))
        assert(scanRoots(q).size == 4)
      } finally spark.conf.unset(ScanPruneRewrite.EnabledConf)
    }
  }

  test("exprIds survive: join above the pruned filter resolves") {
    val (t, cat) = fixture()
    withReg(t, cat, "p10") {
      val dim = Seq((0L, "zero"), (1L, "one"), (2L, "two"), (3L, "three"),
        (4L, "four")).toDF("k", "k_name")
      val q = pinPlan(snapshot(t, cat).filter(col("id") < 10L)
        .join(broadcast(dim), "k")
        .groupBy("k_name").agg(count(lit(1)).as("n")))
      val dataRoots = scanRoots(q).filter(_.contains("/t/"))
      assert(dataRoots.size == 1, s"scanned: ${scanRoots(q)}")
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        Map("zero" -> 2L, "one" -> 2L, "two" -> 2L, "three" -> 2L,
          "four" -> 2L))
    }
  }

  test("bloom admission: equality on a scattered key prunes where min/max cannot") {
    val root = freshDir()
    val t = s"$root/t"
    // u is a high-cardinality key scattered across every id-range file:
    // each file's [min_u, max_u] spans nearly the whole space, so range
    // stats admit everything — the bloom is the only skipping signal
    spark.range(200).select(col("id"),
        ((col("id") * 2654435761L) % 100000L).as("u"))
      .repartitionByRange(4, col("id"))
      .write.parquet(t)
    Layout.statsManifest(spark, t, Seq("id")).write.parquet(s"$root/m1")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m1"))
    Layout.bloomIndex(spark, t, "u").write.parquet(s"$root/bloom")
    ScanPruneRewrite.registerFromCatalog(spark, "pb", t, s"$root/cat")
    try {
      val probeU = (137L * 2654435761L) % 100000L
      // without the bloom: u is not a stats column → no pruning
      val q0 = pinPlan(snapshot(t, s"$root/cat").filter(col("u") === probeU))
      assert(scanRoots(q0).size == 4)
      ScanPruneRewrite.registerBlooms(spark, "pb", "u",
        spark.read.parquet(s"$root/bloom"))
      val q1 = pinPlan(snapshot(t, s"$root/cat").filter(col("u") === probeU))
      assert(scanRoots(q1).size < 4,
        s"bloom should prune the scattered key: ${scanRoots(q1).size}")
      assert(q1.select("id").as[Long].collect().toSeq == Seq(137L))
      // IN over two keys from two different files: both files admitted,
      // rest pruned (modulo bloom false positives, which only ADD files)
      val probeU2 = (42L * 2654435761L) % 100000L
      val q2 = pinPlan(snapshot(t, s"$root/cat")
        .filter(col("u").isin(probeU, probeU2)))
      assert(scanRoots(q2).size >= 2 && scanRoots(q2).size < 4)
      assert(q2.select("id").as[Long].collect().sorted.toSeq ==
        Seq(42L, 137L))
      // an absent key prunes everything (no false-positive full scan
      // at this fixture size means all four blooms reject)
      val q3 = pinPlan(snapshot(t, s"$root/cat").filter(col("u") === 99999L))
      assert(q3.count() == 0L)
      // composition: bloom conjunct AND range conjunct — admitted set
      // is the intersection
      val q4 = pinPlan(snapshot(t, s"$root/cat")
        .filter(col("u") === probeU && col("id") < 50L))
      assert(scanRoots(q4).isEmpty, // id 137 lives past the id<50 file
        s"range ∧ bloom should intersect to nothing: ${scanRoots(q4)}")
    } finally ScanPruneRewrite.unregister("pb")
  }

  test("registerBlooms refuses unknown scans and columns") {
    val (t, cat) = fixture()
    withReg(t, cat, "pb2") {
      val idx = Layout.bloomIndex(spark, t, "k")
      intercept[IllegalArgumentException] {
        ScanPruneRewrite.registerBlooms(spark, "nope", "k", idx)
      }
      intercept[IllegalArgumentException] {
        ScanPruneRewrite.registerBlooms(spark, "pb2", "no_such_col", idx)
      }
    }
  }

  test("pure SQL: graft_prune_register then a WHERE over graft_catalog_read prunes") {
    val (t, cat) = fixture()
    graft.GraftExtensions.register(spark)
    spark.sql(
      s"SELECT * FROM graft_prune_register('p11', '$t', '$cat', 1)").collect()
    try {
      val q = pinPlan(spark.sql(
        s"""SELECT id, k FROM graft_catalog_read('$t', '$cat', 1)
           |WHERE id BETWEEN 10 AND 20""".stripMargin))
      assert(scanRoots(q).size == 1, s"scanned: ${scanRoots(q)}")
      assert(q.count() == 11L)
    } finally ScanPruneRewrite.unregister("p11")
  }
}
