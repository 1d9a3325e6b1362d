package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout.commitAppend / mergeBranch: commits are self-contained file
  * sets, branches (manifest unions) are isolated from each other, and
  * merge is the idempotent fast-forward file-set union. */
class BranchSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-branch-$tag").toString

  test("branch isolation, fast-forward merge, idempotence") {
    val tmp = freshDir("t")
    def commit(rows: Seq[(Long, String)]) =
      Layout.commitAppend(spark, rows.toDF("k", "v"), tmp, Seq("k"))
        .localCheckpoint(eager = true)
    val base = commit(Seq((1L, "a"), (2L, "b")))
    val cDev = commit(Seq((3L, "c")))
    val cMain = commit(Seq((4L, "d")))
    val dev = base.unionAll(cDev)
    val main = base.unionAll(cMain)
    def ks(m: org.apache.spark.sql.DataFrame): Set[Long] =
      Layout.snapshotRead(spark, tmp, m)
        .select("k").collect().map(_.getLong(0)).toSet
    // divergent branches never see each other's commits
    assert(ks(main) === Set(1L, 2L, 4L))
    assert(ks(dev) === Set(1L, 2L, 3L))
    val merged = Layout.mergeBranch(main, dev)
    assert(ks(merged) === Set(1L, 2L, 3L, 4L))
    // the shared base is deduplicated at the file level, not double-read
    val files = merged.select("file").collect().map(_.getString(0))
    assert(files.length === files.distinct.length)
    // merging the same branch again is a no-op
    assert(Layout.mergeBranch(merged, dev).count() === merged.count())
  }

  test("branch-scoped deletes ride through a merge as DV union") {
    val tmp = freshDir("dv")
    val m1 = Layout.commitAppend(spark,
        (0L until 50L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val m2 = Layout.commitAppend(spark,
        (50L until 100L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    // a dev-branch delete addresses ONLY its own commit's files — the
    // commit dir is recoverable from any manifest row's file path
    val devCommitDir = {
      val f = m2.select("file").head.getString(0)
      val p = if (f.startsWith("file:")) new java.net.URI(f).getPath else f
      new java.io.File(p).getParent
    }
    val dv = Layout.deletionVectors(spark, devCommitDir, col("k") % 10 === 0)
      .localCheckpoint(eager = true)
    val merged = Layout.mergeBranch(m1, m2)
    val got = Layout.snapshotReadWithDeletes(spark, tmp, merged, dv)
      .select("k").collect().map(_.getLong(0)).toSet
    // main's rows untouched; dev's k % 10 == 0 rows gone after merge
    val want = (0L until 100L).toSet --
      (50L until 100L).filter(_ % 10 == 0).toSet
    assert(got === want)
  }

  test("WAP abandonment: failed audit leaves main intact, vacuum reclaims") {
    val tmp = freshDir("wap")
    val main = Layout.commitAppend(spark,
        (0L until 40L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    // two staged commits whose audit "fails" — they are simply never merged
    val s1 = Layout.commitAppend(spark,
        (100L until 120L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    Layout.commitAppend(spark,
        (120L until 140L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    // freshly-written commits sit inside the default in-flight grace
    // window — GC keeps everything even though two are unreferenced
    val (d0, k0) = Layout.vacuumCommits(spark, tmp, Seq(main))
    assert(d0 === 0 && k0 === 3)
    // grace 0 (no concurrent writer in this test): a still-retained
    // staging manifest keeps its commit through GC
    val (d1, k1) = Layout.vacuumCommits(spark, tmp, Seq(main, s1),
      olderThanMs = 0L)
    assert(d1 === 1 && k1 === 2)
    // dropping s1's retention abandons its commit too
    val (d2, k2) = Layout.vacuumCommits(spark, tmp, Seq(main),
      olderThanMs = 0L)
    assert(d2 === 1 && k2 === 1)
    // main is untouched through the whole cycle
    val got = Layout.snapshotRead(spark, tmp, main)
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === (0L until 40L).toSet)
  }

  test("merge dedupes the shared base across scheme spellings") {
    val tmp = freshDir("scheme")
    val base = Layout.commitAppend(spark,
        (0L until 30L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    // the same base manifest persisted and reloaded can render its paths
    // without the scheme — merge must still recognize the shared files
    val stripped = base
      .withColumn("file", regexp_replace(col("file"), "^file:", ""))
    val merged = Layout.mergeBranch(base, stripped)
    assert(merged.count() === base.count())
    assert(Layout.snapshotRead(spark, tmp, merged).count() === 30L)
  }

  test("merged manifest serves pruned reads with exact commit stats") {
    val tmp = freshDir("p")
    val m1 = Layout.commitAppend(spark,
        (0L until 100L).map(i => (i, i % 7)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val m2 = Layout.commitAppend(spark,
        (100L until 200L).map(i => (i, i % 7)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val merged = Layout.mergeBranch(m1, m2)
    val got = Layout.prunedRead(spark, tmp, merged, "k", lit(95L), lit(105L))
      .select("k").collect().map(_.getLong(0)).toSet
    assert(got === (95L to 105L).toSet)
  }

  test("mergeBranchChecked refuses a diverged merge, naming the file") {
    val tmp = freshDir("div")
    val base = Layout.commitAppend(spark,
        (0L until 50L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val devCommit = Layout.commitAppend(spark,
        (50L until 60L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val main = base
    val dev = base.unionAll(devCommit)
    // dev deletes rows of a SHARED (fork-base) file; main retains them
    val baseDir = {
      val f = base.select("file").head.getString(0)
      val p = if (f.startsWith("file:")) new java.net.URI(f).getPath else f
      new java.io.File(p).getParent
    }
    val devDv = Layout.deletionVectors(spark, baseDir, col("k") % 10 === 0)
      .localCheckpoint(eager = true)
    val mainDv = devDv.limit(0)
    val e = intercept[IllegalStateException] {
      Layout.mergeBranchChecked(main, dev, mainDv, devDv)
    }
    assert(e.getMessage.contains("diverged merge refused"))
    // the error names at least one concrete conflicting file path
    assert(e.getMessage.contains(".parquet"))
  }

  test("mergeBranchChecked passes when DVs agree or touch unshared files") {
    val tmp = freshDir("ok")
    val base = Layout.commitAppend(spark,
        (0L until 50L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val devCommit = Layout.commitAppend(spark,
        (50L until 60L).map(i => (i, i % 3)).toDF("k", "v"), tmp, Seq("k"))
      .localCheckpoint(eager = true)
    val main = base
    val dev = base.unionAll(devCommit)
    // identical DV rows on the shared base: no divergence
    val baseDir = {
      val f = base.select("file").head.getString(0)
      val p = if (f.startsWith("file:")) new java.net.URI(f).getPath else f
      new java.io.File(p).getParent
    }
    val agreed = Layout.deletionVectors(spark, baseDir, col("k") % 10 === 0)
      .localCheckpoint(eager = true)
    val m1 = Layout.mergeBranchChecked(main, dev, agreed, agreed)
    assert(m1.count() === Layout.mergeBranch(main, dev).count())
    // a dev-only DV over dev's OWN commit (unshared file) is fine too:
    // main never tracked that file, so no contract is broken
    val devDir = {
      val f = devCommit.select("file").head.getString(0)
      val p = if (f.startsWith("file:")) new java.net.URI(f).getPath else f
      new java.io.File(p).getParent
    }
    val devOnlyDv = Layout.deletionVectors(spark, devDir, col("k") === 55L)
      .localCheckpoint(eager = true)
    val m2 = Layout.mergeBranchChecked(main, dev, agreed.limit(0), devOnlyDv)
    assert(m2.count() === Layout.mergeBranch(main, dev).count())
  }
}
