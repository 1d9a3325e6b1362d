package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Catalog: one atomic pointer over a set of named artifact refs.
  * Pins: commit/resolve round-trip, monotone versions with stable
  * history (time travel), current() tracking the pointer, vacuum
  * retention, and loud failure on a missing artifact. */
class CatalogSpec extends AnyFunSuite with SparkTestBase {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-catalog").toString + "/cat"

  test("commit/resolve round-trips and versions are monotone") {
    val path = freshPath()
    val v1 = Catalog.commit(spark, path, Map("a" -> "loc/a1", "b" -> "loc/b1"))
    assert(v1 === 1)
    val v2 = Catalog.commit(spark, path, Map("a" -> "loc/a2", "b" -> "loc/b1"))
    assert(v2 === 2)
    assert(Catalog.resolve(spark, path, 1) ===
      Map("a" -> "loc/a1", "b" -> "loc/b1"))
    assert(Catalog.resolve(spark, path, 2) ===
      Map("a" -> "loc/a2", "b" -> "loc/b1"))
    assert(Catalog.resolveCurrent(spark, path) ===
      Map("a" -> "loc/a2", "b" -> "loc/b1"))
    assert(Versions.current(path)(spark) === 2)
  }

  test("history is immutable: a later commit never changes v1") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "v1-ref"))
    val before = Catalog.resolve(spark, path, 1)
    Catalog.commit(spark, path, Map("m" -> "v2-ref", "extra" -> "x"))
    assert(Catalog.resolve(spark, path, 1) === before)
    assert(Catalog.resolveCurrent(spark, path)("m") === "v2-ref")
  }

  test("ref() fails loudly on a missing artifact, naming what exists") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("manifest" -> "m1", "dv" -> "d1"))
    assert(Catalog.ref(spark, path, 1, "dv") === "d1")
    val ex = intercept[IllegalArgumentException] {
      Catalog.ref(spark, path, 1, "token_bloom")
    }
    assert(ex.getMessage.contains("token_bloom") &&
      ex.getMessage.contains("manifest"))
  }

  test("vacuum retains the newest versions; current survives") {
    val path = freshPath()
    (1 to 5).foreach(i => Catalog.commit(spark, path, Map("m" -> s"ref$i")))
    val doomed = Versions.vacuum(path, keep = 2)(spark)
    assert(doomed === Seq(1, 2, 3))
    assert(Catalog.resolve(spark, path, 4)("m") === "ref4")
    assert(Catalog.resolveCurrent(spark, path)("m") === "ref5")
    assert(intercept[Exception] {
      Catalog.resolve(spark, path, 1)
    } != null)
  }

  test("vacuumKeep deletes by reference, not age") {
    val base = java.nio.file.Files.createTempDirectory("graft-catgc")
    val path = base.toString + "/cat"
    val arts = base.resolve("m")
    java.nio.file.Files.createDirectories(arts)
    def mkArt(name: String): String = {
      val d = arts.resolve(name)
      java.nio.file.Files.createDirectories(d)
      java.nio.file.Files.writeString(d.resolve("data"), name)
      d.toString
    }
    // dv1 is OLD by age but stays referenced by every commit; each
    // commit gets its own manifest dir; 'stray' is referenced by nothing
    val dv1 = mkArt("dv1")
    val stray = mkArt("stray")
    (1 to 4).foreach { i =>
      Catalog.commit(spark, path, Map("manifest" -> mkArt(s"mf$i"),
        "dv" -> dv1))
    }
    val deleted = Catalog.vacuumKeep(spark, path, keep = 2,
      Seq(arts.toString))
    def exists(n: String) = java.nio.file.Files.exists(arts.resolve(n))
    // dropped: the unreferenced manifests + the stray dir; dv1 SURVIVES
    // despite being the oldest artifact on disk
    assert(!exists("mf1") && !exists("mf2") && !exists("stray"))
    assert(exists("mf3") && exists("mf4") && exists("dv1"))
    assert(deleted.map(p => new java.io.File(p).getName).toSet ===
      Set("mf1", "mf2", "stray"))
    // retained versions still resolve to live dirs
    assert(Versions.listVersions(path)(spark) === Seq(3, 4))
    assert(new java.io.File(Catalog.resolve(spark, path, 3)("dv")).exists())
    assert(new java.io.File(
      Catalog.resolve(spark, path, 4)("manifest")).exists())
  }

  test("commitIdempotent: a replayed batch never publishes twice") {
    val path = freshPath()
    val v1 = Catalog.commitIdempotent(spark, path, "batch-0",
      Map("m" -> "m/v0"))
    assert(v1 === 1)
    // the retry: same txn id → SAME version, nothing written
    assert(Catalog.commitIdempotent(spark, path, "batch-0",
      Map("m" -> "m/v0")) === 1)
    assert(Versions.listVersions(path)(spark) === Seq(1))
    // a new batch commits normally
    val v2 = Catalog.commitIdempotent(spark, path, "batch-1",
      Map("m" -> "m/v1"))
    assert(v2 === 2)
    // a LATE replay of batch-0 (crash-restart redelivery) still finds
    // its original version instead of re-publishing
    assert(Catalog.commitIdempotent(spark, path, "batch-0",
      Map("m" -> "m/v0")) === 1)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2))
    assert(Catalog.resolveCurrent(spark, path)("m") === "m/v1")
    // the reserved artifact name refuses
    assert(intercept[IllegalArgumentException] {
      Catalog.commitIdempotent(spark, path, "batch-2",
        Map("_txn" -> "x"))
    }.getMessage.contains("_txn"))
  }

  test("two REAL threads racing 20 commits each: 40 distinct versions, zero lost updates") {
    val path = freshPath()
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val start = new CountDownLatch(1)
    def writer(tag: String): java.util.concurrent.Future[Seq[Int]] =
      pool.submit(new java.util.concurrent.Callable[Seq[Int]] {
        def call(): Seq[Int] = {
          start.await()
          (1 to 20).map { i =>
            // read-modify-write: derive from the CURRENT world, add one
            // artifact — exactly the shape a plain commit() loses races on
            Catalog.commitRetry(spark, path,
              base => base + (s"$tag-$i" -> s"ref/$tag-$i"))
          }
        }
      })
    val fa = writer("a"); val fb = writer("b")
    start.countDown()
    val va = fa.get(120, TimeUnit.SECONDS)
    val vb = fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    // exactly 40 committed versions, no collisions, no holes lost
    assert((va ++ vb).toSet.size === 40, "two commits shared a version")
    assert(Versions.listVersions(path)(spark) === (1 to 40))
    // zero lost updates: the final world carries every writer's artifact
    val finalRefs = Catalog.resolveCurrent(spark, path)
    val want = (1 to 20).flatMap(i => Seq(s"a-$i", s"b-$i")).toSet
    assert(finalRefs.keySet === want)
    // linearizable history: version k's world = version k-1's + exactly
    // one artifact (every commit derived from its immediate predecessor)
    var prev = Set.empty[String]
    (1 to 40).foreach { v =>
      val w = Catalog.resolve(spark, path, v).keySet
      assert(w.size === v, s"v$v has ${w.size} artifacts")
      assert(prev.subsetOf(w), s"v$v dropped an earlier writer's artifact")
      prev = w
    }
    // each thread's own commits are internally ordered
    assert(va === va.sorted); assert(vb === vb.sorted)
  }

  test("commitCas: stale expected conflicts; claimed-but-uncommitted slot conflicts") {
    val path = freshPath()
    assert(Catalog.commitCas(spark, path, 0, Map("m" -> "r1")) === 1)
    val e = intercept[CommitConflictException] {
      Catalog.commitCas(spark, path, 0, Map("m" -> "stale"))
    }
    assert(e.winner === 1 && e.attempted === 1)
    assert(Catalog.commitCas(spark, path, 1, Map("m" -> "r2")) === 2)
    assert(Catalog.resolveCurrent(spark, path)("m") === "r2")
  }

  test("timestamp time travel: resolveAsOf serves the world as of ts; pre-history refuses") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "r1"), committedAt = Some(1000L))
    Catalog.commit(spark, path, Map("m" -> "r2"), committedAt = Some(2000L))
    Catalog.commit(spark, path, Map("m" -> "r3"), committedAt = Some(3000L))
    assert(Catalog.resolveAsOf(spark, path, 1000L) === 1)
    assert(Catalog.resolveAsOf(spark, path, 2999L) === 2)
    assert(Catalog.resolveAsOf(spark, path, 999999L) === 3)
    assert(Catalog.resolve(spark, path,
      Catalog.resolveAsOf(spark, path, 2500L))("m") === "r2")
    val e = intercept[IllegalArgumentException] {
      Catalog.resolveAsOf(spark, path, 999L)
    }
    assert(e.getMessage.contains("precedes the first commit"))
    // an un-stamped caller gets wall clock: monotone vs a fresh commit
    val v4 = Catalog.commit(spark, path, Map("m" -> "r4"))
    assert(Catalog.committedAt(spark, path, v4) > 3000L)
  }

  test("retention contract: a reader pinned to a vacuumed version fails loudly, never partially") {
    val base = java.nio.file.Files.createTempDirectory("graft-vacread")
    val path = base.toString + "/cat"
    import org.apache.spark.sql.functions.col
    // two commits, each with its own immutable manifest + data epoch;
    // manifests live under ONE artifact root so vacuumKeep only ever
    // touches them, and the data epochs are "vacuumed" manually below
    spark.range(100).select(col("id").as("k"))
      .write.parquet(s"$base/t/c1")
    val m1 = Layout.statsManifest(spark, s"$base/t/c1", Seq("k"))
    m1.write.parquet(s"$base/arts/m1")
    Catalog.commit(spark, path, Map("manifest" -> s"$base/arts/m1"))
    spark.range(100, 200).select(col("id").as("k"))
      .write.parquet(s"$base/t/c2")
    m1.unionByName(Layout.statsManifest(spark, s"$base/t/c2", Seq("k")))
      .write.parquet(s"$base/arts/m2")
    Catalog.commit(spark, path, Map("manifest" -> s"$base/arts/m2"))
    // reader resolves v1 BEFORE vacuum (the pinned-manifest read plan)
    val pinned = Layout.snapshotRead(spark, s"$base/t/c1",
      spark.read.parquet(Catalog.ref(spark, path, 1, "manifest")))
    Catalog.vacuumKeep(spark, path, keep = 1, Seq(s"$base/arts"))
    // v1's manifest dir is gone; the pinned scan must fail LOUDLY on its
    // missing concrete input paths — a silent partial scan would be a
    // wrong answer, an exception is the documented retention contract
    java.nio.file.Files.walk(java.nio.file.Paths.get(s"$base/t/c1"))
      .sorted(java.util.Comparator.reverseOrder())
      .forEach(p => java.nio.file.Files.delete(p))
    val ex = intercept[Exception] { pinned.count() }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).flatMap(c => Option(c.getMessage)).getOrElse("")
    assert(msg.toLowerCase.contains("exist") ||
      msg.toLowerCase.contains("not found") ||
      msg.toLowerCase.contains("no such file"),
      s"expected a missing-input failure, got: $msg")
  }

  test("commitIdempotentRetry: exactly-once per txn, concurrent writers' artifacts kept") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "m/v0"))
    val v2 = Catalog.commitIdempotentRetry(spark, path, "b0",
      base => base + ("m" -> "m/v1"))
    assert(v2 === 2)
    // replay of the same batch id: same version, nothing written —
    // even with different (wrong) refs, the dedupe wins
    assert(Catalog.commitIdempotentRetry(spark, path, "b0",
      base => base + ("m" -> "m/WRONG")) === 2)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2))
    assert(Catalog.resolveCurrent(spark, path)("m") === "m/v1")
    // a batch writer lands BETWEEN stream batches...
    assert(Catalog.commitRetry(spark, path,
      base => base + ("dim" -> "d/1")) === 3)
    // ...and the stream's next flip derives from the current world, so
    // the batch artifact survives (plain commitIdempotent would drop it)
    assert(Catalog.commitIdempotentRetry(spark, path, "b1",
      base => base + ("m" -> "m/v2")) === 4)
    val w = Catalog.resolveCurrent(spark, path)
    assert(w("dim") === "d/1" && w("m") === "m/v2")
    // a LATE replay of b0 still finds its original version
    assert(Catalog.commitIdempotentRetry(spark, path, "b0",
      base => base) === 2)
    assert(intercept[IllegalArgumentException] {
      Catalog.commitIdempotentRetry(spark, path, "b9",
        base => base + ("_txn" -> "x"))
    }.getMessage.contains("_txn"))
  }

  test("commit timestamps clamp monotone under writer clock skew") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "r1"), committedAt = Some(5000L))
    // skewed writer: wall clock BEHIND the previous committer's
    Catalog.commit(spark, path, Map("m" -> "r2"), committedAt = Some(1000L))
    Catalog.commit(spark, path, Map("m" -> "r3"), committedAt = Some(1500L))
    val stamps = (1 to 3).map(Catalog.committedAt(spark, path, _))
    assert(stamps === Seq(5000L, 5001L, 5002L),
      s"stamps must be strictly increasing, got $stamps")
    // as-of is therefore well-defined: 5000 names v1's world, not a
    // later version whose predecessor carries a LATER stamp
    assert(Catalog.resolveAsOf(spark, path, 5000L) === 1)
    assert(Catalog.resolveAsOf(spark, path, 5001L) === 2)
    // a sane forward clock is NOT clamped down
    Catalog.commit(spark, path, Map("m" -> "r4"), committedAt = Some(9000L))
    assert(Catalog.committedAt(spark, path, 4) === 9000L)
  }

  test("vacuumKeep grace window spares a concurrent writer's staged artifacts") {
    val base = java.nio.file.Files.createTempDirectory("graft-vacgrace")
    val path = base.toString + "/cat"
    new java.io.File(s"$base/arts/old").mkdirs()
    new java.io.File(s"$base/arts/old").setLastModified(1000L)
    Catalog.commit(spark, path, Map("m" -> s"$base/arts/live"))
    new java.io.File(s"$base/arts/live").mkdirs()
    // a commitRetry writer has STAGED this dir but not yet committed
    // the refs that make it live — unreferenced, but young
    new java.io.File(s"$base/arts/staged").mkdirs()
    val deleted = Catalog.vacuumKeep(spark, path, keep = 1,
      Seq(s"$base/arts"), graceMs = 60000L)
    assert(deleted.map(p => p.substring(p.lastIndexOf('/') + 1)) ===
      Seq("old"), s"got $deleted")
    assert(new java.io.File(s"$base/arts/staged").exists(),
      "a staged dir inside the grace window must survive")
    assert(new java.io.File(s"$base/arts/live").exists())
    // graceMs=0 keeps the pure reference-only behavior
    val deleted2 = Catalog.vacuumKeep(spark, path, keep = 1,
      Seq(s"$base/arts"), graceMs = 0L)
    assert(deleted2.exists(_.endsWith("staged")))
  }

  test("commitRetry self-heals a crash-orphaned claim once the lease expires") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "r1"))
    // a writer died between claim and commit: the v2 slot is wedged
    val dir = new java.io.File(path)
    val claim = new java.io.File(dir, "_claim.v2")
    claim.createNewFile()
    new java.io.File(dir, "v2").mkdirs()
    claim.setLastModified(1000L) // long past any lease
    spark.conf.set(Catalog.ClaimLeaseConf, "60000")
    try {
      val v = Catalog.commitRetry(spark, path, base => base + ("n" -> "r2"))
      assert(v === 2, "the reclaimed slot must be committed fresh")
      assert(Catalog.resolveCurrent(spark, path) ===
        Map("m" -> "r1", "n" -> "r2"))
      assert(Versions.listVersions(path)(spark) === Seq(1, 2))
    } finally spark.conf.unset(Catalog.ClaimLeaseConf)
  }

  test("empty commit refuses") {
    val ex = intercept[IllegalArgumentException] {
      Catalog.commit(spark, freshPath(), Map.empty)
    }
    assert(ex.getMessage.contains("at least one artifact"))
  }

  // r19 swapped BOTH the refs-table writer and reader from Spark jobs to
  // direct parquet-mr in one commit; the cross-format directions were
  // claimed but untested (ADVICE r19). Pin both.
  test("resolve reads a refs table written by the pre-r19 Spark path") {
    import spark.implicits._
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "v1-ref")) // markers for v1
    // overwrite v1's image with one written the OLD way
    val dir = new java.io.File(Versions.versionDir(path, 1))
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    Seq(("manifest", "loc/m7"), ("dv", "loc/d7"))
      .toDF("artifact", "ref")
      .coalesce(1).write.mode("append").parquet(dir.toString)
    assert(Catalog.resolve(spark, path, 1) ===
      Map("manifest" -> "loc/m7", "dv" -> "loc/d7"))
  }

  test("the pre-r19 Spark reader reads a parquet-mr-written refs table") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("manifest" -> "loc/m9", "dv" -> "loc/d9"))
    val rows = spark.read.parquet(Versions.versionDir(path, 1))
      .collect().map(r => r.getAs[String]("artifact") -> r.getAs[String]("ref"))
      .toMap
    assert(rows === Map("manifest" -> "loc/m9", "dv" -> "loc/d9"))
  }

  test("resolve fails loudly on a version dir with no refs parquet") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "r1"))
    val dir = new java.io.File(Versions.versionDir(path, 1))
    dir.listFiles().filter(_.getName.endsWith(".parquet")).foreach(_.delete())
    val ex = intercept[IllegalArgumentException] {
      Catalog.resolve(spark, path, 1)
    }
    assert(ex.getMessage.contains("no refs parquet file"))
  }

  test("resolve ignores hidden sidecars and non-file entries") {
    val path = freshPath()
    Catalog.commit(spark, path, Map("m" -> "r1"))
    val dir = new java.io.File(Versions.versionDir(path, 1))
    // a stray underscore-prefixed sidecar and a subdirectory whose name
    // ends in .parquet must not reach ParquetReader
    new java.io.File(dir, "_sidecar.parquet").createNewFile()
    new java.io.File(dir, "sub.parquet").mkdirs()
    assert(Catalog.resolve(spark, path, 1) === Map("m" -> "r1"))
  }

  test("a null ref fails the commit with a message naming the artifact") {
    val ex = intercept[IllegalArgumentException] {
      Catalog.commit(spark, freshPath(), Map("m" -> (null: String)))
    }
    assert(ex.getMessage.contains("null artifact/ref"))
    assert(ex.getMessage.contains("artifact=m"))
  }
}
