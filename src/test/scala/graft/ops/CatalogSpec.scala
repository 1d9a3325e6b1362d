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

  test("empty commit refuses") {
    val ex = intercept[IllegalArgumentException] {
      Catalog.commit(spark, freshPath(), Map.empty)
    }
    assert(ex.getMessage.contains("at least one artifact"))
  }
}
