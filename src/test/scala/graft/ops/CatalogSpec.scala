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

  test("empty commit refuses") {
    val ex = intercept[IllegalArgumentException] {
      Catalog.commit(spark, freshPath(), Map.empty)
    }
    assert(ex.getMessage.contains("at least one artifact"))
  }
}
