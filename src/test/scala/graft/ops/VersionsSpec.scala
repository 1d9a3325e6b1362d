package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The version-marker protocol's recovery and compatibility surface:
  * legacy `_current`-pointer histories keep resolving (and migrate),
  * orphaned claims reclaim after their lease, and a live writer whose
  * claim was reclaimed fails loudly instead of publishing over the
  * reclaim. */
class VersionsSpec extends AnyFunSuite with SparkTestBase {

  private def freshPath(): String =
    java.nio.file.Files.createTempDirectory("graft-versions").toString + "/v"

  /** Write a legacy-format history by hand: v1..vN dirs + `_current`
    * pointer, NO markers — exactly what the pre-marker release left on
    * disk. */
  private def writeLegacy(path: String, n: Int): Unit = {
    val dir = new java.io.File(path)
    dir.mkdirs()
    (1 to n).foreach { k =>
      val vd = new java.io.File(dir, s"v$k")
      vd.mkdirs()
      val w = new java.io.FileWriter(new java.io.File(vd, "payload.txt"))
      w.write(s"image-$k"); w.close()
    }
    val w = new java.io.FileWriter(new java.io.File(dir, "_current"))
    w.write(n.toString); w.close()
  }

  test("legacy _current history resolves: current/listVersions see the pointer's versions") {
    val path = freshPath()
    writeLegacy(path, 3)
    assert(Versions.current(path)(spark) === 3)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2, 3))
  }

  test("a new marker commit lands on top of a legacy history") {
    val path = freshPath()
    writeLegacy(path, 2)
    val v = Versions.publish(path, dir => {
      new java.io.File(dir).mkdirs()
      val w = new java.io.FileWriter(new java.io.File(dir, "payload.txt"))
      w.write("image-3"); w.close()
    })(spark)
    assert(v === 3)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2, 3))
    // a version dir BEYOND the pointer (legacy crashed writer) stays
    // invisible: the pointer never named it
    new java.io.File(path, "v9").mkdirs()
    assert(Versions.current(path)(spark) === 3)
  }

  test("migrateLegacy writes markers, drops the pointer, is idempotent") {
    val path = freshPath()
    writeLegacy(path, 3)
    assert(Versions.migrateLegacy(path)(spark) === Seq(1, 2, 3))
    assert(!new java.io.File(path, "_current").exists())
    (1 to 3).foreach { k =>
      assert(new java.io.File(path, s"_commit.v$k").exists(), s"v$k marker")
    }
    assert(Versions.listVersions(path)(spark) === Seq(1, 2, 3))
    // re-run: nothing to do, history unchanged
    assert(Versions.migrateLegacy(path)(spark) === Seq.empty)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2, 3))
  }

  test("cleanOrphanedClaims reclaims a dead claim + partial image; spares young and committed") {
    val path = freshPath()
    Versions.publish(path, dir => new java.io.File(dir).mkdirs())(spark)
    // dead writer: claim for v2, partial image, no commit marker, old mtime
    val claim = new java.io.File(path, "_claim.v2")
    claim.createNewFile()
    new java.io.File(path, "v2").mkdirs()
    claim.setLastModified(1000L)
    // young claim for v3 (a live writer mid-publish)
    new java.io.File(path, "_claim.v3").createNewFile()
    val reclaimed = Versions.cleanOrphanedClaims(path,
      olderThanMs = 60000L)(spark)
    assert(reclaimed === Seq(2))
    assert(!claim.exists() && !new java.io.File(path, "v2").exists())
    assert(new java.io.File(path, "_claim.v3").exists(),
      "a claim inside its lease must survive")
    assert(new java.io.File(path, "_commit.v1").exists(),
      "committed versions are never touched")
    // the slot is live again: a CAS writer lands v2 fresh
    new java.io.File(path, "_claim.v3").delete()
    assert(Versions.publishCas(path, 1,
      dir => new java.io.File(dir).mkdirs())(spark) === 2)
  }

  test("a reclaimed-but-live writer fails its commit loudly; the reclaimer's successor wins") {
    val path = freshPath()
    Versions.publish(path, dir => new java.io.File(dir).mkdirs())(spark)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val entered = new java.util.concurrent.CountDownLatch(1)
    val slow = new Thread(() => {
      try {
        Versions.publishCas(path, 1, { dir =>
          new java.io.File(dir).mkdirs()
          entered.countDown()
          gate.await() // writer stalls mid-publish past its lease
        })(spark)
      } catch { case _: CommitConflictException => () }
    })
    // the slow writer needs an active session on its thread for fsFor
    slow.start()
    entered.await()
    // lease expired (0 ms): reclaim the stalled writer's claim
    new java.io.File(path, "_claim.v2").setLastModified(1000L)
    assert(Versions.cleanOrphanedClaims(path, 60000L)(spark) === Seq(2))
    // a new writer takes the slot
    assert(Versions.publishCas(path, 1,
      dir => new java.io.File(dir).mkdirs())(spark) === 2)
    // the zombie resumes: its claim-still-held check must throw, never
    // create a commit marker over the new owner's version
    gate.countDown()
    slow.join(30000)
    assert(!slow.isAlive)
    assert(Versions.listVersions(path)(spark) === Seq(1, 2))
  }
}
