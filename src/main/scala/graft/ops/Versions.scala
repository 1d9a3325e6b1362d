package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** An optimistic commit lost its race: the committed history advanced
  * past the version this writer prepared against. Re-resolve the
  * current version, re-prepare the artifacts from it, and retry —
  * [[Catalog.commitRetry]] does exactly that loop. `winner` is the
  * newest COMMITTED version at throw time; it can still equal
  * `attempted - 1` when the racing writer has claimed the number but
  * not finished publishing (retry after a short wait). */
final case class CommitConflictException(path: String, attempted: Int,
    winner: Int) extends RuntimeException(
  s"commit conflict at $path: attempted v$attempted but another writer " +
    s"holds it (newest committed: v$winner) — re-resolve, re-prepare, retry")

/** Immutable version directories + per-version CLAIM/COMMIT markers —
  * the shared publish discipline for every persisted index family (IVF
  * vector index, text LSH admission index, vector-LSH admission index)
  * and the [[Catalog]], mirroring a lake format's commit log. An
  * in-place overwrite save is a single mutable slot: safe for one
  * writer with no readers mid-publish, but a deployment wants readers
  * pinned to a consistent snapshot while maintenance publishes around
  * them — and INDEPENDENT writers must never silently lose a commit.
  *
  * Layout under `path`: `v<N>/` (one full image each, written by the
  * family's own save), plus two marker files per version —
  * `_claim.v<N>` (created ATOMICALLY by exactly one writer before it
  * starts writing `v<N>/`, the mutual-exclusion atom) and
  * `_commit.v<N>` (created by that writer AFTER `v<N>/` is fully
  * written — its presence is what makes the version visible). A reader
  * therefore sees either nothing or a complete image, never a
  * half-published one, and two writers can never collide on the same
  * version directory: the exclusive create of the claim marker admits
  * exactly one.
  *
  * The exclusive create is `java.io.File.createNewFile` (atomic per
  * its contract) on `file://` and `FileSystem.create(p, overwrite =
  * false)` elsewhere — atomic on HDFS by its public contract. Object
  * stores without atomic create-if-absent (plain S3) need an external
  * coordination layer, the same caveat Delta's LogStore documents.
  *
  * Failure posture: a writer that dies between claim and commit leaves
  * a permanent HOLE — a claimed, never-committed number. Readers skip
  * it (only `_commit` markers are visible) and later writers claim
  * past it, so the history stays live; under [[publishCas]] the hole
  * blocks that one CAS slot and surfaces as a bounded-retry
  * [[CommitConflictException]] the operator can clean up (delete the
  * orphaned `_claim` file). Version numbers are therefore unique and
  * monotone but not necessarily dense.
  *
  * Retention contract (vacuum vs concurrent readers): [[vacuum]]
  * deletes old version images while readers may still hold a resolved
  * reference to them. A reader that resolved version v BEFORE vacuum
  * removed v reads deleted files — its scan fails loudly with missing
  * input paths (parquet scans pin concrete file paths; they never
  * silently serve a partial directory listing, spec-pinned). Size
  * `keep` so the retention window exceeds the deployment's longest
  * reader, exactly the Delta/Iceberg `VACUUM` contract.
  */
object Versions {

  def versionDir(path: String, version: Int): String = s"$path/v$version"

  private def fsFor(path: String)(implicit spark: SparkSession): FileSystem =
    graft.io.PathResolver.fsFor(path,
      spark.sparkContext.hadoopConfiguration)

  private def claimMarker(root: Path, n: Int) = new Path(root, s"_claim.v$n")
  private def commitMarker(root: Path, n: Int) = new Path(root, s"_commit.v$n")

  /** Exclusive create — the one atomic primitive the whole protocol
    * rests on. True iff THIS call created the file. */
  private def tryExclusiveCreate(fs: FileSystem, p: Path): Boolean = {
    val q = fs.makeQualified(p)
    if (q.toUri.getScheme == "file")
      new java.io.File(q.toUri.getPath).createNewFile()
    else
      try { fs.create(q, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if e.getMessage != null &&
              e.getMessage.toLowerCase.contains("already exist") => false
      }
  }

  private val ClaimRe = "_claim\\.v(\\d+)".r
  private val CommitRe = "_commit\\.v(\\d+)".r

  /** One listing → (claimed, committed) version-number sets. */
  private def state(fs: FileSystem, root: Path): (Set[Int], Set[Int]) =
    if (!fs.exists(root)) (Set.empty, Set.empty)
    else {
      val names = fs.listStatus(root).map(_.getPath.getName)
      (names.collect { case ClaimRe(n) => n.toInt }.toSet,
        names.collect { case CommitRe(n) => n.toInt }.toSet)
    }

  /** Write the next version via `saveTo(versionDir)` and commit it.
    * Returns the new version number. Safe under concurrent callers:
    * the claim marker's exclusive create picks each writer a UNIQUE
    * number (a contended claim just moves to the next number — no
    * CAS check, so use this only when each version is self-contained;
    * read-modify-write callers want [[publishCas]]). Never touches an
    * existing version dir, so no read-your-own-overwrite pin is needed
    * even when the published image was derived from a loaded one. */
  def publish(path: String, saveTo: String => Unit)(
      implicit spark: SparkSession): Int = {
    val fs = fsFor(path)
    val root = new Path(path)
    fs.mkdirs(root)
    var attempts = 0
    while (attempts < 64) {
      val (claimed, committed) = state(fs, root)
      val next = 1 + (claimed ++ committed).foldLeft(0)(math.max)
      if (tryExclusiveCreate(fs, claimMarker(root, next))) {
        saveTo(versionDir(path, next))
        require(tryExclusiveCreate(fs, commitMarker(root, next)),
          s"commit marker for $path v$next already existed — " +
            "claim protocol violated")
        return next
      }
      attempts += 1
    }
    throw new IllegalStateException(
      s"could not claim a version at $path after 64 attempts")
  }

  /** Compare-and-swap publish: write version `expected + 1` iff the
    * newest committed version is still `expected` (0 = empty history)
    * AND this writer wins the claim. Throws [[CommitConflictException]]
    * otherwise — the caller re-resolves, re-prepares against the new
    * current, and retries ([[Catalog.commitRetry]]). This is what
    * makes read-modify-write histories linearizable: a commit derived
    * from version k can only land as k+1, never silently overwrite a
    * concurrent k+1 from someone else. */
  def publishCas(path: String, expected: Int, saveTo: String => Unit)(
      implicit spark: SparkSession): Int = {
    require(expected >= 0, s"expected must be >= 0, got $expected")
    val fs = fsFor(path)
    val root = new Path(path)
    fs.mkdirs(root)
    val (_, committed) = state(fs, root)
    val cur = committed.foldLeft(0)(math.max)
    if (cur != expected)
      throw CommitConflictException(path, expected + 1, cur)
    val next = expected + 1
    if (!tryExclusiveCreate(fs, claimMarker(root, next)))
      throw CommitConflictException(path, next,
        state(fs, root)._2.foldLeft(0)(math.max))
    saveTo(versionDir(path, next))
    require(tryExclusiveCreate(fs, commitMarker(root, next)),
      s"commit marker for $path v$next already existed — " +
        "claim protocol violated")
    next
  }

  /** The newest committed version. Loud when the history is empty. */
  def current(path: String)(implicit spark: SparkSession): Int = {
    val (_, committed) = state(fsFor(path), new Path(path))
    require(committed.nonEmpty, s"no committed version at $path")
    committed.max
  }

  /** [[current]], or 0 for an empty history — the CAS base for the
    * first-ever commit. */
  def currentOr0(path: String)(implicit spark: SparkSession): Int =
    state(fsFor(path), new Path(path))._2.foldLeft(0)(math.max)

  /** Delete all but the newest `keep` committed versions; returns the
    * vacuumed version numbers. See the retention contract in the
    * class doc: readers pinned to a vacuumed version fail loudly. */
  def vacuum(path: String, keep: Int)(
      implicit spark: SparkSession): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = fsFor(path)
    val root = new Path(path)
    val doomed = state(fs, root)._2.toSeq.sorted.dropRight(keep)
    doomed.foreach { v =>
      // marker first: a version must never look committed while its
      // image is mid-delete
      fs.delete(commitMarker(root, v), false)
      fs.delete(new Path(root, s"v$v"), true)
      fs.delete(claimMarker(root, v), false)
    }
    doomed
  }

  /** The committed version numbers currently on disk (vacuumed ones
    * excluded, claimed-but-never-committed holes invisible). */
  def listVersions(path: String)(implicit spark: SparkSession): Seq[Int] =
    state(fsFor(path), new Path(path))._2.toSeq.sorted
}
