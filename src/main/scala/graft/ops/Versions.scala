package graft.ops

import org.apache.spark.sql.SparkSession

/** Immutable version directories + an atomic `_current` pointer — the
  * shared publish discipline for every persisted index family (IVF
  * vector index, text LSH admission index, vector-LSH admission index),
  * mirroring the lake side's commit dirs. An in-place overwrite save is
  * a single mutable slot: safe for one writer with no readers
  * mid-publish, but a deployment wants readers pinned to a consistent
  * snapshot while maintenance publishes around them.
  *
  * Layout under `path`: `v<N>/` (one full index image each, written by
  * the family's own save), plus a `_current` file whose CONTENT is the
  * live version number, replaced by atomic rename — a reader sees
  * either the old version or the new one, never a half-published
  * index. Vacuum retains the newest `keep` versions by count; the
  * current pointer's version is always among them because publishes
  * are monotone.
  */
object Versions {

  /** Write the next version via `saveTo(versionDir)` and flip the
    * pointer to it. Returns the new version number. Never touches an
    * existing version dir, so no read-your-own-overwrite pin is needed
    * even when the published index was derived from a loaded one. */
  def publish(path: String, saveTo: String => Unit)(
      implicit spark: SparkSession): Int = {
    val fs = graft.io.PathResolver.fsFor(path,
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    fs.mkdirs(root)
    val next = 1 + list(fs, root).foldLeft(0)(math.max)
    saveTo(versionDir(path, next))
    val tmp = new org.apache.hadoop.fs.Path(root, s"_current.tmp$next")
    val out = fs.create(tmp, true)
    out.write(next.toString.getBytes("UTF-8")); out.close()
    val cur = new org.apache.hadoop.fs.Path(root, "_current")
    fs.delete(cur, false) // rename-over target (rename is the atom)
    require(fs.rename(tmp, cur), s"pointer flip failed for $path v$next")
    next
  }

  def versionDir(path: String, version: Int): String = s"$path/v$version"

  /** The version `_current` points at. */
  def current(path: String)(implicit spark: SparkSession): Int = {
    val fs = graft.io.PathResolver.fsFor(path,
      spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(path, "_current"))
    val s = scala.io.Source.fromInputStream(in).mkString.trim
    in.close()
    s.toInt
  }

  /** Delete all but the newest `keep` versions; returns the vacuumed
    * version numbers. */
  def vacuum(path: String, keep: Int)(
      implicit spark: SparkSession): Seq[Int] = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val fs = graft.io.PathResolver.fsFor(path,
      spark.sparkContext.hadoopConfiguration)
    val root = new org.apache.hadoop.fs.Path(path)
    val doomed = list(fs, root).sorted.dropRight(keep)
    doomed.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"v$v"), true)
    }
    doomed
  }

  /** The version numbers currently on disk (vacuumed ones excluded). */
  def listVersions(path: String)(implicit spark: SparkSession): Seq[Int] = {
    val fs = graft.io.PathResolver.fsFor(path,
      spark.sparkContext.hadoopConfiguration)
    list(fs, new org.apache.hadoop.fs.Path(path)).sorted
  }

  private def list(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Int] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toInt }
}
