package graft.ops

import org.apache.spark.sql.SparkSession

/** CROSS-ARTIFACT atomic commit — one [[Versions]] pointer over a SET
  * of named artifact references (the Nessie / Iceberg-REST multi-table
  * transaction idea, reduced to the single primitive it needs: an
  * atomic swap of a tiny reference table).
  *
  * [[Versions]] makes ONE artifact's publish atomic; a deployment has
  * several that must stay mutually consistent — the table's stats
  * manifest, its DV set, the admission/search indexes built FROM that
  * table state. Publishing them independently leaves a window where a
  * reader resolves a new index against an old manifest (the index
  * names files the manifest doesn't, or vice versa). A catalog version
  * is a parquet table of (artifact, ref) rows — each ref an opaque
  * location the caller already published immutably (a `v<N>` dir, a
  * manifest dump, a DV dump) — so flipping the ONE catalog pointer
  * moves every artifact simultaneously: readers resolve the catalog
  * once and read a consistent world, writers prepare all artifacts
  * off to the side and commit with one rename.
  *
  * Scale: the catalog is O(#artifacts) rows — bytes. All data-scale
  * work stays in the artifacts themselves; time travel and vacuum are
  * inherited from [[Versions]] verbatim. Refs must point at IMMUTABLE
  * locations (the same contract Versions.publish documents): a caller
  * that re-publishes an artifact in place under a still-referenced ref
  * defeats the snapshot, exactly as overwriting a committed data file
  * would. */
object Catalog {

  /** Publish the next catalog version holding `refs` and flip the
    * pointer to it. Returns the new catalog version number. */
  def commit(spark: SparkSession, path: String,
      refs: Map[String, String]): Int = {
    require(refs.nonEmpty, "catalog commit needs at least one artifact")
    Versions.publish(path, dir => {
      import spark.implicits._
      refs.toSeq.sortBy(_._1).toDF("artifact", "ref")
        .coalesce(1).write.parquet(dir)
    })(spark)
  }

  /** The (artifact → ref) map at a pinned catalog version. */
  def resolve(spark: SparkSession, path: String,
      version: Int): Map[String, String] =
    spark.read.parquet(Versions.versionDir(path, version))
      .collect()
      .map(r => r.getAs[String]("artifact") -> r.getAs[String]("ref"))
      .toMap

  /** The map at the version the atomic pointer names right now. */
  def resolveCurrent(spark: SparkSession, path: String): Map[String, String] =
    resolve(spark, path, Versions.current(path)(spark))

  /** [[resolve]] for one artifact, failing loudly when the catalog
    * version doesn't carry it. */
  def ref(spark: SparkSession, path: String, version: Int,
      artifact: String): String = {
    val m = resolve(spark, path, version)
    m.getOrElse(artifact, throw new IllegalArgumentException(
      s"catalog $path v$version has no artifact '$artifact' " +
        s"(has: ${m.keys.toSeq.sorted.mkString(", ")})"))
  }
}
