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

  /** [[commit]] keyed by a transaction id — the exactly-once flip a
    * streaming foreachBatch loop needs: Spark re-runs a failed batch
    * with the SAME batch id, and a plain commit in the retry would
    * publish the same world twice (splitting history and breaking
    * version ≡ batch-prefix reasoning). If any version still on disk
    * carries `txnId`, that version is returned and nothing is written;
    * otherwise this commits `refs` plus the reserved `_txn` artifact
    * row. The lookup reads O(#versions-retained) catalog tables —
    * bytes each, bounded by the retention policy.
    *
    * This makes the POINTER exactly-once; the artifact dirs a batch
    * writes must themselves be replay-safe (immutable per-batch version
    * dirs, or the s34 write-audit-publish staging pattern) — the same
    * division of labor Delta's txn-version store uses. */
  def commitIdempotent(spark: SparkSession, path: String, txnId: String,
      refs: Map[String, String]): Int = {
    require(!refs.contains("_txn"), "'_txn' is a reserved artifact name")
    implicit val s: SparkSession = spark
    Versions.listVersions(path).reverse
      .find(v => resolve(spark, path, v).get("_txn").contains(txnId))
      .getOrElse(commit(spark, path, refs + ("_txn" -> txnId)))
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

  /** CATALOG-AWARE garbage collection — the missing half of retention
    * when artifacts are referenced, not owned: vacuum the catalog to
    * its newest `keep` versions, then delete every child directory of
    * the caller-supplied `artifactRoots` that NO retained catalog
    * version references. Per-artifact [[Versions.vacuum]] can't do this
    * safely (an artifact version may be old by its own count yet still
    * referenced by a retained catalog version — e.g. a DV set that
    * didn't change for ten commits), so the reference set, not age, is
    * the liveness criterion.
    *
    * Scale: reads O(keep · #artifacts) catalog rows and lists the
    * roots' children — planner-scale metadata only. Deletes are
    * restricted to children of the given roots; anything referenced by
    * ANY retained version survives regardless of age. Returns the
    * deleted directories. The usual retention caveat applies verbatim
    * from [[Versions]]: a reader pinned to a vacuumed catalog version
    * loses — size `keep` to the deployment's longest reader. */
  def vacuumKeep(spark: SparkSession, path: String, keep: Int,
      artifactRoots: Seq[String]): Seq[String] = {
    implicit val s: SparkSession = spark
    Versions.vacuum(path, keep)
    def norm(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val referenced = Versions.listVersions(path)
      .flatMap(v => resolve(spark, path, v).values)
      .map(norm).toSet
    val conf = spark.sparkContext.hadoopConfiguration
    artifactRoots.flatMap { root =>
      val fs = graft.io.PathResolver.fsFor(root, conf)
      val rootPath = new org.apache.hadoop.fs.Path(root)
      if (!fs.exists(rootPath)) Seq.empty
      else fs.listStatus(rootPath).toSeq
        .filter(_.isDirectory)
        .map(_.getPath)
        .filterNot(p => referenced.contains(norm(p.toString)))
        .map { p => fs.delete(p, true); p.toString }
    }
  }

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
