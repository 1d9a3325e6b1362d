package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] served ENTIRELY from manifest rows — zero filesystem
  * calls at plan time. `spark.read.parquet(4000 explicit paths)` builds
  * an `InMemoryFileIndex`, which stats every path (a driver listing, or
  * a whole Spark job past the parallel-discovery threshold): the
  * round-18 soak measured ~7 s per scan CONSTRUCTION at 4000 files —
  * paid once at scan-prune registration and again for every
  * per-query snapshot read, dwarfing the 0.1 s the pruned query itself
  * costs. A lake table format never pays this: its manifests record
  * (path, size) at COMMIT time and scan planning trusts them
  * (Iceberg/Delta public model). The stats manifest now carries a
  * `bytes` column for exactly this reason; this index turns those rows
  * straight into the `FileStatus` list Spark's parquet scan needs.
  *
  * Sizes must be EXACT (the parquet footer is located from the file
  * length) — they come from `_metadata.file_size` of the build-time
  * scan, the same source of truth as the rest of the stats row. The
  * modification time is 0 and the block size synthetic: parquet split
  * planning uses only the length.
  *
  * Equality mirrors `InMemoryFileIndex`'s root-path-SET semantics so
  * relation matching (`ScanPruneRewrite`'s registration anchor) works
  * across independently-built scans of the same version, while a raw
  * directory listing or a pruned swap (both `InMemoryFileIndex`) never
  * compares equal — different class, preserved convergence anchor. */
final class ManifestFileIndex(
    spark: SparkSession,
    files: Seq[(String, Long)]) extends FileIndex {

  require(files.nonEmpty, "ManifestFileIndex needs at least one file")

  private val statuses: Seq[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
  }
  private val pathSet: Set[Path] = statuses.map(_.getPath).toSet

  override val rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(InternalRow.empty, statuses.toArray))

  override def inputFiles: Array[String] = files.map(_._1).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_._2).sum

  override def partitionSchema: StructType = StructType(Nil)

  override def equals(other: Any): Boolean = other match {
    case m: ManifestFileIndex => pathSet == m.pathSet
    case _ => false
  }

  override def hashCode(): Int = pathSet.hashCode()
}
