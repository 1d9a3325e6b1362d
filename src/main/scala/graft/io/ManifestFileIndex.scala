package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, BoundReference, Expression, Predicate}
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
  * HIVE-PARTITIONED tables: when the manifest also recorded each
  * file's partition tuple (`part_<col>` columns, the Iceberg
  * manifest-entry model), pass `partSchema` + one values row per file.
  * [[listFiles]] then groups files by tuple and applies Spark's
  * partition filters against the recorded values (bound BY NAME to the
  * partition schema, the same evaluation
  * `PartitioningAwareFileIndex.prunePartitions` performs) — so
  * partition pruning works with zero directory listings and composes
  * with the manifest's min/max skipping upstream.
  *
  * Equality mirrors `InMemoryFileIndex`'s root-path-SET semantics so
  * relation matching (`ScanPruneRewrite`'s registration anchor) works
  * across independently-built scans of the same version, while a raw
  * directory listing or a pruned swap (both `InMemoryFileIndex`) never
  * compares equal — different class, preserved convergence anchor. */
final class ManifestFileIndex(
    spark: SparkSession,
    files: Seq[(String, Long)],
    partSchema: StructType = StructType(Nil),
    partValues: Seq[InternalRow] = Nil) extends FileIndex {

  require(files.nonEmpty, "ManifestFileIndex needs at least one file")
  require(partSchema.isEmpty == partValues.isEmpty &&
    (partValues.isEmpty || partValues.length == files.length),
    "partition values must align one-to-one with files")

  private val statuses: Seq[FileStatus] = files.map { case (p, len) =>
    new FileStatus(len, false, 1, 128L * 1024 * 1024, 0L, new Path(p))
  }
  private val pathSet: Set[Path] = statuses.map(_.getPath).toSet

  /** Files grouped by partition tuple (single all-files group when
    * unpartitioned) — computed once, reused by every listFiles call. */
  private val groups: Seq[(InternalRow, Array[FileStatus])] =
    if (partSchema.isEmpty) Seq(InternalRow.empty -> statuses.toArray)
    else partValues.zip(statuses)
      .groupBy(_._1)
      .map { case (row, fs) => row -> fs.map(_._2).toArray }
      .toSeq

  override val rootPaths: Seq[Path] = statuses.map(_.getPath)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partSchema.isEmpty || partitionFilters.isEmpty) groups
      else {
        // bind by NAME against the partition schema — filters arrive
        // with the relation's attribute ids, which this index never
        // sees (the PartitioningAwareFileIndex.prunePartitions model)
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
              val i = partSchema.indexWhere(_.name == a.name)
              require(i >= 0,
                s"partition filter names unknown column ${a.name}")
              BoundReference(i, partSchema(i).dataType, nullable = true)
          })
        groups.filter { case (row, _) => bound.eval(row) }
      }
    kept.map { case (row, fs) => PartitionDirectory(row, fs) }
  }

  override def inputFiles: Array[String] = files.map(_._1).toArray

  override def refresh(): Unit = ()

  override val sizeInBytes: Long = files.map(_._2).sum

  override def partitionSchema: StructType = partSchema

  override def equals(other: Any): Boolean = other match {
    case m: ManifestFileIndex => pathSet == m.pathSet
    case _ => false
  }

  override def hashCode(): Int = pathSet.hashCode()
}
