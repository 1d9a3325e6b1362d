package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** SCHEMA EVOLUTION over immutable files — rename, drop, re-add and
  * widen columns WITHOUT rewriting a byte of data, via a column-mapping
  * artifact (the Delta column-mapping / Iceberg field-ID model,
  * re-expressed as first-class rows).
  *
  * The mapping table holds one row per column that ever existed:
  * (`logical` — the name queries see today, `physical` — the name
  * actually stored in parquet footers, `dtype` — the current read type,
  * `dropped` — tombstone). The indirection buys exactly the three
  * semantics a 100 TB table cannot afford to buy with rewrites:
  *
  *   - RENAME flips `logical` only; every existing file keeps serving
  *     under its unchanged `physical` name, and writers keep writing it
  *     ([[toPhysical]] translates on the way in).
  *   - DROP tombstones the row (reserving the physical name forever);
  *     a later ADD of the same logical name allocates a FRESH physical
  *     name, so old values can never resurrect into the new column —
  *     the correctness trap field-IDs exist to prevent (spec-pinned).
  *   - RETYPE (widening: int→long, float→double, decimal growth)
  *     changes only the read-side REQUESTED type; narrow values in old
  *     files widen losslessly at scan time while post-retype writers
  *     write the widened physical type. Only parquet-reader-widenable
  *     conversions are admitted — refused loudly at DDL time,
  *     because anything else would strand a mixed-epoch table
  *     unreadable.
  *
  * The artifact is O(#columns-ever) rows — planner-scale metadata
  * committed through [[Catalog]] like any other ([[evolveCommit]]
  * carries the current version's other artifacts forward, so the flip
  * is atomic: readers pinned to an old catalog version keep the OLD
  * schema against the same immutable files — schema time travel for
  * free). Reads reconcile epochs with one requested-schema scan: a
  * file written before an ADD simply lacks the physical column and
  * serves nulls, a file written before a RETYPE widens at scan time —
  * exactly Delta/Iceberg's contract.
  */
object SchemaEvolution {

  /** Catalog artifact name for the column-mapping table. */
  val Artifact = "colmap"

  /** One mapping row, driver-side. */
  final case class ColMapping(logical: String, physical: String,
      dtype: String, dropped: Boolean)

  private val mapSchema = StructType(Seq(
    StructField("ord", org.apache.spark.sql.types.IntegerType, false),
    StructField("logical", org.apache.spark.sql.types.StringType, false),
    StructField("physical", org.apache.spark.sql.types.StringType, false),
    StructField("dtype", org.apache.spark.sql.types.StringType, false),
    StructField("dropped", org.apache.spark.sql.types.BooleanType, false)))

  /** The mapping rows, driver-side (O(#columns-ever) — always tiny).
    * Ordered by the explicit `ord` column: column ORDER is part of the
    * logical schema, and parquet round-trips do not preserve row
    * order (a multi-file artifact reads back in listing order). */
  def mappings(map: DataFrame): Seq[ColMapping] =
    map.select("ord", "logical", "physical", "dtype", "dropped").collect()
      .sortBy(_.getInt(0))
      .map(r => ColMapping(r.getString(1), r.getString(2), r.getString(3),
        r.getBoolean(4))).toIndexedSeq

  private def toDf(spark: SparkSession, ms: Seq[ColMapping]): DataFrame = {
    val rows = new java.util.ArrayList[Row]()
    ms.zipWithIndex.foreach { case (m, i) =>
      rows.add(Row(i, m.logical, m.physical, m.dtype, m.dropped))
    }
    spark.createDataFrame(rows, mapSchema).coalesce(1)
  }

  /** Identity mapping for a table born with `schema` — every column's
    * physical name is its logical name. */
  def initial(spark: SparkSession, schema: StructType): DataFrame =
    toDf(spark, schema.fields.toIndexedSeq.map(f =>
      ColMapping(f.name, f.name, f.dataType.simpleString, dropped = false)))

  private def live(ms: Seq[ColMapping]): Seq[ColMapping] =
    ms.filter(!_.dropped)

  private def requireLive(ms: Seq[ColMapping], logical: String,
      verb: String): ColMapping =
    live(ms).find(_.logical == logical).getOrElse(
      throw new IllegalArgumentException(
        s"$verb: no live column '$logical' " +
          s"(live: ${live(ms).map(_.logical).mkString(", ")})"))

  /** RENAME `from` → `to` — metadata only; fails if `to` is live. */
  def rename(spark: SparkSession, map: DataFrame, from: String,
      to: String): DataFrame = {
    val ms = mappings(map)
    requireLive(ms, from, "rename")
    require(!live(ms).exists(_.logical == to),
      s"rename: '$to' already names a live column")
    toDf(spark, ms.map(m =>
      if (!m.dropped && m.logical == from) m.copy(logical = to) else m))
  }

  /** DROP `logical` — tombstones the row; its physical name stays
    * reserved so a later re-add can never resurrect old values. */
  def dropColumn(spark: SparkSession, map: DataFrame,
      logical: String): DataFrame = {
    val ms = mappings(map)
    requireLive(ms, logical, "drop")
    toDf(spark, ms.map(m =>
      if (!m.dropped && m.logical == logical) m.copy(dropped = true) else m))
  }

  /** ADD a column. The physical name is the logical name unless some
    * row (live or tombstoned) ever used it, in which case a fresh
    * `name__vK` is allocated — the no-resurrection guarantee. */
  def addColumn(spark: SparkSession, map: DataFrame, logical: String,
      dtype: String): DataFrame = {
    val ms = mappings(map)
    require(!live(ms).exists(_.logical == logical),
      s"add: '$logical' already names a live column")
    val used = ms.map(_.physical).toSet
    val physical =
      if (!used.contains(logical)) logical
      else Iterator.from(2).map(k => s"${logical}__v$k")
        .find(!used.contains(_)).get
    toDf(spark, ms :+ ColMapping(logical, physical, dtype, dropped = false))
  }

  /** The type promotions Spark 4's parquet readers perform when the
    * REQUESTED schema is wider than a file's physical type — the exact
    * set [[retype]] may use, because [[evolvedRead]] serves mixed-epoch
    * tables through one requested-schema scan (old files keep the
    * narrow physical type; post-retype writers write the widened one).
    * Decimal widening additionally requires the scale to not shrink
    * and the integer-digit room (precision − scale) to not shrink. */
  private val widenable: Map[String, Set[String]] = Map(
    "tinyint" -> Set("smallint", "int", "bigint", "double"),
    "smallint" -> Set("int", "bigint", "double"),
    "int" -> Set("bigint", "double"),
    "float" -> Set("double"))

  private def parse(dt: String): org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL(dt)

  private def widenOk(from: String, to: String): Boolean = {
    if (from == to) true
    else if (widenable.get(from).exists(_.contains(to))) true
    else (parse(from), parse(to)) match {
      case (f: org.apache.spark.sql.types.DecimalType,
            t: org.apache.spark.sql.types.DecimalType) =>
        t.scale >= f.scale &&
          t.precision - t.scale >= f.precision - f.scale
      case _ => false
    }
  }

  /** RETYPE (widen) `logical` to `dtype`. No file is rewritten: old
    * epochs keep the narrow physical type and later writers write the
    * widened one, so the conversion must be one the parquet reader can
    * perform at scan time under a requested schema ([[widenable]] +
    * decimal widening) — anything else would strand mixed-epoch tables
    * unreadable, and is refused here, loudly, at DDL time. */
  def retype(spark: SparkSession, map: DataFrame, logical: String,
      dtype: String): DataFrame = {
    val ms = mappings(map)
    val cur = requireLive(ms, logical, "retype")
    require(widenOk(cur.dtype, dtype),
      s"retype: ${cur.dtype} -> $dtype is not a parquet-widenable " +
        "conversion; old files would become unreadable next to " +
        "post-retype epochs (widenable: " +
        widenable.map { case (f, ts) => s"$f->{${ts.mkString(",")}}" }
          .mkString("; ") + "; decimal may grow scale/precision)")
    toDf(spark, ms.map(m =>
      if (!m.dropped && m.logical == logical) m.copy(dtype = dtype) else m))
  }

  /** Translate a LOGICAL-schema frame to physical names for writing —
    * the write-side half of the indirection. The frame must carry
    * exactly the live logical columns (loud otherwise: a silently
    * dropped or extra column is how mapping and data drift apart). */
  def toPhysical(df: DataFrame, map: DataFrame): DataFrame =
    toPhysical(df, map, Nil)

  /** [[toPhysical]] with `passthrough` columns carried verbatim — the
    * CDC shape: a change batch is the logical row plus bookkeeping
    * columns (`is_delete`, sequence numbers) that are not table
    * columns. Passthrough names must not collide with any physical
    * name (loud otherwise). */
  def toPhysical(df: DataFrame, map: DataFrame,
      passthrough: Seq[String]): DataFrame = {
    val lv = live(mappings(map))
    val have = df.columns.toSet
    val need = lv.map(_.logical).toSet ++ passthrough
    require(have == need,
      s"toPhysical: frame columns ${have.toSeq.sorted.mkString(",")} != " +
        s"live logical columns + passthrough ${need.toSeq.sorted.mkString(",")}")
    val collide = passthrough.toSet.intersect(lv.map(_.physical).toSet)
    require(collide.isEmpty,
      s"toPhysical: passthrough ${collide.mkString(",")} collides with a " +
        "physical column name")
    df.select(lv.map(m =>
      col(s"`${m.logical}`").cast(m.dtype).as(m.physical)) ++
      passthrough.map(c => col(s"`$c`")): _*)
  }

  /** The PHYSICAL name currently backing a live logical column — what a
    * merge/DV verb keyed by a logical column must address files with. */
  def physicalName(map: DataFrame, logical: String): String =
    requireLive(mappings(map), logical, "physicalName").physical

  /** The evolved snapshot read: ONE scan of the manifest's files under
    * an explicit REQUESTED physical schema (each live physical column
    * at its current dtype), optional DV subtraction, then the mapping
    * projection to logical names. The requested schema — not footer
    * merging — is what makes mixed epochs readable: a file written
    * before an ADD simply lacks the column and serves nulls, a file
    * written before a RETYPE holds the narrow physical type and the
    * parquet reader widens it at scan time (the conversions [[retype]]
    * admits), and tombstoned physical columns are never requested at
    * all. Footer merging (`mergeSchema`) cannot do this —
    * `StructType.merge` throws on int-vs-bigint the moment a
    * post-retype epoch lands next to a pre-retype one — and it reads
    * every footer twice; the requested schema is pure metadata.
    *
    * An empty manifest (a freshly created table, or one whose files
    * were all merged away) reads as an EMPTY frame with the mapped
    * logical schema — a valid table state, not an error. */
  def evolvedRead(spark: SparkSession, manifest: DataFrame,
      dv: Option[DataFrame], map: DataFrame): DataFrame = {
    val lv = live(mappings(map))
    val files = manifest.select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      return spark.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(lv.map(m =>
          StructField(m.logical, parse(m.dtype), nullable = true))))
    val requested = StructType(lv.map(m =>
      StructField(m.physical, parse(m.dtype), nullable = true)))
    val base = spark.read.schema(requested)
      .parquet(files.toIndexedSeq: _*)
    val withDv = dv.map(Layout.applyDv(base, _)).getOrElse(base)
    withDv.select(lv.map(m =>
      col(s"`${m.physical}`").cast(m.dtype).as(m.logical)): _*)
  }

  /** Commit an evolved mapping atomically: current version's artifacts
    * carried forward, `colmap` swapped. Returns the new version. */
  def evolveCommit(spark: SparkSession, catalogPath: String,
      artifactDir: String, newMap: DataFrame): Int = {
    val refs = Catalog.resolveCurrent(spark, catalogPath)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val dir = s"$artifactDir/colmap-$tag"
    newMap.write.parquet(dir)
    Catalog.commit(spark, catalogPath,
      refs - "_txn" + (Artifact -> dir))
  }

  /** [[evolvedRead]] pinned to a catalog version — the full read path:
    * schema (colmap), file set (manifest) and row tombstones (dv) all
    * come from one atomic version. */
  def evolvedCatalogRead(spark: SparkSession, catalogPath: String,
      version: Int): DataFrame = {
    val refs = Catalog.resolve(spark, catalogPath, version)
    val map = spark.read.parquet(refs.getOrElse(Artifact,
      throw new IllegalArgumentException(
        s"catalog $catalogPath v$version carries no '$Artifact' artifact")))
    evolvedRead(spark, spark.read.parquet(refs("manifest")),
      refs.get("dv").map(spark.read.parquet(_)), map)
  }
}
