package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pure `StructType` utilities.
  *
  * Re-implements (from public behavior only) the four schema helpers the
  * reference pulls from `za.co.absa:spark-commons` — see
  * `/root/reference/datasetComparison/.../DatasetComparator.scala:24,74,152-154,168-170` —
  * plus metadata stripping (`DatasetComparator.scala:315-317`).
  *
  * Semantics (observed at the reference call sites):
  *  - equivalence is field-ORDER-insensitive, metadata-blind and
  *    nullability-blind, case-insensitive on names, recursive into
  *    structs / arrays / maps;
  *  - the "selector" is the canonical alphabetically-sorted projection,
  *    including nested struct fields, so two schema-equivalent DataFrames
  *    select into positionally identical shapes.
  */
object SchemaUtils {

  private def norm(name: String): String = name.toLowerCase

  /** StructType with all metadata removed, recursively. */
  def stripMetadata(schema: StructType): StructType =
    StructType(schema.map(f => StructField(f.name, stripMetadata(f.dataType), f.nullable)))

  private def stripMetadata(dt: DataType): DataType = dt match {
    case s: StructType     => stripMetadata(s)
    case ArrayType(et, n)  => ArrayType(stripMetadata(et), n)
    case MapType(k, v, n)  => MapType(stripMetadata(k), stripMetadata(v), n)
    case other             => other
  }

  /** Order-insensitive, metadata/nullability-blind, case-insensitive
    * structural equivalence. */
  def isEquivalent(a: StructType, b: StructType): Boolean =
    equivalent(a, b)

  private def equivalent(a: DataType, b: DataType): Boolean = (a, b) match {
    case (x: StructType, y: StructType) =>
      val xm = x.fields.map(f => norm(f.name) -> f).toMap
      val ym = y.fields.map(f => norm(f.name) -> f).toMap
      xm.keySet == ym.keySet && xm.forall { case (k, f) => equivalent(f.dataType, ym(k).dataType) }
    case (ArrayType(x, _), ArrayType(y, _)) => equivalent(x, y)
    case (MapType(xk, xv, _), MapType(yk, yv, _)) => equivalent(xk, yk) && equivalent(xv, yv)
    case (x, y) => x == y
  }

  /** Dotted paths of fields present in `a` but missing (or type-mismatched)
    * in `b`. Symmetric difference = diffSchema(a,b) ++ diffSchema(b,a). */
  def diffSchema(a: StructType, b: StructType, parent: String = ""): Seq[String] = {
    val bm = b.fields.map(f => norm(f.name) -> f).toMap
    a.fields.toSeq.flatMap { f =>
      val path = if (parent.isEmpty) f.name else s"$parent.${f.name}"
      bm.get(norm(f.name)) match {
        case None => Seq(path)
        case Some(g) => (f.dataType, g.dataType) match {
          case (x: StructType, y: StructType) => diffSchema(x, y, path)
          case (ArrayType(x: StructType, _), ArrayType(y: StructType, _)) =>
            diffSchema(x, y, path)
          case (x, y) if equivalent(x, y) => Nil
          case _ => Seq(path)
        }
      }
    }
  }

  /** Is every field of `sub` present in `sup` with an equivalent type? */
  def isSubset(sub: StructType, sup: StructType): Boolean = {
    val supm = sup.fields.map(f => norm(f.name) -> f).toMap
    sub.fields.forall { f =>
      supm.get(norm(f.name)).exists { g =>
        (f.dataType, g.dataType) match {
          case (x: StructType, y: StructType) => isSubset(x, y)
          case (ArrayType(x: StructType, _), ArrayType(y: StructType, _)) => isSubset(x, y)
          case (x, y) => equivalent(x, y)
        }
      }
    }
  }

  /** Canonical sorted projection: top-level fields alphabetically; struct
    * fields rebuilt with sorted children (recursively); arrays of structs
    * sorted inside via `transform`. Selecting this on two equivalent
    * DataFrames yields positionally identical schemas — the precondition
    * for `except` / full-row comparison.
    * Mirrors spark-commons `getDataFrameSelector` as used at
    * `DatasetComparator.scala:74-78`.
    *
    * With `canonicalizeMaps = true` every map column (at any depth) is
    * rewritten to its key-sorted entry list — `array<struct<key,value>>`
    * via `array_sort(map_entries(..))` — because Spark defines no
    * ordering/equality on maps: `except`, `<=>` and full-row joins all
    * reject raw map columns (the reference inherits the same restriction,
    * `DatasetComparator.scala:89-92`). The sorted entry list is a
    * deterministic orderable encoding of map equality (maps are equal iff
    * their entry sets are equal; keys are unique so the key-sorted list
    * is canonical), which makes map columns first-class in the diff
    * engine instead of an opaque Spark error. */
  def dataFrameSelector(schema: StructType, canonicalizeMaps: Boolean = false): List[Column] =
    schema.fields.sortBy(f => norm(f.name))
      .map(f => sortedColumn(col(quote(f.name)), f.dataType, canonicalizeMaps).as(f.name)).toList

  /** Backtick-quote a column name for Column/expr construction — THE
    * shared escaping helper (Flattener and the diff engine use it too;
    * one place to fix if the escaping rules ever change). */
  private[graft] def quote(name: String): String =
    "`" + name.replace("`", "``") + "`"

  private def sortedColumn(c: Column, dt: DataType, canonMaps: Boolean = false): Column = dt match {
    case s: StructType =>
      struct(s.fields.sortBy(f => norm(f.name))
        .map(f => sortedColumn(c.getField(f.name), f.dataType, canonMaps).as(f.name)).toSeq: _*)
    case ArrayType(et @ (_: StructType | _: ArrayType | _: MapType), _) =>
      transform(c, x => sortedColumn(x, et, canonMaps))
    case MapType(k, v, _) if canonMaps =>
      // array_sort's default struct ordering compares fields in order —
      // key first — and map keys are unique, so the result is total
      array_sort(transform(map_entries(c), e =>
        struct(sortedColumn(e.getField("key"), k, canonMaps).as("key"),
               sortedColumn(e.getField("value"), v, canonMaps).as("value"))))
    case _ => c
  }
}
