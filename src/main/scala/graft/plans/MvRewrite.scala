package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** MATERIALIZED-VIEW query rewrite — route an aggregate over a lake
  * table version to the incrementally-maintained view instead of the
  * base scan (the Calcite / Snowflake / BigQuery MV-rewrite idea,
  * reduced to the one view shape this engine maintains).
  *
  * The IVM family keeps per-group `(key, n, total, min_v, max_v)`
  * states current at O(delta) per batch ([[graft.ops.Merge.aggView]]
  * defines the state, `incrementalAgg` / `refreshHybridView` / the s43
  * streaming loop maintain it, `Catalog` commits it consistently with
  * the (manifest, DV) version it summarizes). This rule closes the
  * loop: a query that re-aggregates the base table anyway —
  * `base.groupBy(key).agg(count/sum/min/max/avg)` — is answered from
  * the O(#groups) view with ZERO base I/O. At 100 TB that is the
  * difference between a dashboard refresh reading kilobytes and one
  * re-scanning the table.
  *
  * Matching is CacheManager-style plan equivalence, not name equality:
  * the aggregate's child must be `sameResult` with the registered base
  * definition (canonicalized comparison, so exprIds / column order
  * don't matter, and explicit-file-list scans compare by file SET).
  * Because a registered base pins an exact (manifest, DV) version, a
  * query over a DIFFERENT version — or over the raw directory listing —
  * never matches: staleness is structurally impossible rather than
  * policed. Both optimized column-pruned shapes of the base are stored
  * (`key+value`, `key` only) so count-only queries match too.
  *
  * The rewrite is EXACT-ONLY, never approximate:
  *   - count(constant) → `n`; min/max(value) → `min_v`/`max_v` — exact
  *     for every type;
  *   - sum(value) / avg(value) → `total` / `total ÷ n` ONLY when the
  *     value column is integral or decimal (floating-point sums depend
  *     on accumulation order, so a stored double total may differ from
  *     a re-scan in the last ulp — those queries are left alone);
  *   - DISTINCT / FILTER-clause aggregates, expressions the view never
  *     folded, multi-key groupings: no rewrite.
  * Output attributes keep the original exprIds (and non-null view
  * columns are re-marked via [[KnownNotNull]]) so the surrounding plan
  * is untouched.
  *
  * Registered by `graft.GraftExtensions` for new sessions, or
  * [[MvRewrite.install]] on a live one; fires only while the registry
  * is non-empty, and `spark.graft.mvRewrite.enabled=false` is the kill
  * switch.
  */
object MvRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.mvRewrite.enabled"

  /** One registered view: the optimized column-pruned shapes of the
    * base definition to match against — plain, and with an
    * `isnotnull(key)` filter folded in (the constraint an enclosing
    * join on the aggregate's key pushes through the Aggregate and deep
    * into the scan; letting the SAME optimizer produce the stored
    * shape keeps matching exact) — and where the state rows live. */
  private case class Mv(name: String, keyCol: String, valueCol: String,
      valueType: DataType, viewDir: String,
      plain: Seq[LogicalPlan], keyNotNull: Seq[LogicalPlan])

  private val registry = new ConcurrentHashMap[String, Mv]()

  /** Register `viewDir` (a persisted [[graft.ops.Merge.aggView]] /
    * `refreshHybridView` state: `keyCol`, n, total, min_v, max_v) as
    * answering aggregates whose child plan is equivalent to
    * `base.select(keyCol, valueCol)`. `base` must be the EXACT reader
    * definition the view summarizes — for a lake table, the pinned
    * (manifest, DV) snapshot read; see [[registerFromCatalog]]. */
  def register(spark: SparkSession, name: String, base: DataFrame,
      keyCol: String, valueCol: String, viewDir: String): Unit = {
    val valueType = base.schema(valueCol).dataType
    // store the optimized shapes: the rule runs in the optimizer, where
    // an Aggregate's child has already been column-pruned to exactly
    // these projections (count-only queries prune the value column too)
    import org.apache.spark.sql.functions.col
    def shapes(b: DataFrame): Seq[LogicalPlan] = Seq(
      b.select(keyCol, valueCol).queryExecution.optimizedPlan,
      b.select(keyCol).queryExecution.optimizedPlan)
    registry.put(name, Mv(name, keyCol, valueCol, valueType, viewDir,
      shapes(base), shapes(base.filter(col(keyCol).isNotNull))))
    install(spark)
  }

  /** [[register]] from a [[graft.ops.Catalog]] version — the production
    * path: one resolve pins (manifest, dv?, view) together, so the
    * registered base and the view are consistent BY CONSTRUCTION (the
    * catalog committed them under one pointer flip; the s41–s43
    * discipline). `prep` runs on the snapshot read before the key/value
    * projection, for views defined over a derived column (e.g. a
    * decimal cast of a double measure — required, since a double value
    * column would make sum/avg rewrites inexact and they would not
    * fire). Returns the catalog version registered. */
  def registerFromCatalog(spark: SparkSession, name: String,
      dataDir: String, catalogPath: String, keyCol: String,
      valueCol: String, version: Option[Int] = None,
      prep: DataFrame => DataFrame = identity): Int = {
    implicit val s: SparkSession = spark
    val v = version.getOrElse(graft.ops.Versions.current(catalogPath))
    val refs = graft.ops.Catalog.resolve(spark, catalogPath, v)
    val manifest = spark.read.parquet(
      graft.ops.Catalog.ref(spark, catalogPath, v, "manifest"))
    val snap = refs.get("dv") match {
      case Some(dv) => graft.ops.Layout.snapshotReadWithDeletes(
        spark, dataDir, manifest, spark.read.parquet(dv))
      case None => graft.ops.Layout.snapshotRead(spark, dataDir, manifest)
    }
    register(spark, name, prep(snap), keyCol, valueCol,
      graft.ops.Catalog.ref(spark, catalogPath, v, "view"))
    v
  }

  def unregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty ||
        !conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan transformUp {
      case a: Aggregate => rewrite(a).getOrElse(a)
    }
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = for {
    g <- a.groupingExpressions match {
      case Seq(attr: AttributeReference) => Some(attr)
      case _ => None
    }
    // an `isnotnull(key)` constraint an enclosing join infers commutes
    // with the groupBy: match the variant shape and re-filter the view
    (mv, keyNotNull) <- registry.values.asScala.collectFirst {
      case m if m.keyCol == g.name &&
          m.plain.exists(a.child.sameResult) => (m, false)
      case m if m.keyCol == g.name &&
          m.keyNotNull.exists(a.child.sameResult) => (m, true)
    }
    out <- substitute(a, g, mv, keyNotNull)
  } yield out

  /** Strip casts: `sum(cast(v as ...))` still folds from the view when
    * the stored total's type can cast to the query's (exact for the
    * integral/decimal types the rewrite admits). */
  @scala.annotation.tailrec
  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }

  private def isIntegral(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def exactlySummable(t: DataType): Boolean =
    isIntegral(t) || t.isInstanceOf[DecimalType]

  private def substitute(a: Aggregate, g: AttributeReference,
      mv: Mv, keyNotNull: Boolean): Option[LogicalPlan] = {
    val valueAttr = a.child.output.find(_.name == mv.valueCol)
    def isValue(e: Expression): Boolean =
      valueAttr.exists(v => stripCast(e).semanticEquals(v))
    def isBareValue(e: Expression): Boolean =
      valueAttr.exists(e.semanticEquals)
    // a FRESH view relation per rewrite: two rewrites in one query must
    // not share attribute ids
    val viewPlan = SparkSession.active.read.parquet(mv.viewDir)
      .queryExecution.analyzed
    def viewCol(name: String): Option[Attribute] =
      viewPlan.output.find(_.name == name)
    for {
      vKey <- viewCol(mv.keyCol)
      vN <- viewCol("n")
      vTotal <- viewCol("total")
      vMin <- viewCol("min_v")
      vMax <- viewCol("max_v")
      if vKey.dataType == g.dataType
      // the view carries no row for an empty group, so `n` is never
      // null/0 — re-mark what parquet round-tripping made nullable. The
      // KEY keeps the base attribute's nullability (a null-key group is
      // a real view row).
      keyExpr = if (g.nullable) vKey else KnownNotNull(vKey)
      mapped <- traverseOpt(a.aggregateExpressions) { ne =>
        mapNamed(ne, g, isValue, isBareValue, mv.valueType,
          keyExpr, KnownNotNull(vN), vTotal, vMin, vMax)
      }
    } yield Project(mapped,
      if (keyNotNull) Filter(IsNotNull(vKey), viewPlan) else viewPlan)
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] =
    xs.foldLeft(Option(Vector.empty[B])) { (acc, x) =>
      acc.flatMap(v => f(x).map(v :+ _))
    }

  /** Map one output expression of the Aggregate onto the view's
    * columns, preserving the exprId (and hence the enclosing plan). */
  private def mapNamed(ne: NamedExpression, g: AttributeReference,
      isValue: Expression => Boolean, isBareValue: Expression => Boolean,
      valueType: DataType,
      vKey: Expression, vN: Expression, vTotal: Attribute,
      vMin: Attribute, vMax: Attribute): Option[NamedExpression] = {

    def cast(e: Expression, t: DataType): Expression =
      if (e.dataType == t) e else Cast(e, t)

    // the aggregate functions the view folded; Cast wrappers inside the
    // agg list (`sum(x).cast("double")`) recurse through `expr`
    def aggFn(fn: AggregateFunction, resultType: DataType): Option[Expression] =
      fn match {
        case c: Count if c.children.forall(ch =>
            ch.foldable && ch.eval() != null) =>
          Some(cast(vN, resultType))
        case s: Sum if isValue(s.child) && exactlySummable(valueType) &&
            exactlySummable(stripCast(s.child).dataType) =>
          Some(cast(vTotal, resultType))
        case m: Min if isBareValue(m.child) =>
          Some(cast(vMin, resultType))
        case m: Max if isBareValue(m.child) =>
          Some(cast(vMax, resultType))
        case av: Average if isValue(av.child) && resultType == DoubleType &&
            isIntegral(valueType) =>
          // integral avg: Spark divides the (exactly-representable)
          // double sum by the count — same arithmetic, same result
          Some(Divide(Cast(vTotal, DoubleType), Cast(vN, DoubleType)))
        case _ => None
      }

    def expr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        aggFn(ae.aggregateFunction, ae.dataType)
      case c: Cast => expr(c.child).map(ch => cast(ch, c.dataType))
      case attr: AttributeReference if attr.semanticEquals(g) => Some(vKey)
      case _ => None
    }

    ne match {
      case attr: AttributeReference if attr.semanticEquals(g) =>
        Some(Alias(cast(vKey, attr.dataType), attr.name)(
          exprId = attr.exprId, qualifier = attr.qualifier))
      case al: Alias =>
        expr(al.child).map(m => Alias(cast(m, al.dataType), al.name)(
          exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
  }

  /** Add the rule to an already-built session (idempotent). These run
    * in the final "User Provided Optimizers" batch — after column
    * pruning, which is exactly the shape [[register]] stored. New
    * sessions get the rule via `spark.sql.extensions=graft.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
