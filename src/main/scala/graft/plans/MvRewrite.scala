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
  * The IVM family keeps per-group `(keys..., n, total, min_v, max_v)`
  * states current at O(delta) per batch ([[graft.ops.Merge.aggView]]
  * defines the state — single or compound group key — `incrementalAgg`
  * / `refreshHybridView` / the s43 streaming loop maintain it, and
  * `Catalog` commits it consistently with the (manifest, DV) version
  * it summarizes). This rule closes the loop: a query that
  * re-aggregates the base table anyway is answered from the
  * O(#groups) view with ZERO base I/O. Two query shapes rewrite:
  *
  *   - GROUPED: `base.groupBy(keys).agg(count/sum/min/max/avg)` with
  *     the grouping attribute set equal to the view's key set (any
  *     order) → a Project over the view rows;
  *   - GLOBAL: `base.agg(...)` with no grouping → ONE aggregate over
  *     the O(#groups) view rows (`count(*) = Σn`, `min = min(min_v)`,
  *     `sum = Σtotal`, `avg = Σtotal ÷ Σn`) — the rollup-of-a-rollup,
  *     exact because the panel's aggregates are all decomposable.
  *
  * Matching is CacheManager-style plan equivalence, not name equality:
  * the aggregate's child must be `sameResult` with the registered base
  * definition (canonicalized comparison, so exprIds / column order
  * don't matter, and explicit-file-list scans compare by file SET).
  * Because a registered base pins an exact (manifest, DV) version, a
  * query over a DIFFERENT version — or over the raw directory
  * listing — never matches: staleness is structurally impossible
  * rather than policed. Stored shapes cover every column-pruned
  * projection a matching query can present (keys+value, keys-only for
  * count-only queries, value-only and empty for global panels) and,
  * for grouped queries, the `isnotnull(key-subset)` variants an
  * enclosing join on the view key pushes through the Aggregate.
  *
  * The rewrite is EXACT-ONLY, never approximate:
  *   - count(constant) → `n`; min/max(value) → `min_v`/`max_v` — exact
  *     for every type;
  *   - sum(value) / avg(value) fold ONLY when the value column is
  *     integral or decimal (floating-point sums depend on accumulation
  *     order, so a stored double total may differ from a re-scan in
  *     the last ulp — those queries are left alone);
  *   - DISTINCT / FILTER-clause aggregates, expressions the view never
  *     folded, grouping sets other than the exact key set: no rewrite.
  * Output attributes keep the original exprIds (and non-null view
  * columns are re-marked via [[KnownNotNull]]) so the surrounding plan
  * is untouched.
  *
  * Registered by `graft.GraftExtensions` for new sessions, or
  * [[MvRewrite.install]] on a live one; fires only while the registry
  * is non-empty, and `spark.graft.mvRewrite.enabled=false` is the kill
  * switch.
  */
object MvRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.mvRewrite.enabled"

  /** One registered view. `grouped` pairs each stored shape with the
    * key subset whose `isnotnull` filter it folded in (empty = plain);
    * `global` holds the value-only / empty projections a global panel
    * prunes to. */
  private case class Mv(name: String, keyCols: Seq[String],
      valueCol: String, valueType: DataType, viewDir: String,
      grouped: Seq[(Set[String], LogicalPlan)],
      global: Seq[LogicalPlan])

  private val registry = new ConcurrentHashMap[String, Mv]()

  /** Register `viewDir` (a persisted [[graft.ops.Merge.aggView]] /
    * `refreshHybridView` state: keys..., n, total, min_v, max_v) as
    * answering aggregates whose child plan is equivalent to `base`
    * pruned to the key/value columns. `base` must be the EXACT reader
    * definition the view summarizes — for a lake table, the pinned
    * (manifest, DV) snapshot read; see [[registerFromCatalog]]. */
  def register(spark: SparkSession, name: String, base: DataFrame,
      keyCol: String, valueCol: String, viewDir: String): Unit =
    registerKeys(spark, name, base, Seq(keyCol), valueCol, viewDir)

  /** Multi-key [[register]]. */
  def registerKeys(spark: SparkSession, name: String, base: DataFrame,
      keyCols: Seq[String], valueCol: String, viewDir: String): Unit = {
    require(keyCols.nonEmpty && keyCols.size <= 3,
      s"keyCols must be 1..3 columns, got ${keyCols.size}")
    val valueType = base.schema(valueCol).dataType
    import org.apache.spark.sql.functions.col
    // store the optimized shapes: the rule runs in the optimizer, where
    // an Aggregate's child has already been column-pruned — projections
    // follow the BASE's column order, which is the order pruning leaves
    def prune(b: DataFrame, wanted: Set[String]): LogicalPlan =
      b.select(base.columns.filter(wanted.contains).map(col).toSeq: _*)
        .queryExecution.optimizedPlan
    val grouped = keyCols.toSet.subsets().flatMap { nn =>
      val b = if (nn.isEmpty) base
        else base.filter(nn.map(col(_).isNotNull).reduce(_ && _))
      Seq(nn -> prune(b, keyCols.toSet + valueCol),
        nn -> prune(b, keyCols.toSet))
    }.toSeq
    val global = Seq(prune(base, Set(valueCol)), prune(base, Set.empty))
    registry.put(name, Mv(name, keyCols, valueCol, valueType, viewDir,
      grouped, global))
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
      prep: DataFrame => DataFrame = identity): Int =
    registerFromCatalogKeys(spark, name, dataDir, catalogPath,
      Seq(keyCol), valueCol, version, prep)

  /** Multi-key [[registerFromCatalog]]. */
  def registerFromCatalogKeys(spark: SparkSession, name: String,
      dataDir: String, catalogPath: String, keyCols: Seq[String],
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
    registerKeys(spark, name, prep(snap), keyCols, valueCol,
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

  private def rewrite(a: Aggregate): Option[LogicalPlan] =
    a.groupingExpressions match {
      case Seq() =>
        registry.values.asScala
          .find(m => m.global.exists(a.child.sameResult))
          .flatMap(substituteGlobal(a, _))
      case gs if gs.forall(_.isInstanceOf[AttributeReference]) =>
        val attrs = gs.map(_.asInstanceOf[AttributeReference])
        val names = attrs.map(_.name)
        if (names.distinct.size != names.size) None
        else {
          // an `isnotnull(key)` constraint an enclosing join infers
          // commutes with the groupBy: match the variant shape and
          // re-filter the view on the same keys
          val hit = registry.values.asScala.flatMap { m =>
            if (m.keyCols.toSet != names.toSet) None
            else m.grouped.collectFirst {
              case (nn, shape) if a.child.sameResult(shape) => (m, nn)
            }
          }.headOption
          hit.flatMap { case (m, nn) => substituteGrouped(a, attrs, m, nn) }
        }
      case _ => None
    }

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

  private def cast(e: Expression, t: DataType): Expression =
    if (e.dataType == t) e else Cast(e, t)

  private def freshViewPlan(mv: Mv): LogicalPlan =
    // a FRESH view relation per rewrite: two rewrites in one query must
    // not share attribute ids
    SparkSession.active.read.parquet(mv.viewDir).queryExecution.analyzed

  // ---- grouped: Project over the view rows ---------------------------

  private def substituteGrouped(a: Aggregate,
      gAttrs: Seq[AttributeReference], mv: Mv,
      keyNotNull: Set[String]): Option[LogicalPlan] = {
    val valueAttr = a.child.output.find(_.name == mv.valueCol)
    def isValue(e: Expression): Boolean =
      valueAttr.exists(v => stripCast(e).semanticEquals(v))
    def isBareValue(e: Expression): Boolean =
      valueAttr.exists(e.semanticEquals)
    val viewPlan = freshViewPlan(mv)
    def viewCol(name: String): Option[Attribute] =
      viewPlan.output.find(_.name == name)
    for {
      vN <- viewCol("n")
      vTotal <- viewCol("total")
      vMin <- viewCol("min_v")
      vMax <- viewCol("max_v")
      vKeys <- traverseOpt(gAttrs)(g => viewCol(g.name)
        .filter(_.dataType == g.dataType).map(g -> _))
      mapped <- traverseOpt(a.aggregateExpressions) { ne =>
        mapGroupedExpr(ne, vKeys.toMap, isValue, isBareValue, mv.valueType,
          KnownNotNull(vN), vTotal, vMin, vMax)
      }
    } yield {
      val filtered =
        if (keyNotNull.isEmpty) viewPlan
        else Filter(vKeys.collect {
          case (g, vk) if keyNotNull.contains(g.name) =>
            IsNotNull(vk): Expression
        }.reduce(And), viewPlan)
      Project(mapped, filtered)
    }
  }

  private def traverseOpt[A, B](xs: Seq[A])(f: A => Option[B]): Option[Seq[B]] =
    xs.foldLeft(Option(Vector.empty[B])) { (acc, x) =>
      acc.flatMap(v => f(x).map(v :+ _))
    }

  /** Map one output expression of the grouped Aggregate onto the view's
    * columns, preserving the exprId (and hence the enclosing plan). */
  private def mapGroupedExpr(ne: NamedExpression,
      vKeys: Map[AttributeReference, Attribute],
      isValue: Expression => Boolean, isBareValue: Expression => Boolean,
      valueType: DataType, vN: Expression, vTotal: Attribute,
      vMin: Attribute, vMax: Attribute): Option[NamedExpression] = {

    def keyFor(attr: AttributeReference): Option[Expression] =
      vKeys.collectFirst { case (g, vk) if attr.semanticEquals(g) =>
        // the view carries no row for an empty group, so `n` is never
        // null/0 — re-mark what parquet round-tripping made nullable;
        // the KEY keeps the base attribute's nullability (a null-key
        // group is a real view row)
        if (g.nullable) vk else KnownNotNull(vk)
      }

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

    // GENERAL expression recursion: the optimizer collapses post-agg
    // Projects into the Aggregate's output list, so an output column
    // can be any deterministic expression over grouping keys, folded
    // aggregates and literals (e.g. `concat(day, src)`, `lit('all')`,
    // `sum(v).cast(double) / 100`). Leaves must map; interior nodes
    // rebuild over the mapped children.
    def expr(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        aggFn(ae.aggregateFunction, ae.dataType)
      case attr: AttributeReference => keyFor(attr)
      case l: Literal => Some(l)
      case other if other.deterministic =>
        traverseOpt(other.children)(expr).map(other.withNewChildren)
      case _ => None
    }

    ne match {
      case attr: AttributeReference =>
        keyFor(attr).map(k => Alias(cast(k, attr.dataType), attr.name)(
          exprId = attr.exprId, qualifier = attr.qualifier))
      case al: Alias =>
        expr(al.child).map(m => Alias(cast(m, al.dataType), al.name)(
          exprId = al.exprId, qualifier = al.qualifier))
      case _ => None
    }
  }

  // ---- global: ONE aggregate over the O(#groups) view rows -----------

  private def substituteGlobal(a: Aggregate, mv: Mv): Option[LogicalPlan] = {
    val valueAttr = a.child.output.find(_.name == mv.valueCol)
    def isValue(e: Expression): Boolean =
      valueAttr.exists(v => stripCast(e).semanticEquals(v))
    def isBareValue(e: Expression): Boolean =
      valueAttr.exists(e.semanticEquals)
    import org.apache.spark.sql.functions.{coalesce, col, lit,
      max => smax, min => smin, sum => ssum}

    // every panel aggregate is decomposable over the per-group state;
    // count(col) is NOT (the view's n counts null-value rows too)
    def rollup(fn: AggregateFunction): Option[org.apache.spark.sql.Column] =
      fn match {
        case c: Count if c.children.forall(ch =>
            ch.foldable && ch.eval() != null) =>
          Some(coalesce(ssum(col("n")), lit(0L)))
        case s: Sum if isValue(s.child) && exactlySummable(mv.valueType) &&
            exactlySummable(stripCast(s.child).dataType) =>
          Some(ssum(col("total")))
        case m: Min if isBareValue(m.child) => Some(smin(col("min_v")))
        case m: Max if isBareValue(m.child) => Some(smax(col("max_v")))
        case av: Average if isValue(av.child) &&
            av.dataType == DoubleType && isIntegral(mv.valueType) =>
          Some(ssum(col("total")).cast("double") /
            ssum(col("n")).cast("double"))
        case _ => None
      }

    // every AggregateExpression in the output list must roll up; the
    // SURROUNDING expression tree (casts, arithmetic, literals the
    // optimizer collapsed in) rebuilds over references to the inner
    // panel aggregate — one aggregate over the O(#groups) view rows
    val aggNodes: Seq[AggregateExpression] =
      a.aggregateExpressions.flatMap(_.collect {
        case ae: AggregateExpression => ae
      })
    if (aggNodes.isEmpty ||
        aggNodes.exists(ae => ae.isDistinct || ae.filter.nonEmpty) ||
        a.aggregateExpressions.exists(!_.deterministic)) None
    else {
      val rollups = traverseOpt(aggNodes)(ae =>
        rollup(ae.aggregateFunction))
      rollups.map { cols =>
        val inner = SparkSession.active.read.parquet(mv.viewDir)
          .agg(cols.head.as("graft_mv_0"),
            cols.tail.zipWithIndex.map { case (c, i) =>
              c.as(s"graft_mv_${i + 1}") }: _*)
        val innerPlan = inner.queryExecution.analyzed
        // AggregateExpressions carry unique resultIds, so instance →
        // attribute association survives duplicates
        val byNode = new java.util.IdentityHashMap[AggregateExpression,
          Attribute]()
        aggNodes.zip(innerPlan.output).foreach { case (ae, attr) =>
          byNode.put(ae, attr)
        }
        val proj = a.aggregateExpressions.map { ne =>
          val rebuilt = ne match {
            case al: Alias => al.child.transformUp {
              case ae: AggregateExpression if byNode.containsKey(ae) =>
                cast(byNode.get(ae), ae.dataType)
            }
            case other => other.transformUp {
              case ae: AggregateExpression if byNode.containsKey(ae) =>
                cast(byNode.get(ae), ae.dataType)
            }
          }
          val e2 = if (!ne.toAttribute.nullable && rebuilt.nullable)
            KnownNotNull(rebuilt) else rebuilt
          Alias(cast(e2, ne.dataType), ne.name)(exprId = ne.exprId,
            qualifier = ne.qualifier)
        }
        Project(proj, innerPlan)
      }
    }
  }

  /** Add the rule to an already-built session (idempotent). These run
    * in the final "User Provided Optimizers" batch — after column
    * pruning, which is exactly the shape [[registerKeys]] stored. New
    * sessions get the rule via `spark.sql.extensions=graft.GraftExtensions`. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
