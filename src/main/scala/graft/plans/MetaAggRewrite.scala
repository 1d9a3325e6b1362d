package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.{coalesce, lit, max => smax, min => smin, sum => ssum}

/** METADATA-ONLY aggregate answering — the global (un-grouped)
  * `count(*) / min / max / count(col)` panel over a manifest-pinned
  * snapshot, answered from the stats manifest's per-file
  * `(n_rows, min_c, max_c, nulls_c)` rows with ZERO data-file I/O
  * (Spark's own OptimizeMetadataOnlyQuery answers from partition
  * VALUES; lake formats answer from file STATS — this is the latter,
  * over the manifest this engine already maintains).
  *
  * These four aggregates are exactly derivable for an APPEND-ONLY
  * version: files are immutable and the manifest's stats were computed
  * from precisely the files the registered snapshot reads, so
  * `count(*) = Σ n_rows`, `min(c) = min(min_c)`, `max(c) = max(max_c)`,
  * `count(c) = Σ n_rows − Σ nulls_c`. A version carrying a deletion
  * vector is REFUSED at registration (a DV'd row may have been a
  * file's min — merge-on-read tables take the [[MvRewrite]] route via
  * their maintained views instead). At 100 TB this turns the
  * "how many rows / what's the time range" introspection every
  * pipeline run issues from a full scan into an O(#files)-row read.
  *
  * Matching is [[MvRewrite]]'s canonical plan equivalence: the
  * aggregate must be global (no grouping), DISTINCT/FILTER-free, over
  * a child `sameResult` with the registered snapshot pruned to a
  * SUBSET of the registered stats columns (one stored shape per
  * subset, so `SELECT count(*)`, `SELECT min(ts), max(ts)` and the
  * full panel all match). Anything else — expressions over
  * non-stats columns, sums, averages — is left alone.
  */
object MetaAggRewrite extends Rule[LogicalPlan] {

  val EnabledConf = "spark.graft.metaAgg.enabled"

  private case class Reg(name: String, manifestDir: String,
      statsCols: Seq[String], shapes: Seq[(Set[String], LogicalPlan)])

  private val registry = new ConcurrentHashMap[String, Reg]()

  /** Register `manifestDir`'s stats rows as answering global aggregates
    * over `base` — which must be the snapshot read pinned to EXACTLY
    * that manifest ([[registerFromCatalog]] is the safe path). */
  def register(spark: SparkSession, name: String, base: DataFrame,
      statsCols: Seq[String], manifestDir: String): Unit = {
    require(statsCols.nonEmpty && statsCols.size <= 4,
      s"statsCols must be 1..4 columns, got ${statsCols.size}")
    val shapes = statsCols.toSet.subsets().map { sub =>
      // subset shapes in base-schema order — the order column pruning
      // leaves the Aggregate's child in
      val cols = base.columns.filter(sub.contains).toSeq
      sub -> base.select(cols.map(org.apache.spark.sql.functions.col): _*)
        .queryExecution.optimizedPlan
    }.toSeq
    registry.put(name, Reg(name, manifestDir, statsCols, shapes))
    install(spark)
  }

  /** [[register]] from a catalog version. Refuses a version carrying a
    * `dv` artifact with any rows: deletion vectors invalidate per-file
    * stats as global answers. Returns the version registered. */
  def registerFromCatalog(spark: SparkSession, name: String,
      dataDir: String, catalogPath: String, statsCols: Seq[String],
      version: Option[Int] = None): Int = {
    implicit val s: SparkSession = spark
    val v = version.getOrElse(graft.ops.Versions.current(catalogPath))
    val refs = graft.ops.Catalog.resolve(spark, catalogPath, v)
    refs.get("dv").foreach { dvDir =>
      val dvRows = spark.read.parquet(dvDir).limit(1).count()
      require(dvRows == 0, s"catalog $catalogPath v$v carries a non-empty " +
        "deletion vector — per-file stats cannot answer global aggregates " +
        "over a merge-on-read version; use MvRewrite's maintained view")
    }
    val mDir = graft.ops.Catalog.ref(spark, catalogPath, v, "manifest")
    val base = graft.ops.Layout.snapshotRead(spark, dataDir,
      spark.read.parquet(mDir))
    register(spark, name, base, statsCols, mDir)
    v
  }

  def unregister(name: String): Unit = registry.remove(name)

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty ||
        !conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan transformUp {
      case a: Aggregate if a.groupingExpressions.isEmpty =>
        rewrite(a).getOrElse(a)
    }
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = for {
    (reg, cols) <- registry.values.asScala.flatMap { r =>
      r.shapes.collectFirst {
        case (sub, shape) if a.child.sameResult(shape) => (r, sub)
      }
    }.headOption
    out <- substitute(a, reg, cols)
  } yield out

  /** The manifest-side column computing one original aggregate. */
  private def manifestCol(fn: AggregateFunction,
      cols: Set[String]): Option[Column] = {
    def colNameOf(e: Expression): Option[String] = e match {
      case attr: AttributeReference if cols.contains(attr.name) =>
        Some(attr.name)
      case _ => None
    }
    import org.apache.spark.sql.functions.col
    fn match {
      case c: Count if c.children.forall(ch =>
          ch.foldable && ch.eval() != null) =>
        Some(coalesce(ssum(col("n_rows")), lit(0L)))
      case c: Count if c.children.size == 1 =>
        colNameOf(c.children.head).map(n =>
          coalesce(ssum(col("n_rows")) - ssum(col(s"nulls_$n")), lit(0L)))
      case m: Min => colNameOf(m.child).map(n => smin(col(s"min_$n")))
      case m: Max => colNameOf(m.child).map(n => smax(col(s"max_$n")))
      case _ => None
    }
  }

  private def substitute(a: Aggregate, reg: Reg,
      cols: Set[String]): Option[LogicalPlan] = {
    val mapped: Option[Seq[(NamedExpression, Column)]] =
      a.aggregateExpressions.foldLeft(
          Option(Vector.empty[(NamedExpression, Column)])) { (acc, ne) =>
        acc.flatMap { v =>
          ne match {
            case al: Alias => al.child match {
              case ae: AggregateExpression
                  if !ae.isDistinct && ae.filter.isEmpty =>
                manifestCol(ae.aggregateFunction, cols).map(c => v :+ (al, c))
              case _ => None
            }
            case _ => None
          }
        }
      }
    mapped.filter(_.nonEmpty).map { pairs =>
      // ONE manifest-side aggregate computing every requested panel
      // column, then a Project restoring the original names/exprIds
      val inner = SparkSession.active.read.parquet(reg.manifestDir)
        .agg(pairs.head._2.as("graft_ma_0"),
          pairs.tail.zipWithIndex.map { case ((_, c), i) =>
            c.as(s"graft_ma_${i + 1}") }: _*)
      val innerPlan = inner.queryExecution.analyzed
      val proj = pairs.zip(innerPlan.output).map { case ((orig, _), attr) =>
        val e: Expression =
          if (attr.dataType == orig.dataType) attr
          else Cast(attr, orig.dataType)
        val e2 = if (!orig.toAttribute.nullable && attr.nullable)
          KnownNotNull(e) else e
        Alias(e2, orig.name)(exprId = orig.exprId,
          qualifier = orig.qualifier)
      }
      Project(proj, innerPlan)
    }
  }

  /** Add the rule to an already-built session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
