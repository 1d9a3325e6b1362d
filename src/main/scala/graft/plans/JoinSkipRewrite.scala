package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** AUTOMATIC join-driven file skipping — [[ScanPruneRewrite]] extended
  * from literal filters to JOINS. For a registered fact scan appearing
  * on one side of an INNER equi-join whose key column the scan can skip
  * on (range stats or bloom), this rule evaluates the OTHER side's
  * distinct join keys driver-side (capped, cached) and injects the
  * lossless conjunct `fact.key IN (keys)` above the fact side. The
  * injected filter changes no rows — an inner join keeps exactly the
  * fact rows whose key appears on the dim side — and the existing
  * [[ScanPruneRewrite]] admission then turns it into file-level
  * skipping (plus free parquet row-group pushdown inside admitted
  * files). This is the no-API star-join contract: `SELECT ... FROM
  * graft_catalog_read(...) f JOIN dim d ON f.k = d.k WHERE d.selective`
  * opens only the fact files that can hold a matching key, with no
  * pruning verb in the query.
  *
  * == The driver-evaluation contract ==
  *
  * Collecting the dim side's keys requires RUNNING it — a real Spark
  * job during optimization, this library's documented driver-verb
  * posture (the `graft_commit` family does planner-side work at
  * analysis; EXPLAIN therefore also evaluates — same caveat). Three
  * guards keep it honest at scale:
  *
  *   - OPT-IN per fact scan ([[register]]), with a `maxKeys` cap: the
  *     evaluation runs `dim.select(key).distinct().limit(maxKeys + 1)`
  *     — if more than `maxKeys` keys come back the rewrite silently
  *     declines (a broad dim wouldn't prune anyway) and the result is
  *     cached, so an unselective dim costs its probe once;
  *   - a CACHE keyed by the dim side's canonicalized PLAN plus its
  *     concrete file listing (path/size/modTime — root-path-set
  *     relation equality alone would keep serving stale keys after a
  *     dim append) per registration: the optimizer reaches fixpoint
  *     by re-running its user batch, EXPLAIN and execution each
  *     optimize, and every pass after the first hits the cache (zero
  *     further jobs); the cache is a bounded LRU so ad-hoc dim
  *     filters in a long-lived session cannot leak driver memory;
  *   - a re-entrancy latch: evaluating the dim side optimizes THAT
  *     plan on this thread — the latch keeps the rule from firing
  *     inside its own evaluation.
  *
  * Idempotency (required under the user batch's fixpoint): the rule
  * declines when the fact side already carries an In/InSet conjunct on
  * the same key attribute — one injection per join, stable thereafter.
  * Scope: the fact side must be the bare registered scan under
  * attribute-only Projects/Filters (the shapes between the join and
  * the scan after standard pushdown); a DV anti-join above the scan
  * keeps the row-level benefit of the injected filter but blocks the
  * file swap — register the no-DV version for full skipping.
  * `spark.graft.joinSkip.enabled=false` is the kill switch.
  */
object JoinSkipRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val EnabledConf = "spark.graft.joinSkip.enabled"

  private case class JReg(scanName: String, keyCol: String, maxKeys: Int)

  private val registry = new ConcurrentHashMap[String, JReg]()

  /** Cache key for one dim probe. The CANONICALIZED plan itself (not
    * its 32-bit hash — a hash collision between two different dim
    * plans would silently serve the wrong key set), plus the dim's
    * concrete file listing: `HadoopFsRelation`/`InMemoryFileIndex`
    * equality compares only the root-path SET, so a fresh
    * `spark.read` of the same dim directory AFTER an append
    * canonicalizes equal to the stale one — without the
    * (path, size, modTime) signature the cached `InSet` would drop
    * fact rows matching the newly added dim keys and the rewrite
    * would no longer be lossless. */
  private case class DimKey(scanName: String, plan: LogicalPlan,
      files: Seq[(String, Long, Long)])

  /** Bounded LRU (access-order): every distinct dim plan caches up to
    * `maxKeys` values on the driver, so an unbounded map leaks in a
    * long-lived session running ad-hoc dim filters. 64 entries ×
    * default 100k keys bounds the worst case at planner scale. All
    * access goes through the map's own monitor. */
  private val MaxCacheEntries = 64
  private val keyCache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[DimKey, Option[Seq[Any]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[DimKey, Option[Seq[Any]]]): Boolean =
        size() > MaxCacheEntries
    })

  private val evaluating = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Opt a registered scan ([[ScanPruneRewrite.register]]) into
    * join-driven skipping on `keyCol`. The column must be one the scan
    * can actually skip on (manifest stats or a registered bloom) —
    * injecting a filter nothing downstream can use would be pure
    * overhead. */
  def register(spark: SparkSession, scanName: String, keyCol: String,
      maxKeys: Int = 100000): Unit = {
    require(maxKeys > 0, s"maxKeys must be positive, got $maxKeys")
    val (_, skippable) = ScanPruneRewrite.lookupRelation(scanName)
      .getOrElse(throw new IllegalArgumentException(
        s"no registered scan named '$scanName' — register the catalog " +
          "version with ScanPruneRewrite/graft_prune_register first"))
    require(skippable.contains(keyCol),
      s"'$keyCol' has neither manifest stats nor a bloom on scan " +
        s"'$scanName' (skippable: ${skippable.toSeq.sorted.mkString(", ")})")
    registry.put(scanName, JReg(scanName, keyCol, maxKeys))
    ScanPruneRewrite.install(spark) // file admission must be active too
    install(spark)
  }

  def unregister(name: String): Unit = {
    registry.remove(name)
    keyCache.synchronized {
      keyCache.keySet.asScala.filter(_.scanName == name).toSeq
        .foreach(keyCache.remove)
    }
  }

  def clear(): Unit = { registry.clear(); keyCache.clear() }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (registry.isEmpty || evaluating.get() ||
        !conf.getConfString(EnabledConf, "true").toBoolean) plan
    else plan transformUp {
      case j @ Join(_, _, Inner, Some(_), _) =>
        rewriteJoin(j).getOrElse(j)
    }
  }

  /** The registered scan leaf under attribute-only Projects/Filters —
    * the fact-side shapes standard pushdown leaves between a join and
    * its scan. Anything else (another join, an aggregate) refuses: the
    * injected conjunct must sit where ScanPruneRewrite can see it. */
  private def factLeaf(side: LogicalPlan,
      rel: org.apache.spark.sql.execution.datasources.HadoopFsRelation)
      : Option[org.apache.spark.sql.execution.datasources.LogicalRelation] =
    side match {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation
          if lr.relation == rel => Some(lr)
      case Project(ps, c) if ps.forall(_.isInstanceOf[AttributeReference]) =>
        factLeaf(c, rel)
      case Filter(_, c) => factLeaf(c, rel)
      case _ => None
    }

  /** True when the subtree scans ANY registered relation — such a side
    * is a fact table by definition, and evaluating it as the "dim"
    * would run a fact-sized distinct inside the optimizer. */
  private def containsRegistered(side: LogicalPlan): Boolean = {
    val rels = registry.keys.asScala
      .flatMap(ScanPruneRewrite.lookupRelation(_).map(_._1)).toSet
    side.exists {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            rels.contains(fs)
          case _ => false
        }
      case _ => false
    }
  }

  private def rewriteJoin(j: Join): Option[LogicalPlan] = {
    val regs = registry.values.asScala.toSeq
    regs.iterator.flatMap { r =>
      ScanPruneRewrite.lookupRelation(r.scanName).iterator.flatMap {
        case (rel, _) =>
          val leftLeaf = factLeaf(j.left, rel)
          val rightLeaf = factLeaf(j.right, rel)
          (leftLeaf, rightLeaf) match {
            // self-joins of the registered scan are ambiguous — decline
            case (Some(_), Some(_)) => None
            case (Some(lr), None) if !containsRegistered(j.right) =>
              tryInject(j, r, lr, factOnLeft = true)
            case (None, Some(lr)) if !containsRegistered(j.left) =>
              tryInject(j, r, lr, factOnLeft = false)
            case _ => None
          }
      }
    }.nextOption()
  }

  private def tryInject(j: Join, r: JReg,
      leaf: org.apache.spark.sql.execution.datasources.LogicalRelation,
      factOnLeft: Boolean): Option[LogicalPlan] = {
    val factSide = if (factOnLeft) j.left else j.right
    val dimSide = if (factOnLeft) j.right else j.left
    val scanIds = leaf.output.map(_.exprId).toSet
    val dimIds = dimSide.outputSet
    // the equi-conjunct fact.keyCol = dim.x (either orientation)
    val pair = splitConjunctivePredicates(j.condition.get).collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name == r.keyCol && scanIds.contains(a.exprId) &&
            dimIds.contains(b) => (a, b)
      case EqualTo(b: AttributeReference, a: AttributeReference)
          if a.name == r.keyCol && scanIds.contains(a.exprId) &&
            dimIds.contains(b) => (a, b)
    }
    pair.flatMap { case (factAttr, dimAttr) =>
      // idempotency under the fixpoint batch: one injection per key attr
      val already = factSide.collectFirst {
        case Filter(c, _) if c.exists {
          case InSet(x: AttributeReference, _) => x.exprId == factAttr.exprId
          case In(x: AttributeReference, _) => x.exprId == factAttr.exprId
          case _ => false
        } => ()
      }.nonEmpty
      if (already) None
      else dimKeys(r, dimAttr, dimSide) match {
        case Some(vs) if vs.nonEmpty =>
          // InSet (the already-optimized IN form — hash lookup per row,
          // translatable by both ScanPruneRewrite and the parquet
          // pushdown) over CATALYST values; injected directly above the
          // LEAF so the scan-prune match always sees Filter(scan),
          // whatever Projects/Filters sit between join and scan
          val toCat = org.apache.spark.sql.catalyst.CatalystTypeConverters
            .createToCatalystConverter(factAttr.dataType)
          val pred = InSet(factAttr, vs.map(toCat).toSet)
          val newFact = factSide transformUp {
            case l: org.apache.spark.sql.execution.datasources.LogicalRelation
                if l eq leaf => Filter(pred, l)
          }
          Some(if (factOnLeft) j.copy(left = newFact)
            else j.copy(right = newFact))
        // an EMPTY key set would prune everything, but a false-literal
        // filter has no idempotency anchor under the fixpoint batch —
        // decline (the join itself returns nothing either way)
        case _ => None
      }
    }
  }

  /** The (path, size, modTime) signature of every file-source leaf in
    * the dim plan — the part of the dim's identity that canonicalized
    * plan equality cannot see (root-path-set equality survives
    * appends and in-place overwrites of the same directory). */
  private def fileSignature(plan: LogicalPlan): Seq[(String, Long, Long)] =
    plan.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location match {
              case p: org.apache.spark.sql.execution.datasources.PartitioningAwareFileIndex =>
                p.allFiles().map(f =>
                  (f.getPath.toString, f.getLen, f.getModificationTime))
              case other =>
                other.inputFiles.toSeq.map((_, -1L, -1L))
            }
          case _ => Seq.empty
        }
    }.flatten.sortBy(_._1)

  /** The dim side's distinct non-null join keys, evaluated driver-side
    * under the latch and cached by (canonical plan, file listing);
    * None = over the cap (cached too — an unselective dim probes once,
    * ever, until its data changes). */
  private def dimKeys(r: JReg, dimAttr: AttributeReference,
      dimSide: LogicalPlan): Option[Seq[Any]] = {
    val proj = Project(Seq(dimAttr), dimSide)
    val cacheKey =
      DimKey(r.scanName, proj.canonicalized, fileSignature(dimSide))
    Option(keyCache.get(cacheKey)).getOrElse {
      val computed: Option[Seq[Any]] =
        try {
          evaluating.set(true)
          val spark = SparkSession.active
          val rows = org.apache.spark.sql.graftbridge.ColumnBridge
            .ofRows(spark, proj)
            .distinct().limit(r.maxKeys + 1).collect()
          if (rows.length > r.maxKeys) None
          else Some(rows.iterator.map(_.get(0)).filter(_ != null).toSeq)
        } finally evaluating.set(false)
      keyCache.put(cacheKey, computed)
      computed
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
