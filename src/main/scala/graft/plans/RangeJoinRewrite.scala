package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a pure range-band join into a bucketed
  * equi-join.
  *
  * A join whose only cross-side condition is a band — `lo <= p AND
  * p < hi` with the point `p` from one side and both bounds from the
  * other — has no equi-key, so Catalyst can only plan a broadcast
  * nested loop (or a cartesian product), both infeasible at 100 TB.
  * `ops.RangeJoin` exposes the scalable shape as a library call; this
  * rule gives the same plan to plain SQL (`FROM pts JOIN iv ON ts >=
  * lo AND ts < hi`) with no query rewrite:
  *
  *   - the interval side explodes each row into the fixed-width
  *     buckets `[floor(lo/w), floor(hi/w)]` it can overlap,
  *   - the point side computes its single bucket `floor(p/w)`,
  *   - the join gains the conjunct `p_bucket = iv_bucket` — an
  *     equi-key, so the planner picks a hash/sort-merge join — and
  *     keeps the ORIGINAL band predicate, so results are exact even
  *     though bucketing is done in (monotonic) double arithmetic,
  *   - a point owns exactly one bucket, so each qualifying pair meets
  *     exactly once: no duplicate elimination, no extra shuffle.
  *
  * Fires only when `spark.graft.rangeJoin.bucketWidth` (same unit as
  * the band columns; pick ≈ the typical interval length) is set
  * positive, the join is INNER, and no cross-side equi conjunct
  * already exists (if one does, the planner already has a shuffle
  * key and per-key duplication would only add cost). The added
  * bucket equality is itself an equi conjunct, which makes the rule
  * a fixed point after one application.
  *
  * Registered by `graft.GraftExtensions` (session build time) or
  * [[RangeJoinRewrite.install]] (live session).
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  val WidthConf = "spark.graft.rangeJoin.bucketWidth"

  /** One reading of a comparison conjunct: `point` strictly between /
    * beside `bound`; `lower` = the bound sits below the point. */
  private case class Band(point: Expression, bound: Expression, lower: Boolean)

  /** Both readings of a binary comparison (`a >= b` bounds `a` from
    * below AND bounds `b` from above). */
  private def readings(e: Expression): Seq[Band] = e match {
    case GreaterThanOrEqual(a, b) => Seq(Band(a, b, lower = true), Band(b, a, lower = false))
    case GreaterThan(a, b)        => Seq(Band(a, b, lower = true), Band(b, a, lower = false))
    case LessThanOrEqual(a, b)    => Seq(Band(a, b, lower = false), Band(b, a, lower = true))
    case LessThan(a, b)           => Seq(Band(a, b, lower = false), Band(b, a, lower = true))
    case _                        => Seq.empty
  }

  private def sideOf(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(l.outputSet)) Some(true)
    else if (refs.subsetOf(r.outputSet)) Some(false)
    else None
  }

  private def numeric(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  /** floor(e / w) as a LongType bucket id. Double arithmetic is exact
    * enough here because it only has to be MONOTONIC (the band filter
    * is re-applied verbatim): lo <= p <= hi ⇒ bucket(lo) <= bucket(p)
    * <= bucket(hi), so the point's bucket is always in the interval's
    * exploded range. */
  private def bucket(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  private def width: Option[Double] =
    scala.util.Try(conf.getConfString(WidthConf, "0").toDouble).toOption.filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = width match {
    case None => plan
    case Some(w) => plan transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
              yield sa != sb).getOrElse(false)
          case EqualNullSafe(a, b) =>
            (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
              yield sa != sb).getOrElse(false)
          case _ => false
        }
        if (hasEqui) j
        else {
          // all (conjunct-index, reading) pairs that put point and
          // bound on opposite sides with numeric types
          val cands = conjuncts.zipWithIndex.flatMap { case (c, i) =>
            readings(c).flatMap { b =>
              if (!numeric(b.point) || !numeric(b.bound) ||
                  !b.point.deterministic || !b.bound.deterministic) None
              else for {
                ps <- sideOf(b.point, left, right)
                bs <- sideOf(b.bound, left, right)
                if ps != bs
              } yield (i, ps, b)
            }
          }
          // a band = a lower and an upper reading of the SAME point
          // expression from two DIFFERENT conjuncts
          val band = (for {
            (i1, ps1, lo) <- cands if lo.lower
            (i2, ps2, hi) <- cands
            if !hi.lower && i1 != i2 && ps1 == ps2 &&
              lo.point.semanticEquals(hi.point)
          } yield (ps1, lo, hi)).headOption

          band match {
            case None => j
            case Some((pointOnLeft, lo, hi)) =>
              val (pointPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)
              // point side: append its single bucket id
              val pAlias = Alias(bucket(lo.point, w), "graft_p_bucket")()
              val pProj = Project(pointPlan.output :+ pAlias, pointPlan)
              // interval side: explode into every bucket the band's
              // bound range can overlap
              // timeZoneId must be pinned here: TimeZoneAwareExpression
              // is unresolved without it, and no analyzer rule runs
              // after the optimizer
              val seqExpr = Sequence(
                bucket(lo.bound, w), bucket(hi.bound, w),
                Some(Literal(1L)), Some(conf.sessionLocalTimeZone))
              val ivAttr = AttributeReference("graft_iv_bucket", LongType,
                nullable = false)()
              val ivGen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(ivAttr), child = ivPlan)
              val (newLeft, newRight) =
                if (pointOnLeft) (pProj, ivGen) else (ivGen, pProj)
              val newCond = And(EqualTo(pAlias.toAttribute, ivAttr), cond)
              // restore the original output (drop the bucket columns)
              Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
        }
    }
  }

  /** Add the rule to an already-built session (idempotent). New
    * sessions get it via `spark.sql.extensions=graft.GraftExtensions`. */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].experimental
    if (!exp.extraOptimizations.contains(this))
      exp.extraOptimizations = exp.extraOptimizations :+ this
  }
}
