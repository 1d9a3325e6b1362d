package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._

/** Runtime guards for the id/payload PRECONDITIONS the corpus
  * write-side ops document (unique non-null ids, non-null payloads;
  * scaladoc on [[CorpusOps.budgetedMix]], [[CorpusOps.shardShuffle]],
  * [[Multimodal.packIndex]] and their streaming folds): a violating
  * caller must fail LOUDLY instead of receiving silently
  * engine-dependent positions or token totals.
  *
  * Each guard is a ZERO-EXTRA-PASS column: it rides a window or
  * aggregate the op already computes, yields 0L while the contract
  * holds, and raises on the first violating row. Adding it to a column
  * the op's output consumes keeps Catalyst from pruning it away. Opt
  * out with `spark.graft.validate.ids=false` — the plans are then
  * identical to the unguarded ones (the conf is read at plan-build
  * time, so a bulk loader that has already validated ids pays nothing).
  */
private[ops] object Guards {

  def enabled(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.graft.validate.ids", "true").toBoolean

  /** 0L, or raise. The op's window orders by (hash(id), id) — equal
    * ids sort ADJACENT, so `lag(id) == id` witnesses every duplicate
    * without any extra shuffle; null ids and `extraViolation` (e.g. a
    * null payload length) are per-row checks. `wLag` must share the
    * op's window partitioning + ordering (frames may differ — Spark
    * folds same-partition/same-order functions into one WindowExec). */
  def laggedIdGuard(idCol: String, op: String, wLag: WindowSpec,
      extraViolation: Column = lit(false),
      extraMsg: String = ""): Column = {
    val dup = lag(col(idCol), 1).over(wLag) === col(idCol)
    val viol = col(idCol).isNull || dup || extraViolation
    when(viol, raise_error(concat(
      lit(s"$op: PRECONDITION violated — idCol must be unique and " +
        s"non-null$extraMsg; first violating id: "),
      coalesce(col(idCol).cast("string"), lit("NULL")))).cast("long"))
      .otherwise(lit(0L))
  }

  /** 0L, or raise — aggregate form for ops whose shuffle is a keyed
    * groupBy: within each group `count != count_distinct(id)` witnesses
    * both duplicate and null ids (count_distinct skips nulls), and a
    * null-token count witnesses null payloads the window sum would
    * silently skip. */
  def aggIdGuard(op: String, n: Column, nDistinct: Column,
      nNullTokens: Column): Column =
    when(n =!= nDistinct,
      raise_error(lit(s"$op: PRECONDITION violated — idCol must be " +
        "unique and non-null within each source")).cast("long"))
      .when(nNullTokens > 0,
        raise_error(lit(s"$op: PRECONDITION violated — text/payload " +
          "must be non-null (a null token count silently skews every " +
          "later row's position)")).cast("long"))
      .otherwise(lit(0L))
}
