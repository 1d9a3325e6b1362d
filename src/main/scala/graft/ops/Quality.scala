package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rule evaluation — the validation pass a
  * table gets before it is trusted as pipeline input (the role
  * "expectations" frameworks play, rebuilt Spark-first).
  *
  * Every rule is a boolean `Column` predicate evaluated per row; ALL
  * rules fuse into ONE aggregate over ONE scan — at 100 TB the scan is
  * the cost, so a rule engine that runs one pass per rule is unusable
  * and this one is free beyond the first rule. A null predicate result
  * counts as a violation (null-hostile, like SQL `CHECK` semantics).
  */
object Quality {

  /** @return one row per rule: (rule, n_violations, n_rows, passed) */
  def checks(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    // rule names are spliced into a stack() SQL string — restrict to
    // identifier characters so no name can break out of the expression
    rules.foreach { case (name, _) =>
      require(name.matches("[A-Za-z0-9_]+"),
        s"rule name must be [A-Za-z0-9_]+, got '$name'")
    }
    require(rules.map(_._1).distinct.size == rules.size, "duplicate rule names")
    val aggs = rules.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"graft_$name")
    } :+ count(lit(1)).as("graft_n_rows")
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map(r => s"'${r._1}', `graft_${r._1}`").mkString(", ")
    row.select(
        expr(s"stack(${rules.size}, $stacked) AS (rule, n_violations)"),
        col("graft_n_rows").as("n_rows"))
      .withColumn("passed", col("n_violations") === 0L)
  }
}
