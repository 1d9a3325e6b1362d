package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access shim: `ExpressionUtils` is `private[sql]` in Spark 4's classic
  * module, so Column↔Expression conversion for registering custom
  * Catalyst expressions goes through this bridge package. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a builder in a LIVE session's function registry (the
    * `SparkSessionExtensions` path only applies at session build time;
    * this serves notebooks/tests that already hold a session).
    * `sessionState` is `private[sql]`, hence bridged here. */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Register a TABLE-VALUED function (`SELECT * FROM name(...)`) in a
    * LIVE session — the `tableFunctionRegistry` twin of
    * [[registerFunction]], bridged for the same `private[sql]` reason. */
  def registerTableFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      builder: Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Unit =
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      name, builder, "scala_udf")

  /** Unpersist the cached blocks behind a locally-checkpointed
    * Dataset — `LogicalRDD` is `private[sql]` in Spark 4, hence
    * bridged. Returns the number of RDDs released. A local checkpoint
    * truncates lineage, so the blocks are the ONLY copy: callers must
    * guarantee the frame is never read again (see
    * `graft.ops.Ckpt.release` for the contract). */
  def releaseCheckpointBlocks(ds: org.apache.spark.sql.Dataset[_]): Int = {
    var n = 0
    ds.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false); n += 1
      case _ => ()
    }
    n
  }

  /** The RDD ids behind a checkpointed Dataset's `LogicalRDD` leaves —
    * lets a spec assert presence/absence in
    * `sparkContext.getPersistentRDDs` without global counting (robust
    * under parallel suites sharing the session). */
  def checkpointRddIds(ds: org.apache.spark.sql.Dataset[_]): Seq[Int] =
    ds.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
    }

  /** A DataFrame over an already-resolved logical plan —
    * `classic.Dataset.ofRows` is `private[sql]`; bridged so an
    * optimizer rule can evaluate a delta-scale side plan driver-side
    * (the join-skip key collection). */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
