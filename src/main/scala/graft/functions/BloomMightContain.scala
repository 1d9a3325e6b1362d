package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a codegen'd
  * predicate.
  *
  * The semi-join reduction at 100 TB: a fact⋈dim join shuffles the
  * ENTIRE fact table even when the dim side's keys would discard 99%
  * of it post-join. Probing a driver-built filter of the dim keys
  * BEFORE the exchange drops non-joining fact rows at scan time —
  * false positives survive (and are removed by the real join), false
  * negatives cannot happen, so the join result is exactly unchanged
  * while the shuffle shrinks by the selectivity factor. Spark's own
  * `InjectRuntimeFilter` applies the same idea opportunistically;
  * `ops.BloomPrune` makes it an explicit, always-on library call.
  *
  * The filter ships as its serialized bytes (the task-side object is
  * rebuilt lazily once per executor), so the expression tree stays
  * trivially serializable and the generated code is one virtual call.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
  extends UnaryExpression {

  @transient private lazy val filter: BloomFilter = BloomFilter.readFrom(filterBytes)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain supports bigint and string keys, got ${other.catalogString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(input: Any): Any = input match {
    case l: java.lang.Long => filter.mightContainLong(l)
    case s: UTF8String => filter.mightContainBinary(s.getBytes)
    case other => throw new IllegalStateException(s"unreachable input $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this, classOf[BloomMightContain].getName)
    val probe = child.dataType match {
      case LongType => (c: String) => s"$ref.probeLong($c)"
      case _ => (c: String) => s"$ref.probeUtf8($c)"
    }
    defineCodeGen(ctx, ev, probe)
  }

  /** Codegen entry points (the lazy filter lives on this instance). */
  def probeLong(v: Long): Boolean = filter.mightContainLong(v)
  def probeUtf8(v: UTF8String): Boolean = filter.mightContainBinary(v.getBytes)

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
