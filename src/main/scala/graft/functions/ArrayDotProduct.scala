package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two array<double> columns as a native codegen'd
  * expression: one tight primitive loop per row instead of the
  * interpreted `aggregate(zip_with(...))` lambda chain (higher-order
  * functions never enter whole-stage codegen, and the lambda-allocating
  * fold dominates cosine-heavy plans like all-pairs dedup).
  *
  * The summation is the SAME left-to-right sequential fold as
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` and as DuckDB
  * `list_reduce(list_transform(...), (x,y) -> x+y)`, so results remain
  * bit-identical to the oracle formulation.
  *
  * Null if either array is null, any element is null, or lengths differ.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires two array<double>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayDotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val result = nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Double ${ev.value}Boxed = graft.functions.ArrayDotProduct.compute($a, $b);
         |if (${ev.value}Boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}Boxed.doubleValue();
         |}
       """.stripMargin
    })
    result
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  /** Shared kernel; boxed Double so null (length mismatch / null
    * element) propagates through generated code. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
