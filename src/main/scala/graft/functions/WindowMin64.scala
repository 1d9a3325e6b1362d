package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct sliding-window minima of a long array in ONE codegen'd
  * kernel — the winnowing selection step (Schleimer et al., SIGMOD'03).
  * Value-identical to the builtin chain
  * `array_distinct(transform(sequence(1, greatest(size(h)-w+1, 1)),
  * i => array_min(slice(h, i, w))))`, whose higher-order lambda is
  * interpreted AND re-evaluates its captured child expression per
  * window — O(windows × child-cost) instead of one child evaluation.
  * Arrays shorter than the window yield the single whole-array minimum.
  */
case class WindowMin64(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, "window must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_min64 requires array<long> (no nulls), got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_min64"

  override protected def nullSafeEval(input: Any): Any =
    WindowMin64.compute(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WindowMin64.compute($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): WindowMin64 =
    copy(child = newChild)
}

object WindowMin64 {

  /** Runtime kernel shared by interpreted eval and generated code.
    * Monotonic-deque sliding minimum: O(n) regardless of window size;
    * distinctness keeps first-occurrence order (= `array_distinct`). */
  def compute(hashes: ArrayData, w: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    // deque of candidate indices with increasing hash values
    val idx = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      while (tail > head && hashes.getLong(idx(tail - 1)) >= h) tail -= 1
      idx(tail) = i; tail += 1
      if (idx(head) <= i - w) head += 1
      if (i >= w - 1) seen.add(hashes.getLong(idx(head)))
      i += 1
    }
    // array shorter than the window: one whole-array minimum
    if (n < w) seen.add(hashes.getLong(idx(head)))
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
