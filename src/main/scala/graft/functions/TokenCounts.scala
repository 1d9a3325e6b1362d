package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term frequencies: `array<string>` tokens →
  * `array<struct<token, tf>>` in ONE codegen'd pass.
  *
  * The relational formulation — `explode(tokens)` then
  * `groupBy(doc, token).count()` — shuffles EVERY token occurrence of
  * the corpus just to count within single documents (at 100 TB: the
  * full token stream, ~5× the text bytes, through an exchange whose
  * groups never cross a row boundary). A document's counts need no
  * data movement at all: this kernel folds them row-locally with one
  * hash map, so pipelines explode DISTINCT (token, tf) pairs — ~3×
  * fewer rows — straight into the corpus-level aggregate, deleting the
  * per-doc exchange entirely (tfIdf / bm25 / vocabulary all reuse it).
  *
  * Output order is first-appearance (LinkedHashMap), so results are
  * deterministic row-by-row even before any downstream aggregation.
  */
case class TokenCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_counts requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = TokenCounts.outType
  override def prettyName: String = "token_counts"

  override protected def nullSafeEval(input: Any): Any =
    TokenCounts.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenCounts.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCounts =
    copy(child = newChild)
}

object TokenCounts {

  val outType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  /** Runtime kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): ArrayData = {
    val counts = new java.util.LinkedHashMap[UTF8String, Long]()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        val prev = counts.get(t)
        counts.put(t, prev + 1L) // get() of a missing key is 0L (unboxed)
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }
}
