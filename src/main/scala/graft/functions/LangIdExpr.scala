package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Stopword-based language ID over a token array as ONE codegen'd pass.
  * Value-identical to [[TextFunctions.langId]]'s builtin formulation
  * (argmax of per-language stopword hits, ties broken by language
  * order, 'und' when no stopword matched) — but the builtin form
  * re-inlines the tokenizer and one interpreted filter() lambda per
  * language into every consumer (~12 tokenizations per row inside a
  * single filter condition); here each row is one loop with hash-set
  * membership tests. */
case class LangIdExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_id requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    LangIdExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

object LangIdExpr {
  private val langs: Array[UTF8String] =
    TextFunctions.languages.map(UTF8String.fromString).toArray
  private val sets: Array[java.util.HashSet[UTF8String]] =
    TextFunctions.languages.map { l =>
      val s = new java.util.HashSet[UTF8String]()
      TextFunctions.stopwords(l).foreach(w => s.add(UTF8String.fromString(w)))
      s
    }.toArray
  private val und = UTF8String.fromString("und")

  /** Runtime kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): UTF8String = {
    val counts = new Array[Int](sets.length)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val t = tokens.getUTF8String(i)
        var l = 0
        while (l < sets.length) {
          if (sets(l).contains(t)) counts(l) += 1
          l += 1
        }
      }
      i += 1
    }
    var best = 0
    var l = 0
    while (l < counts.length) {
      if (counts(l) > best) best = counts(l)
      l += 1
    }
    if (best == 0) und
    else {
      var pick = 0
      while (counts(pick) != best) pick += 1 // first language wins ties
      langs(pick)
    }
  }
}
