package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-shingle 60-bit hashes of a token array in ONE codegen'd
  * kernel — the hot head of every MinHash pipeline. Value-identical to
  * the builtin chain
  * `transform(array_distinct(shinglesFromTokens(toks, n)), h64)`, whose
  * higher-order lambdas are interpreted and re-evaluated per consumer;
  * here each row is a single tight loop with one MD5 instance.
  *
  * Shingle semantics mirror [[TextFunctions.shinglesFromTokens]]:
  * max(size-n+1, 1) shingles of up to n tokens joined by a space
  * (null tokens skipped like concat_ws), so texts shorter than n yield
  * one shingle and empty token arrays yield the empty-string shingle.
  * With `distinct = true` (the MinHash head) distinctness is over the
  * shingle STRINGS (first occurrence kept), matching `array_distinct`
  * before hashing; with `distinct = false` the output keeps positional
  * order and duplicates — the form winnowing's sliding window needs.
  */
case class ShingleHash64(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hash64"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHash64.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHash64.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash64 =
    copy(child = newChild)
}

object ShingleHash64 {

  /** Runtime kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val size = tokens.numElements()
    val count = math.max(size - (n - 1), 1)
    // LinkedHashSet both dedupes and preserves first-occurrence order, so
    // the distinct path needs it; the positional path keeps every shingle
    val shingles = new java.util.ArrayList[String](count)
    val seen = if (distinct) new java.util.LinkedHashSet[String](count * 2) else null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      var first = true
      var j = i
      val end = math.min(i + n, size)
      while (j < end) {
        if (!tokens.isNullAt(j)) { // concat_ws skips nulls
          if (!first) sb.append(' ')
          sb.append(tokens.getUTF8String(j).toString)
          first = false
        }
        j += 1
      }
      if (distinct) seen.add(sb.toString) else shingles.add(sb.toString)
      i += 1
    }
    val src: java.util.Collection[String] = if (distinct) seen else shingles
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Long](src.size())
    val it = src.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = SimHash60.hash60(md, UTF8String.fromString(it.next()))
      k += 1
    }
    new GenericArrayData(out)
  }
}
