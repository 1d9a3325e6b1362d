package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 60-bit SimHash over a token array, as a native Catalyst expression
  * with codegen (stays inside whole-stage codegen — no UDF/serialization
  * boundary in the hot path).
  *
  * Per-token hash is the same portable md5-derived 60-bit value as
  * [[TextFunctions.h64]], so the result has an exact DuckDB oracle:
  * bit j of the output is set iff strictly more than half of the tokens
  * have bit j set in their hash.
  *
  * This is the §7-extension case where a custom Expression is justified:
  * the builtin-only formulation needs a 60-element per-row aggregate
  * array; here it is one tight loop per row.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

object SimHash60 {

  /** Runtime kernel shared by interpreted eval and generated code. */
  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](60)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    var total = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash60(md, tokens.getUTF8String(i))
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1
          j += 1
        }
        total += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      // strictly more than half — ties leave the bit clear (oracle parity)
      if (2 * counts(j) > total) out |= (1L << j)
      j += 1
    }
    out
  }

  /** First 15 hex chars of md5 as a long — identical to
    * [[TextFunctions.h64]] and to DuckDB
    * `('0x' || substr(md5(s),1,15))::BIGINT`. */
  private[functions] def hash60(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    // 15 hex chars = 7.5 bytes: take 8 bytes big-endian, drop low nibble
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }
}
