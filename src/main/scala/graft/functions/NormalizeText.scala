package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization as ONE codegen'd pass per row.
  *
  * A 100 TB web corpus mixes precomposed and combining-sequence forms of
  * the same text (reference: Hermes compares datasets byte-wise, so
  * upstream normalization decides whether `café` == `café`); dedup
  * fingerprints, tokenizers and equality joins all need a canonical
  * form first. Spark has no builtin for this, and a Scala UDF would
  * break whole-stage codegen around it — so this is the Expression
  * tier of the extension ladder (SURVEY §7.1).
  *
  * Modes (each verified byte-identical to the DuckDB/utf8proc
  * equivalent, see NormalizeSpec and gate d23):
  *   - `nfc` / `nfkc`: canonical / compatibility composition
  *     (≡ DuckDB `nfc_normalize` for `nfc`),
  *   - `strip_accents`: NFD-decompose, drop nonspacing marks (category
  *     Mn), keep the rest UNrecomposed — exactly utf8proc/DuckDB
  *     `strip_accents` semantics (`é` → `e`, but `ø` → `ø`: not a
  *     combining mark, nothing to strip).
  *
  * The fast path skips allocation entirely: pure-ASCII strings (the
  * overwhelming majority of a real corpus) are already normalized in
  * every mode, and UTF8String exposes that check without decoding.
  */
case class NormalizeText(child: Expression, mode: String) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if NormalizeText.modes.contains(mode) =>
      TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"unknown mode '$mode' (expected one of ${NormalizeText.modes.mkString(", ")})")
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String], mode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mode", mode, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.compute($c, $m)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {

  val modes: Set[String] = Set("nfc", "nfkc", "strip_accents")

  /** Runtime kernel shared by interpreted eval and generated code. */
  def compute(s: UTF8String, mode: String): UTF8String = {
    // ASCII is a fixed point of NFC/NFKC/strip_accents: no decode, no copy
    if (isAscii(s)) return s
    val str = s.toString
    val out = mode match {
      case "nfc" => Normalizer.normalize(str, Normalizer.Form.NFC)
      case "nfkc" => Normalizer.normalize(str, Normalizer.Form.NFKC)
      case "strip_accents" => stripAccents(str)
      case other => throw new IllegalArgumentException(s"unknown mode '$other'")
    }
    if (out == str) s else UTF8String.fromString(out)
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  private def stripAccents(str: String): String = {
    val d = Normalizer.normalize(str, Normalizer.Form.NFD)
    val b = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) b.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    b.toString
  }
}
