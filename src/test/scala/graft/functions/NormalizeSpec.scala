package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** NormalizeText: Unicode normalization as a codegen'd Expression.
  * The cross-engine byte-parity claim (≡ DuckDB nfc_normalize /
  * strip_accents) is enforced by gate d23; these specs pin the
  * Java-side semantics the gate relies on. */
class NormalizeSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // codepoint-pinned fixtures (see SparkEntry.normSfx*)
  private val combining = "Café"          // e + U+0301
  private val precomposed = "déjà ệ"
  private val stacked = "ệ"          // -> U+1EC7 under NFC
  private val angstrom = "Å"                // NFC singleton -> U+00C5
  private val ligature = "ﬁle"              // NFKC -> "file", NFC fixed point

  private def run(mode: String, ss: String*): Seq[String] =
    ss.toDF("s").select(normalizeText(col("s"), mode)).as[String].collect().toSeq

  test("nfc composes combining sequences and singletons, fixes precomposed") {
    assert(run("nfc", combining, precomposed, stacked, angstrom, ligature) ===
      Seq("Café", precomposed, "ệ", "Å", ligature))
  }

  test("nfkc applies compatibility mappings nfc leaves alone") {
    assert(run("nfkc", ligature, "①") === Seq("file", "1"))
  }

  test("strip_accents drops nonspacing marks without recomposing") {
    // precomposed chars decompose then lose their marks; bare letters
    // without decompositions (ø) survive — utf8proc/DuckDB semantics
    assert(run("strip_accents", combining, precomposed, stacked, "ø") ===
      Seq("Cafe", "deja e", "e", "ø"))
  }

  test("ascii fast path is an identity, nulls stay null") {
    val in = Seq("plain ascii 123", null)
    val out = in.toDF("s").select(normalizeText(col("s"), "nfc")).as[String].collect()
    assert(out.toSeq === in)
  }

  test("interpreted eval matches codegen") {
    val e = NormalizeText(
      org.apache.spark.sql.graftbridge.ColumnBridge.expression(col("s")), "strip_accents")
    val rows = Seq(combining, precomposed, stacked, angstrom).toDF("s")
    val viaPlan = rows.select(normalizeText(col("s"), "strip_accents")).as[String].collect()
    val viaEval = Seq(combining, precomposed, stacked, angstrom).map(s =>
      NormalizeText.compute(org.apache.spark.unsafe.types.UTF8String.fromString(s),
        "strip_accents").toString)
    assert(viaPlan.toSeq === viaEval)
    assert(e.dataType === org.apache.spark.sql.types.StringType)
  }

  test("sql surface: normalize_text registered via GraftExtensions") {
    graft.GraftExtensions.register(spark)
    val got = spark.sql(s"SELECT normalize_text('$combining', 'nfc') AS n")
      .as[String].collect()
    assert(got.toSeq === Seq("Café"))
    val err = intercept[Exception] {
      spark.sql("SELECT normalize_text('x', 'bogus')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("mode"))
  }
}
