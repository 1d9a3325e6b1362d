package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** JaroWinkler: semantics pinned to the DuckDB/RapidFuzz formulation
  * (cross-engine bit-parity is enforced end-to-end by gate q53; these
  * specs pin the local kernel against hand-computed values). */
class JaroWinklerSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))

  // bitwise parity belongs to gate q53 (vs DuckDB); textbook values are
  // asserted to 1e-12 — the kernel's float op ORDER is its own contract
  private def close(a: Double, b: Double): Boolean = math.abs(a - b) < 1e-12

  test("textbook pairs") {
    // MARTHA/MARHTA: m=6, t=1 → jaro = (1 + 1 + 5/6)/3 = 17/18, prefix 3
    val martha = 17.0 / 18
    assert(close(jw("martha", "marhta"), martha + 3 * 0.1 * (1 - martha)))
    // DIXON/DICKSONX: m=4, t=0 → jaro = (4/5 + 4/8 + 1)/3, prefix 2
    val dixon = (4.0 / 5 + 4.0 / 8 + 1.0) / 3
    assert(close(jw("dixon", "dicksonx"), dixon + 2 * 0.1 * (1 - dixon)))
  }

  test("empty and equal semantics match DuckDB (empty→0, even both empty)") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("abc", "abc") === 1.0)
  }

  test("winkler boost applies only above the 0.7 jaro threshold") {
    // fries/frog: only f,r match in window 1 → jaro = (2/5 + 2/4 + 1)/3
    // ≈ 0.633 < 0.7, so NO boost despite the 2-char common prefix
    assert(close(jw("fries", "frog"), (2.0 / 5 + 2.0 / 4 + 1.0) / 3))
    // duane/dwayne: jaro = (4/5 + 4/6 + 1)/3 = 0.822 > 0.7, prefix 1
    val duane = (4.0 / 5 + 4.0 / 6 + 1.0) / 3
    assert(close(jw("duane", "dwayne"), duane + 0.1 * (1 - duane)))
    // a/b: no matches → 0, no boost path
    assert(jw("a", "b") === 0.0)
  }

  test("transpositions halve and symmetry holds") {
    assert(jw("CRATE", "TRACE") === jw("TRACE", "CRATE"))
    assert(jw("ab", "ba") === jw("ba", "ab"))
  }

  test("column + sql surfaces agree with the kernel") {
    graft.GraftExtensions.register(spark)
    val viaCol = Seq(("martha", "marhta")).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).as[Double].head()
    val viaSql = spark.sql("SELECT jaro_winkler('martha', 'marhta')")
      .as[Double].head()
    assert(viaCol === jw("martha", "marhta"))
    assert(viaSql === viaCol)
  }
}
