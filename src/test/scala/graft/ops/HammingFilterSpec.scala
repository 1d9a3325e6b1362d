package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.hammingFilter64]] — cross-set Hamming admission against a
  * frozen perceptual-hash index (the round-15 building block that had
  * no spec): exact and near hits are rejected, far hashes admitted,
  * over-cap index buckets degrade to admission, and — the round-15
  * advice bug — string ids must key the anti-join untouched (a long
  * cast nulled them out and admitted everything). */
class HammingFilterSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private val index = Seq(
    (100L, 0x0000000000000000L),
    (101L, 0x7777777777777777L)).toDF("id", "ph")

  test("exact index hash is rejected") {
    val in = Seq((1L, 0x0000000000000000L), (2L, 0x1111222233334444L))
      .toDF("id", "ph")
    val got = Dedup.hammingFilter64(index, in, "id", "ph", maxHamming = 3)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("within maxHamming rejected, beyond admitted") {
    val in = Seq(
      (1L, 0x0000000000000007L), // 3 bits from index hash 0 -> rejected
      (2L, 0x000000000000000FL), // 4 bits away -> admitted
      (3L, 0x7777777777777770L)  // 3 bits from the second index hash
    ).toDF("id", "ph")
    val got = Dedup.hammingFilter64(index, in, "id", "ph", maxHamming = 3)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("string ids survive the anti-join (no numeric cast)") {
    val idx = Seq(("a", 0x0000000000000000L)).toDF("doc", "ph")
    val in = Seq(
      ("doc-near", 0x0000000000000001L),
      ("doc-far", 0x00FF00FF00FF00FFL)).toDF("doc", "ph")
    val got = Dedup.hammingFilter64(idx, in, "doc", "ph", maxHamming = 3)
      .select("doc").as[String].collect().toSet
    assert(got === Set("doc-far"),
      "string-id rejections must not be nulled away by a long cast")
  }

  test("over-cap index buckets admit rather than scan (documented cap)") {
    // 20 identical index hashes: every chunk bucket holds 20 rows, so a
    // maxBucket = 10 cap drops them all and the matching incoming hash
    // is ADMITTED — the high-recall-of-admission posture of the LSH caps
    val flood = (0 until 20).map(i => (i.toLong, 0x1234123412341234L))
      .toDF("id", "ph")
    val in = Seq((1L, 0x1234123412341234L)).toDF("id", "ph")
    val capped = Dedup.hammingFilter64(flood, in, "id", "ph",
      maxHamming = 3, maxBucket = 10)
    assert(capped.count() === 1L)
    // with room in the bucket the same hash is rejected
    val uncapped = Dedup.hammingFilter64(flood, in, "id", "ph",
      maxHamming = 3, maxBucket = 1000)
    assert(uncapped.count() === 0L)
  }

  test("original columns come back unchanged") {
    val in = Seq((7L, 0x0F0F0F0F0F0F0F0FL, "payload")).toDF("id", "ph", "blob")
    val got = Dedup.hammingFilter64(index, in, "id", "ph", maxHamming = 3)
    assert(got.columns.toSeq === Seq("id", "ph", "blob"))
    assert(got.collect().map(_.getString(2)).toSeq === Seq("payload"))
  }
}
