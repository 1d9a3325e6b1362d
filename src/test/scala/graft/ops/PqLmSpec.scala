package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity.productQuantize and CorpusOps.lmScore — cross-engine value
  * parity is gate e8/d26's job; these pin hand-checked semantics. */
class PqLmSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  test("productQuantize encodes each subspace to its nearest seed") {
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 seed codebook:
    // seeds are vectors of ids 0 and 1
    val vecs = Seq(
      (0L, Array(0f, 0f, 10f, 10f)),
      (1L, Array(4f, 4f, 0f, 0f)),
      (2L, Array(1f, 0f, 9f, 9f)),   // sub0 near seed0, sub1 near seed0
      (3L, Array(5f, 3f, 1f, 1f)))   // sub0 near seed1, sub1 near seed1
      .toDF("vec_id", "embedding")
    val out = Similarity.productQuantize(vecs, "vec_id", "embedding", m = 2, k = 2)
      .orderBy("id", "sub").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.length === 8)
    val codes = out.map(t => ((t._1, t._2), t._3)).toMap
    assert(codes((2L, 0)) === 0 && codes((2L, 1)) === 0)
    assert(codes((3L, 0)) === 1 && codes((3L, 1)) === 1)
    // seeds encode themselves with distance 0 (expansion is exact here)
    assert(out.filter(t => t._1 < 2 && t._3 == t._1.toInt).forall(_._4 == 0.0))
  }

  test("productQuantize is a pure projection — no exchange in the plan") {
    val vecs = Seq.tabulate(20)(i =>
      (i.toLong, Array.tabulate(4)(j => (i + j).toFloat))).toDF("vec_id", "embedding")
    val plan = Similarity.productQuantize(vecs, "vec_id", "embedding", m = 2, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no Exchange in:\n$plan")
  }

  test("lmScore: uniform text scores the full scale, count excludes short docs") {
    val docs = Seq(
      (1L, "a a a a"),      // every bigram "a a": p = 3/3 → scale
      (2L, "a b a b a"),    // bigrams: ab,ba,ab,ba
      (3L, "solo"))         // < 2 tokens — excluded
      .toDF("doc_id", "text")
    val out = CorpusOps.lmScore(docs, "doc_id", "text", scale = 1000L)
      .orderBy("doc").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L))
    // doc 1: "a a" has c12=3; prefix a: c1 = 3(aa) + 2(ab) = 5 → p = 600
    assert(out(0) === ((1L, 3L, 1800L, 600L)))
    // doc 2: "a b" p = 2*1000 div 5 = 400; "b a" p = 2*1000 div 2 = 1000
    assert(out(1) === ((2L, 4L, 2800L, 700L)))
  }

  test("noveltyCounts: first carrier wins, repeats score zero, counts are distinct shingles") {
    val docs = Seq(
      (1L, "a b c d"),       // shingles (n=2): ab, bc, cd — all novel
      (2L, "a b c d"),       // exact repeat — zero novel
      (3L, "c d e f"),       // cd seen (doc 1); de, ef novel
      (4L, "x y x y x y"))   // xy, yx, xy, yx → DISTINCT {xy, yx}, both novel
      .toDF("doc_id", "text")
    val got = CorpusOps.noveltyCounts(docs, "doc_id", "text", shingleSize = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq(
      (1L, 3L, 3L), (2L, 3L, 0L), (3L, 3L, 2L), (4L, 2L, 2L)))
    // novelty is prefix-relative: re-ordering ids flips who is "first"
    val flipped = Seq((5L, "a b c d"), (1L, "a b c d")).toDF("doc_id", "text")
    val g2 = CorpusOps.noveltyCounts(flipped, "doc_id", "text", 2)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(g2.toSeq === Seq((1L, 3L), (5L, 0L)))
  }

  test("overlapMatrix: distinct shared shingles per group pair, canonical order") {
    val docs = Seq(
      ("en", "a b c d"),     // en: ab, bc, cd
      ("fr", "c d e f"),     // fr: cd, de, ef
      ("de", "x y z w"),     // de: xy, yz, zw
      ("en", "c d x q"),     // en += cd(dup within en), dx, xq
      ("de", "c d q r"))     // de += cd, dq, qr
      .toDF("lang", "text")
    val got = CorpusOps.overlapMatrix(docs, "lang", "text", shingleSize = 2)
      .orderBy("grp_a", "grp_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // "c d" is the only cross-group shingle; within-en duplication
    // must NOT inflate any pair (distinct (group, hash) first)
    assert(got.toSeq === Seq(
      ("de", "en", 1L), ("de", "fr", 1L), ("en", "fr", 1L)))
  }
}
