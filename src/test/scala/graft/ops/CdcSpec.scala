package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CorpusOps.cdcChunks: content-defined chunk boundaries and the
  * edit-robustness property that motivates them. */
class CdcSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def chunksOf(text: String): Seq[(Long, Long, Long, Long)] =
    CorpusOps.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", shingleSize = 3, modulus = 8)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "n_tokens", "chunk_hash")
      .as[(Long, Long, Long, Long)].collect().toSeq

  private val words =
    (0 until 120).map(i => s"w${(i * 37 + 11) % 53}").mkString(" ")

  test("chunks tile the document exactly") {
    val cs = chunksOf(words)
    assert(cs.nonEmpty)
    assert(cs.head._2 == 0L)
    // consecutive: each chunk starts where the previous ended
    cs.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 + a._3 == b._2)
      case _ =>
    }
    assert(cs.map(_._3).sum == 120L)
    assert(cs.forall(_._3 > 0))
  }

  test("an insertion near the head leaves later chunk hashes unchanged") {
    val original = chunksOf(words)
    assume(original.size >= 3, "fixture must produce several chunks")
    val edited = chunksOf("INSERTED " + words)
    // content-defined boundaries re-synchronize: every original chunk
    // hash from the SECOND chunk on must still appear in the edited
    // chunking (fixed-size chunking would lose all of them)
    val originalTail = original.drop(1).map(_._4).toSet
    val editedHashes = edited.map(_._4).toSet
    assert(originalTail.subsetOf(editedHashes),
      s"lost chunks: ${originalTail -- editedHashes}")
  }

  test("empty and sub-shingle documents behave") {
    assert(chunksOf("").isEmpty)
    val tiny = chunksOf("one two")   // shorter than the shingle
    assert(tiny.size == 1 && tiny.head._3 == 2L)
  }
}
