package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TokenCounts: the row-local tf kernel must be value-identical to the
  * relational explode→groupBy formulation it replaces. */
class TokenCountsSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat the end"),
    (2L, "one token"),
    (3L, ""),
    (4L, "dup dup dup dup")).toDF("doc_id", "text")

  private def toks = split(trim(lower(col("text"))), "\\s+")

  test("matches explode + groupBy exactly") {
    val viaKernel = docs
      .select(col("doc_id"), explode(tokenCounts(toks)).as("tc"))
      .select(col("doc_id"), col("tc.token"), col("tc.tf"))
      .filter(col("token") =!= "")
      .orderBy("doc_id", "token")
      .collect()
    val viaShuffle = docs
      .select(col("doc_id"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .orderBy("doc_id", "token")
      .collect()
    assert(viaKernel.toSeq === viaShuffle.toSeq)
  }

  test("order is first appearance; nulls in the array are skipped") {
    val arr = Seq(Seq("b", "a", "b", "c", "a", "b")).toDF("t")
      .select(tokenCounts(col("t")).as("tc"))
      .selectExpr("transform(tc, x -> x.token) AS toks",
        "transform(tc, x -> x.tf) AS tfs")
      .as[(Seq[String], Seq[Long])].head()
    assert(arr === ((Seq("b", "a", "c"), Seq(3L, 2L, 1L))))
  }

  test("empty array gives empty result, null gives null") {
    val out = Seq((1, Some(Seq.empty[String])), (2, None))
      .toDF("id", "t")
      .select(col("id"), tokenCounts(col("t")).as("tc"))
      .orderBy("id")
      .collect()
    assert(out(0).getSeq[Any](1).isEmpty)
    assert(out(1).isNullAt(1))
  }
}
