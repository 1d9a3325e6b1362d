package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus write-side preconditions (unique non-null ids, non-null
  * payloads — scaladoc contracts since r13) are RUNTIME-guarded: a
  * violating caller fails loudly instead of getting silently
  * engine-dependent positions/totals. The guard rides the op's own
  * window/aggregate (Guards.scala), so these specs also pin that valid
  * input is unaffected and that `spark.graft.validate.ids=false`
  * restores the unguarded plan for pre-validated bulk loads. */
class PreconditionGuardSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def messageChain(t: Throwable): String = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  private def assertRaises(df: => DataFrame, op: String): Unit = {
    val e = intercept[Throwable] { df.collect() }
    val msg = messageChain(e)
    assert(msg.contains("PRECONDITION"), s"wanted guard failure, got: $msg")
    assert(msg.contains(op), s"guard message should name $op, got: $msg")
  }

  private val budgets = Seq(("a", 100L)).toDF("source", "budget")

  test("shardShuffle: duplicate id fails loudly") {
    val df = Seq((1L, "x"), (2L, "y"), (1L, "z")).toDF("doc_id", "text")
    assertRaises(CorpusOps.shardShuffle(df, "doc_id", 4), "shardShuffle")
  }

  test("shardShuffle: null id fails loudly") {
    val df = Seq(Some(1L), Some(2L), None).toDF("doc_id")
    assertRaises(CorpusOps.shardShuffle(df, "doc_id", 4), "shardShuffle")
  }

  test("shardShuffle: valid ids pass and positions are dense per shard") {
    val df = (1L to 40L).toDF("doc_id")
    val out = CorpusOps.shardShuffle(df, "doc_id", 4)
    assert(out.count() === 40L)
    val bad = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("seq").as("mx"))
      .filter(col("n") =!= col("mx")).count()
    assert(bad === 0L)
  }

  test("budgetedMix: duplicate id within a source fails loudly") {
    val df = Seq((1L, "a", "one two"), (1L, "a", "three four"))
      .toDF("doc_id", "source", "text")
    assertRaises(
      CorpusOps.budgetedMix(df, "doc_id", "text", "source", budgets),
      "budgetedMix")
  }

  test("budgetedMix: null text fails loudly") {
    val df = Seq((1L, "a", "one two"), (2L, "a", null))
      .toDF("doc_id", "source", "text")
    assertRaises(
      CorpusOps.budgetedMix(df, "doc_id", "text", "source", budgets),
      "budgetedMix")
  }

  test("epochPlan: duplicate id fails loudly through the shared core") {
    val df = Seq((1L, "a", "one two"), (1L, "a", "three four"))
      .toDF("doc_id", "source", "text")
    assertRaises(
      CorpusOps.epochPlan(df, "doc_id", "text", "source", budgets),
      "budgetedMix")
  }

  test("budgetedAdmitBatch: duplicate id within a batch fails loudly") {
    val seen = Seq.empty[(String, Long)].toDF("source", "seen_tokens")
    val batch = Seq((1L, "a", "one two"), (1L, "a", "three"))
      .toDF("doc_id", "source", "text")
    val (adm, _) = CorpusOps.budgetedAdmitBatch(seen, batch,
      "doc_id", "text", "source", budgets)
    assertRaises(adm, "budgetedAdmitBatch")
  }

  test("packIndex: null payload fails loudly") {
    val df = Seq((1L, Some(Array[Byte](1, 2))), (2L, None))
      .toDF("doc_id", "payload")
    assertRaises(
      Multimodal.packIndex(df, "doc_id", "payload", 2), "packIndex")
  }

  test("packIndex: duplicate id fails loudly") {
    val df = Seq((1L, Array[Byte](1)), (1L, Array[Byte](2)))
      .toDF("doc_id", "payload")
    assertRaises(
      Multimodal.packIndex(df, "doc_id", "payload", 2), "packIndex")
  }

  test("packAssignBatch: null payload fails loudly") {
    val seen = Seq.empty[(Int, Long)].toDF("shard", "n_bytes")
    val batch = Seq((1L, Some(Array[Byte](1))), (2L, None))
      .toDF("doc_id", "payload")
    // construction stays inside the by-name arg: the guard can fire at
    // the op's own (eager) Ckpt barrier, not only at the caller's action
    assertRaises(
      Multimodal.packAssignBatch(seen, batch, "doc_id", "payload", 2)._1,
      "packAssignBatch")
  }

  test("deterministicSplit: null id fails loudly, duplicates stay benign") {
    val bad = Seq(Some(1L), None).toDF("doc_id")
    assertRaises(
      CorpusOps.deterministicSplit(bad, "doc_id"), "deterministicSplit")
    // duplicate ids are NOT a violation here: same id ⇒ same split is
    // the op's defining property (incremental-growth stability)
    val dup = Seq(1L, 1L, 2L).toDF("doc_id")
    val splits = CorpusOps.deterministicSplit(dup, "doc_id")
      .groupBy("doc_id").agg(count_distinct(col("split")).as("n"))
      .filter(col("n") > 1).count()
    assert(splits === 0L)
  }

  test("temperatureMix: duplicate id within a domain fails loudly") {
    val df = Seq((1L, "web"), (1L, "web"), (2L, "code"))
      .toDF("doc_id", "domain")
    assertRaises(
      CorpusOps.temperatureMix(df, "doc_id", "domain"), "temperatureMix")
  }

  test("temperatureMix: null id fails loudly") {
    val df = Seq((Some(1L), "web"), (None, "web"), (Some(2L), "code"))
      .toDF("doc_id", "domain")
    assertRaises(
      CorpusOps.temperatureMix(df, "doc_id", "domain"), "temperatureMix")
  }

  test("temperatureMix: valid ids — guarded output equals opted-out output") {
    val df = (1L to 200L).map(i => (i, if (i % 5 == 0) "code" else "web"))
      .toDF("doc_id", "domain")
    val guarded = CorpusOps.temperatureMix(df, "doc_id", "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    spark.conf.set("spark.graft.validate.ids", "false")
    val plain = try CorpusOps.temperatureMix(df, "doc_id", "domain")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    finally spark.conf.set("spark.graft.validate.ids", "true")
    assert(guarded === plain)
    assert(guarded.nonEmpty)
  }

  test("opt-out conf restores the unguarded path") {
    val df = Seq((1L, "x"), (1L, "y")).toDF("doc_id", "text")
    spark.conf.set("spark.graft.validate.ids", "false")
    try {
      // silently engine-dependent, but must NOT raise when opted out
      assert(CorpusOps.shardShuffle(df, "doc_id", 4).count() === 2L)
    } finally spark.conf.set("spark.graft.validate.ids", "true")
    // and back on, the same frame raises again
    assertRaises(CorpusOps.shardShuffle(df, "doc_id", 4), "shardShuffle")
  }
}
