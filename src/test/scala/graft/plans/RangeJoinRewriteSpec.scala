package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer-rule tier of the extension ladder: plain-SQL band
  * joins get the same bucketed plan `ops.RangeJoin` builds by hand. */
class RangeJoinRewriteSpec extends AnyFunSuite with SparkTestBase {

  RangeJoinRewrite.install(spark)

  private def withWidth[T](w: String)(f: => T): T = {
    spark.conf.set(RangeJoinRewrite.WidthConf, w)
    try f finally spark.conf.unset(RangeJoinRewrite.WidthConf)
  }

  private lazy val points = spark.range(0, 500)
    .select(col("id").as("p_id"), (col("id") * 7 % 1000).as("ts"))
  private lazy val intervals = spark.range(0, 40)
    .select(col("id").as("iv_id"), (col("id") * 25).as("lo"),
      (col("id") * 25 + 60).as("hi"))

  private def bandJoin(): DataFrame =
    points.join(intervals, col("ts") >= col("lo") && col("ts") < col("hi"))

  private def executed(df: DataFrame): SparkPlan = {
    val p = df.queryExecution.executedPlan
    df.collect() // finalize AQE
    p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
  }

  // QueryStageExec nodes (BroadcastQueryStage, and ResultQueryStage once
  // AQE finalizes) are LEAVES whose compiled subtree hangs off `.plan`, so
  // a plain collect sees nothing below them — descend explicitly
  private def allNodes(p: SparkPlan): Seq[SparkPlan] =
    p.collectWithSubqueries { case n => n }.flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: allNodes(q.plan)
      case n => Seq(n)
    }

  private def hasBnlj(p: SparkPlan): Boolean =
    allNodes(p).exists(_.isInstanceOf[BroadcastNestedLoopJoinExec])

  test("band join without the rule plans a broadcast nested loop") {
    assert(hasBnlj(executed(bandJoin())))
  }

  test("rule turns the band join into an equi-join with identical rows") {
    val naive = bandJoin().orderBy("p_id", "iv_id").collect()
    withWidth("60") {
      val rewritten = bandJoin()
      assert(!hasBnlj(executed(rewritten)),
        "bucketed rewrite must remove the nested loop")
      assert(rewritten.orderBy("p_id", "iv_id").collect().toSeq ===
        naive.toSeq)
      assert(rewritten.columns.toSeq === Seq("p_id", "ts", "iv_id", "lo", "hi"),
        "rewrite must not leak bucket columns")
    }
  }

  test("bound strictness is preserved exactly (>= vs > and < vs <=)") {
    // points exactly on lo and on hi decide strictness correctness
    val p = spark.range(0, 1).select(lit(100L).as("ts"), lit(1L).as("p_id"))
      .union(spark.range(0, 1).select(lit(160L).as("ts"), lit(2L).as("p_id")))
    val iv = spark.range(0, 1).select(lit(100L).as("lo"), lit(160L).as("hi"))
    withWidth("60") {
      val inclusive = p.join(iv, col("ts") >= col("lo") && col("ts") <= col("hi"))
      assert(inclusive.count() === 2)
      val exclusive = p.join(iv, col("ts") > col("lo") && col("ts") < col("hi"))
      assert(exclusive.count() === 0)
    }
  }

  test("reversed operand order (lo <= ts AND hi > ts) is recognized") {
    withWidth("60") {
      val df = points.join(intervals,
        col("lo") <= col("ts") && col("hi") > col("ts"))
      assert(!hasBnlj(executed(df)))
      assert(df.count() === bandJoin().count())
    }
  }

  test("joins that already have an equi-key are left untouched") {
    withWidth("60") {
      val l = spark.range(0, 100).select(col("id").as("k"), col("id").as("a"))
      val r = spark.range(0, 100).select(col("id").as("k2"), (col("id") * 2).as("lo"),
        (col("id") * 2 + 10).as("hi"))
      val df = l.join(r, col("k") === col("k2") &&
        col("a") >= col("lo") && col("a") < col("hi"))
      val plan = df.queryExecution.optimizedPlan
      assert(!plan.toString.contains("graft_iv_bucket"),
        "equi-keyed join must not be exploded")
      assert(df.count() > 0)
    }
  }

  test("rule is inert without the width conf") {
    val plan = bandJoin().queryExecution.optimizedPlan
    assert(!plan.toString.contains("graft_iv_bucket"))
  }

  test("null bounds and null points produce no matches, as in the naive join") {
    val p = spark.sql("SELECT * FROM VALUES (1L, 50L), (2L, CAST(NULL AS LONG)) t(p_id, ts)")
    val iv = spark.sql(
      "SELECT * FROM VALUES (10L, 40L, 60L), (11L, CAST(NULL AS LONG), 90L) t(iv_id, lo, hi)")
    val naive = p.join(iv, col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("p_id", "iv_id").collect().toSeq
    withWidth("25") {
      val rewritten = p.join(iv, col("ts") >= col("lo") && col("ts") < col("hi"))
        .select("p_id", "iv_id").collect().toSeq
      assert(rewritten === naive)
      assert(naive === Seq(org.apache.spark.sql.Row(1L, 10L)))
    }
  }
}
