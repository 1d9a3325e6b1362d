package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TopK.perGroup: bounded-heap aggregation must return exactly what the
  * window-rank formulation returns, while planning as two-phase
  * aggregation (partial heaps before the shuffle) instead of a global
  * sort. */
class TopKSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // 3 groups × 400 rows with deliberate score ties (score = id % 17)
  private lazy val rows = spark.range(0, 1200)
    .select((col("id") % 3).cast("string").as("g"),
      (col("id") % 17).cast("double").as("score"),
      col("id"))

  private def viaWindow(k: Int) = rows
    .withColumn("rank", row_number().over(
      Window.partitionBy("g").orderBy(col("score").desc, col("id").desc)).cast("long"))
    .filter(col("rank") <= k)
    .select("g", "rank", "score", "id")

  test("matches the window-rank formulation exactly, ties broken by id") {
    val got = TopK.perGroup(rows, Seq("g"), Seq(col("score"), col("id")), k = 7)
      .orderBy("g", "rank").collect()
    val want = viaWindow(7).orderBy("g", "rank").collect()
    assert(got.toSeq === want.toSeq)
  }

  test("k larger than the group returns the whole group, ranked") {
    val tiny = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L))
      .toDF("g", "score", "id")
    val got = TopK.perGroup(tiny, Seq("g"), Seq(col("score"), col("id")), k = 10)
      .orderBy("g", "rank").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ===
      Seq(("a", 1L, 2.0), ("a", 2L, 1.0), ("b", 1L, 9.0)))
  }

  test("plans as two-phase aggregation — partial heaps, no window sort") {
    val df = TopK.perGroup(rows, Seq("g"), Seq(col("score"), col("id")), k = 5)
    df.collect() // finalize AQE
    def all(p: SparkPlan): Seq[SparkPlan] =
      p.collectWithSubqueries { case n => n }.flatMap {
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => q +: all(q.plan)
        case n => Seq(n)
      }
    val nodes = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        all(a.executedPlan)
      case p => all(p)
    }
    val aggs = nodes.collect { case o: ObjectHashAggregateExec => o }
    assert(aggs.size >= 2, s"expected partial+final ObjectHashAggregate, got:\n$nodes")
    assert(!nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.window.WindowExec]),
      "top-k must not plan a window sort")
  }

  test("survives serialization across a real shuffle repartition") {
    // force many upstream partitions so partial buffers actually merge
    val spread = rows.repartition(16, col("id"))
    val got = TopK.perGroup(spread, Seq("g"), Seq(col("score"), col("id")), k = 7)
      .orderBy("g", "rank").collect()
    assert(got.toSeq === viaWindow(7).orderBy("g", "rank").collect().toSeq)
  }

  test("rejects non-struct input and k <= 0") {
    val err = intercept[Exception] {
      rows.groupBy("g").agg(graft.functions.topK(struct(col("score")), 0)).collect()
    }
    assert(err.getMessage.contains("k > 0") || err.getMessage.contains("k=0"))
  }
}
