package graft.plans
import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
class PlanPeekSpec extends AnyFunSuite with SparkTestBase {
  test("peek") {
    val points = spark.range(0, 500).select(col("id").as("p_id"), (col("id") * 7 % 1000).as("ts"))
    val intervals = spark.range(0, 40).select(col("id").as("iv_id"), (col("id") * 25).as("lo"), (col("id") * 25 + 60).as("hi"))
    val df = points.join(intervals, col("ts") >= col("lo") && col("ts") < col("hi"))
    df.collect()
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.toString.take(3000))
  }
}
