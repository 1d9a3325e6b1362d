package graft.plans

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q90's 100 TB posture, plan-asserted: when one join key carries most
  * of the fact rows and broadcast is off, AQE must recognize the hot
  * shuffle partition and SPLIT it (`skew=true` on the sort-merge
  * join) — without the remedy one task processes 75% of the table
  * while the rest of the cluster idles. Runs the shared q90 plan
  * against sf0.01 (the hot partition must exceed the threshold). */
class SkewJoinPlanSpec extends AnyFunSuite with SparkTestBase {

  test("q90 sort-merge join handles the engineered skew (skew=true)") {
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.SparkEntry.q90SkewJoin(spark, "/root/testdata/sf0.01")
      df.collect() // finalize AQE stages on THIS plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition for splitting:\n" +
          plan.take(4000))
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
