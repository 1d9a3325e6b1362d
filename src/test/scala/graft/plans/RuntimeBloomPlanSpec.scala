package graft.plans

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q91's 100 TB posture, plan-asserted: a selective dimension filter
  * must reach the FACT side as a runtime Bloom filter (`might_contain`
  * on the scan side) — at scale, pruning 99% of the fact rows before
  * the join shuffle is the difference between shuffling the table and
  * shuffling the answer. Runs the shared q91 plan against sf0.01. */
class RuntimeBloomPlanSpec extends AnyFunSuite with SparkTestBase {

  test("q91 fact side is pruned by an injected runtime bloom filter") {
    val confs = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = graft.SparkEntry.q91BloomJoin(spark, "/root/testdata/sf0.01")
      df.collect() // finalize AQE stages on THIS plan
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the fact side:\n" +
          plan.take(4000))
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
