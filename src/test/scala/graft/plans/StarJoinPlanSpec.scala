package graft.plans

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q85's 100 TB posture, plan-asserted: the dimension chain must reach
  * the executed plan as BROADCAST joins (nation/region are
  * planner-scale at any corpus size — shuffling the fact table on a
  * dimension key to meet a 25-row table would be the classic star-join
  * scale bug), and nothing may degrade to a nested-loop/cartesian
  * plan. Runs the real gate against the sf0.001 fixtures. */
class StarJoinPlanSpec extends AnyFunSuite with SparkTestBase {

  test("q85 star join broadcasts the dimension chain, never a cartesian") {
    val df = graft.SparkEntry.queries("q85_star_join")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE stages on THIS plan
    val plan = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).length
    assert(broadcasts >= 2,
      s"expected nation+region to broadcast, saw $broadcasts in:\n" +
        plan.take(4000))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"star join degraded to a nested-loop/cartesian plan:\n" +
        plan.take(4000))
  }
}
