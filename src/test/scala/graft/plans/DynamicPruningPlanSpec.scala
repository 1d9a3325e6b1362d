package graft.plans

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** q87's 100 TB posture, plan-asserted: when the fact table is
  * partitioned on the join key and the dimension side carries the
  * selective filter, the partition filter must arrive at the fact scan
  * as a DYNAMIC pruning subquery — scanning every partition and
  * filtering after the join would read the full table for a one-
  * partition answer. Runs the real gate against the sf0.001 fixtures. */
class DynamicPruningPlanSpec extends AnyFunSuite with SparkTestBase {

  test("q87 fact scan carries a dynamic-pruning partition filter") {
    val df = graft.SparkEntry.queries("q87_dynamic_pruning")(
      spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE stages on THIS plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic partition pruning filter on the fact scan:\n" +
        plan.take(4000))
  }
}
