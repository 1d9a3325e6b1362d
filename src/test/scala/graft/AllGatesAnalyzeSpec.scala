package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered gate must still ANALYZE against the current
  * fixtures — the guard round 9 lacked: fixture/schema drift broke 23
  * gates and `Verify`'s per-query catch turned them into silent
  * omissions. Here each gate builds its DataFrame against sf0.001 and
  * forces analysis, so `sbt test` names the broken gate the day the
  * drift lands, not at the driver's bench.
  *
  * Construction alone executes the streaming gates (their query
  * functions run the micro-batch to a memory sink) — that's accepted
  * cost at sf0.001; batch gates stop at the analyzed plan.
  *
  * Also pins the registry contract: every `queries` key has an
  * `oracleSql` entry and vice versa (the driver compare needs both).
  */
class AllGatesAnalyzeSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("queries and oracleSql cover the same gate names") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"gate $name analyzes against sf0.001") {
      val df = fn(spark, sfDir)
      // analysis (not execution) is the drift tripwire for batch gates
      assert(df.queryExecution.analyzed.schema.fields.nonEmpty)
    }
  }
}
