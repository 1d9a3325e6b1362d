package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BloomPrune: the pruned join must be row-identical to the plain join
  * (no false negatives), actually prune (fpp ≪ 1 on disjoint keys),
  * and place the probe before the join in the plan. */
class BloomPruneSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private lazy val fact = spark.range(0, 20000)
    .select(col("id").as("f_key"), (col("id") % 7).as("payload"))
  private lazy val dim = spark.range(0, 20000)
    .filter(col("id") % 100 === 0)
    .select(col("id").as("d_key"), lit("x").as("tag"))

  test("pruned join is row-identical to the plain join") {
    val plain = fact.join(dim, col("f_key") === col("d_key"))
      .orderBy("f_key").collect()
    val pruned = BloomPrune.prunedJoin(fact, dim, "f_key", "d_key",
        expectedItems = 1000)
      .orderBy("f_key").collect()
    assert(pruned.toSeq === plain.toSeq)
  }

  test("filter prunes non-joining rows down to ~fpp") {
    val bytes = BloomPrune.buildFilter(dim, "d_key", expectedItems = 1000, fpp = 0.01)
    val survivors = BloomPrune.pruned(fact, "f_key", bytes).count()
    val joining = 200L // 20000 / 100
    assert(survivors >= joining, "false negatives are impossible")
    assert(survivors <= joining + 600,
      s"expected ≈1% fpp over 19800 non-joining rows, got $survivors survivors")
  }

  test("string keys probe through the same filter") {
    val sFact = fact.select(concat(lit("k"), col("f_key")).as("f_key"))
    val sDim = dim.select(concat(lit("k"), col("d_key")).as("d_key"))
    val bytes = BloomPrune.buildFilter(sDim, "d_key", expectedItems = 1000)
    val survivors = BloomPrune.pruned(sFact, "f_key", bytes)
    assert(survivors.count() >= 200)
    // every dim key must survive its own filter
    val misses = sDim.select(col("d_key").as("f_key"))
      .except(BloomPrune.pruned(sDim.select(col("d_key").as("f_key")), "f_key", bytes))
    assert(misses.count() === 0)
  }

  test("probe sits below the join in the plan") {
    val df = BloomPrune.prunedJoin(fact, dim, "f_key", "d_key", expectedItems = 1000)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"expected a bloom probe in the optimized plan:\n$plan")
  }

  test("rejects unsupported key types") {
    val err = intercept[Exception] {
      BloomPrune.pruned(fact.select(col("f_key").cast("double").as("f_key")),
        "f_key", BloomPrune.buildFilter(dim, "d_key", 100)).collect()
    }
    assert(err.getMessage.contains("bloom_might_contain"))
  }
}
