package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hierarchy.rootAndDepth: pointer doubling resolves forests in
  * O(log depth) passes with exact depths and roots. */
class HierarchySpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def solve(parents: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    Hierarchy.rootAndDepth(parents.toDF("node", "parent"), "node", "parent")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("a chain resolves to one root with exact depths") {
    // 1 ← 2 ← 3 ← … ← 40 (root 1 self-parented)
    val chain = (1L to 40L).map(k => k -> math.max(1L, k - 1)).map {
      case (k, p) => (k, if (k == 1) 1L else p)
    }
    val r = solve(chain)
    assert(r(1L) === ((1L, 0L)))
    assert(r(40L) === ((1L, 39L)))
    assert((1L to 40L).forall(k => r(k) === ((1L, k - 1))))
  }

  test("a forest keeps components separate") {
    val forest = Seq((1L, 1L), (2L, 1L), (3L, 2L), (10L, 10L), (11L, 10L))
    val r = solve(forest)
    assert(r(3L) === ((1L, 2L)))
    assert(r(11L) === ((10L, 1L)))
    assert(r(10L) === ((10L, 0L)))
  }

  test("a star resolves in one pass; results repartition-stable") {
    val star = (2L to 200L).map(k => (k, 1L)) :+ ((1L, 1L))
    val a = solve(star)
    assert(a.values.forall(_._1 == 1L))
    assert(a(150L)._2 === 1L)
    val b = Hierarchy.rootAndDepth(
      star.toDF("node", "parent").repartition(7), "node", "parent")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(a === b)
  }

  test("dangling parent pointer is detected, not silently dropped") {
    // node 3's parent 99 never appears as a node
    val e = intercept[IllegalArgumentException] {
      solve(Seq((1L, 1L), (2L, 1L), (3L, 99L)))
    }
    assert(e.getMessage.contains("outside the node set"))
  }

  test("duplicate node rows are diagnosed as such, not as dangling pointers") {
    val e = intercept[IllegalArgumentException] {
      solve(Seq((1L, 1L), (1L, 1L), (2L, 1L)))
    }
    assert(e.getMessage.contains("not unique"))
  }

  test("a parent cycle is detected instead of returning wrong state") {
    // 1 → 2 → 1 never converges (distances grow every pass)
    val e = intercept[IllegalStateException] {
      Hierarchy.rootAndDepth(
        Seq((1L, 2L), (2L, 1L)).toDF("node", "parent"),
        "node", "parent", maxIters = 8)
    }
    assert(e.getMessage.contains("no convergence"))
  }
}
