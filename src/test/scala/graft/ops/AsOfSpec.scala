package graft.ops

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("asOfJoin attaches the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 9L, 900.0))
      .toDF("k", "ts", "v")
    val rows = AsOf.asOfJoin(left, right, "k", "ts", Seq("v"))
      .orderBy("k", "ts").collect()
    // (1,10): right at the SAME ts matches (backward-inclusive)
    assert(rows(0).getAs[Double]("asof_v") == 100.0 && rows(0).getAs[Long]("asof_ts") == 10L)
    // (1,20): latest prior right is ts=15
    assert(rows(1).getAs[Double]("asof_v") == 150.0)
    // (2,5): right row is later (ts=9) → no match, nulls
    assert(rows(2).isNullAt(rows(2).fieldIndex("asof_v")))
    // left columns survive untouched
    assert(rows.map(_.getAs[String]("name")).toSeq == Seq("a", "b", "c"))
  }

  test("forward asOfJoin attaches the earliest right row at or after each left ts") {
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (2L, 3L, 900.0))
      .toDF("k", "ts", "v")
    val rows = AsOf.asOfJoin(left, right, "k", "ts", Seq("v"),
        direction = "forward")
      .orderBy("k", "ts").collect()
    // (1,10): right at the SAME ts matches (forward-inclusive)
    assert(rows(0).getAs[Double]("asof_v") == 100.0 && rows(0).getAs[Long]("asof_ts") == 10L)
    // (1,20): no later right row → nulls
    assert(rows(1).isNullAt(rows(1).fieldIndex("asof_v")))
    // (2,5): right row is earlier (ts=3) → no match in forward mode
    assert(rows(2).isNullAt(rows(2).fieldIndex("asof_v")))
    // forward ties reduce to the MIN payload struct
    val l2 = Seq((1L, 10L)).toDF("k", "ts")
    val r2 = Seq((1L, 12L, 9.0), (1L, 12L, 2.0)).toDF("k", "ts", "v")
    val picked = AsOf.asOfJoin(l2, r2, "k", "ts", Seq("v"),
      direction = "forward").collect().head
    assert(picked.getAs[Double]("asof_v") == 2.0)
  }

  test("duplicate right rows on one (key, ts) reduce deterministically") {
    val left = Seq((1L, 10L)).toDF("k", "ts")
    val right = Seq((1L, 5L, 1.0), (1L, 5L, 7.0), (1L, 5L, 3.0)).toDF("k", "ts", "v")
    val r = AsOf.asOfJoin(left, right, "k", "ts", Seq("v")).collect().head
    assert(r.getAs[Double]("asof_v") == 7.0) // max payload struct wins
  }
}
