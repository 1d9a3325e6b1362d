package graft.ops

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** q80/q81 gate semantics against BRUTE FORCE on sf0.001 — the window
  * formulations are clever enough (preceding-min dominance, monotone
  * qualification) to deserve an independent O(n²)/direct check beyond
  * the DuckDB oracle, which mirrors the same window shape. */
class SkylineMedianSpec extends AnyFunSuite with SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("q80 skyline equals the O(n²) dominance definition") {
    val frontier = SparkEntry.queries("q80_skyline")(spark, sfDir)
      .select("l_returnflag", "price", "qty")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val points = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").as("price"),
        col("l_quantity").cast("long").as("qty"))
      .count()
      .select(col("l_returnflag"), col("price").cast("double"), col("qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val byGroup = points.groupBy(_._1)
    val brute = points.filter { case (g, p, q) =>
      !byGroup(g).exists { case (_, p2, q2) =>
        p2 <= p && q2 <= q && (p2 < p || q2 < q)
      }
    }.toSet
    assert(frontier === brute)
    assert(frontier.nonEmpty)
  }

  test("q81 weighted median: half the weight sits at or beyond it, on both sides") {
    val med = SparkEntry.queries("q81_weighted_median")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toList
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag"),
        col("l_extendedprice").cast("decimal(18,2)").cast("double").as("v"),
        col("l_quantity").cast("long").as("w"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(med.nonEmpty)
    med.foreach { case (g, m, tot) =>
      val grp = rows.filter(_._1 == g)
      assert(grp.map(_._3).sum === tot)
      // the defining inequalities of a weighted median
      val wBelowOrAt = grp.filter(_._2 <= m).map(_._3).sum
      val wAboveOrAt = grp.filter(_._2 >= m).map(_._3).sum
      assert(2 * wBelowOrAt >= tot, s"group $g: left mass short")
      assert(2 * wAboveOrAt >= tot, s"group $g: right mass short")
    }
  }
}
