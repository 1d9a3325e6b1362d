package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Merge.refreshHybridView: (count, sum, min, max) maintenance under a
  * mixed signed changeset, each aggregate routed down its cheapest
  * correct path. Pins the contracts the doc makes:
  * (1) result ≡ a full recompute over the post-change base, across
  *     inserts, deletes, new groups and fully-deleted groups;
  * (2) min/max FOLD for insert-only groups — proven structurally by
  *     handing the op a base slice holding ONLY the delete-touched
  *     groups' rows (anything else it tried to read is absent, so a
  *     recompute-everything implementation would corrupt those groups);
  * (3) untouched groups pass through verbatim;
  * (4) a group whose rows all retract drops out. */
class ViewMaintenanceSpec extends AnyFunSuite with SparkTestBase {

  private def mkBase(n: Long): DataFrame =
    spark.range(n).select(
      (col("id") % 10).as("g"),
      (col("id") % 97).cast("double").as("x"),
      col("id").as("rid"))

  private def view(df: DataFrame): DataFrame =
    df.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(18,2)")).as("total"),
      min(col("x")).as("min_v"),
      max(col("x")).as("max_v"))

  private def canon(df: DataFrame): Seq[(Long, Long, Double, Double, Double)] =
    df.select(col("g"), col("n"), col("total").cast("double"),
        col("min_v"), col("max_v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1).toSeq

  test("hybrid refresh equals the full recompute over the changed base") {
    val base0 = mkBase(1000).filter(col("rid") % 7 =!= 0)
    val state = Ckpt.pinned(view(base0))
    // inserts: the missing rid % 7 rows; deletes: groups 2 and 5 lose
    // their low-x rows (which ARE those groups' min bounds)
    val inserts = mkBase(1000).filter(col("rid") % 7 === 0)
      .withColumn("sign", lit(1L))
    val deletes = base0.filter(col("g").isin(2L, 5L) && col("x") < 20.0)
      .withColumn("sign", lit(-1L))
    val delta = inserts.unionAll(deletes)
    val baseNew = mkBase(1000)
      .filter(!(col("g").isin(2L, 5L) && col("x") < 20.0) ||
        col("rid") % 7 === 0)
    val got = Merge.refreshHybridView(state, delta, baseNew, "g", "x", "sign")
    assert(canon(got) === canon(view(baseNew)))
  }

  test("insert-only groups never touch the base (structural)") {
    val base0 = mkBase(1000)
    val state = Ckpt.pinned(view(base0))
    val inserts = spark.range(1000, 1300).select(
        (col("id") % 10).as("g"),
        (col("id") % 211).cast("double").as("x"), col("id").as("rid"))
      .filter(col("g") =!= 3) // group 3 is delete-touched below
    val deletes = base0.filter(col("g") === 3 && col("x") < 30.0)
    val delta = inserts.withColumn("sign", lit(1L))
      .unionAll(deletes.withColumn("sign", lit(-1L)))
    val baseNew = base0.filter(!(col("g") === 3 && col("x") < 30.0))
      .unionAll(inserts)
    // hand the op a base holding ONLY group 3's post-change rows: if
    // any other group's refresh read the base, its row would collapse
    // to that slice and the compare below would fail
    val baseSlice = baseNew.filter(col("g") === 3)
    val got = Merge.refreshHybridView(state, delta, baseSlice, "g", "x", "sign")
    assert(canon(got) === canon(view(baseNew)))
  }

  test("new groups appear, fully-retracted groups drop") {
    val base0 = mkBase(100).filter(col("g") < 5)
    val state = Ckpt.pinned(view(base0))
    // group 99 is born from inserts alone; group 0 retracts entirely
    val delta = spark.range(3).select(lit(99L).as("g"),
        (col("id") + 1).cast("double").as("x"), col("id").as("rid"))
      .withColumn("sign", lit(1L))
      .unionAll(base0.filter(col("g") === 0).withColumn("sign", lit(-1L)))
    val baseNew = base0.filter(col("g") =!= 0).unionAll(
      spark.range(3).select(lit(99L).as("g"),
        (col("id") + 1).cast("double").as("x"), col("id").as("rid")))
    val got = Merge.refreshHybridView(state, delta, baseNew, "g", "x", "sign")
    assert(canon(got) === canon(view(baseNew)))
    val groups = canon(got).map(_._1)
    assert(groups.contains(99L) && !groups.contains(0L))
  }

  test("empty delta is the identity") {
    val base0 = mkBase(200)
    val state = Ckpt.pinned(view(base0))
    val delta = base0.withColumn("sign", lit(1L)).limit(0)
    val got = Merge.refreshHybridView(state, delta, base0.limit(0),
      "g", "x", "sign")
    assert(canon(got) === canon(state))
  }
}
