package graft.schema

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class FlattenerSpec extends AnyFunSuite with SparkTestBase {

  test("flattens nested structs to underscore-joined scalar columns") {
    val df = spark.sql(
      "SELECT 1 AS id, named_struct('b', named_struct('c', 7), 'd', 'x') AS a")
    val flat = Flattener.flattenDataFrame(df)
    assert(flat.schema.fieldNames.toSeq == Seq("id", "a_b_c", "a_d"))
    assert(flat.collect().toSeq == Seq(Row(1, 7, "x")))
  }

  test("expands arrays positionally to the max observed length, padding nulls") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        | (1, array(named_struct('name', 'a'), named_struct('name', 'b'))),
        | (2, array(named_struct('name', 'c')))
        | AS t(id, b)""".stripMargin)
    val flat = Flattener.flattenDataFrame(df)
    assert(flat.schema.fieldNames.toSeq == Seq("id", "b_0_name", "b_1_name"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0) == Row(1, "a", "b"))
    assert(rows(1) == Row(2, "c", null))
  }

  test("flattens arrays of arrays with two index components") {
    val df = spark.sql(
      "SELECT * FROM VALUES (1, array(array(1, 2), array(3))), (2, array(array(4))) AS t(id, a)")
    val flat = Flattener.flattenDataFrame(df)
    assert(flat.schema.fieldNames.toSeq ==
      Seq("id", "a_0_0", "a_0_1", "a_1_0", "a_1_1"))
    val rows = flat.orderBy("id").collect()
    assert(rows(0) == Row(1, 1, 2, 3, null))
    assert(rows(1) == Row(2, 4, null, null, null))
  }

  test("maxArrayLengths is a single aggregate pass combining all DataFrames") {
    val df1 = spark.sql("SELECT array(1,2,3) AS a, array(array('x')) AS b")
    val df2 = spark.sql("SELECT array(1) AS a, array(array('x','y'), array('z')) AS b")
    val lens = Flattener.maxArrayLengths(Seq(df1, df2))
    assert(lens == Map("a" -> 3, "b" -> 2, "b[]" -> 2))
  }

  test("empty and null arrays yield zero columns / zero lengths") {
    val df = spark.sql("SELECT 1 AS id, CAST(array() AS array<int>) AS a " +
      "UNION ALL SELECT 2, CAST(NULL AS array<int>)")
    val lens = Flattener.maxArrayLengths(Seq(df))
    assert(lens == Map("a" -> 0))
    val flat = Flattener.flattenDataFrame(df)
    assert(flat.schema.fieldNames.toSeq == Seq("id"))
  }

  test("flattens the reference's deepest fixture shape (FIXTURES.md §3)") {
    // id, legs: array<struct<conditions: array<struct<checks:
    //   array<struct<checkNums: array<string>>>>>, legid: long>>
    val df = spark.sql(
      """SELECT 1L AS id, array(named_struct(
        |  'conditions', array(named_struct(
        |    'checks', array(named_struct(
        |      'checkNums', array('a', 'b', 'c'))))),
        |  'legid', 7L)) AS legs""".stripMargin)
    val flat = Flattener.flattenDataFrame(df)
    assert(flat.schema.fieldNames.toSeq == Seq(
      "id",
      "legs_0_conditions_0_checks_0_checkNums_0",
      "legs_0_conditions_0_checks_0_checkNums_1",
      "legs_0_conditions_0_checks_0_checkNums_2",
      "legs_0_legid"))
    assert(flat.collect().head == Row(1L, "a", "b", "c", 7L))
  }

  test("shared select list aligns two DataFrames with different array lengths") {
    val df1 = spark.sql("SELECT 1 AS id, array('p') AS tags")
    val df2 = spark.sql("SELECT 1 AS id, array('p', 'q') AS tags")
    val sel = Flattener.sharedFlattenSelectList(Seq(df1, df2))
    val f1 = df1.select(sel: _*)
    val f2 = df2.select(sel: _*)
    assert(f1.schema == f2.schema)
    assert(f1.collect().head == Row(1, "p", null))
    assert(f2.collect().head == Row(1, "p", "q"))
  }
}
