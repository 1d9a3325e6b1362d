package graft.schema

import graft.SparkTestBase
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaUtilsSpec extends AnyFunSuite with SparkTestBase {

  private val nested = StructType(Seq(
    StructField("b", StructType(Seq(
      StructField("y", IntegerType),
      StructField("x", StringType)))),
    StructField("a", LongType)))

  private val nestedReordered = StructType(Seq(
    StructField("A", LongType, nullable = false),
    StructField("B", StructType(Seq(
      StructField("x", StringType),
      StructField("Y", IntegerType))))))

  test("isEquivalent is order-, case-, nullability- and metadata-insensitive") {
    assert(SchemaUtils.isEquivalent(nested, nestedReordered))
    val withMeta = StructType(nested.fields.map(f =>
      f.copy(metadata = new MetadataBuilder().putString("k", "v").build())))
    assert(SchemaUtils.isEquivalent(nested, withMeta))
  }

  test("isEquivalent rejects missing fields and type mismatches") {
    val missing = StructType(nested.fields.take(1))
    assert(!SchemaUtils.isEquivalent(nested, missing))
    val retyped = StructType(Seq(
      StructField("b", StructType(Seq(
        StructField("y", StringType), StructField("x", StringType)))),
      StructField("a", LongType)))
    assert(!SchemaUtils.isEquivalent(nested, retyped))
  }

  test("diffSchema reports dotted paths of missing/mismatched fields") {
    val other = StructType(Seq(
      StructField("b", StructType(Seq(StructField("x", StringType)))),
      StructField("a", LongType),
      StructField("c", DoubleType)))
    assert(SchemaUtils.diffSchema(nested, other) == Seq("b.y"))
    assert(SchemaUtils.diffSchema(other, nested) == Seq("c"))
  }

  test("isSubset checks recursive containment") {
    val sub = StructType(Seq(
      StructField("b", StructType(Seq(StructField("x", StringType))))))
    assert(SchemaUtils.isSubset(sub, nested))
    assert(!SchemaUtils.isSubset(nested, sub))
  }

  test("stripMetadata strips recursively") {
    val meta = new MetadataBuilder().putString("k", "v").build()
    val s = StructType(Seq(StructField("s", StructType(Seq(
      StructField("i", IntegerType, nullable = true, meta))), nullable = true, meta)))
    val stripped = SchemaUtils.stripMetadata(s)
    assert(stripped("s").metadata == Metadata.empty)
    assert(stripped("s").dataType.asInstanceOf[StructType]("i").metadata == Metadata.empty)
  }

  test("dataFrameSelector aligns two column-order-shuffled DataFrames") {
    import spark.implicits._
    val df1 = spark.sql(
      "SELECT 1 AS a, named_struct('y', 2, 'x', 'p') AS b UNION ALL SELECT 3, named_struct('y', 4, 'x', 'q')")
    val df2 = spark.sql(
      "SELECT named_struct('x', 'p', 'y', 2) AS b, 1 AS a UNION ALL SELECT named_struct('x', 'q', 'y', 4), 3")
    val s1 = df1.select(SchemaUtils.dataFrameSelector(df1.schema): _*)
    val s2 = df2.select(SchemaUtils.dataFrameSelector(df2.schema): _*)
    assert(s1.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(s1.schema == s2.schema)
    assert(s1.except(s2).count() == 0 && s2.except(s1).count() == 0)
  }

  test("dataFrameSelector sorts inside arrays of structs") {
    val df1 = spark.sql("SELECT array(named_struct('y', 1, 'x', 'a')) AS arr")
    val df2 = spark.sql("SELECT array(named_struct('x', 'a', 'y', 1)) AS arr")
    val s1 = df1.select(SchemaUtils.dataFrameSelector(df1.schema): _*)
    val s2 = df2.select(SchemaUtils.dataFrameSelector(df2.schema): _*)
    assert(s1.schema == s2.schema)
    assert(s1.except(s2).count() == 0)
  }
}
