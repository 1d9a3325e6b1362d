package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SchemaEvolution: rename/drop/re-add/widen through the column-mapping
  * artifact — no file rewrites, no resurrection, atomic via the catalog. */
class SchemaEvolutionSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-evo-$tag").toString

  test("rename serves old files under the new logical name; writers keep the physical name") {
    val root = freshDir("ren")
    val e1 = Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount")
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.rename(spark, map, "amount", "balance")
    // epoch 2 writes through the NEW logical name -> same physical col
    val e2 = Seq((3L, 30.0)).toDF("k", "balance")
    SchemaEvolution.toPhysical(e2, map).write.parquet(s"$root/t/c2")
    val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .unionByName(Layout.statsManifest(spark, s"$root/t/c2", Seq("k")))
    val got = SchemaEvolution.evolvedRead(spark, m, None, map)
    assert(got.columns.toSeq === Seq("k", "balance"))
    assert(got.orderBy("k").as[(Long, Double)].collect().toSeq
      === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
    // both epochs share one physical column in the footers
    val phys = spark.read.parquet(s"$root/t/c2").columns.toSeq
    assert(phys.contains("amount") && !phys.contains("balance"))
  }

  test("drop then re-add never resurrects old values; fresh physical name allocated") {
    val root = freshDir("readd")
    val e1 = Seq((1L, "secret"), (2L, "hidden")).toDF("k", "note")
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.dropColumn(spark, map, "note")
    map = SchemaEvolution.addColumn(spark, map, "note", "bigint")
    val e2 = Seq((3L, 99L)).toDF("k", "note")
    SchemaEvolution.toPhysical(e2, map).write.parquet(s"$root/t/c2")
    val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .unionByName(Layout.statsManifest(spark, s"$root/t/c2", Seq("k")))
    val got = SchemaEvolution.evolvedRead(spark, m, None, map)
      .orderBy("k").as[(Long, Option[Long])].collect().toSeq
    // epoch-1 rows: note is NULL (the string values are unreachable)
    assert(got === Seq((1L, None), (2L, None), (3L, Some(99L))))
    val ms = SchemaEvolution.mappings(map)
    assert(ms.count(_.physical.startsWith("note")) === 2)
    assert(ms.find(m2 => m2.logical == "note" && !m2.dropped)
      .get.physical === "note__v2")
  }

  test("retype widens at read; added-but-never-written column serves typed nulls") {
    val root = freshDir("widen")
    val e1 = spark.range(3).select(col("id").cast("int").as("k"),
      (col("id") * 2).cast("int").as("v"))
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.retype(spark, map, "v", "bigint")
    map = SchemaEvolution.addColumn(spark, map, "tag", "string")
    val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
    val got = SchemaEvolution.evolvedRead(spark, m, None, map)
    assert(got.schema("v").dataType.simpleString === "bigint")
    assert(got.schema("tag").dataType.simpleString === "string")
    assert(got.filter(col("tag").isNull).count() === 3)
    assert(got.agg(sum("v")).head().getLong(0) === 6L)
  }

  test("retype THEN append stays readable: old narrow epochs widen at scan next to new wide ones") {
    val root = freshDir("mixep")
    // epoch 1: int + float physical types
    val e1 = spark.range(3).select(col("id").cast("int").as("k"),
      (col("id") * 2).cast("int").as("v"),
      (col("id") * 1.5).cast("float").as("w"))
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.retype(spark, map, "v", "bigint")
    map = SchemaEvolution.retype(spark, map, "w", "double")
    // epoch 2 writes THROUGH the widened mapping -> bigint/double
    // footers land next to epoch 1's int/float ones (the shape footer
    // merging cannot read: StructType.merge throws on int vs bigint)
    val e2 = Seq((10, 4000000000L, 9.25)).toDF("k", "v", "w")
    SchemaEvolution.toPhysical(e2, map).write.parquet(s"$root/t/c2")
    val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .unionByName(Layout.statsManifest(spark, s"$root/t/c2", Seq("k")))
    val got = SchemaEvolution.evolvedRead(spark, m, None, map)
    assert(got.schema("v").dataType.simpleString === "bigint")
    assert(got.schema("w").dataType.simpleString === "double")
    assert(got.orderBy("k").as[(Int, Long, Double)].collect().toSeq
      === Seq((0, 0L, 0.0), (1, 2L, 1.5), (2, 4L, 3.0),
        (10, 4000000000L, 9.25)))
  }

  test("every admitted widening actually READS across mixed epochs") {
    // the whitelist is only honest if the parquet reader performs each
    // conversion under a requested schema — pin every admitted pair by
    // writing a narrow epoch, retyping, writing a wide epoch, reading
    val cases = Seq(
      ("tinyint", "smallint", "1", "300"),
      ("tinyint", "int", "2", "70000"),
      ("tinyint", "bigint", "3", "5000000000"),
      ("tinyint", "double", "4", "1.5"),
      ("smallint", "int", "5", "70000"),
      ("smallint", "bigint", "6", "5000000000"),
      ("smallint", "double", "7", "2.5"),
      ("int", "bigint", "8", "5000000000"),
      ("int", "double", "9", "3.5"),
      ("float", "double", "1.25", "4.5"),
      ("decimal(10,2)", "decimal(18,2)", "12345678.90", "1234567890123456.78"),
      ("decimal(10,2)", "decimal(20,4)", "12345678.90", "123456789012345.6789"))
    cases.foreach { case (from, to, narrowV, wideV) =>
      val root = freshDir("widenrt")
      val e1 = spark.sql(s"SELECT CAST($narrowV AS $from) AS v")
      var map = SchemaEvolution.initial(spark, e1.schema)
      SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
      map = SchemaEvolution.retype(spark, map, "v", to)
      SchemaEvolution.toPhysical(
        spark.sql(s"SELECT CAST($wideV AS $to) AS v"), map)
        .write.parquet(s"$root/t/c2")
      val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("v"))
        .unionByName(Layout.statsManifest(spark, s"$root/t/c2", Seq("v")))
      val got = SchemaEvolution.evolvedRead(spark, m, None, map)
      assert(got.schema("v").dataType.simpleString === to,
        s"$from -> $to: wrong read type")
      val expected = spark.sql(
        s"SELECT CAST(CAST($narrowV AS $from) AS $to) AS v " +
          s"UNION ALL SELECT CAST($wideV AS $to)").collect().toSet
      assert(got.collect().toSet === expected,
        s"$from -> $to: mixed-epoch read returned wrong values")
    }
  }

  test("retype refuses non-widenable conversions at DDL time") {
    val df = Seq((1, "x")).toDF("k", "s")
    val map = SchemaEvolution.initial(spark, df.schema)
    val e = intercept[IllegalArgumentException] {
      SchemaEvolution.retype(spark, map, "k", "string")
    }
    assert(e.getMessage.contains("not a parquet-widenable"))
    intercept[IllegalArgumentException] {
      SchemaEvolution.retype(spark, map, "s", "int")
    }
    // decimal: scale may not shrink, integer room may not shrink
    val dmap = SchemaEvolution.initial(spark,
      Seq(Tuple1(BigDecimal(1))).toDF("d")
        .select(col("d").cast("decimal(10,2)").as("d")).schema)
    SchemaEvolution.retype(spark, dmap, "d", "decimal(18,2)")
    SchemaEvolution.retype(spark, dmap, "d", "decimal(20,4)")
    intercept[IllegalArgumentException] {
      SchemaEvolution.retype(spark, dmap, "d", "decimal(10,4)") // room shrinks
    }
  }

  test("empty manifest reads as an empty frame with the mapped logical schema") {
    val root = freshDir("empty")
    val e1 = Seq((1L, 10.0)).toDF("k", "amount")
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.rename(spark, map, "amount", "balance")
    val m0 = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .filter(lit(false)) // all files merged/compacted away
    val got = SchemaEvolution.evolvedRead(spark, m0, None, map)
    assert(got.columns.toSeq === Seq("k", "balance"))
    assert(got.schema("balance").dataType.simpleString === "double")
    assert(got.count() === 0)
  }

  test("guards: rename to live name, add live name, toPhysical drift all refuse") {
    val df = Seq((1L, 1.0)).toDF("k", "v")
    val map = SchemaEvolution.initial(spark, df.schema)
    intercept[IllegalArgumentException] {
      SchemaEvolution.rename(spark, map, "v", "k")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.addColumn(spark, map, "k", "bigint")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.dropColumn(spark, map, "nope")
    }
    intercept[IllegalArgumentException] {
      SchemaEvolution.toPhysical(Seq((1L)).toDF("k"), map)
    }
  }

  test("catalog flip is atomic: old version keeps the old schema over the same files") {
    val root = freshDir("cat")
    val e1 = Seq((1L, 5.0)).toDF("k", "amount")
    val map1 = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map1).write.parquet(s"$root/t/c1")
    Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .write.parquet(s"$root/m1")
    map1.write.parquet(s"$root/cm1")
    Catalog.commit(spark, s"$root/cat",
      Map("manifest" -> s"$root/m1", "colmap" -> s"$root/cm1"))
    val map2 = SchemaEvolution.rename(spark, map1, "amount", "balance")
    val v2 = SchemaEvolution.evolveCommit(spark, s"$root/cat", root, map2)
    assert(v2 === 2)
    assert(SchemaEvolution.evolvedCatalogRead(spark, s"$root/cat", 1)
      .columns.toSeq === Seq("k", "amount"))
    assert(SchemaEvolution.evolvedCatalogRead(spark, s"$root/cat", 2)
      .columns.toSeq === Seq("k", "balance"))
    // manifest carried forward untouched by the schema commit
    assert(Catalog.resolve(spark, s"$root/cat", 2)("manifest")
      === s"$root/m1")
  }

  test("merge-on-read composes with an evolved schema: logical changes, physical files") {
    val root = freshDir("mor")
    // table born (k, v); committed with manifest + colmap
    val e1 = spark.range(100).select(col("id").as("k"),
      (col("id") * 10).as("v"))
    val map1 = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map1)
      .repartitionByRange(2, col("k")).write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("k"))
      .write.parquet(s"$root/m1")
    map1.write.parquet(s"$root/cm1")
    Catalog.commit(spark, s"$root/cat",
      Map("manifest" -> s"$root/m1", "colmap" -> s"$root/cm1"))
    // rename v -> amount; a LOGICAL-schema change batch then merges:
    // toPhysical translates it (passthrough is_delete), the merge keys
    // on the PHYSICAL column name, and the evolved read serves the
    // merged rows under the new logical name
    val map2 = SchemaEvolution.rename(spark, map1, "v", "amount")
    SchemaEvolution.evolveCommit(spark, s"$root/cat", root, map2)
    val changes = Seq((5L, 555L, false), (6L, 0L, true), (200L, 7L, false))
      .toDF("k", "amount", "is_delete")
    val v3 = Layout.mergeOnReadCommit(spark, s"$root/t", s"$root/cat", root,
      SchemaEvolution.toPhysical(changes, map2, Seq("is_delete")),
      SchemaEvolution.physicalName(map2, "k"), "is_delete",
      Seq(SchemaEvolution.physicalName(map2, "k")))
    // the merge commit carries the colmap forward (schema is
    // data-independent) — the evolved read resolves entirely from v3
    val got = SchemaEvolution.evolvedCatalogRead(spark, s"$root/cat", v3)
    assert(got.columns.toSeq === Seq("k", "amount"))
    assert(got.count() === 100)
    assert(got.filter(col("k") === 5L).head().getLong(1) === 555L)
    assert(got.filter(col("k") === 6L).isEmpty)
    assert(got.filter(col("k") === 200L).head().getLong(1) === 7L)
  }

  test("stale-mapping writers stay safe: rename absorbs them, drop+re-add quarantines them") {
    val root = freshDir("stale")
    val e1 = Seq((1L, 10L)).toDF("k", "v")
    val map1 = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map1).write.parquet(s"$root/t/c1")
    // rename v -> balance; a writer still holding map1 commits an epoch
    // THROUGH THE OLD MAPPING — physical names did not change, so its
    // rows serve correctly under the new logical name
    val map2 = SchemaEvolution.rename(spark, map1, "v", "balance")
    SchemaEvolution.toPhysical(Seq((2L, 20L)).toDF("k", "v"), map1)
      .write.parquet(s"$root/t/c2")
    val m12 = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
      .unionByName(Layout.statsManifest(spark, s"$root/t/c2", Seq("k")))
    assert(SchemaEvolution.evolvedRead(spark, m12, None, map2)
      .orderBy("k").as[(Long, Long)].collect().toSeq
      === Seq((1L, 10L), (2L, 20L)))
    // drop balance, re-add it: a writer STILL on map1 commits afterward
    // — its values land in the tombstoned physical column and stay
    // invisible (quarantined, never resurrected into the new column)
    val map3 = SchemaEvolution.addColumn(spark,
      SchemaEvolution.dropColumn(spark, map2, "balance"),
      "balance", "bigint")
    SchemaEvolution.toPhysical(Seq((3L, 30L)).toDF("k", "v"), map1)
      .write.parquet(s"$root/t/c3")
    val m123 = m12.unionByName(
      Layout.statsManifest(spark, s"$root/t/c3", Seq("k")))
    val got = SchemaEvolution.evolvedRead(spark, m123, None, map3)
      .orderBy("k").as[(Long, Option[Long])].collect().toSeq
    assert(got === Seq((1L, None), (2L, None), (3L, None)))
  }

  test("DV subtraction composes with the mapping projection") {
    val root = freshDir("dv")
    val e1 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "amount")
    var map = SchemaEvolution.initial(spark, e1.schema)
    SchemaEvolution.toPhysical(e1, map).write.parquet(s"$root/t/c1")
    map = SchemaEvolution.rename(spark, map, "amount", "balance")
    val dv = Layout.deletionVectors(spark, s"$root/t/c1", col("k") === 2L)
    val m = Layout.statsManifest(spark, s"$root/t/c1", Seq("k"))
    val got = SchemaEvolution.evolvedRead(spark, m, Some(dv), map)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(got === Seq((1L, 10.0), (3L, 30.0)))
  }
}
