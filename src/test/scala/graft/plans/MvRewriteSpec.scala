package graft.plans

import graft.SparkTestBase
import graft.ops.{Catalog, Layout, Merge}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MvRewrite: aggregates over a registered lake version answer from the
  * IVM-maintained view. Pins:
  *   - the rewrite FIRES (optimized plan scans the view dir, zero base
  *     files) and the answer equals the un-rewritten aggregate;
  *   - exprId preservation: downstream operators over the aggregate
  *     keep working;
  *   - count-only queries match the key-only pruned shape;
  *   - refusals: raw-dir scans, a different grouping key, DISTINCT,
  *     sum over a double value, an aggregate the view never folded;
  *   - the conf kill switch;
  *   - composition with refreshHybridView: a view rolled forward by the
  *     IVM path registered at the NEW catalog version answers queries
  *     over that version.
  */
class MvRewriteSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-mv").toString

  /** force optimization NOW (QueryExecution caches it), so a conf set
    * at build time governs the plan regardless of when actions run. */
  private def pinPlan(df: DataFrame): DataFrame = {
    df.queryExecution.optimizedPlan
    df
  }

  /** root paths of every file scan in the OPTIMIZED plan (the rewrite
    * happens in the optimizer, so Dataset.inputFiles — analyzed-plan
    * based — cannot see it). */
  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  /** A small lake table with a DV wave, its view, and a catalog commit;
    * returns (dataDir, catalogPath). Rows: id 0..199, key = id % 5,
    * value = id (long); DV erases id % 7 == 0. */
  private def fixture(): (String, String) = {
    val root = freshDir()
    val t = s"$root/t"
    spark.range(200).select(col("id"),
        (col("id") % 5).as("k"), col("id").as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(t)
    Layout.statsManifest(spark, t, Seq("id")).write.parquet(s"$root/m1")
    val m1 = spark.read.parquet(s"$root/m1")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(200).filter(col("id") % 7 === 0).select("id"), "id")
      .write.parquet(s"$root/dv1")
    val dv1 = spark.read.parquet(s"$root/dv1")
    Merge.aggView(
        Layout.snapshotReadWithDeletes(spark, t, m1, dv1), "k", "v")
      .write.parquet(s"$root/view1")
    Catalog.commit(spark, s"$root/cat", Map(
      "manifest" -> s"$root/m1", "dv" -> s"$root/dv1",
      "view" -> s"$root/view1"))
    (t, s"$root/cat")
  }

  private def snapshotAt(dataDir: String, cat: String, v: Int): DataFrame = {
    val refs = Catalog.resolve(spark, cat, v)
    Layout.snapshotReadWithDeletes(spark, dataDir,
      spark.read.parquet(refs("manifest")), spark.read.parquet(refs("dv")))
  }

  test("full-panel aggregate rewrites to a view-only scan, exactly") {
    val (t, cat) = fixture()
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      def q() = snapshotAt(t, cat, 1).groupBy("k").agg(
        count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v2"), max(col("v")).as("max_v2"),
        avg(col("v")).as("avg_v")).orderBy("k")
      val rewritten = q()
      val roots = scanRoots(rewritten)
      assert(roots.nonEmpty && roots.forall(_.contains("/view1")),
        s"expected view-only scan, got $roots")
      // the rewritten grouped query is a Project over the view scan —
      // the groupBy's exchange is gone entirely (the sort's range
      // exchange from orderBy remains; no hash-partitioning for an agg)
      assert(!rewritten.queryExecution.optimizedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Aggregate]),
        "rewritten plan still aggregates")
      spark.conf.set(MvRewrite.EnabledConf, "false")
      val direct = try pinPlan(q()) finally
        spark.conf.set(MvRewrite.EnabledConf, "true")
      assert(scanRoots(direct).exists(_.contains("/t/")))
      assert(rewritten.collect().toSeq === direct.collect().toSeq)
    } finally MvRewrite.clear()
  }

  test("exprIds survive: downstream filter/join over the rewrite works") {
    val (t, cat) = fixture()
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      val agg = snapshotAt(t, cat, 1).groupBy("k")
        .agg(count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"))
      val downstream = agg.filter(col("n_rows") > 0)
        .join(Seq((0L, "zero"), (1L, "one")).toDF("k", "label"), Seq("k"))
        .orderBy("k")
      assert(scanRoots(downstream).exists(_.contains("/view1")))
      assert(downstream.count() === 2)
    } finally MvRewrite.clear()
  }

  test("count-only query matches the key-only pruned shape") {
    val (t, cat) = fixture()
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      val q = snapshotAt(t, cat, 1).groupBy("k")
        .agg(count(lit(1)).as("n_rows"))
      assert(scanRoots(q).forall(_.contains("/view1")))
      val expect = snapshotAt(t, cat, 1).groupBy("k").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(q.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        === expect)
    } finally MvRewrite.clear()
  }

  test("refusals: raw dir, other key, distinct, unfolded agg") {
    val (t, cat) = fixture()
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      // raw directory listing is NOT the registered version
      val raw = spark.read.parquet(t).groupBy("k")
        .agg(sum(col("v")).as("s"))
      assert(!scanRoots(raw).exists(_.contains("/view1")))
      // different grouping key
      val otherKey = snapshotAt(t, cat, 1).groupBy("id")
        .agg(sum(col("v")).as("s"))
      assert(!scanRoots(otherKey).exists(_.contains("/view1")))
      // DISTINCT aggregate is not foldable from the view
      val dist = snapshotAt(t, cat, 1).groupBy("k")
        .agg(countDistinct(col("v")).as("d"))
      assert(!scanRoots(dist).exists(_.contains("/view1")))
      // an aggregate the view never folded
      val other = snapshotAt(t, cat, 1).groupBy("k")
        .agg(sum(col("id") * 2).as("s2"))
      assert(!scanRoots(other).exists(_.contains("/view1")))
    } finally MvRewrite.clear()
  }

  test("sum over a DOUBLE value never rewrites (order-dependent)") {
    val root = freshDir()
    spark.range(100).select((col("id") % 3).as("k"),
        (col("id") / 7.0).as("v"))
      .write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("k"))
      .write.parquet(s"$root/m")
    val base = Layout.snapshotRead(spark, s"$root/t",
      spark.read.parquet(s"$root/m"))
    Merge.aggView(base, "k", "v").write.parquet(s"$root/view")
    try {
      MvRewrite.register(spark, "dbl", base, "k", "v", s"$root/view")
      val sumQ = Layout.snapshotRead(spark, s"$root/t",
          spark.read.parquet(s"$root/m"))
        .groupBy("k").agg(sum(col("v")).as("s"))
      assert(!scanRoots(sumQ).exists(_.contains("/view")))
      // but min/max/count over the same double view DO rewrite
      val mmQ = Layout.snapshotRead(spark, s"$root/t",
          spark.read.parquet(s"$root/m"))
        .groupBy("k").agg(min(col("v")).as("mn"),
          max(col("v")).as("mx"), count(lit(1)).as("n_rows"))
      assert(scanRoots(mmQ).forall(_.contains("/view")))
    } finally MvRewrite.clear()
  }

  test("pure SQL through the catalog TVF rewrites too") {
    val (t, cat) = fixture()
    graft.GraftExtensions.register(spark)
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      // no Scala DSL anywhere: the TVF resolves to the same snapshot
      // plan the registration stored, so the aggregate matches and the
      // SQL prompt is answered from the view
      val q = spark.sql(
        s"""SELECT k, COUNT(*) AS n_rows, SUM(v) AS sum_v,
           |  MIN(v) AS min_v2, MAX(v) AS max_v2
           |FROM graft_catalog_read('$t', '$cat', 1)
           |GROUP BY k ORDER BY k""".stripMargin)
      assert(scanRoots(q).forall(_.contains("/view1")),
        s"SQL path did not rewrite: ${scanRoots(q)}")
      spark.conf.set(MvRewrite.EnabledConf, "false")
      val direct = try pinPlan(snapshotAt(t, cat, 1).groupBy("k").agg(
        count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("min_v2"), max(col("v")).as("max_v2"))
        .orderBy("k")) finally
        spark.conf.set(MvRewrite.EnabledConf, "true")
      assert(q.collect().toSeq === direct.collect().toSeq)
    } finally MvRewrite.clear()
  }

  test("SQL-only loop: graft_mv_register + query, no Scala API") {
    val (t, cat) = fixture()
    graft.GraftExtensions.register(spark)
    try {
      // registration IS a SQL statement; it returns the view rows
      val reg = spark.sql(
        s"SELECT * FROM graft_mv_register('t_sql', '$t', '$cat', 'k', 'v', 1)")
      assert(reg.columns.toSet === Set("k", "n", "total", "min_v", "max_v"))
      assert(reg.count() === 5)
      val q = spark.sql(
        s"""SELECT k, COUNT(*) AS n_rows, SUM(v) AS sum_v
           |FROM graft_catalog_read('$t', '$cat', 1)
           |GROUP BY k ORDER BY k""".stripMargin)
      assert(scanRoots(q).forall(_.contains("/view1")),
        s"SQL-registered rewrite did not fire: ${scanRoots(q)}")
      assert(q.count() === 5)
    } finally MvRewrite.clear()
  }

  test("GLOBAL panel rolls up from the view: one agg over #groups rows") {
    val (t, cat) = fixture()
    try {
      MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      def q() = snapshotAt(t, cat, 1).agg(
        count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("mn"), max(col("v")).as("mx"),
        avg(col("v")).as("av"))
      val rewritten = q()
      assert(scanRoots(rewritten).forall(_.contains("/view1")),
        s"global rollup did not fire: ${scanRoots(rewritten)}")
      spark.conf.set(MvRewrite.EnabledConf, "false")
      val direct = try pinPlan(q()) finally
        spark.conf.set(MvRewrite.EnabledConf, "true")
      assert(rewritten.collect().toSeq === direct.collect().toSeq)
      // count(col) must REFUSE: the view's n counts null-value rows too
      val cc = snapshotAt(t, cat, 1).agg(count(col("v")).as("nv"))
      assert(!scanRoots(cc).exists(_.contains("/view1")))
    } finally MvRewrite.clear()
  }

  test("MULTI-KEY view: compound grouping in any order, plus a join") {
    val root = freshDir()
    val t = s"$root/t"
    spark.range(300).select(col("id"), (col("id") % 4).as("day"),
        (col("id") % 3).as("src"), col("id").as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(t)
    Layout.statsManifest(spark, t, Seq("id")).write.parquet(s"$root/m")
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(300).filter(col("id") % 13 === 0).select("id"), "id")
      .write.parquet(s"$root/dv")
    def snap() = Layout.snapshotReadWithDeletes(spark, t,
      spark.read.parquet(s"$root/m"), spark.read.parquet(s"$root/dv"))
    Merge.aggView(snap(), Seq("day", "src"), "v")
      .write.parquet(s"$root/view")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m",
      "dv" -> s"$root/dv", "view" -> s"$root/view"))
    try {
      MvRewrite.registerFromCatalogKeys(spark, "t_by_day_src", t,
        s"$root/cat", Seq("day", "src"), "v")
      // grouping order REVERSED vs registration — sets match
      def q() = snap().groupBy("src", "day").agg(
        count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        max(col("v")).as("mx")).orderBy("src", "day")
      val rewritten = q()
      assert(scanRoots(rewritten).forall(_.contains("/view")),
        s"multi-key rewrite did not fire: ${scanRoots(rewritten)}")
      spark.conf.set(MvRewrite.EnabledConf, "false")
      val direct = try pinPlan(q()) finally
        spark.conf.set(MvRewrite.EnabledConf, "true")
      assert(rewritten.collect().toSeq === direct.collect().toSeq)
      // a join on ONE of the keys pushes isnotnull(day) through the
      // Aggregate — the subset variant matches and re-filters the view
      import spark.implicits._
      val joined = snap().groupBy("day", "src")
        .agg(sum(col("v")).as("sum_v"))
        .join(Seq((0L, "d0"), (1L, "d1")).toDF("day", "label"), Seq("day"))
      assert(scanRoots(joined).exists(_.contains("/view")),
        "subset isnotnull variant did not match")
      assert(joined.count() === 6) // days 0,1 × src 0,1,2
      // grouping by a STRICT SUBSET of the keys must refuse (would
      // double-count nothing here, but is a different grouping set)
      val subset = snap().groupBy("day").agg(sum(col("v")).as("s"))
      assert(!scanRoots(subset).exists(_.contains("/view")))
    } finally MvRewrite.clear()
  }

  test("IVM composition: hybrid-refreshed view answers the new version") {
    val (t, cat) = fixture()
    val root = new java.io.File(t).getParent
    try {
      // roll the table forward: append + a second DV wave
      spark.range(200, 260).select(col("id"),
          (col("id") % 5).as("k"), col("id").as("v"))
        .repartitionByRange(2, col("id"))
        .write.mode("append").parquet(t)
      val m1 = spark.read.parquet(s"$root/m1")
      Layout.extendManifest(spark, t, m1, Seq("id"))
        .write.parquet(s"$root/m2")
      val m2 = spark.read.parquet(s"$root/m2")
      spark.read.parquet(s"$root/dv1").unionAll(
          Layout.deletionVectorsForKeys(spark, t,
            spark.range(260).filter(col("id") % 11 === 3).select("id"), "id"))
        .distinct().write.parquet(s"$root/dv2")
      val dv2 = spark.read.parquet(s"$root/dv2")
      // IVM: fold the change feed through refreshHybridView
      val delta = Layout.snapshotDiff(spark, t, m1, m2,
          spark.read.parquet(s"$root/dv1"), dv2)
        .withColumn("sign", when(col("_change_type") === "insert", lit(1L))
          .otherwise(lit(-1L)))
        .select(col("k"), col("v"), col("sign"))
      val baseNew = Layout.snapshotReadWithDeletes(spark, t, m2, dv2)
        .select("k", "v")
      Merge.refreshHybridView(spark.read.parquet(s"$root/view1"), delta,
          baseNew, "k", "v", "sign")
        .write.parquet(s"$root/view2")
      Catalog.commit(spark, cat, Map("manifest" -> s"$root/m2",
        "dv" -> s"$root/dv2", "view" -> s"$root/view2"))
      val v = MvRewrite.registerFromCatalog(spark, "t_by_k", t, cat, "k", "v")
      assert(v === 2)
      def q() = snapshotAt(t, cat, 2).groupBy("k").agg(
        count(lit(1)).as("n_rows"), sum(col("v")).as("sum_v"),
        min(col("v")).as("mn"), max(col("v")).as("mx")).orderBy("k")
      val rewritten = q()
      assert(scanRoots(rewritten).forall(_.contains("/view2")))
      spark.conf.set(MvRewrite.EnabledConf, "false")
      val direct = try pinPlan(q()) finally
        spark.conf.set(MvRewrite.EnabledConf, "true")
      assert(rewritten.collect().toSeq === direct.collect().toSeq)
      // the OLD version still answers from the old view when registered
      MvRewrite.registerFromCatalog(spark, "t_by_k_v1", t, cat, "k", "v",
        version = Some(1))
      val old = snapshotAt(t, cat, 1).groupBy("k")
        .agg(sum(col("v")).as("sum_v"))
      assert(scanRoots(old).forall(_.contains("/view1")))
    } finally MvRewrite.clear()
  }
}
