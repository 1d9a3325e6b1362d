package graft.plans

import graft.SparkTestBase
import graft.ops.{Catalog, Layout}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** MetaAggRewrite: global count/min/max/count(col) over an append-only
  * snapshot answer from the stats manifest's per-file rows. Pins:
  *   - the full panel rewrites to a manifest-only scan and equals the
  *     direct aggregate (nulls included: count(col) vs count(*));
  *   - count(*)-only and single-column panels match their subset shapes;
  *   - refusals: grouped aggregates, non-stats columns, sum, a version
  *     carrying a non-empty DV (registration refuses);
  *   - the empty-table edge (count(*) = 0, min/max null).
  */
class MetaAggRewriteSpec extends AnyFunSuite with SparkTestBase {

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ma").toString

  private def scanRoots(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten

  private def pinPlan(df: DataFrame): DataFrame = {
    df.queryExecution.optimizedPlan
    df
  }

  /** id 0..499, ts = id*10, v = null every 3rd row. */
  private def fixture(): (String, String) = {
    val root = freshDir()
    spark.range(500).select(col("id"), (col("id") * 10).as("ts"),
        when(col("id") % 3 === 0, lit(null).cast("long"))
          .otherwise(col("id")).as("v"))
      .repartitionByRange(4, col("id"))
      .write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("ts", "v"))
      .write.parquet(s"$root/m")
    Catalog.commit(spark, s"$root/cat", Map("manifest" -> s"$root/m"))
    (s"$root/t", s"$root/cat")
  }

  private def snap(t: String, cat: String): DataFrame =
    Layout.snapshotRead(spark, t, spark.read.parquet(
      Catalog.resolveCurrent(spark, cat)("manifest")))

  test("full panel answers from the manifest only, exactly") {
    val (t, cat) = fixture()
    try {
      MetaAggRewrite.registerFromCatalog(spark, "t_meta", t, cat,
        Seq("ts", "v"))
      def q() = snap(t, cat).agg(count(lit(1)).as("n_rows"),
        min(col("ts")).as("min_ts"), max(col("ts")).as("max_ts"),
        count(col("v")).as("n_v"))
      val rewritten = q()
      val roots = scanRoots(rewritten)
      assert(roots.nonEmpty && roots.forall(_.contains("/m")),
        s"expected manifest-only scan, got $roots")
      spark.conf.set(MetaAggRewrite.EnabledConf, "false")
      val direct = try pinPlan(q()) finally
        spark.conf.set(MetaAggRewrite.EnabledConf, "true")
      assert(scanRoots(direct).exists(_.contains("/t/")))
      assert(rewritten.collect().toSeq === direct.collect().toSeq)
    } finally MetaAggRewrite.clear()
  }

  test("count-only and single-column panels match subset shapes") {
    val (t, cat) = fixture()
    try {
      MetaAggRewrite.registerFromCatalog(spark, "t_meta", t, cat,
        Seq("ts", "v"))
      val n = snap(t, cat).agg(count(lit(1)).as("n_rows"))
      assert(scanRoots(n).forall(_.contains("/m")))
      assert(n.head.getLong(0) === 500L)
      val tsOnly = snap(t, cat).agg(min(col("ts")).as("mn"),
        max(col("ts")).as("mx"))
      assert(scanRoots(tsOnly).forall(_.contains("/m")))
      assert(tsOnly.head.getLong(0) === 0L)
      assert(tsOnly.head.getLong(1) === 4990L)
      val vCount = snap(t, cat).agg(count(col("v")).as("nv"))
      assert(scanRoots(vCount).forall(_.contains("/m")))
      assert(vCount.head.getLong(0) === 500L - 167L) // 167 nulls (0,3,...,498)
    } finally MetaAggRewrite.clear()
  }

  test("refusals: grouping, non-stats column, sum") {
    val (t, cat) = fixture()
    try {
      MetaAggRewrite.registerFromCatalog(spark, "t_meta", t, cat,
        Seq("ts", "v"))
      val grouped = snap(t, cat).groupBy("ts")
        .agg(count(lit(1)).as("n"))
      assert(!scanRoots(grouped).exists(_.contains("/m")))
      val nonStats = snap(t, cat).agg(min(col("id")).as("mn"))
      assert(!scanRoots(nonStats).exists(_.contains("/m")))
      val summed = snap(t, cat).agg(sum(col("ts")).as("s"))
      assert(!scanRoots(summed).exists(_.contains("/m")))
    } finally MetaAggRewrite.clear()
  }

  test("registration refuses a version with a non-empty DV") {
    val (t, cat) = fixture()
    val root = new java.io.File(t).getParent
    Layout.deletionVectorsForKeys(spark, t,
        spark.range(5).select(col("id")), "id")
      .write.parquet(s"$root/dv")
    Catalog.commit(spark, cat, Map("manifest" -> s"$root/m",
      "dv" -> s"$root/dv"))
    val ex = intercept[IllegalArgumentException] {
      MetaAggRewrite.registerFromCatalog(spark, "t_meta", t, cat,
        Seq("ts", "v"))
    }
    assert(ex.getMessage.contains("deletion vector"))
    // pinning to the DV-free version 1 still registers
    try {
      MetaAggRewrite.registerFromCatalog(spark, "t_meta", t, cat,
        Seq("ts", "v"), version = Some(1))
      val n = Layout.snapshotRead(spark, t, spark.read.parquet(
          Catalog.resolve(spark, cat, 1)("manifest")))
        .agg(count(lit(1)).as("n_rows"))
      assert(scanRoots(n).forall(_.contains("/m")))
    } finally MetaAggRewrite.clear()
  }

  test("SQL-only loop: graft_meta_register + query, no Scala API") {
    val (t, cat) = fixture()
    graft.GraftExtensions.register(spark)
    try {
      val reg = spark.sql(s"SELECT * FROM graft_meta_register(" +
        s"'t_sql_meta', '$t', '$cat', 'ts,v', 1)")
      assert(reg.columns.contains("n_rows") &&
        reg.columns.contains("min_ts"))
      val q = spark.sql(
        s"""SELECT COUNT(*) AS n_rows, MIN(ts) AS mn, MAX(ts) AS mx
           |FROM graft_catalog_read('$t', '$cat', 1)""".stripMargin)
      assert(scanRoots(q).forall(_.contains("/m")),
        s"SQL-registered meta rewrite did not fire: ${scanRoots(q)}")
      val r = q.head
      assert(r.getLong(0) === 500L && r.getLong(1) === 0L &&
        r.getLong(2) === 4990L)
    } finally MetaAggRewrite.clear()
  }

  test("empty table: count 0, min/max null") {
    val root = freshDir()
    spark.range(0).select(col("id"), col("id").as("ts"))
      .write.parquet(s"$root/t")
    Layout.statsManifest(spark, s"$root/t", Seq("ts"))
      .write.parquet(s"$root/m")
    val base = Layout.snapshotRead(spark, s"$root/t",
      spark.read.parquet(s"$root/m"))
    try {
      MetaAggRewrite.register(spark, "empty", base, Seq("ts"), s"$root/m")
      val q = Layout.snapshotRead(spark, s"$root/t",
          spark.read.parquet(s"$root/m"))
        .agg(count(lit(1)).as("n_rows"), min(col("ts")).as("mn"))
      assert(scanRoots(q).forall(_.contains("/m")))
      val r = q.head
      assert(r.getLong(0) === 0L && r.isNullAt(1))
    } finally MetaAggRewrite.clear()
  }
}
