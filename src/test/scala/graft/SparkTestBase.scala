package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs (mirrors the reference's SparkTestBase
  * idea — `/root/reference/utils/.../SparkTestBase.scala:23-44` — but
  * keeps whole-stage codegen ON: we test the plans we ship). */
trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestBase.session
  lazy implicit val implicitSpark: SparkSession = spark
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
