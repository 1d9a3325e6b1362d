package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width source (SURVEY.md §2 S8): read as `text`, project columns
  * by substring offsets — pure codegen'd expressions over the line scan,
  * no custom datasource needed. Widths are (name, width) pairs, columns
  * sliced left to right; values are trimmed strings (cast downstream). */
object FixedWidth {

  def load(path: String, widths: Seq[(String, Int)], trimValues: Boolean = true)
      (implicit spark: SparkSession): DataFrame = {
    val raw = spark.read.text(path)
    var offset = 1 // substring is 1-based
    val cols = widths.map { case (name, w) =>
      val c = substring(col("value"), offset, w)
      offset += w
      (if (trimValues) trim(c) else c).as(name)
    }
    raw.select(cols: _*)
  }
}

/** JSON-string literals → DataFrame (SURVEY.md §2 S9; reference
  * `utils/.../HelperFunctions.scala:156-159`). */
object JsonStrings {
  def toDataFrame(json: Seq[String])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.read.json(json.toDS())
  }
}

/** Minimum-version gate (reference `SparkVersionGuard`,
  * `DatasetComparisonJob.scala:32`). */
object SparkVersionGuard {
  val minSparkVersion = "3.0.0"

  def ensureSparkVersionCompatibility(version: String = org.apache.spark.SPARK_VERSION): Unit = {
    def nums(v: String) = v.split("[.-]").take(3).map(s => s.takeWhile(_.isDigit))
      .filter(_.nonEmpty).map(_.toInt).padTo(3, 0).toSeq
    val (cur, min) = (nums(version), nums(minSparkVersion))
    if (Ordering.Implicits.seqOrdering[Seq, Int].lt(cur, min))
      throw new IllegalStateException(
        s"Spark $version is older than the minimum supported $minSparkVersion")
  }
}
