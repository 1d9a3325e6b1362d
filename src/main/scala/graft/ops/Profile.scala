package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dataset profiling: per-column null counts, exact distinct counts and
  * min/max, computed in ONE aggregate pass over the input (4 aggregate
  * expressions per column fused into a single job — the profile of a
  * 100 TB table is one scan). The driver only touches the single
  * aggregated row.
  *
  * Numeric and timestamp extremes surface as doubles (timestamps as
  * epoch seconds), strings as strings — engine-portable representations
  * so the profile is DuckDB-oracle-checkable (double→string formatting
  * is NOT portable; never cast extremes to string).
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  /** @param exact exact distinct counts (expand-based: multiplies the
    *   scan by #columns — right for correctness gates). `false` switches
    *   to HyperLogLog++ `approx_count_distinct` (single-pass, the 100 TB
    *   default). */
  def profile(df: DataFrame, exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    val fields = df.schema.fields.toSeq
    def distinctAgg(c: org.apache.spark.sql.Column) =
      if (exact) countDistinct(c) else approx_count_distinct(c)
    val aggs = Seq(count(lit(1)).as("graft_total")) ++ fields.flatMap { f =>
      val c = col("`" + f.name + "`")
      val (minE, maxE) = f.dataType match {
        case dt if isNumeric(dt) =>
          (min(c).cast("double"), max(c).cast("double"))
        case _: TimestampType | _: TimestampNTZType =>
          (min(unix_timestamp(c)).cast("double"), max(unix_timestamp(c)).cast("double"))
        case _ => (lit(null).cast("double"), lit(null).cast("double"))
      }
      val (minS, maxS) = f.dataType match {
        case StringType => (min(c), max(c))
        case _ => (lit(null).cast("string"), lit(null).cast("string"))
      }
      Seq(
        count(c).as(s"${f.name}__nonnull"),
        distinctAgg(c).as(s"${f.name}__distinct"),
        minE.as(s"${f.name}__min_num"), maxE.as(s"${f.name}__max_num"),
        minS.as(s"${f.name}__min_str"), maxS.as(s"${f.name}__max_str"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val total = row.getLong(0)

    val out = fields.zipWithIndex.map { case (f, i) =>
      val base = 1 + i * 6
      Row(f.name, total, total - row.getLong(base),
        row.getLong(base + 1),
        if (row.isNullAt(base + 2)) null else row.getDouble(base + 2),
        if (row.isNullAt(base + 3)) null else row.getDouble(base + 3),
        if (row.isNullAt(base + 4)) null else row.getString(base + 4),
        if (row.isNullAt(base + 5)) null else row.getString(base + 5))
    }
    val schema = StructType(Seq(
      StructField("col_name", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min_num", DoubleType),
      StructField("max_num", DoubleType),
      StructField("min_str", StringType),
      StructField("max_str", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
