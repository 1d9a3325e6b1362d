package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers for shuffle-free co-located joins
  * (SURVEY.md §7 "100 TB posture": a fact⋈fact equi-join on the bucket
  * key needs NO exchange when both sides are bucketed the same way —
  * at 100 TB that turns the dominant shuffle into a local zip of
  * pre-sorted buckets).
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), so these
  * helpers manage named tables rather than bare paths.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With
    * `spark.sql.sources.bucketing.enabled` (default true) the plan
    * contains no Exchange on either side. */
  def cololocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))

  /** True when the physical plan of `df` contains no shuffle exchange —
    * the assertion hook for co-location tests/inspection. */
  def isExchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
