package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one or all SparkEntry
  * queries (`runMain graft.Explain [queryName] [sfDir]`) — used to check
  * pushdown (PushedFilters/ReadSchema), broadcast choices, and
  * WholeStageCodegen coverage while iterating on operators. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val selected = name match {
      case Some(n) => SparkEntry.queries.filter(_._1 == n)
      case None => SparkEntry.queries
    }
    selected.toSeq.sortBy(_._1).foreach { case (n, fn) =>
      println(s"\n========== $n ==========")
      try fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
