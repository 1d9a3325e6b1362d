package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// dev scratchpad — not part of the library surface
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s  ($n rows)")
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.functions.TextFunctions._

    time("ntok project only") {
      docs.select(col("lang"), col("doc_id"),
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(tokenCount(col("text")).cast("long")).as("ntok")).count()
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("doc"))
    time("+ window cumsum") {
      docs.select(col("lang").as("grp"), col("doc_id").as("doc"),
          when(length(trim(col("text"))) === 0, lit(0L))
            .otherwise(tokenCount(col("text")).cast("long")).as("ntok"))
        .withColumn("graft_cum", sum("ntok").over(w)).count()
    }
    val base = docs.select(col("lang").as("grp"), col("doc_id").as("doc"),
        when(length(trim(col("text"))) === 0, lit(0L))
          .otherwise(tokenCount(col("text")).cast("long")).as("ntok"))
      .withColumn("graft_cum", sum("ntok").over(w))
      .select(col("grp"), col("doc"), col("ntok"),
        expr("(graft_cum - ntok) div 512L").as("seq_id"))
    time("+ div project") { base.count() }
    time("+ groupBy count only") {
      base.groupBy("grp", "seq_id").agg(count(lit(1)).as("n")).count()
    }
    time("+ full agg") {
      base.groupBy("grp", "seq_id")
        .agg(count(lit(1)).as("n_docs"), sum("ntok").as("n_tokens"),
          min("doc").as("first_doc"), max("doc").as("last_doc")).count()
    }
    time("full pack") {
      ops.CorpusOps.pack(docs, "doc_id", "text", "lang", 512L).count()
    }
    spark.stop()
  }
}
