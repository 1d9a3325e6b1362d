package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale soak for the LLM-layer heavyweights: blows the sf tables up
  * 10× (deterministic id offsets; non-first copies get a per-copy text
  * suffix / vector perturbation so near-dup logic does real work) and
  * runs dedupCorpus, allPairsJaccard and IvfIndex.knnJoin end to end,
  * reporting wall seconds and SHUFFLE WRITE bytes per op — the scale
  * currency that the correctness gates can't see. The blown-up corpus
  * is soak stress input only; gates and oracles always read the
  * driver-generated tables untouched.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.Soak
  * → one JSON line {"op": {"sec": .., "shuffle_mb": ..}, ...}
  */
object Soak {

  private class ShuffleMeter extends SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      bytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val copies = sys.env.getOrElse("SPARK_GRAFT_SOAK_COPIES", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docsN = (0 until copies).map { i =>
      docs.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        (if (i == 0) col("text")
         else concat(col("text"), lit(s" soakcopy$i"))).as("text"))
    }.reduce(_ unionAll _)

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val embN = (0 until copies).map { i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        transform(col("embedding"),
          x => x + lit((i * 1e-4).toFloat)).as("embedding"))
    }.reduce(_ unionAll _)

    // listener events arrive asynchronously and the bus has no public
    // drain hook, so wait until the byte counter itself goes quiet —
    // a fixed sleep can still attribute a slow previous op's shuffle
    // bytes to the next op
    def quiesce(): Unit = {
      var prev = -1L
      var stableMs = 0
      var waitedMs = 0
      while (stableMs < 300 && waitedMs < 5000) {
        Thread.sleep(100); waitedMs += 100
        val b = meter.bytes.get()
        if (b == prev) stableMs += 100 else { stableMs = 0; prev = b }
      }
    }

    def measure(name: String)(f: => Long): (String, Double, Double, Long) = {
      quiesce() // settle counters from the previous op
      val b0 = meter.bytes.get()
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      quiesce()
      val mb = (meter.bytes.get() - b0) / 1e6
      (name, sec, mb, rows)
    }

    val results = Seq(
      measure("dedup_corpus") {
        ops.Dedup.dedupCorpus(docsN, "doc_id", "text").count()
      },
      measure("all_pairs_jaccard") {
        // %2 subset: exact all-pairs is the heaviest op; half the blown-up
        // corpus still dwarfs any gate input
        ops.Dedup.allPairsJaccard(docsN.filter(col("doc_id") % 2 === 0),
          "doc_id", "text", shingleSize = 3, tau = 0.5).count()
      },
      measure("ivf_knn_join") {
        ops.Similarity.ivfIndexSeeded(embN, "vec_id", "embedding", nlist = 32)
          .knnJoin(k = 5, nprobe = 4).count()
      })

    val json = results.map { case (n, sec, mb, rows) =>
      f""""$n": {"sec": $sec%.2f, "shuffle_mb": $mb%.1f, "rows": $rows}"""
    }.mkString("{", ", ", s""", "copies": $copies, "sf": "$sfDir"}""")
    println(json)
    spark.stop()
  }
}
