package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool (like [[Explain]]): run ONE gate with a listener that
  * attributes wall-clock to Spark jobs (count, wall, summed task time)
  * vs driver-side gaps — `runMain graft.ProfileGate <gate> [sfDir]
  * [cpus]`. Used in the optimization rounds to tell "too many tiny
  * jobs / driver dead time" apart from "the tasks are genuinely busy"
  * before touching an operator (guide §1/§7.3). */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: ProfileGate <gate> [sfDir] [cpus]"))
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = args.drop(2).headOption.getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown gate $name"))
    // warmup rep: JIT/codegen/session init lands here
    fn(spark, sfDir).count()

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    var nJobs = 0
    var jobWallMs = 0L
    var taskMs = 0L
    var nTasks = 0L
    val byDesc = scala.collection.mutable.Map[String, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .filter(_.nonEmpty)
          .orElse(e.stageInfos.lastOption.map(_.name.takeWhile(_ != '\n')))
          .getOrElse("")
        jobs.put(e.jobId, (e.time, d))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (t0, d) =>
          val w = e.time - t0
          synchronized {
            nJobs += 1; jobWallMs += w
            val (c, s) = byDesc.getOrElse(d, (0, 0L))
            byDesc(d) = (c + 1, s + w)
          }
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) synchronized {
          nTasks += 1
          taskMs += (e.taskInfo.finishTime - e.taskInfo.launchTime)
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wallMs = (System.nanoTime() - t0) / 1e6
    spark.sparkContext.removeSparkListener(listener)
    println(f"PROFILE $name: wall=${wallMs / 1000}%.2fs jobs=$nJobs " +
      f"jobWall=${jobWallMs / 1000.0}%.2fs (sum over jobs; overlaps) " +
      f"tasks=$nTasks taskTime=${taskMs / 1000.0}%.2fs " +
      f"driverGap≈${(wallMs - jobWallMs) / 1000.0}%.2fs (if jobs serial)")
    byDesc.toSeq.sortBy(-_._2._2).take(20).foreach { case (d, (c, s)) =>
      println(f"  ${s / 1000.0}%7.2fs  n=$c%-4d ${if (d.isEmpty) "(unlabelled)" else d}")
    }
    spark.stop()
  }
}
