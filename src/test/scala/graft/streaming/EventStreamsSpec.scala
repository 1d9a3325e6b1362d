package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class EventStreamsSpec extends AnyFunSuite with SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedStats over a MemoryStream emits finalized windows after watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val q = EventStreams.windowedStats(events, "1 hour", "0 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(
        (ts("2026-01-01 10:05:00"), "click", 1.0),
        (ts("2026-01-01 10:55:00"), "click", 2.0),
        (ts("2026-01-01 10:30:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark past 11:00 to finalize the 10:00 window
      mem.addData((ts("2026-01-01 12:00:01"), "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n", "total")
        .orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
        Seq(("2026-01-01 10:00:00.0", "click", 2L, 3.0),
            ("2026-01-01 10:00:00.0", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("windowedStats transform gives identical results in batch mode") {
    val batch = spark.sql(
      """SELECT * FROM VALUES
        | (TIMESTAMP '2026-01-01 10:05:00', 'click', 1.0D),
        | (TIMESTAMP '2026-01-01 10:55:00', 'click', 2.0D),
        | (TIMESTAMP '2026-01-01 11:30:00', 'view', 5.0D)
        | AS t(ts, event_type, value)""".stripMargin)
    val rows = EventStreams.windowedStats(batch)
      .orderBy("window_start", "event_type").collect()
    assert(rows.length == 2)
    assert(rows.head.getLong(2) == 2L && rows.head.getDouble(3) == 3.0)
  }

  test("sessionize closes a session on inactivity gap within a batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 60000)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // two bursts 10 minutes apart → first session closes when the
      // second burst arrives in a later batch
      mem.addData((7L, ts("2026-01-01 10:00:00"), 1.0),
                  (7L, ts("2026-01-01 10:00:30"), 2.0))
      q.processAllAvailable()
      mem.addData((7L, ts("2026-01-01 10:10:00"), 4.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_out").as[EventStreams.Session].collect()
      assert(sessions.length == 1)
      assert(sessions.head.userId == 7L)
      assert(sessions.head.nEvents == 2 && sessions.head.totalValue == 3.0)
    } finally q.stop()
  }

  test("dedupStream drops repeat ids across micro-batches within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val events = mem.toDF().toDF("event_id", "ts", "value")
    val q = EventStreams.dedupStream(events, "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData((1L, ts("2026-01-01 10:00:00"), 1.0),
                  (1L, ts("2026-01-01 10:00:00"), 1.0), // same batch dup
                  (2L, ts("2026-01-01 10:01:00"), 2.0))
      q.processAllAvailable()
      mem.addData((1L, ts("2026-01-01 10:00:00"), 1.0)) // cross-batch dup
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("stream-stream join matches keys within the event-time window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lmem = MemoryStream[(Long, Timestamp, Double)]
    val rmem = MemoryStream[(Long, Timestamp, Double)]
    val left = lmem.toDF().toDF("user_id", "ts", "value")
    val right = rmem.toDF().toDF("user_id", "ts", "value")
    val q = EventStreams.streamJoin(left, right, "user_id", "0 seconds", "5 minutes")
      .select("user_id", "value", "r_value")
      .writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append()).start()
    try {
      lmem.addData((1L, ts("2026-01-01 10:00:00"), 1.0),
                   (2L, ts("2026-01-01 10:00:00"), 2.0))
      rmem.addData((1L, ts("2026-01-01 10:03:00"), 10.0), // within 5 min → match
                   (2L, ts("2026-01-01 10:30:00"), 20.0)) // outside → no match
      q.processAllAvailable()
      val rows = spark.table("sj_out").collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq ==
        Seq((1L, 1.0, 10.0)))
    } finally q.stop()
  }

  test("end-to-end readStream → transform → parquet sink round-trip") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventStreams.startWindowedQuery(events, s"$dir/ckpt", s"$dir/out")
    try {
      mem.addData((ts("2026-01-01 10:05:00"), "click", 1.0))
      q.processAllAvailable()
      mem.addData((ts("2026-01-01 12:00:01"), "click", 1.0))
      q.processAllAvailable()
      val out = spark.read.parquet(s"$dir/out")
      assert(out.count() == 1) // the finalized 10:00 window
    } finally q.stop()
  }

  test("transformWithState keeps per-key state across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Double, Long)]
      val out = mem.toDS().groupByKey(_._1)
        .transformWithState(new PurchaseStateProcessor,
          org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
      val q = out.toDF("user", "n", "cents")
        .writeStream.format("memory").queryName("graft_tws_spec")
        .outputMode(OutputMode.Update()).start()
      try {
        mem.addData((1L, 1.50, 10L), (1L, 2.25, 11L), (2L, 5.00, 12L))
        q.processAllAvailable()
        mem.addData((1L, 0.25, 13L)) // key 1 recurs → state must survive
        q.processAllAvailable()
        val rows = spark.table("graft_tws_spec")
          .as[(Long, Long, Long)].collect().toSet
        assert(rows.contains((1L, 2L, 375L))) // after batch 1
        assert(rows.contains((1L, 3L, 400L))) // running total after batch 2
        assert(rows.contains((2L, 1L, 500L)))
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("idle-expiry: mid-stream timer fires, state drops, returning key re-opens fresh") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, Timestamp, Double)]
      val out = mem.toDS().toDF("user_id", "ts", "value")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp, Double)]
        .groupByKey(_._1)
        .transformWithState(new IdleExpiryProcessor(ttlMs = 100000L), // 100 s
          org.apache.spark.sql.streaming.TimeMode.EventTime(), OutputMode.Update())
      val q = out.toDF("user_id", "kind", "n", "cents")
        .writeStream.format("memory").queryName("graft_ttl_spec")
        .outputMode(OutputMode.Update()).start()
      try {
        // batch 1: both keys live; timers arm at lastTs + 100 s
        mem.addData((1L, ts("2026-01-01 10:00:00"), 1.00),
                    (2L, ts("2026-01-01 10:00:05"), 2.00))
        q.processAllAvailable()
        // batch 2: watermark (5 s) still below key 1's timer — no expiry
        mem.addData((2L, ts("2026-01-01 10:05:00"), 3.00))
        q.processAllAvailable()
        // batch 3: watermark is now 10:05:00, past key 1's 10:01:40
        // timer → key 1 expires MID-STREAM with its final aggregate;
        // key 2 keeps accumulating (its timer re-armed each batch)
        mem.addData((2L, ts("2026-01-01 10:06:40"), 4.00))
        q.processAllAvailable()
        // batch 4: key 1 RETURNS after expiry → state re-opened fresh
        mem.addData((1L, ts("2026-01-01 10:07:30"), 9.00))
        q.processAllAvailable()
        val rows = spark.table("graft_ttl_spec")
          .as[(Long, String, Long, Long)].collect().toSet
        assert(rows.contains((1L, "exp", 1L, 100L))) // mid-stream expiry
        assert(rows.contains((1L, "upd", 1L, 900L))) // fresh state, not n=2
        assert(!rows.exists(r => r._1 == 1L && r._2 == "upd" && r._3 == 2L))
        assert(rows.contains((2L, "upd", 3L, 900L))) // survivor accumulates
        assert(!rows.contains((2L, "exp", 3L, 900L))) // never idle past TTL
      } finally q.stop()
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("checkpoint restart resumes exactly-once: no replays, no gaps") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-restart").toString
    def writeBatch(ids: Range): Unit =
      ids.map(i => (i.toLong, s"e$i")).toDF("id", "payload")
        .coalesce(1).write.mode("append").parquet(s"$dir/in")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    def run(): Unit = {
      val q = spark.readStream.schema(schema).parquet(s"$dir/in")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/chk")
        .outputMode(OutputMode.Append()).start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch(0 until 50)
    run() // first incarnation consumes the first file
    writeBatch(50 until 80)
    run() // restart from the SAME checkpoint: only the new file processes
    val out = spark.read.parquet(s"$dir/out").select("id").as[Long].collect().sorted
    assert(out.toSeq === (0L until 80L)) // every row exactly once
  }

  test("quotaAdmit: counter state spans micro-batches, in-batch order is (ts, id)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val q = EventStreams.quotaAdmit(mem.toDS(), n = 3)
      .toDF("user", "id", "ts_us")
      .writeStream.format("memory").queryName("quota_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1 arrives out of (ts, id) order: user 1 must admit the
      // time-earliest two (ids 12, 11), not the arrival-first two
      mem.addData((1L, 10L, 300L), (1L, 12L, 100L), (1L, 11L, 200L),
        (2L, 20L, 100L))
      q.processAllAvailable()
      // batch 2: user 1 has 3 admitted after one more; user 2 continues
      mem.addData((1L, 13L, 400L), (1L, 14L, 500L), (2L, 21L, 200L))
      q.processAllAvailable()
      val got = spark.table("quota_out").select("user", "id")
        .as[(Long, Long)].collect().toSet
      // user 1: ts order admits 12, 11, then 10 fills the quota in
      // batch 1; 13/14 are over quota. user 2: both under quota.
      assert(got === Set((1L, 12L), (1L, 11L), (1L, 10L),
        (2L, 20L), (2L, 21L)))
    } finally q.stop()
  }

  test("zScoreAnomalies: spike flags against PRIOR history only, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Long)]
    val q = EventStreams.zScoreAnomalies(mem.toDS(), minHistory = 3L, theta = 3L)
      .toDF("user", "id").writeStream.format("memory")
      .queryName("zscore_out").outputMode(OutputMode.Append()).start()
    try {
      // batch 1: history 100, 102, 98 — below minHistory, nothing flags
      mem.addData((1L, 1L, 10L, 100L), (1L, 2L, 20L, 102L), (1L, 3L, 30L, 98L))
      q.processAllAvailable()
      assert(spark.table("zscore_out").count() === 0L)
      // batch 2: 101 is in-band; 500 is a spike vs the PRIOR 4 values;
      // the later 99 is back in band even though 500 inflated the
      // moments — prior-history scoring, not leave-one-out
      mem.addData((1L, 4L, 40L, 101L), (1L, 5L, 50L, 500L), (1L, 6L, 60L, 99L))
      q.processAllAvailable()
      val got = spark.table("zscore_out").select("user", "id")
        .as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 5L)))
      // zero-variance history: ANY deviation flags (strict inequality)
      mem.addData((2L, 10L, 10L, 50L), (2L, 11L, 20L, 50L), (2L, 12L, 30L, 50L),
        (2L, 13L, 40L, 51L), (2L, 14L, 50L, 50L))
      q.processAllAvailable()
      val got2 = spark.table("zscore_out").select("user", "id")
        .as[(Long, Long)].collect().toSet
      assert(got2 === Set((1L, 5L), (2L, 13L)))
    } finally q.stop()
  }
}
