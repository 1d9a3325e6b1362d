package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-user session accumulator (top-level: state encoders need a
  * publicly constructible class for codegen). */
case class SessionState(nEvents: Long, totalValue: Double,
    startMs: Long, lastMs: Long)

/** Per-key admission counter for [[EventStreams.quotaAdmit]]. */
case class QuotaState(admitted: Long)

/** Running integer moments for [[EventStreams.zScoreAnomalies]]. */
case class ZScoreState(n: Long, sum: Long, sumSq: Long)

/** Structured Streaming operators over the `events` shape
  * (event_id, ts, user_id, event_type, value) — SURVEY.md §7: streams are
  * an extension beyond the batch-only reference, built the idiomatic way:
  * `readStream` → declarative transforms → `writeStream`, watermarks for
  * state cleanup, `flatMapGroupsWithState` for custom session state.
  *
  * Every transform here takes/returns DataFrames so the SAME code path
  * runs in batch tests and streaming jobs (Spark's unified semantics);
  * the specs execute them over MemoryStream micro-batches.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type with a watermark: late
    * data beyond `lateness` is dropped and window state is reclaimed —
    * mandatory for unbounded 100 TB/day streams. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total"))

  /** Running per-user totals (complete/update-mode aggregation). */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))

  /** Streaming exact dedup: drop repeat `idCols` arrivals, with state
    * bounded by the watermark (events older than `lateness` can no
    * longer collide, so their dedup state is reclaimed — the only way
    * exact dedup stays O(window) instead of O(stream) at 100 TB/day). */
  def dedupStream(events: DataFrame, tsCol: String, lateness: String,
      idCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .dropDuplicates(idCols :+ tsCol)

  case class Session(userId: Long, nEvents: Long, totalValue: Double,
      startTs: java.sql.Timestamp, endTs: java.sql.Timestamp)

  /** Session windows via `flatMapGroupsWithState`: a session closes when
    * a later event for the key arrives more than `gapMs` after the last
    * one (event-time gap). With `withTimeout=true` a processing-time
    * timeout ALSO flushes idle sessions (for production streams; tests
    * use false because timeout wakeups keep `processAllAvailable` busy).
    * Emits one row per CLOSED session. State per key is O(1) — counters
    * only — so the operator scales to arbitrarily many users. */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp, Double)],
      gapMs: Long, withTimeout: Boolean = false): Dataset[Session] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), timeoutConf) {
        case (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(userId, s.nEvents, s.totalValue,
              new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs)))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { case (_, ts, value) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  cur = Some(s.copy(nEvents = s.nEvents + 1,
                    totalValue = s.totalValue + value, lastMs = t))
                case Some(s) =>
                  closed ::= Session(userId, s.nEvents, s.totalValue,
                    new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs))
                  cur = Some(SessionState(1, value, t, t))
                case None =>
                  cur = Some(SessionState(1, value, t, t))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (withTimeout) state.setTimeoutDuration(gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Watermarked stream-stream inner join: match events from two streams
    * by key within ±`window` of event time. Both sides need watermarks
    * so Spark can bound the join state buffers (unbounded state is the
    * classic stream-join OOM at scale). */
  def streamJoin(left: DataFrame, right: DataFrame, key: String,
      lateness: String, window: String): DataFrame = {
    val l = left.withWatermark("ts", lateness)
    val r = right.select(col(key).as("r_key"), col("ts").as("r_ts"),
      col("value").as("r_value")).withWatermark("r_ts", lateness)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("ts") - expr(s"INTERVAL $window") &&
        col("r_ts") <= col("ts") + expr(s"INTERVAL $window"),
      "inner")
  }

  /** Per-key admission quota over a stream: admit the FIRST `n` events
    * of each key in (ts, event_id) order, drop the rest — the per-source
    * rate cap / per-domain document budget a training-ingest pipeline
    * enforces at the front door (keeps one hot domain from flooding a
    * crawl batch).
    *
    * State per key is ONE long (the admitted count) — O(keys) total, no
    * timestamps, no buffers — so the operator runs forever on an
    * unbounded stream. Rows are (key, event_id, tsUs) triples with the
    * event time as epoch MICROS (a Timestamp's getTime is ms-truncated
    * and would tie-order differently from a µs-exact replay); each
    * micro-batch's group iterator is sorted by (tsUs, event_id) before
    * admission, so the admitted set equals the global first-`n` per key
    * whenever arrival respects event-time order across batches (the
    * time-partitioned-file / CDC contract, as in the s17 gate) — and is
    * still exactly-`n`-per-key deterministic-per-replay otherwise. */
  def quotaAdmit(events: Dataset[(Long, Long, Long)],
      n: Long): Dataset[(Long, Long, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[QuotaState, (Long, Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (_, rows, state: GroupState[QuotaState]) =>
          var admitted = state.getOption.map(_.admitted).getOrElse(0L)
          val out = rows.toSeq
            .sortBy(r => (r._3, r._2))
            .iterator
            .takeWhile { _ => admitted < n }
            .map { r => admitted += 1; r }
            .toList
          state.update(QuotaState(admitted))
          out.iterator
      }
  }

  /** Streaming z-score anomaly detection: flag each event whose value
    * deviates from its key's PRIOR history by more than `theta` standard
    * deviations — the metric-spike alarm a training-ingest pipeline
    * hangs on per-source document sizes, loss values, or spend.
    *
    * Scored strictly against history (the event then joins the
    * moments), in INTEGER cents, with the z-test cross-multiplied so no
    * division or sqrt ever runs:
    *
    *   flag ⇔ n ≥ minHistory ∧ (n·c − Σc)² > θ²·(n·Σc² − (Σc)²)
    *
    * Integer arithmetic makes the boundary engine-exact (a float
    * z-score would flip borderline events between engines) and the
    * state is THREE longs per key — (n, Σc, Σc²) — forever-bounded.
    * Overflow bound: needs n²·max(c)² < 2⁶³/θ²; at cents scale that is
    * ~10⁵ events of ~$1000 per key — a production deployment decays or
    * windows the moments long before that. Rows are (key, event_id,
    * tsUs, cents); each batch's group is sorted by (tsUs, event_id), so
    * under time-ordered arrival (the s17/s19 contract) the flags equal
    * the batch replay exactly.
    *
    * @return (key, event_id) rows for flagged events
    */
  def zScoreAnomalies(events: Dataset[(Long, Long, Long, Long)],
      minHistory: Long, theta: Long): Dataset[(Long, Long)] = {
    import events.sparkSession.implicits._
    require(minHistory >= 2 && theta >= 1,
      s"need minHistory >= 2 and theta >= 1, got $minHistory, $theta")
    events.groupByKey(_._1)
      .flatMapGroupsWithState[ZScoreState, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[ZScoreState]) =>
          var st = state.getOption.getOrElse(ZScoreState(0L, 0L, 0L))
          val out = List.newBuilder[(Long, Long)]
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, id, _, c) =>
            if (st.n >= minHistory) {
              val dev = st.n * c - st.sum
              val varTerm = st.n * st.sumSq - st.sum * st.sum
              if (dev * dev > theta * theta * varTerm) out += ((key, id))
            }
            st = ZScoreState(st.n + 1, st.sum + c, st.sumSq + c * c)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** End-to-end streaming pipeline wiring: file/rate/memory source →
    * windowed stats → sink. Returns the started query (caller manages
    * lifecycle). Kept thin — the logic lives in the transforms above. */
  def startWindowedQuery(events: DataFrame, checkpointDir: String,
      outPath: String): org.apache.spark.sql.streaming.StreamingQuery =
    windowedStats(events).writeStream
      .outputMode(OutputMode.Append())
      .format("parquet")
      .option("checkpointLocation", checkpointDir)
      .option("path", outPath)
      .start()
}
