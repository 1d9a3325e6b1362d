package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Spark 4 arbitrary-state API v2 (`transformWithState` /
  * `StatefulProcessor`): the successor to flatMapGroupsWithState with
  * per-state-variable handles, TTL, and timers, backed by the RocksDB
  * state store. [[PurchaseStateProcessor]] keeps one running
  * (count, cents) aggregate per user and emits the running value once
  * per key per micro-batch.
  *
  * Determinism: money accumulates in integer cents (inputs carry
  * 2-decimal values), and long addition is commutative/associative, so
  * the fold consumes the iterator in whatever shuffle order rows
  * arrive — totals are exact and independent of both row order and
  * batch boundaries, which is what gives the streaming gate a batch
  * SQL oracle.
  */
case class TwsAgg(n: Long, cents: Long)

class PurchaseStateProcessor
    extends StatefulProcessor[Long, (Long, Double, Long), (Long, Long, Long)] {

  @transient private var agg: ValueState[TwsAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[TwsAgg]("agg", Encoders.product[TwsAgg],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Double, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = if (agg.exists()) agg.get() else TwsAgg(0L, 0L)
    var n = prev.n
    var cents = prev.cents
    // no buffering/sorting: the integer-cents fold is order-independent
    rows.foreach { case (_, value, _) =>
      n += 1
      cents += Math.round(value * 100.0)
    }
    agg.update(TwsAgg(n, cents))
    Iterator.single((key, n, cents))
  }
}

/** Idle-key TTL expiry via EVENT-TIME timers (state API v2, TimeMode
  * EventTime): one running (count, cents) aggregate per key plus one
  * idle timer re-armed to lastEventTime + ttlMs on every input batch.
  * When the watermark passes the timer, the key's state is CLEARED and
  * one final "exp"-tagged row carrying the aggregate is emitted; input
  * batches emit "upd"-tagged running rows.
  *
  * Event-time timers — not `TTLConfig`'s wall-clock TTL — are the
  * deterministic formulation of expiry: the same input replays to the
  * same expiry set regardless of processing speed, which is what gives
  * the gate a batch SQL oracle (and what an incremental 100 TB pipeline
  * needs for reprocessing to be idempotent). State per key is O(1)
  * (three longs + one timer); expired keys leave the store entirely,
  * so state size tracks the ACTIVE key set, not the all-time key set.
  */
case class IdleAgg(n: Long, cents: Long, lastMs: Long)

class IdleExpiryProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp, Double), (Long, String, Long, Long)] {

  @transient private var agg: ValueState[IdleAgg] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    agg = getHandle.getValueState[IdleAgg]("idle", Encoders.product[IdleAgg],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, java.sql.Timestamp, Double)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    val prev = if (agg.exists()) agg.get() else IdleAgg(0L, 0L, Long.MinValue)
    var n = prev.n
    var cents = prev.cents
    var last = prev.lastMs
    // integer-cents max/sum fold: order-independent, so shuffle order
    // and batch boundaries cannot change the result (same contract as
    // PurchaseStateProcessor)
    rows.foreach { case (_, ts, value) =>
      n += 1
      cents += Math.round(value * 100.0)
      val ms = ts.getTime
      if (ms > last) last = ms
    }
    // re-arm the idle timer: drop the stale one so each key holds
    // exactly one pending timer
    if (prev.lastMs != Long.MinValue) getHandle.deleteTimer(prev.lastMs + ttlMs)
    getHandle.registerTimer(last + ttlMs)
    agg.update(IdleAgg(n, cents, last))
    Iterator.single((key, "upd", n, cents))
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, String, Long, Long)] = {
    val out =
      if (agg.exists()) {
        val a = agg.get()
        Iterator.single((key, "exp", a.n, a.cents))
      } else Iterator.empty
    agg.clear() // the DROP: idle keys leave the store
    out
  }
}
