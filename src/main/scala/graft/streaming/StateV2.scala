package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

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
