package graft.util

/** Side-channel timings for gates whose cost is dominated by setup work
  * (e.g. q22 writes two bucketed tables before its exchange-free join).
  * Gates record named sub-phase durations here; `graft.Bench` drains the
  * map after each timed query and emits the probes alongside the
  * per-query seconds, so a regression can be attributed to the write
  * path vs the query plan without changing the gate's result shape. */
object BenchProbe {
  private val m = new java.util.concurrent.ConcurrentHashMap[String, Double]()

  /** Run `f`, recording its wall-clock seconds under `name`. */
  def time[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    m.put(name, (System.nanoTime() - t0) / 1e9)
    r
  }

  /** Snapshot and clear all recorded probes. */
  def drain(): Map[String, Double] = {
    import scala.jdk.CollectionConverters._
    val snap = m.asScala.toMap
    m.clear()
    snap
  }
}
