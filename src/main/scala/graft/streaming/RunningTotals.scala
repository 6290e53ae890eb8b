package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Arbitrary-stateful running totals on Spark 4's `transformWithState`
  * API — the modern replacement for `flatMapGroupsWithState` (typed
  * composite state handles, per-state TTL, timers) and the extension
  * point a production pipeline would grow per-key enrichment state on.
  * Demonstrated here as the simplest exactly-verifiable kernel: per-key
  * event count + max id, updated per batch, emitted on every change.
  *
  * Input (key already extracted): (event_type, event_id); output:
  * (event_type, running_count, running_max_id). Both statistics are
  * order-insensitive integers, so the drained result is independent of
  * batch boundaries and row order — which is what makes the operator
  * oracle-checkable against a plain batch aggregate.
  *
  * `transformWithState` requires the RocksDB state-store provider; the
  * drain query forces it on its session clone (SCALE.md §Streaming).
  */
class RunningTotals
    extends StatefulProcessor[String, (String, Long), (String, Long, Long)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)](
      "totals",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[(String, Long)],
      timerValues: TimerValues): Iterator[(String, Long, Long)] = {
    var (n, mx) = if (totals.exists()) totals.get() else (0L, Long.MinValue)
    rows.foreach { case (_, id) =>
      n += 1
      if (id > mx) mx = id
    }
    totals.update((n, mx))
    Iterator.single((key, n, mx))
  }
}
