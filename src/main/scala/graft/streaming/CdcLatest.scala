package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Latest-change-per-key CDC state on `transformWithState` — the
  * streaming half of [[graft.queries.RelationalQueries.cdcApply]]: one
  * typed ValueState per key holding the maximal (ts, event_id) change
  * seen so far plus the change count, emitted on every update. The
  * drained snapshot (last emission per key, delete ops removed) equals
  * the batch MERGE result — both statistics are monotone in the feed,
  * so the outcome is batching-invariant and oracle-checkable against
  * the same SQL as the batch operator.
  *
  * Scale: state is ONE small record per live key (RocksDB provider —
  * required by the API — keeps the key set off-heap with changelog
  * checkpoints); per-batch work is one fold over that key's arrivals.
  * This is the streaming materialized-view pattern: the op log never
  * accumulates, only the current version per key does.
  */
object CdcLatest {
  /** One change event (column names match the events stream). */
  final case class Change(
      user_id: Long, ts_us: Long, event_id: Long, event_type: String, value: Double)

  /** Current per-key version + how many changes produced it. */
  final case class Current(
      user_id: Long, ts_us: Long, event_id: Long, event_type: String,
      value: Double, n_changes: Long)
}

class CdcLatest
    extends StatefulProcessor[Long, CdcLatest.Change, CdcLatest.Current] {
  import CdcLatest._

  @transient private var current: ValueState[Current] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    current = getHandle.getValueState[Current](
      "current",
      Encoders.product[Current],
      TTLConfig.NONE)

  override def handleInputRows(
      key: Long,
      rows: Iterator[Change],
      timerValues: TimerValues): Iterator[Current] = {
    var cur = if (current.exists()) current.get() else null
    rows.foreach { ch =>
      val n = if (cur == null) 1L else cur.n_changes + 1L
      val newer = cur == null ||
        ch.ts_us > cur.ts_us || (ch.ts_us == cur.ts_us && ch.event_id > cur.event_id)
      cur =
        if (newer) Current(ch.user_id, ch.ts_us, ch.event_id, ch.event_type, ch.value, n)
        else cur.copy(n_changes = n)
    }
    current.update(cur)
    Iterator.single(cur)
  }
}
