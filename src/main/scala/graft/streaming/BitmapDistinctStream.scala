package graft.streaming

import graft.functions.PagedBitmap
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming._

/** Streaming EXACT distinct count on `transformWithState`, with the
  * [[PagedBitmap]] from the batch bitmap family as the per-key state —
  * the streaming half of [[graft.queries.SketchQueries.bitmapDistinct]].
  * Every micro-batch ORs the batch's ids into the key's bitmap and emits
  * the running cardinality; the count is monotone in the feed, so the
  * drained last-emission-per-key snapshot is batching-invariant and
  * oracle-checkable against the same `count(DISTINCT)` SQL as the batch
  * leg.
  *
  * Scale: state per key is ONE serialized bitmap (presence-mask pages:
  * ~18 B per sparse id, 1 bit per dense id) in the RocksDB provider —
  * the same summary the batch rollup stores per day, so a deployment
  * can seed streaming state from batch `bitmap_build` output and
  * vice versa. For id domains too large for one value row, shard the
  * grouping key by `id >> k` (bitmap pages partition cleanly) and
  * `bitmap_merge_count` the shards downstream.
  */
object BitmapDistinctStream {
  /** One observation (column names match the events stream). */
  final case class Obs(event_type: String, user_id: Long)

  /** Running exact distinct count for a key. */
  final case class DistinctCount(event_type: String, n_users: Long)
}

class BitmapDistinctStream
    extends StatefulProcessor[
      String, BitmapDistinctStream.Obs, BitmapDistinctStream.DistinctCount] {
  import BitmapDistinctStream._

  @transient private var bitmap: ValueState[Array[Byte]] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    bitmap = getHandle.getValueState[Array[Byte]]("bitmap", Encoders.BINARY, TTLConfig.NONE)

  override def handleInputRows(
      key: String,
      rows: Iterator[Obs],
      timerValues: TimerValues): Iterator[DistinctCount] = {
    val cur =
      if (bitmap.exists()) PagedBitmap.fromBytes(bitmap.get()) else new PagedBitmap
    rows.foreach(r => cur.add(r.user_id))
    bitmap.update(cur.toBytes)
    Iterator.single(DistinctCount(key, cur.cardinality))
  }
}
