package graft.streaming

import graft.Sessions
import graft.schemas._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Throughput soak for the `transformWithState` frame assembly (A2 at
  * 100×): drives [[FrameAssemblyTws.assemble]] from a `rate` source at
  * ≥10⁶ frames on the RocksDB state store and measures what the
  * correctness suite cannot — the sustained envelope. Emits ONE JSON
  * line (and a file copy) with:
  *
  *   - sustained message and frame throughput (rows/s, frames/s),
  *   - micro-batch duration distribution (p50/p95/max over non-empty
  *     batches — the engine-added assembly latency bound),
  *   - peak state rows and RocksDB memory/SST footprint (the in-flight
  *     window: partial frames + 500 ms tombstones, NOT corpus-sized),
  *   - the TTL-envelope verdict: with every digitiser of a frame
  *     generated back-to-back, a sustained engine inside the reference's
  *     500 ms `--frame-ttl-ms` (BASELINE.md) must assemble ≈ every
  *     emitted frame COMPLETE — partial flushes mean timers outran the
  *     data, i.e. the envelope was breached.
  *
  * Knobs (env): SOAK_FRAMES (default 1e6), SOAK_DIGITIZERS (4),
  * SOAK_EVENTS per message (32), SOAK_ROWS_PER_BATCH (100k),
  * SOAK_MODE=event for the event-time twin (watermark-fired timers),
  * SOAK_OUT (/tmp/frame_soak.json). Results recorded in SCALE.md
  * §Streaming.
  */
object FrameSoak {

  def main(args: Array[String]): Unit = {
    val targetFrames = sys.env.getOrElse("SOAK_FRAMES", "1000000").toLong
    val nDig = sys.env.getOrElse("SOAK_DIGITIZERS", "4").toInt
    val eventsPerMsg = sys.env.getOrElse("SOAK_EVENTS", "32").toInt
    val rowsPerBatch = sys.env.getOrElse("SOAK_ROWS_PER_BATCH", "100000").toLong
    val outPath = sys.env.getOrElse("SOAK_OUT", "/tmp/frame_soak.json")
    val ttlMs = 500L

    val spark = Sessions.local("frame-soak", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    spark.conf.set(
      "spark.sql.streaming.stateStore.providerClass", Sessions.RocksDBProvider)
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      sys.env.getOrElse("SOAK_CHANGELOG", "true"))
    // A/B levers for the per-batch cost growth (see SCALE.md §Streaming):
    // dead-version accumulation in the RocksDB CFs makes iterator-heavy
    // ops (timer expiry scans, map-key prefix seeks) decay batch over
    // batch at CONSTANT live state — compactOnCommit trades a bounded
    // per-commit compaction for flat scan cost
    if (sys.env.contains("SOAK_COMPACT"))
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb.compactOnCommit", "true")
    if (sys.env.contains("SOAK_NOTRACK"))
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one frame = nDig consecutive rate-source values; contributions for
    // a frame are generated back-to-back, so any partial flush is the
    // ENGINE breaching the TTL envelope, not the data being late.
    // rate-micro-batch (not plain rate): every trigger carries EXACTLY
    // rowsPerBatch rows, so batch durations measure engine capacity at a
    // fixed load instead of whatever backlog the wall clock accumulated
    // (the plain source's first batch swallows the whole JVM warm-up gap)
    def msgOf(v: Long): EventListMessage = {
      val frame = v / nDig
      val dig = (v % nDig).toInt
      EventListMessage(
        digitizerId = dig,
        metadata = FrameMetadata(
          timestampNs = frame * 20000000L, // the reference's 50 Hz cadence
          periodNumber = frame % 4,
          protonsPerPulse = 4,
          running = true,
          frameNumber = frame,
          vetoFlags = 0),
        time = Array.tabulate(eventsPerMsg)(i => i.toLong * 100L),
        voltage = Array.tabulate(eventsPerMsg)(i => 100 + (i % 50)),
        channel = Array.tabulate(eventsPerMsg)(i => (dig * 8 + i % 8).toLong))
    }
    val raw = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", "32")
      .load()

    // SOAK_MODE=event drives the EVENT-TIME twin (assembleEventTime):
    // the same state machine on delivery-time timers that fire on
    // watermark passage — deterministic under replay, and the soak's
    // synthetic delivery clock (one ms per value) makes TTL expiry
    // deterministic too. Default: processing-time `assemble`.
    val eventTimeMode =
      sys.env.get("SOAK_MODE").exists(_.equalsIgnoreCase("event"))
    val assembled0 =
      if (eventTimeMode) {
        val timed = raw
          .select(col("value"))
          .as[Long]
          .map(v => FrameAssemblyTws.TimedMessage(
            msgOf(v), new java.sql.Timestamp(v)))
        FrameAssemblyTws.assembleEventTime(timed, 0 until nDig, ttlMs)
      } else {
        val src = raw.select(col("value")).as[Long].map(msgOf)
        FrameAssemblyTws.assemble(src, 0 until nDig, ttlMs)
      }
    val assembled = assembled0
      .observe(
        "soak",
        count(lit(1)).as("frames"),
        sum(when(col("complete"), 1L).otherwise(0L)).as("complete_frames"))

    // (batchMs, inputRows, frames, complete, stateRows, rocksMem, sstBytes)
    val batches = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, Long, Long, Long, Long)]
    // r14 (VERDICT ask #6): split the event-time twin's cost to
    // mechanism — per-batch state-op walls and timer-CF work summed
    // into the artifact so the processing/event A/B reads from JSON,
    // not from eyeballing SOAK_DEBUG_METRICS lines.
    // (updMs, rmMs, commitMs, timerMs, registered, expired, deleted)
    val stateCost = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Long, Long, Long, Long, Long)]
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val om = Option(p.observedMetrics.get("soak"))
        def obs(field: String): Long =
          om.flatMap(r => Option(r.getAs[Any](field)))
            .map(_.asInstanceOf[Number].longValue)
            .getOrElse(0L)
        val so = p.stateOperators.headOption
        def custom(k: String): Long =
          so.flatMap(o => Option(o.customMetrics.get(k)).map(_.longValue)).getOrElse(0L)
        if (sys.env.contains("SOAK_DEBUG_METRICS"))
          so.foreach(o => println(
            s"[soak] batch=${p.batchId} ms=${p.batchDuration} in=${p.numInputRows} " +
              s"upd=${o.numRowsUpdated}/${o.allUpdatesTimeMs}ms " +
              s"rm=${o.numRowsRemoved}/${o.allRemovalsTimeMs}ms " +
              s"commit=${o.commitTimeMs}ms " +
              s"timers=${custom("numRegisteredTimers")}+/" +
              s"${custom("numExpiredTimers")}exp/" +
              s"${custom("numDeletedTimers")}del " +
              s"timerMs=${custom("timerProcessingTimeMs")} " +
              s"stallMs=${custom("rocksdbWriterStallLatencyMs")} " +
              s"ckptMs=${custom("rocksdbCommitCheckpointLatency")} " +
              s"flushMs=${custom("rocksdbCommitFlushLatency")}"))
        batches.synchronized {
          batches += ((
            p.batchDuration, p.numInputRows,
            obs("frames"), obs("complete_frames"),
            so.map(_.numRowsTotal).getOrElse(0L),
            custom("rocksdbPinnedBlocksMemoryUsage"),
            custom("rocksdbSstFileSize")))
          stateCost += ((
            so.map(_.allUpdatesTimeMs).getOrElse(0L),
            so.map(_.allRemovalsTimeMs).getOrElse(0L),
            so.map(_.commitTimeMs).getOrElse(0L),
            custom("timerProcessingTimeMs"),
            custom("numRegisteredTimers"),
            custom("numExpiredTimers"),
            custom("numDeletedTimers")))
        }
      }
    }
    spark.streams.addListener(listener)

    val ckptBase = Sessions.tmpfsScratchDir
      .getOrElse(java.nio.file.Paths.get("/tmp"))
    val ckpt = java.nio.file.Files.createTempDirectory(ckptBase, "frame_soak_ckpt")
    val query = assembled.writeStream
      .format("noop")
      .outputMode("append")
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.ProcessingTime("0 milliseconds"))
      .start()

    val t0 = System.nanoTime()
    def totals: (Long, Long) = batches.synchronized {
      (batches.iterator.map(_._3).sum, batches.iterator.map(_._4).sum)
    }
    // SOAK_DEADLINE_MIN: the r15 long-horizon soak (10⁷ frames) needs
    // more than the default 15-minute cap
    val deadline = System.currentTimeMillis() +
      sys.env.getOrElse("SOAK_DEADLINE_MIN", "15").toLong * 60 * 1000L
    try {
      while (totals._1 < targetFrames && System.currentTimeMillis() < deadline &&
        query.isActive) {
        Thread.sleep(500L)
      }
    } finally query.stop()
    val elapsedSec = (System.nanoTime() - t0) / 1e9

    val snap = batches.synchronized(batches.toVector)
    val (frames, complete) = (snap.map(_._3).sum, snap.map(_._4).sum)
    val msgs = snap.map(_._2).sum
    val nonEmpty = snap.filter(_._2 > 0).map(_._1).sorted
    def pct(p: Double): Long =
      if (nonEmpty.isEmpty) 0L
      else nonEmpty(math.min(nonEmpty.size - 1, (p * nonEmpty.size).toInt))
    val completeFrac = if (frames == 0) 0.0 else complete.toDouble / frames
    val ttlOk = completeFrac >= 0.999
    val json =
      f"""{"metric":"frame_soak","frames":$frames,"complete_frames":$complete,""" +
        f""""complete_frac":$completeFrac%.6f,"ttl_envelope_ok":$ttlOk,""" +
        f""""elapsed_sec":$elapsedSec%.1f,"frames_per_sec":${frames / elapsedSec}%.0f,""" +
        f""""msgs_per_sec":${msgs / elapsedSec}%.0f,"events_per_sec":${msgs * eventsPerMsg / elapsedSec}%.0f,""" +
        s""""n_batches":${snap.size},"batch_ms_p50":${pct(0.5)},"batch_ms_p95":${pct(0.95)},""" +
        s""""batch_ms_max":${if (nonEmpty.isEmpty) 0L else nonEmpty.last},""" +
        s""""state_rows_peak":${if (snap.isEmpty) 0L else snap.map(_._5).max},""" +
        s""""rocksdb_mem_peak_bytes":${if (snap.isEmpty) 0L else snap.map(_._6).max},""" +
        s""""rocksdb_sst_peak_bytes":${if (snap.isEmpty) 0L else snap.map(_._7).max},""" +
        s""""ttl_ms":$ttlMs,"digitizers":$nDig,"events_per_msg":$eventsPerMsg,""" +
        s""""rows_per_batch":$rowsPerBatch,""" + {
          // per-decile trend over the run IN BATCH ORDER (r15, VERDICT
          // ask #6): a long-horizon soak is healthy iff batch time,
          // commit time, and the RocksDB SST footprint stay ~flat from
          // the first decile to the last — linear growth here is the
          // changelog tombstone-decay signature the r13 study found
          val ordered = snap.filter(_._2 > 0)
          val orderedCost = batches.synchronized(stateCost.toVector)
            .zip(snap).filter(_._2._2 > 0).map(_._1)
          def decileMeans(xs: Vector[Long]): String =
            if (xs.isEmpty) "[]"
            else (0 until 10).map { d =>
              val lo = d * xs.size / 10
              val hi = math.max(lo + 1, (d + 1) * xs.size / 10)
              val s = xs.slice(lo, hi)
              f"${s.sum.toDouble / s.size}%.0f"
            }.mkString("[", ",", "]")
          s""""batch_ms_decile_means":${decileMeans(ordered.map(_._1))},""" +
            s""""commit_ms_decile_means":${decileMeans(orderedCost.map(_._3))},""" +
            s""""sst_bytes_decile_means":${decileMeans(ordered.map(_._7))},"""
        } + {
          val sc = batches.synchronized(stateCost.toVector)
          s""""state_update_ms_total":${sc.map(_._1).sum},""" +
            s""""state_removal_ms_total":${sc.map(_._2).sum},""" +
            s""""state_commit_ms_total":${sc.map(_._3).sum},""" +
            s""""timer_processing_ms_total":${sc.map(_._4).sum},""" +
            s""""timers_registered":${sc.map(_._5).sum},""" +
            s""""timers_expired":${sc.map(_._6).sum},""" +
            s""""timers_deleted":${sc.map(_._7).sum},"""
        } +
        s""""mode":"${if (eventTimeMode) "event" else "processing"}"}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
