package graft.streaming

import graft.Sessions
import graft.dsp.{DetectorSettings, FixedThreshold}
import graft.operators.EventFormation
import graft.schemas._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

/** Full-chain streaming soak — the engine's §3.3 deployment topology
  * measured END-TO-END (the r13 FrameSoak measured the A2 stage alone):
  *
  *   dat2 traces → event formation (D1 threshold detection, per-channel)
  *   → stateful frame assembly (TTL) → run assignment against a LIVE
  *   control-fed [[RunCatalog]] → [[NexusSink]] parquet run files with
  *   linger finalization, compaction, and the archive tier
  *   — i.e. [[PipelineJobs.traceToNexusWithLifecycle]] verbatim, plus
  *   [[PipelineJobs.controlToCatalog]] on an interleaved run start/stop
  *   stream (the reference nexus-writer's topology,
  *   `nexus-writer/src/main.rs:240-318`).
  *
  * Three stages, selected by `SOAK_STAGE`, so the per-stage batch-time
  * split is a measured subtraction rather than a guess (each stage runs
  * in its own JVM for equal JIT footing):
  *
  *   - `formation`: traces → formEvents → noop (source + detector cost);
  *   - `assembly`:  traces → formEvents → fMGWS assemble → noop (adds
  *     the keyed state stage — the SAME assembler the lifecycle job
  *     uses, not the TWS twin, so the subtraction is the real chain's);
  *   - `full`:      the lifecycle job with control, sink, finalize,
  *     compaction, archive (default).
  *
  * Clocks: frame timestamps advance 20 ms per frame (the reference's
  * 50 Hz cadence) from 0, so DATA time runs much faster than wall time
  * at soak throughput. The lifecycle's `nowNs` is therefore driven by a
  * WRITTEN-high-water data clock — cumulative source rows over COMPLETED
  * micro-batches (a completed batch has durably written its frames) —
  * so linger finalization can never front-run frames still in flight,
  * exactly the property the wall clock gives the reference (linger 2 s
  * ≫ TTL 500 ms). Run generations are scheduled every `RUN_FRAMES`
  * frames with EXPLICIT boundary timestamps and fed through the control
  * stream one run ahead of the data high-water, so the catalog grows
  * mid-flight like a live instrument's; per-run frame accounting in the
  * artifact makes any assignment loss (a control message losing the
  * race) visible rather than silent.
  *
  * Envelopes measured (the reference's two deadlines):
  *   - TTL (500 ms, `digitiser-aggregator/src/main.rs:110-113`): every
  *     frame's digitisers are generated back-to-back, so
  *     complete_frac < 1 in the SINK means the engine breached it;
  *   - run linger (2 s, `nexus-writer/src/main.rs:109-111`): wall lag
  *     from "stop + linger passed on the data clock" to "generation left
  *     local/" — should be ~one micro-batch, reported p50/max.
  *
  * Write amplification: final parquet bytes by tier + compaction
  * rewrite bytes ([[NexusSink.compactionStats]]) against the logical
  * event payload (20 B/event + 48 B/frame), plus file counts before/after
  * compaction — the small-files story quantified.
  *
  * Knobs (env): SOAK_FRAMES (1e6), SOAK_DIGITIZERS (4), SOAK_CHANNELS
  * (4), SOAK_SAMPLES (128 — the 30 k reference trace shape is covered by
  * the separate event-formation envelope bench), SOAK_ROWS_PER_BATCH
  * (20000), RUN_FRAMES (50000), SOAK_STAGE (full), SOAK_OUT
  * (/tmp/chain_soak.json), SOAK_SINK_DIR (/tmp/chain_soak_sink),
  * SOAK_ARCHIVE_MS (5000 — the maintenance THREAD's wall-clock poll
  * interval since r15; it was a data-clock gate when the tier ran
  * inside foreachBatch). Results in SCALE.md §Streaming.
  */
object ChainSoak {

  private final case class RunSchedule(name: String, startMs: Long, stopMs: Long)

  def main(args: Array[String]): Unit = {
    val targetFrames = sys.env.getOrElse("SOAK_FRAMES", "1000000").toLong
    val nDig = sys.env.getOrElse("SOAK_DIGITIZERS", "4").toInt
    val nChan = sys.env.getOrElse("SOAK_CHANNELS", "4").toInt
    val nSamples = sys.env.getOrElse("SOAK_SAMPLES", "128").toInt
    val rowsPerBatch = sys.env.getOrElse("SOAK_ROWS_PER_BATCH", "20000").toLong
    val runFrames = sys.env.getOrElse("RUN_FRAMES", "50000").toLong
    val stage = sys.env.getOrElse("SOAK_STAGE", "full")
    val outPath = sys.env.getOrElse("SOAK_OUT", "/tmp/chain_soak.json")
    val sinkDir = sys.env.getOrElse("SOAK_SINK_DIR", "/tmp/chain_soak_sink")
    val archiveMs = sys.env.getOrElse("SOAK_ARCHIVE_MS", "5000").toLong
    val ttlMs = 500L
    val lingerMs = 2000L
    val frameNs = 20000000L // 50 Hz
    require(rowsPerBatch % nDig == 0, "rowsPerBatch must be a digitiser multiple")

    val spark = Sessions.local("chain-soak", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // the production A2 state profile: RocksDB + high-churn (frame keys
    // live ~one TTL — the r13 FrameSoak A/B, SCALE.md §Streaming).
    // SOAK_HIGHCHURN=0 A/Bs the default changelog profile.
    spark.conf.set(Sessions.StateStoreKey, "rocksdb")
    spark.conf.set(
      "graft.stateStore.highChurn",
      (!sys.env.get("SOAK_HIGHCHURN").exists(v => v == "0")).toString)
    Sessions.stateStoreConfigure(spark)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one frame = nDig consecutive rate values, contributions
    // back-to-back (any partial flush is an ENGINE TTL breach). Each
    // message carries nChan channel traces with a deterministic pulse
    // comb: one super-threshold spike every 16 samples, amplitude varied
    // per (value, sample) so parquet can't flatten the event payload to
    // a constant column.
    val eventsPerChannel = nSamples / 16
    def traceOf(v: Long): TraceMessage = {
      val frame = v / nDig
      val dig = (v % nDig).toInt
      TraceMessage(
        digitizerId = dig,
        metadata = FrameMetadata(
          timestampNs = frame * frameNs,
          periodNumber = frame % 4,
          protonsPerPulse = 4,
          running = true,
          frameNumber = frame,
          vetoFlags = 0),
        sampleRate = 1000000000L,
        channels = Array.tabulate(nChan) { c =>
          ChannelTrace(
            channel = (dig * nChan + c).toLong,
            voltage = Array.tabulate(nSamples) { i =>
              if (i % 16 == 8) 100 + ((v + i + c) % 50).toInt // pulse
              else ((v * 31 + i * 7 + c) % 16).toInt // sub-threshold noise
            })
        })
    }
    val settings = DetectorSettings(FixedThreshold(threshold = 50.0, duration = 1))

    val raw = spark.readStream
      .format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch.toString)
      .option("numPartitions", "32")
      .load()
    val traces = raw.select(col("value")).as[Long].map(traceOf)

    // ---- instrumentation ------------------------------------------------
    // (batchMs, inputRows, stateRows, updMs, rmMs, commitMs, addBatchMs)
    val batches = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, Long, Long, Long, Long, Long)]
    val inputRowsWritten = new AtomicLong(0L) // cumulative over COMPLETED batches
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        // only the DATA query (rate source); the control query's
        // MemoryStream batches would pollute the split. Match on the
        // provider class name ("RatePerMicroBatch…"), case-insensitive —
        // the description is NOT the DataSource short name.
        if (!p.sources.exists(_.description.toLowerCase.contains("rate"))) return
        val so = p.stateOperators.headOption
        def dur(k: String): Long =
          Option(p.durationMs.get(k)).map(_.longValue).getOrElse(0L)
        inputRowsWritten.addAndGet(p.numInputRows)
        if (sys.env.contains("SOAK_DEBUG"))
          println(
            s"[soak] batch=${p.batchId} ms=${p.batchDuration} in=${p.numInputRows} " +
              s"state=${so.map(_.numRowsTotal).getOrElse(-1L)} " +
              s"upd=${so.map(_.numRowsUpdated).getOrElse(-1L)} " +
              s"out=${p.sink.numOutputRows} addBatch=${dur("addBatch")}")
        batches.synchronized {
          batches += ((
            p.batchDuration,
            p.numInputRows,
            so.map(_.numRowsTotal).getOrElse(0L),
            so.map(_.allUpdatesTimeMs).getOrElse(0L),
            so.map(_.allRemovalsTimeMs).getOrElse(0L),
            so.map(_.commitTimeMs).getOrElse(0L),
            dur("addBatch")))
        }
      }
    }
    spark.streams.addListener(listener)

    val ckptBase = Sessions.tmpfsScratchDir.getOrElse(Paths.get("/tmp"))
    def ckpt(tag: String): String =
      Files.createTempDirectory(ckptBase, s"chain_soak_$tag").toString

    val deadline = System.currentTimeMillis() + 25 * 60 * 1000L
    def framesDone: Long = inputRowsWritten.get() / nDig

    // ---- stages ---------------------------------------------------------
    var extra = "" // stage-specific JSON fields
    val t0 = System.nanoTime()

    stage match {
      case "formation" =>
        val q = EventFormation
          .formEvents(traces, settings)
          .writeStream
          .format("noop")
          .option("checkpointLocation", ckpt("formation"))
          .trigger(Trigger.ProcessingTime("0 milliseconds"))
          .start()
        try while (framesDone < targetFrames &&
          System.currentTimeMillis() < deadline && q.isActive)
          Thread.sleep(200L)
        finally q.stop()

      case "assembly" =>
        val dev2 = EventFormation.formEvents(traces, settings)
        @scala.annotation.nowarn("cat=deprecation")
        val aev2 = FrameAssemblyStream.assemble(dev2, 0 until nDig, ttlMs)
        val q = aev2.writeStream
          .format("noop")
          .outputMode("append")
          .option("checkpointLocation", ckpt("assembly"))
          .trigger(Trigger.ProcessingTime("0 milliseconds"))
          .start()
        try while (framesDone < targetFrames &&
          System.currentTimeMillis() < deadline && q.isActive)
          Thread.sleep(200L)
        finally q.stop()

      case "full" =>
        NexusSink.deleteRecursively(Paths.get(sinkDir))
        val sink = new NexusSink(sinkDir)
        val catalog = new RunCatalog

        // data clock: written-high-water (completed batches only)
        val nowNs = () => framesDone * frameNs

        // control plane: run k covers frames [k·R, (k+1)·R); boundaries
        // are EXPLICIT ms timestamps one ms before the first covered
        // frame (assignFrames' lower bound is strict)
        def schedule(k: Long) = RunSchedule(
          f"run_$k%04d",
          startMs = k * runFrames * 20 - 1,
          stopMs = (k + 1) * runFrames * 20 - 1)
        val control = MemoryStream[ControlMessage](spark)
        val controlQuery =
          PipelineJobs.controlToCatalog(control.toDS(), catalog, ckpt("control"), Some(sink))
        def emitRun(k: Long): Unit = {
          val r = schedule(k)
          control.addData(
            ControlMessage("start", r.name, r.startMs, "SOAK"),
            ControlMessage("stop", r.name, r.stopMs, "SOAK"))
        }
        // run lookahead: a real instrument's RunStart precedes its beam
        // frames; the margin must cover ≥ one full data batch PLUS the
        // control query's own batch latency, or the snapshot race drops
        // the late run's frames (measured in the smoke runs: half-run
        // and one-batch lookaheads both lost the race — alternating
        // whole-run loss at one batch of lookahead)
        val lookaheadFrames = math.max(2 * runFrames, 4 * rowsPerBatch / nDig)
        var nextRun = 0L
        while (nextRun * runFrames <= lookaheadFrames) { emitRun(nextRun); nextRun += 1 }
        // the catalog must hold the whole initial window before the
        // first frame is written
        val warmup = System.currentTimeMillis() + 60000L
        while (catalog.entries.size < nextRun && System.currentTimeMillis() < warmup)
          Thread.sleep(50L)
        require(catalog.entries.size >= nextRun,
          s"control query delivered ${catalog.entries.size}/$nextRun initial runs")

        val dataQuery = PipelineJobs.traceToNexusWithLifecycle(
          traces,
          settings,
          0 until nDig,
          sink,
          catalog,
          ttlMs = ttlMs,
          checkpoint = ckpt("data"),
          triggerMs = 0L,
          lingerMs = lingerMs,
          nowNs = nowNs,
          archiveIntervalMs = archiveMs,
          compactBeforeArchive = true)

        // watcher: keep the catalog a lookahead window ahead of the
        // source high-water, and record the linger envelope per closed
        // run — wall time from "stop + linger passed on the data clock"
        // to "generation left local/"
        val eligibleWallMs = scala.collection.mutable.Map.empty[Long, Long]
        val finalizedWallMs = scala.collection.mutable.Map.empty[Long, Long]
        def localGenDir(k: Long) = Paths.get(
          sinkDir, "local", "frames",
          s"run_name=${schedule(k).name}",
          s"run_start_ns=${schedule(k).startMs * 1000000L}")
        def archiveGenDir(k: Long) = Paths.get(
          sinkDir, "archive", "frames",
          s"run_name=${schedule(k).name}",
          s"run_start_ns=${schedule(k).startMs * 1000000L}")
        try {
          // one loop for soak AND drain: after the frame target is
          // reached, keep the chain running (the clock advances with it)
          // until every CLOSED run has left local/ — capped at 90 s past
          // the target so a finalization bug can't hang the soak.
          var drainDeadline = Long.MaxValue
          var closedAtTarget: Seq[Long] = Seq.empty
          var done = false
          while (!done && System.currentTimeMillis() < deadline && dataQuery.isActive) {
            val hw = framesDone
            while (nextRun * runFrames <= hw + lookaheadFrames) { emitRun(nextRun); nextRun += 1 }
            val wall = System.currentTimeMillis()
            val clock = hw * frameNs
            var k = 0L
            while (k < nextRun) {
              if (!eligibleWallMs.contains(k) &&
                schedule(k).stopMs * 1000000L + lingerMs * 1000000L < clock)
                eligibleWallMs(k) = wall
              if (eligibleWallMs.contains(k) && !finalizedWallMs.contains(k) &&
                !Files.exists(localGenDir(k)))
                finalizedWallMs(k) = wall
              k += 1
            }
            if (hw >= targetFrames) {
              // freeze the drain obligation at target time: runs closing
              // DURING the drain would otherwise keep extending it
              if (drainDeadline == Long.MaxValue) {
                drainDeadline = wall + 90000L
                closedAtTarget = (0L until nextRun).filter(j => (j + 1) * runFrames <= hw)
              }
              done = wall >= drainDeadline ||
                closedAtTarget.forall(j => finalizedWallMs.contains(j))
            }
            Thread.sleep(100L)
          }
        } finally {
          dataQuery.stop()
          controlQuery.stop()
          // a compaction/archive pass in flight at stop time finishes on
          // its own thread — join it, or the audit reads race the moves
          PipelineJobs.awaitMaintenance(dataQuery)
        }

        // ---- end-state audit (after the queries stopped) ----
        // a tier dir can exist but hold no data files (e.g. local/ after
        // every generation finalized) — treat "cannot infer schema" as
        // an empty tier, like the sink's own onDiskEventCounts does
        def tier(t: String) = {
          val p = Paths.get(sinkDir, t, "frames")
          if (!Files.isDirectory(p)) None
          else
            try {
              val df = spark.read.parquet(p.toString)
              df.schema // force schema inference
              Some(df)
            } catch {
              case _: org.apache.spark.sql.AnalysisException => None
            }
        }
        val framesAll = Seq("local", "completed", "archive").flatMap(tier)
          .map(_.select(
            col("run_name"),
            col("frame_complete").cast("long").as("c"),
            lit(1L).as("n")))
          .reduceOption(_ unionByName _)
        val (framesWritten, framesComplete, perRun) = framesAll match {
          case None => (0L, 0L, Map.empty[String, Long])
          case Some(df) =>
            val agg = df.groupBy(col("run_name"))
              .agg(sum(col("n")).as("n"), sum(col("c")).as("c"))
              .collect()
            (
              agg.map(_.getLong(1)).sum,
              agg.map(_.getLong(2)).sum,
              agg.map(r => r.getString(0) -> r.getLong(1)).toMap)
        }
        def countEvents(t: String): Long = {
          val p = Paths.get(sinkDir, t, "events")
          if (!Files.isDirectory(p)) 0L
          else
            try spark.read.parquet(p.toString).count()
            catch { case _: org.apache.spark.sql.AnalysisException => 0L }
        }
        val eventsWritten = Seq("local", "completed", "archive").map(countEvents).sum

        // bytes + file census by tier
        def census(t: String): (Long, Long) = {
          val p = Paths.get(sinkDir, t)
          if (!Files.isDirectory(p)) (0L, 0L)
          else {
            val s = Files.walk(p)
            try {
              var bytes = 0L; var n = 0L
              s.iterator().forEachRemaining { f =>
                if (Files.isRegularFile(f) && f.toString.endsWith(".parquet")) {
                  bytes += Files.size(f); n += 1
                }
              }
              (bytes, n)
            } finally s.close()
          }
        }
        val (localBytes, localFiles) = census("local")
        val (completedBytes, completedFiles) = census("completed")
        val (archiveBytes, archiveFiles) = census("archive")
        val comp = sink.compactionStats
        val compBytesBefore = comp.map(_.bytesBefore).sum
        val compBytesAfter = comp.map(_.bytesAfter).sum
        val compFilesBefore = comp.map(_.filesBefore.toLong).sum
        val compFilesAfter = comp.map(_.filesAfter.toLong).sum
        val finalBytes = localBytes + completedBytes + archiveBytes
        // total bytes the sink PUT to disk = what remains uncompacted
        // (written once) + compacted generations' original small files +
        // their rewrite
        val bytesPut = (finalBytes - compBytesAfter) + compBytesBefore + compBytesAfter
        val logicalBytes = eventsWritten * 20L + framesWritten * 48L

        // run accounting: closed = both boundaries inside the emitted
        // range; every closed run must hold exactly runFrames frames
        val emittedFrames = framesDone
        val closedRuns = (0L until nextRun).filter(k => (k + 1) * runFrames <= emittedFrames)
        // the strict finalize-before-stop requirement applies to runs
        // closed within the soak's frame TARGET — runs closing during
        // the drain tail may legitimately still be inside their linger
        // when the queries stop
        val closedByTarget = closedRuns.filter(k => (k + 1) * runFrames <= targetFrames)
        val fullRuns = closedRuns.count(k => perRun.getOrElse(schedule(k).name, 0L) == runFrames)
        val lags = closedRuns.flatMap(k =>
          for (e <- eligibleWallMs.get(k); f <- finalizedWallMs.get(k)) yield f - e).sorted
        def lagPct(q: Double): Long =
          if (lags.isEmpty) -1L else lags(math.min(lags.size - 1, (q * lags.size).toInt))
        val archived = closedRuns.count(k => Files.isDirectory(archiveGenDir(k)))
        // finalize lag is bounded by engine cadence, not wall absolutes:
        // eligibility is detected one batch after the clock passes (the
        // data clock advances per completed batch) and the move happens
        // in the NEXT batch's lifecycle poll — so allow ~3 median
        // batches of slack before calling the envelope breached
        val batchP50 = {
          val ds = batches.synchronized(batches.filter(_._2 > 0).map(_._1).sorted)
          if (ds.isEmpty) 0L else ds(ds.size / 2)
        }
        val lingerOk = closedByTarget.nonEmpty &&
          fullRuns == closedRuns.size &&
          closedByTarget.forall(k => finalizedWallMs.contains(k)) &&
          (lags.isEmpty || lags.last <= 3 * batchP50 + 5000L)
        val completeFrac =
          if (framesWritten == 0) 0.0 else framesComplete.toDouble / framesWritten
        extra =
          f""","frames_written":$framesWritten,"events_written":$eventsWritten,""" +
            f""""complete_frac":$completeFrac%.6f,"ttl_envelope_ok":${completeFrac >= 0.999},""" +
            s""""runs_scheduled":$nextRun,"runs_closed":${closedRuns.size},""" +
            s""""runs_with_full_frames":$fullRuns,"runs_finalized":${lags.size},""" +
            s""""runs_archived":$archived,""" +
            s""""linger_lag_wall_ms_p50":${lagPct(0.5)},"linger_lag_wall_ms_max":${lagPct(1.0)},""" +
            s""""linger_envelope_ok":$lingerOk,""" +
            s""""sink_bytes_local":$localBytes,"sink_bytes_completed":$completedBytes,""" +
            s""""sink_bytes_archive":$archiveBytes,""" +
            s""""sink_files":${localFiles + completedFiles + archiveFiles},""" +
            s""""compaction_files_before":$compFilesBefore,"compaction_files_after":$compFilesAfter,""" +
            s""""compaction_bytes_before":$compBytesBefore,"compaction_bytes_after":$compBytesAfter,""" +
            s""""bytes_put":$bytesPut,"logical_bytes":$logicalBytes,""" +
            f""""write_amplification":${if (logicalBytes == 0) 0.0
              else bytesPut.toDouble / logicalBytes}%.3f"""

      case other => sys.error(s"unknown SOAK_STAGE: $other")
    }

    val elapsedSec = (System.nanoTime() - t0) / 1e9
    val snap = batches.synchronized(batches.toVector)
    val msgs = snap.map(_._2).sum
    val frames = msgs / nDig
    val nonEmpty = snap.filter(_._2 > 0).map(_._1).sorted
    def pct(p: Double): Long =
      if (nonEmpty.isEmpty) 0L
      else nonEmpty(math.min(nonEmpty.size - 1, (p * nonEmpty.size).toInt))
    // steady-state rate: drop the two warm-up batches (JIT + first
    // RocksDB open dominate them) and divide by busy time, not wall
    val steady = snap.drop(2).filter(_._2 > 0)
    val steadyFps =
      if (steady.isEmpty || steady.map(_._1).sum == 0) 0.0
      else steady.map(_._2).sum.toDouble / nDig / (steady.map(_._1).sum / 1000.0)
    // chronological decile trend (VERDICT r15 ask #4): ten consecutive
    // slices of the non-empty batch sequence, median per slice, for
    // batch duration, state-commit time, and state rows — a FLAT array
    // is the long-horizon no-degradation evidence (a single p50/p95 can
    // hide a ramp that only the tail pays)
    val chron = snap.filter(_._2 > 0)
    def decile(f: ((Long, Long, Long, Long, Long, Long, Long)) => Long): String =
      if (chron.size < 10) "[]"
      else (0 until 10).map { d =>
        val slice = chron.slice(d * chron.size / 10, (d + 1) * chron.size / 10)
          .map(f).sorted
        slice(slice.size / 2)
      }.mkString("[", ",", "]")
    val decileJson =
      s""","batch_ms_decile_p50":${decile(_._1)}""" +
        s""","state_commit_ms_decile_p50":${decile(_._6)}""" +
        s""","state_rows_decile_p50":${decile(_._3)}"""
    val json =
      f"""{"metric":"chain_soak","stage":"$stage","frames":$frames,""" +
        f""""elapsed_sec":$elapsedSec%.1f,"frames_per_sec":${frames / elapsedSec}%.0f,""" +
        f""""frames_per_sec_steady":$steadyFps%.0f,""" +
        f""""msgs_per_sec":${msgs / elapsedSec}%.0f,""" +
        f""""samples_per_sec":${msgs.toDouble * nChan * nSamples / elapsedSec}%.0f,""" +
        s""""n_batches":${snap.size},"batch_ms_p50":${pct(0.5)},"batch_ms_p95":${pct(0.95)},""" +
        s""""batch_ms_max":${if (nonEmpty.isEmpty) 0L else nonEmpty.last},""" +
        s""""state_rows_peak":${if (snap.isEmpty) 0L else snap.map(_._3).max},""" +
        s""""state_update_ms_total":${snap.map(_._4).sum},""" +
        s""""state_removal_ms_total":${snap.map(_._5).sum},""" +
        s""""state_commit_ms_total":${snap.map(_._6).sum},""" +
        s""""add_batch_ms_total":${snap.map(_._7).sum},""" +
        s""""digitizers":$nDig,"channels":$nChan,"samples":$nSamples,""" +
        s""""events_per_msg":${nChan * eventsPerChannel},"rows_per_batch":$rowsPerBatch,""" +
        s""""run_frames":$runFrames,"ttl_ms":$ttlMs,"linger_ms":$lingerMs$decileJson$extra}"""
    Files.writeString(Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
