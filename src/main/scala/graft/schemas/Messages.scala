package graft.schemas

/** Typed message model for the pipeline streams — the Spark rendering of
  * the reference's FlatBuffers schemas (SURVEY.md §1.3). Unsigned widths
  * are widened one step (u8→Int, u16→Int, u32→Long, u64→Long); GpsTime is
  * flattened to ns-since-epoch because TimestampType's µs precision would
  * lose the schema's ns fields (`/root/reference/schemas/frame_metadata_v2.fbs:12-23`).
  */

/** Frame identity + status (`schemas/frame_metadata_v2.fbs:3-10`).
  * CRITICAL: frame identity EXCLUDES `vetoFlags` — digitisers may disagree
  * on veto flags for the same frame and the aggregator ORs them
  * (`streaming-types/src/frame_metadata.rs:17-31`,
  * `digitiser-aggregator/src/frame/partial.rs:80-82`). Use [[FrameKey]]
  * for grouping, never the full metadata.
  */
final case class FrameMetadata(
    timestampNs: Long,
    periodNumber: Long,
    protonsPerPulse: Int,
    running: Boolean,
    frameNumber: Long,
    vetoFlags: Int)

/** Veto-flag-free grouping key for frame assembly. */
final case class FrameKey(
    timestampNs: Long,
    periodNumber: Long,
    protonsPerPulse: Int,
    running: Boolean,
    frameNumber: Long)

object FrameKey {
  def of(m: FrameMetadata): FrameKey =
    FrameKey(m.timestampNs, m.periodNumber, m.protonsPerPulse, m.running, m.frameNumber)
}

/** One channel of a trace message (`schemas/dat2_digitizer_analog_trace_v2.fbs:5-8`). */
final case class ChannelTrace(channel: Long, voltage: Array[Int])

/** dat2 digitiser analog trace (`schemas/dat2_digitizer_analog_trace_v2.fbs:10-17`). */
final case class TraceMessage(
    digitizerId: Int,
    metadata: FrameMetadata,
    sampleRate: Long,
    channels: Array[ChannelTrace])

/** dev2 digitiser event list — struct-of-arrays, one entry per event
  * (`schemas/dev2_digitizer_event_v2.fbs:5-13`).
  */
final case class EventListMessage(
    digitizerId: Int,
    metadata: FrameMetadata,
    time: Array[Long],
    voltage: Array[Int],
    channel: Array[Long])

/** aev2 assembled frame event list
  * (`schemas/aev2_frame_assembled_event_v2.fbs:5-14`).
  */
final case class AssembledFrame(
    metadata: FrameMetadata,
    time: Array[Long],
    voltage: Array[Int],
    channel: Array[Long],
    complete: Boolean,
    digitizersPresent: Array[Int])

/** df12 detector-spectrum mapping as carried inside a pl72 RunStart
  * (`schemas/ecs_df12_det_spec_map.fbs:6-10`): two parallel `[int]`
  * vectors plus the declared spectrum count. Seq (not Array) so the case
  * class keeps structural equality — round-trip specs compare whole
  * messages.
  */
final case class SpectraDetectorMap(
    spectrum: Seq[Int],
    detectorId: Seq[Int],
    nSpectra: Int) {

  /** The broadcast-dimension rendering consumed by the J5 join. */
  def mappings: Seq[SpectrumMapping] =
    spectrum.lazyZip(detectorId).map((s, d) => SpectrumMapping(s, d))
}

/** pl72 run start (`schemas/ecs_pl72_run_start.fbs:14-31`). The file-writer
  * contract fields are all carried: `nexus_structure` JSON passes through
  * opaquely, the optional df12 `detector_spectrum_map` feeds the J5
  * broadcast join. `broker`/`service_id`/`metadata` (unused by both
  * reference consumers the engine models) decode to defaults and are not
  * written.
  */
final case class RunStart(
    runName: String,
    startTimeMs: Long,
    instrumentName: String,
    nPeriods: Long = 1L,
    nexusStructure: String = "",
    jobId: String = "",
    filename: String = "",
    controlTopic: String = "",
    detectorSpectrumMap: Option[SpectraDetectorMap] = None)

/** 6s4t run stop (`schemas/ecs_6s4t_run_stop.fbs:12-18`); stopTimeMs == 0
  * means "stop NOW".
  */
final case class RunStop(runName: String, stopTimeMs: Long)

/** f144 run log sample (`schemas/ecs_f144_logdata.fbs:50-54`). The 20-way
  * scalar/array value union becomes a type tag + widened numeric columns —
  * faithful because the reference's sink resolves the union to one
  * concrete type at first append (`nexus-writer/src/nexus/logs/f114.rs:35-57`).
  */
final case class LogData(
    sourceName: String,
    timestampNs: Long,
    valueType: String,
    value: Double,
    arrayValue: Array[Double])

/** se00 sample-environment log (`schemas/ecs_se00_data.fbs:31-43`).
  * `valuesType` names the 10-way ValueUnion member the samples arrived as
  * (`Int8Array`…`FloatArray`); values are widened to doubles in the typed
  * model and narrowed back — fail-closed — on encode.
  */
final case class SampleEnvLog(
    name: String,
    channel: Int,
    packetTimestampNs: Long,
    timeDelta: Double,
    timestampLocation: String,
    values: Array[Double],
    timestamps: Array[Long],
    messageCounter: Long,
    valuesType: String = "DoubleArray")

/** al00 alarm (`schemas/ecs_al00_alarm.fbs:12-17`). */
final case class Alarm(
    sourceName: String,
    timestampNs: Long,
    severity: String,
    message: String)

/** df12 detector-spectrum map row (`schemas/ecs_df12_det_spec_map.fbs:6-10`)
  * — a small broadcast-join dimension.
  */
final case class SpectrumMapping(spectrum: Int, detectorId: Int)
