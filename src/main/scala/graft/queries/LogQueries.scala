package graft.queries

import graft.Tables
import graft.dsp.{DetectorSettings, FixedThreshold}
import graft.functions.{GpsTime, TimeFunctions}
import graft.operators.EventFormation
import graft.schemas._
import graft.sources.TraceGenerator
import graft.sources.TraceGenerator.GeneratorConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Log-stream, scalar-function, and diagnostics operators (SURVEY §2.3
  * P9/P10, §2.6 A5/A6, §2.7 J4/J5, §2.9 F1/F10/F12). Log fixtures are
  * generated deterministically (no harness log tables exist); the JSON
  * operator runs over the events table and carries a DuckDB oracle.
  */
object LogQueries {

  /** F12: JSON property extraction over the events stream — oracle-checked. */
  def jsonProps(s: SparkSession, dir: String): DataFrame =
    Tables
      .events(s, dir)
      .select(
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("value"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))

  val jsonPropsSql: String =
    """SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       count(*) AS n, round(sum(value), 4) AS sum_value
       FROM events GROUP BY 1"""

  private def runStartNs = 1700000000000000000L

  /** Deterministic se00 fixture mirroring the schema's two timestamp
    * modes and all three timestamp locations
    * (`schemas/ecs_se00_data.fbs:5,31-43`).
    */
  private def selogFixture(s: SparkSession) = {
    import s.implicits._
    (0 until 64).map { i =>
      val packetTs = runStartNs + i.toLong * 1000000000L
      val explicit = i % 2 == 0
      SampleEnvLog(
        name = if (i % 3 == 0) s"IN:MUSR:CS:SB:temp_$i" else s"pressure_$i",
        channel = i % 8,
        packetTimestampNs = packetTs,
        timeDelta = if (explicit) 0.0 else 250000.0, // ns between samples
        timestampLocation = Seq("Start", "Middle", "End")(i % 3),
        // exact dyadic rationals: bit-identical in any IEEE-754 engine,
        // so the DuckDB oracle can regenerate the fixture
        values = Array.tabulate(16)(j => ((i * 37 + j * 11) % 200) / 8.0 - 12.5),
        timestamps =
          if (explicit) Array.tabulate(16)(j => packetTs + j.toLong * 300000L)
          else Array.empty[Long],
        messageCounter = i.toLong)
    }.toDS()
  }

  /** se00 sample-environment expansion (P9 + P10 +
    * `nexus-writer/src/nexus/logs/se00.rs:71-105`): per-sample timestamps
    * from the explicit array when present, else packet_timestamp +
    * i×time_delta; names prefix-stripped; times rebased to seconds from
    * run start. One narrow posexplode — no shuffle.
    */
  def selogExpand(s: SparkSession, dir: String): DataFrame = {
    val strip = graft.operators.LogTables.strip _
    selogFixture(s)
      .select(
        strip(col("name")).as("name"),
        col("channel"),
        col("packetTimestampNs"),
        col("timeDelta"),
        col("timestampLocation"),
        col("timestamps"),
        posexplode(col("values")).as(Seq("sample_idx", "value")))
      .withColumn(
        "ts_ns",
        // per-SAMPLE guard like LogTables.selogTable (7bd57b6): under
        // ANSI mode a truncated timestamps vector would throw on the
        // subscript; short rows fall back to the delta grid
        when(size(col("timestamps")) > col("sample_idx"), expr("timestamps[sample_idx]"))
          .otherwise(col("packetTimestampNs") +
            (col("sample_idx").cast("double") * col("timeDelta")).cast("long")))
      // timestamp_location (ecs_se00_data.fbs:5,38-40): under
      // oversampling the per-sample timestamp marks the Start, Middle,
      // or End of the window of summed raw samples; the window start is
      // recovered by shifting back 0, delta/2, or delta. Only meaningful
      // with a positive time_delta (explicit-timestamp packets set it
      // <= 0 per the schema contract).
      .withColumn(
        "window_shift_ns",
        when(col("timeDelta") <= 0.0, lit(0L))
          .when(col("timestampLocation") === "Middle", (col("timeDelta") / 2).cast("long"))
          .when(col("timestampLocation") === "End", col("timeDelta").cast("long"))
          .otherwise(lit(0L)))
      .select(
        col("name"),
        col("channel"),
        col("sample_idx"),
        col("timestampLocation").as("location"),
        round((col("ts_ns") - lit(runStartNs)).cast("double") / 1e9, 9).as("time_sec"),
        round((col("ts_ns") - col("window_shift_ns") - lit(runStartNs)).cast("double") / 1e9, 9)
          .as("window_start_sec"),
        round(col("value"), 6).as("value"))
  }

  /** DuckDB oracle for [[selogExpand]]: regenerates the deterministic
    * fixture with `range()` and re-applies the se00 expansion rules in
    * SQL — an independent recomputation, not a dump of the Spark result.
    */
  val selogExpandSql: String =
    """WITH g AS (
         SELECT i, j,
                ['Start','Middle','End'][(i % 3) + 1] AS location,
                (i * 1000000000
                 + CASE WHEN i % 2 = 0 THEN j * 300000 ELSE j * 250000 END)::BIGINT AS rel_ns,
                CASE WHEN i % 2 = 0 THEN 0
                     WHEN i % 3 = 1 THEN 125000
                     WHEN i % 3 = 2 THEN 250000
                     ELSE 0 END::BIGINT AS shift_ns
         FROM range(64) t(i), range(16) s(j)
       )
       SELECT CASE WHEN i % 3 = 0 THEN 'temp_' || i ELSE 'pressure_' || i END AS name,
              (i % 8)::INT AS channel,
              j::INT AS sample_idx,
              location,
              round(rel_ns::DOUBLE / 1e9, 9) AS time_sec,
              round((rel_ns - shift_ns)::DOUBLE / 1e9, 9) AS window_start_sec,
              round(((i*37 + j*11) % 200) / 8.0 - 12.5, 6) AS value
       FROM g"""

  /** The f144 value union's 20 variants in wire order
    * (`schemas/ecs_f144_logdata.fbs:5-46`).
    */
  private val f144Types = Seq(
    "Byte", "UByte", "Short", "UShort", "Int", "UInt", "Long", "ULong",
    "Float", "Double",
    "ArrayByte", "ArrayUByte", "ArrayShort", "ArrayUShort", "ArrayInt",
    "ArrayUInt", "ArrayLong", "ArrayULong", "ArrayFloat", "ArrayDouble")

  /** The reference's variant → HDF5 type-descriptor mapping
    * (`nexus-writer/src/nexus/logs/f114.rs:35-56`).
    */
  private val f144BaseDescr = Map(
    "Byte" -> "Integer(U1)", "UByte" -> "Unsigned(U1)",
    "Short" -> "Integer(U2)", "UShort" -> "Unsigned(U2)",
    "Int" -> "Integer(U4)", "UInt" -> "Unsigned(U4)",
    "Long" -> "Integer(U8)", "ULong" -> "Unsigned(U8)",
    "Float" -> "Float(U4)", "Double" -> "Float(U8)")

  private def f144Descriptor(t: String): String =
    if (t.startsWith("Array")) s"VarLenArray(${f144BaseDescr(t.stripPrefix("Array"))})"
    else f144BaseDescr(t)

  /** Deterministic in-range sample for scalar base type `b` (0..9 in
    * union order) — integer/dyadic arithmetic only, so the DuckDB oracle
    * regenerates identical doubles.
    */
  private def f144Sample(b: Int, n: Long): Double = b match {
    case 0 => (n * 13 % 200 - 100).toDouble // Byte
    case 1 => (n * 13 % 250).toDouble // UByte
    case 2 => (n * 523 % 60000 - 30000).toDouble // Short
    case 3 => (n * 523 % 60000).toDouble // UShort
    case 4 => (n * 48611 % 2000000000L - 1000000000L).toDouble // Int
    case 5 => (n * 48611 % 4000000000L).toDouble // UInt
    case 6 => (n * 1103515245L).toDouble // Long
    case 7 => (n * 2654435761L).toDouble // ULong
    case 8 => (n * 13 % 1000) / 4.0 // Float (quarter-exact in f32)
    case _ => n / 8.0 // Double
  }

  /** f144 run-log union dispatch (`schemas/ecs_f144_logdata.fbs:27-54`):
    * all 20 union variants are modelled as a type tag plus a widened
    * numeric lane; like the reference sink, the concrete type per source
    * is resolved from the FIRST sample, later samples append under it,
    * and the HDF5 type descriptor it would open is reported
    * (`nexus-writer/src/nexus/logs/f114.rs:25-59`). Scalars and arrays
    * coexist (arrays via per-sample explode).
    */
  /** Deterministic f144 fixture: 80 messages cycling all 20 union
    * variants, 100 ms apart — shared by [[runlogTyped]] and
    * [[nexusRunlogTable]], regenerated in SQL by both oracles.
    */
  private def runlogFixture(s: SparkSession) = {
    import s.implicits._
    (0 until 80).map { i =>
      val t = f144Types(i % 20)
      val isArray = i % 20 >= 10
      LogData(
        sourceName = s"IN:MUSR:CS:SB:pv_${i % 20}",
        timestampNs = runStartNs + i.toLong * 100000000L,
        valueType = t,
        value = if (isArray) 0.0 else f144Sample(i % 10, i.toLong),
        arrayValue =
          if (isArray) Array.tabulate(4)(j => f144Sample(i % 10, i.toLong + j * 7L))
          else Array.empty)
    }.toDS()
  }

  def runlogTyped(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val logs = runlogFixture(s)
    val strip = graft.operators.LogTables.strip _
    // generators can't sit inside when/otherwise — split the union by tag
    val scalars = logs
      .filter(!col("valueType").startsWith("Array"))
      .select(
        strip(col("sourceName")).as("source"),
        col("valueType"),
        col("timestampNs"),
        col("value").as("sample"))
    val arrays = logs
      .filter(col("valueType").startsWith("Array"))
      .select(
        strip(col("sourceName")).as("source"),
        col("valueType"),
        col("timestampNs"),
        explode(col("arrayValue")).as("sample"))
    val perSample = scalars.union(arrays)
    val descrByType = typedLit(f144Types.map(t => t -> f144Descriptor(t)).toMap)
    perSample
      .groupBy(col("source"))
      .agg(
        min_by(col("valueType"), col("timestampNs")).as("resolved_type"),
        count(lit(1)).as("n_samples"),
        round(avg(col("sample")), 6).as("mean_value"),
        round((max(col("timestampNs")) - lit(runStartNs)).cast("double") / 1e9, 9)
          .as("last_time_sec"))
      .withColumn("type_descriptor", element_at(descrByType, col("resolved_type")))
  }

  /** DuckDB oracle for [[runlogTyped]]: fixture regenerated with
    * `range()`; type-per-source is single-valued by construction so
    * `min(valueType)` equals the first-sample resolution.
    */
  /** SQL twin of [[f144Sample]] for the fixture-regenerating oracles. */
  private def runlogSampleSql(n: String) =
    s"""CASE (i % 10)
          WHEN 0 THEN (($n)*13 % 200 - 100)::DOUBLE
          WHEN 1 THEN (($n)*13 % 250)::DOUBLE
          WHEN 2 THEN (($n)*523 % 60000 - 30000)::DOUBLE
          WHEN 3 THEN (($n)*523 % 60000)::DOUBLE
          WHEN 4 THEN (($n)*48611 % 2000000000 - 1000000000)::DOUBLE
          WHEN 5 THEN (($n)*48611 % 4000000000)::DOUBLE
          WHEN 6 THEN (($n)*1103515245)::DOUBLE
          WHEN 7 THEN (($n)*2654435761)::DOUBLE
          WHEN 8 THEN (($n)*13 % 1000) / 4.0
          ELSE ($n) / 8.0 END"""

  val runlogTypedSql: String = {
    def sample(n: String) = runlogSampleSql(n)
    val typeRows = f144Types.zipWithIndex
      .map { case (t, k) => s"($k, '$t', '${f144Descriptor(t)}')" }
      .mkString(",\n           ")
    s"""WITH types(k, t, descr) AS (
         VALUES $typeRows
       ), samples AS (
         SELECT i % 20 AS k,
                (1700000000000000000 + i * 100000000)::BIGINT AS ts,
                ${sample("i")} AS sample
         FROM range(80) r(i) WHERE i % 20 < 10
         UNION ALL
         SELECT i % 20,
                (1700000000000000000 + i * 100000000)::BIGINT,
                ${sample("i + j*7")}
         FROM range(80) r(i), range(4) s(j) WHERE i % 20 >= 10
       )
       SELECT 'pv_' || k AS source, t AS resolved_type, descr AS type_descriptor,
              count(*) AS n_samples,
              round(avg(sample), 6) AS mean_value,
              round((max(ts) - 1700000000000000000)::DOUBLE / 1e9, 9) AS last_time_sec
       FROM samples JOIN types USING (k)
       GROUP BY k, t, descr"""
  }

  /** K4 log-table path end-to-end in batch form: the f144 fixture is
    * run-assigned ([[graft.operators.RunAssignment.assignLogs]] against a
    * two-generation run dimension), expanded per-sample
    * ([[graft.operators.LogTables.runlogTable]]), written through a real
    * [[graft.streaming.NexusSink]] `runlog/` partitioned layout, and read
    * back — the oracle re-derives fixture, run assignment, and expansion
    * in SQL.
    */
  def nexusRunlogTable(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val logs = runlogFixture(s)
    // run_1 [t0, t0+4s) stopped, run_2 [t0+4s, open) — ms-exact values
    val starts = Seq(
      RunStart("run_1", runStartNs / 1000000L, "muon"),
      RunStart("run_2", runStartNs / 1000000L + 4000L, "muon")).toDS()
    val stops = Seq(RunStop("run_1", runStartNs / 1000000L + 4000L)).toDS()
    val runs = graft.operators.RunAssignment.runs(s, starts, stops)
    val assigned = graft.operators.RunAssignment.assignLogs(logs.toDF(), runs)
    // per-application scratch dir (the traceFileRoundtrip convention):
    // a fresh createTempDirectory per invocation leaked one parquet
    // layout per bench/verify round for the life of the host
    val out = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"),
      s"graft_runlog_sink_${s.sparkContext.applicationId}")
    graft.streaming.NexusSink.deleteRecursively(out)
    val sink = new graft.streaming.NexusSink(out.toString)
    // the 200-row fixture otherwise fans out over every shuffle partition
    // and pays 32 write tasks for 2 partition dirs — layout-only change
    sink.writeLogBatch(graft.operators.LogTables.runlogTable(assigned).coalesce(1), "runlog", 0L)
    s.read
      .parquet(out.resolve("local").resolve("runlog").toString)
      .select(
        col("run_name"),
        // partition-column inference types small values as INT
        col("run_start_ns").cast("long").as("run_start_ns"),
        col("source"),
        col("value_type"),
        col("time_ns"),
        col("time_sec"),
        col("value"))
  }

  /** DuckDB oracle for [[nexusRunlogTable]]: fixture regenerated with
    * `range()`, J2 assignment applied as the closed-form CASE the
    * two-run interval fixture reduces to (earliest run not ending before
    * the message timestamp).
    */
  val nexusRunlogTableSql: String = {
    val typeRows = f144Types.zipWithIndex
      .map { case (t, k) => s"($k, '$t')" }
      .mkString(",\n           ")
    s"""WITH types(k, t) AS (
         VALUES $typeRows
       ), samples AS (
         SELECT i, i % 20 AS k,
                (1700000000000000000 + i * 100000000)::BIGINT AS time_ns,
                ${runlogSampleSql("i")} AS value
         FROM range(80) r(i) WHERE i % 20 < 10
         UNION ALL
         SELECT i, i % 20,
                (1700000000000000000 + i * 100000000)::BIGINT,
                ${runlogSampleSql("i + j*7")}
         FROM range(80) r(i), range(4) s(j) WHERE i % 20 >= 10
       ), assigned AS (
         SELECT *,
                CASE WHEN i < 40 THEN 'run_1' ELSE 'run_2' END AS run_name,
                (CASE WHEN i < 40 THEN 1700000000000000000
                      ELSE 1700000004000000000 END)::BIGINT AS run_start_ns
         FROM samples
       )
       SELECT run_name, run_start_ns, 'pv_' || k AS source, t AS value_type,
              time_ns,
              round((time_ns - run_start_ns)::DOUBLE / 1e9, 9) AS time_sec,
              value
       FROM assigned JOIN types USING (k)"""
  }

  /** al00 alarm normalisation (F10 severity mapping +
    * `schemas/ecs_al00_alarm.fbs:5-17`).
    */
  def alarmSeverity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val alarms = (0 until 32).map { i =>
      Alarm(
        sourceName = s"IN:MUSR:CS:SB:block_${i % 4}",
        timestampNs = runStartNs + i.toLong * 500000000L,
        severity = Seq("OK", "MINOR", "MAJOR", "INVALID")(i % 4),
        message = s"alarm $i")
    }.toDS()
    val strip = graft.operators.LogTables.strip _
    alarms
      .select(
        strip(col("sourceName")).as("source"),
        col("severity"),
        graft.operators.LogTables.severityCode(col("severity")).as("severity_code"),
        round((col("timestampNs") - lit(runStartNs)).cast("double") / 1e9, 9)
          .as("time_sec"))
  }

  /** DuckDB oracle for [[alarmSeverity]]: fixture regenerated in SQL. */
  val alarmSeveritySql: String =
    """SELECT 'block_' || (i % 4) AS source,
              ['OK','MINOR','MAJOR','INVALID'][(i % 4) + 1] AS severity,
              (i % 4)::INT AS severity_code,
              round((i * 500000000)::DOUBLE / 1e9, 9) AS time_sec
       FROM range(32) t(i)"""

  /** F1: GpsTime ↔ epoch-ns round trip over a generated component grid. */
  def gpsRoundTrip(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val gps = udf { (ns: Long) =>
      val g = TimeFunctions.epochNsToGps(ns)
      (g.year, g.day, g.hour, g.minute, g.second, g.millisecond, g.microsecond, g.nanosecond)
    }
    val back = udf { (y: Int, d: Int, h: Int, m: Int, sec: Int, ms: Int, us: Int, ns: Int) =>
      TimeFunctions.gpsToEpochNs(GpsTime(y, d, h, m, sec, ms, us, ns))
    }
    s.range(0, 1000)
      .select((lit(runStartNs) + col("id") * 86400123456789L).as("ts_ns"))
      .withColumn("g", gps(col("ts_ns")))
      .select(
        col("ts_ns"),
        col("g._1").as("year"),
        col("g._2").as("day"),
        col("g._3").as("hour"),
        back(col("g._1"), col("g._2"), col("g._3"), col("g._4"), col("g._5"),
          col("g._6"), col("g._7"), col("g._8")).as("round_trip_ns"))
      .withColumn("ok", col("ts_ns") === col("round_trip_ns"))
  }

  /** DuckDB oracle for [[gpsRoundTrip]]: the calendar decomposition is
    * recomputed with DuckDB's own date functions (year/dayofyear/hour of
    * the µs-truncated timestamp — sub-second GPS components don't affect
    * them), and `round_trip_ns = ts_ns` asserts the inverse conversion
    * is exact.
    */
  val gpsRoundTripSql: String =
    """SELECT ts_ns,
              (year(t) - 2000)::INT AS year,
              dayofyear(t)::INT AS day,
              hour(t)::INT AS hour,
              ts_ns AS round_trip_ns,
              true AS ok
       FROM (SELECT (1700000000000000000 + i * 86400123456789)::BIGINT AS ts_ns,
                    make_timestamp((1700000000000000000 + i * 86400123456789) // 1000) AS t
             FROM range(1000) r(i))"""

  /** J5: detector-spectrum map as a broadcast dimension joined to event
    * channels (`schemas/ecs_df12_det_spec_map.fbs:6-10`). Runs the REAL
    * trace→event FSM chain over the closed-form [[TraceFixtures]] grid,
    * so the DuckDB oracle re-derives the per-spectrum event counts with
    * gaps-and-islands — the detection FSM, channel-id fan-out, and the
    * broadcast dimension join are all hash-checked end-to-end. The
    * mapping itself arrives the way the reference receives it: embedded
    * as a df12 table inside a pl72 RunStart and extracted from the WIRE
    * BYTES (`ecs_pl72_run_start.fbs:25`), so the nested-table codec sits
    * on this oracle's hash path too.
    */
  def spectrumMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wire = graft.schemas.WireCodecs.encodePl72(RunStart(
      "run_map", 1700000000000L, "muon",
      detectorSpectrumMap = Some(graft.schemas.SpectraDetectorMap(
        spectrum = (0 until 32).map(1000 + _),
        detectorId = 0 until 32,
        nSpectra = 32))))
    val mapping = graft.schemas.WireCodecs.decodePl72(wire)
      .detectorSpectrumMap.get.mappings.toDS()
    val dev2 = EventFormation.formEvents(
      TraceFixtures.arithmeticTraces(s, nFrames = 8, nDigitizers = 4),
      DetectorSettings(FixedThreshold(threshold = 100.0), baseline = 50.0))
    dev2
      .select(col("digitizerId"), explode(col("channel")).as("detectorId"))
      .join(broadcast(mapping), Seq("detectorId"))
      .groupBy(col("spectrum"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** DuckDB oracle for [[spectrumMap]]: islands per (d, c) summed over
    * frames, keyed by spectrum = 1000 + detector id (d*8 + c).
    */
  val spectrumMapSql: String =
    TraceFixtures.islandsSql(nFrames = 8, nDigitizers = 4) +
      """
       SELECT (1000 + d*8 + c)::INT AS spectrum, count(*) AS n_events
       FROM islands GROUP BY 1"""

  /** J4: trace ↔ event-list attach on (digitiser id, frame timestamp) —
    * the trace-viewer dragnet join
    * (`trace-viewer/src/finder/task/dragnet.rs:93-130`).
    */
  def traceEventAttach(s: SparkSession, dir: String): DataFrame = {
    val traces = TraceFixtures.arithmeticTraces(s, nFrames = 8, nDigitizers = 4)
    val dev2 = EventFormation.formEvents(
      traces, DetectorSettings(FixedThreshold(threshold = 100.0), baseline = 50.0))
    traces
      .select(
        col("digitizerId"),
        col("metadata.timestampNs").as("ts_ns"),
        size(col("channels")).as("n_channels"))
      .join(
        dev2.select(
          col("digitizerId"),
          col("metadata.timestampNs").as("ts_ns"),
          size(col("time")).as("n_events")),
        Seq("digitizerId", "ts_ns"))
      .orderBy(col("ts_ns"), col("digitizerId"))
  }

  /** DuckDB oracle for [[traceEventAttach]]: per-message island totals on
    * the [[TraceFixtures]] grid — the attach join is 1:1 on
    * (digitiser, frame ts), so the oracle is one row per (f, d).
    */
  val traceEventAttachSql: String =
    TraceFixtures.islandsSql(nFrames = 8, nDigitizers = 4) +
      """
       SELECT d::INT AS "digitizerId",
              (1700000000000000000 + f*20000000)::BIGINT AS ts_ns,
              8::INT AS n_channels, count(*)::INT AS n_events
       FROM islands GROUP BY f, d"""

  /** A5: per-digitiser live diagnostics (the `daq-trace` TUI aggregation,
    * `diagnostics/src/daq_trace/data.rs:46-120`): message count,
    * first/last timestamps, frame span, channel/sample counts, intensity
    * extrema.
    */
  def digitiserStats(s: SparkSession, dir: String): DataFrame = {
    val traces = TraceFixtures.arithmeticTraces(s, nFrames = 16, nDigitizers = 4)
    traces
      .select(
        col("digitizerId"),
        col("metadata.timestampNs").as("ts_ns"),
        col("metadata.frameNumber").as("frame"),
        size(col("channels")).as("n_channels"),
        expr("aggregate(channels, 0, (acc, c) -> acc + size(c.voltage))").as("n_samples"),
        expr("array_max(transform(channels, c -> array_max(c.voltage)))").as("max_intensity"),
        expr("array_min(transform(channels, c -> array_min(c.voltage)))").as("min_intensity"))
      .groupBy(col("digitizerId"))
      .agg(
        count(lit(1)).as("n_messages"),
        min(col("ts_ns")).as("first_ts_ns"),
        max(col("ts_ns")).as("last_ts_ns"),
        min(col("frame")).as("first_frame"),
        max(col("frame")).as("last_frame"),
        max(col("n_channels")).as("n_channels"),
        max(col("n_samples")).as("samples_per_msg"),
        max(col("max_intensity")).as("max_intensity"),
        min(col("min_intensity")).as("min_intensity"))
  }

  /** DuckDB oracle for [[digitiserStats]]: the per-digitiser aggregates
    * re-derived from the [[TraceFixtures]] arithmetic (16 frames × 4
    * digitisers × 8 channels × 500 samples).
    */
  val digitiserStatsSql: String =
    """WITH samp AS (
         SELECT d, ((f*31 + d*13 + c*7 + j*11) % 400) AS v
         FROM range(16) rf(f), range(4) rd(d), range(8) rc(c), range(500) rj(j)
       )
       SELECT d::INT AS "digitizerId", 16::BIGINT AS n_messages,
              1700000000000000000::BIGINT AS first_ts_ns,
              (1700000000000000000 + 15*20000000)::BIGINT AS last_ts_ns,
              0::BIGINT AS first_frame, 15::BIGINT AS last_frame,
              8::INT AS n_channels, 4000::INT AS samples_per_msg,
              (50 + max(v))::INT AS max_intensity,
              (50 + min(v))::INT AS min_intensity
       FROM samp GROUP BY d"""
}
