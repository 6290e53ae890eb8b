package graft.sources

import graft.dsp.{DetectorSettings, FixedThreshold}
import graft.operators.EventFormation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class TraceFileSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Directory listing that closes its stream (the discipline main code
    * keeps in NexusSink.listChildren).
    */
  private def fileNames(dir: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    val st = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    try st.iterator().asScala.map(_.getFileName.toString).toSeq
    finally st.close()
  }

  private def fixture: Seq[(Long, Array[Array[Int]])] =
    (0 until 10).map { i =>
      val ts = 1700000000000000000L + i * 20000000L
      val channels = Array.tabulate(2)(c =>
        Array.tabulate(32)(j => 50 + ((i * 31 + c * 7 + j * 13) % 400)))
      (ts, channels)
    }

  test("binary trace file round-trips header and events with random access") {
    val path = Files.createTempDirectory("tracefile").resolve("run.gtf").toString
    TraceFile.write(path, sampleTimeNs = 1.0, events = fixture)
    val header = TraceFile.readHeader(path)
    assert(header.nChannels === 2)
    assert(header.nSamples === 32)
    assert(header.nEvents === 10)
    assert(header.sampleTimeNs === 1.0)
    // random access: read event 7 directly, compare to source
    val (ts7, ch7) = TraceFile.readEvent(path, header, 7)
    assert(ts7 === fixture(7)._1)
    assert(ch7.map(_.toSeq).toSeq === fixture(7)._2.map(_.toSeq).toSeq)
  }

  test("DataSource V2: spark.read.format(trace-file) with split planning and column pruning") {
    import org.apache.spark.sql.functions._
    val path = Files.createTempDirectory("tracefile_v2").resolve("run.gtf").toString
    TraceFile.write(path, sampleTimeNs = 1.0, events = fixture)

    val df = spark.read.format("trace-file").load(path)
    assert(df.count() === 10)
    // values agree with the typed reader
    val full = df.orderBy("event_index").collect()
    assert(full.map(_.getAs[Long]("timestamp_ns")).toSeq === fixture.map(_._1))
    val ch0 = full(3)
      .getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("channels")
      .head
      .getAs[scala.collection.Seq[Int]]("voltage")
    assert(ch0.toSeq === fixture(3)._2.head.toSeq)

    // column pruning reaches the scan: a timestamp-only projection's
    // batch scan must not output the channels column (the reader then
    // reads 8 bytes per record instead of the payload)
    val pruned = df.select(col("timestamp_ns"))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }
    assert(scans.nonEmpty)
    assert(scans.head.output.map(_.name) === Seq("timestamp_ns"))
    assert(pruned.collect().map(_.getLong(0)).toSeq.sorted === fixture.map(_._1))

    // sample_rate derived from the header
    assert(df.select(max(col("sample_rate"))).head().getLong(0) === 1000000000L)

    // timestamp-range pushdown prunes the PLANNED event range via bisect:
    // a filter selecting events 4..7 must plan exactly 4 records
    val midLo = fixture(4)._1
    val midHi = fixture(7)._1
    val filtered = df.filter(col("timestamp_ns") >= midLo && col("timestamp_ns") <= midHi)
    assert(filtered.count() === 4)
    assert(filtered.select(min(col("event_index"))).head().getLong(0) === 4L)
    val fScan = filtered.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => s
    }.head
    val planned = fScan.scan
      .asInstanceOf[TraceFileScan]
      .planInputPartitions()
      .map(_.asInstanceOf[TraceFilePartition])
    assert(planned.map(p => p.end - p.start).sum === 4L,
      s"bisect prune should plan 4 events, planned ${planned.toSeq}")
    assert(planned.head.start === 4L)
  }

  test("DataSource V2: a directory of trace files plans per file") {
    val dir = Files.createTempDirectory("tracefile_dir")
    TraceFile.write(dir.resolve("a.gtf").toString, 1.0, fixture)
    // second capture file 1 s later
    val later = fixture.map { case (ts, ch) => (ts + 1000000000L, ch) }
    TraceFile.write(dir.resolve("b.gtf").toString, 1.0, later)
    val df = spark.read.format("trace-file").load(dir.toString)
    assert(df.count() === 20)
    // range filter spanning only the second file prunes the first
    val onlyB = df.filter(org.apache.spark.sql.functions.col("timestamp_ns") >= later.head._1)
    assert(onlyB.count() === 10)
  }

  test("DataSource V2: multi-path load(p1, p2) reads every path (Spark passes a 'paths' JSON array)") {
    val dir = Files.createTempDirectory("tracefile_multi")
    TraceFile.write(dir.resolve("a.gtf").toString, 1.0, fixture)
    val later = fixture.map { case (ts, ch) => (ts + 1000000000L, ch) }
    TraceFile.write(dir.resolve("b.gtf").toString, 1.0, later)
    val df = spark.read.format("trace-file")
      .load(dir.resolve("a.gtf").toString, dir.resolve("b.gtf").toString)
    assert(df.count() === 20)
    // a path entry may itself be a directory
    val mixed = spark.read.format("trace-file").load(dir.toString)
    assert(mixed.count() === 20)
  }

  test("distributed load feeds event formation") {
    val path = Files.createTempDirectory("tracefile").resolve("run.gtf").toString
    TraceFile.write(path, sampleTimeNs = 1.0, events = fixture)
    val traces = TraceFile.load(spark, path, digitizerId = 3)
    assert(traces.count() === 10)
    val dev2 = EventFormation
      .formEvents(traces, DetectorSettings(FixedThreshold(threshold = 100.0), baseline = 50.0))
      .collect()
    assert(dev2.length === 10)
    assert(dev2.forall(_.digitizerId === 3))
    assert(dev2.map(_.time.length).sum > 0)
  }

  test("bisect by timestamp: backstep + forward scan with limit (O4/O5)") {
    val path = Files.createTempDirectory("tracefile").resolve("run.gtf").toString
    TraceFile.write(path, sampleTimeNs = 1.0, events = fixture)
    // target between events 4 and 5 → bisect lands on 5, backstep 2 → start 3
    val target = fixture(4)._1 + 1L
    val hits = TraceFile.findByTimestamp(path, target, backstep = 2, limit = 3)
    assert(hits.map(_._1) === Seq(5, 6, 7)) // dropWhile skips pre-target
    assert(hits.forall(_._2 >= target))
    // bounded forward distance truncates the scan
    val bounded = TraceFile.findByTimestamp(path, target, backstep = 2, limit = 10,
      forwardDistanceNs = 40000000L)
    assert(bounded.map(_._1) === Seq(5, 6))
    // target beyond all events → empty
    assert(TraceFile.findByTimestamp(path, fixture.last._1 + 1L) === Seq.empty)
  }

  test("DataSource V2 write: distributed round trip, overwrite truncates, tmp invisible") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gtf_write").toString
    def grid(n: Int, seed: Int) = spark
      .range(0, n)
      .select(
        (lit(1000000L) + col("id") * 10L).as("timestamp_ns"),
        lit(1000000000L).as("sample_rate"),
        expr(s"""transform(sequence(0, 1), c -> named_struct(
                  'channel', cast(c as bigint),
                  'voltage', transform(sequence(0, 3),
                    j -> cast((id*7 + c*3 + j + $seed) % 100 as int))))""").as("channels"))
    grid(20, 0)
      .repartitionByRange(3, col("timestamp_ns"))
      .sortWithinPartitions("timestamp_ns")
      .write
      .format("trace-file")
      .mode("overwrite")
      .save(dir)
    val back = spark.read.format("trace-file").load(dir)
    assert(back.count() == 20)
    // content identical: every (ts, voltage grid) value survives
    val vsum = back
      .select(expr(
        "aggregate(channels, 0L, (acc, ch) -> acc + aggregate(ch.voltage, 0L, (a, v) -> a + v))"))
      .collect()
      .map(_.getLong(0))
      .sum
    val expected = (0 until 20).map(i => (0 until 2).map(c => (0 until 4).map(j => (i * 7 + c * 3 + j) % 100).sum).sum).sum
    assert(vsum == expected)

    // overwrite replaces the previous file set entirely (different seed)
    grid(10, 1).coalesce(1).sortWithinPartitions("timestamp_ns")
      .write.format("trace-file").mode("overwrite").save(dir)
    assert(spark.read.format("trace-file").load(dir).count() == 10)
    // no stray temps or stale parts
    val files = fileNames(dir)
    assert(files.forall(f => f.endsWith(".gtf")), files.toString)
    assert(files.size == 1)
  }

  test("DataSource V2 write: append adds job-unique files, never clobbers; probe cleaned") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gtf_append").toString
    def grid(n: Int, base: Long) = spark
      .range(0, n)
      .select(
        (lit(base) + col("id") * 10L).as("timestamp_ns"),
        lit(1000000000L).as("sample_rate"),
        expr("""transform(sequence(0, 1), c -> named_struct(
                 'channel', cast(c as bigint),
                 'voltage', transform(sequence(0, 3), j -> cast(1 as int))))""").as("channels"))
    grid(6, 1000L).coalesce(1).sortWithinPartitions("timestamp_ns")
      .write.format("trace-file").mode("overwrite").save(dir)
    grid(4, 9000L).coalesce(1).sortWithinPartitions("timestamp_ns")
      .write.format("trace-file").mode("append").save(dir)
    // both file sets live side by side: file names carry the write job's
    // queryId, so a second application's taskId=0 cannot regenerate (and
    // the commit rename cannot clobber) the first job's names
    val files = fileNames(dir)
    assert(files.size == 2 && files.forall(_.endsWith(".gtf")), files.toString)
    assert(files.distinct.size == 2)
    assert(spark.read.format("trace-file").load(dir).count() == 10)
  }

  test("DataSource V2 write: null/zero sample_rate fails closed, not Infinity header") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gtf_badrate").toString
    val zeroRate = spark
      .range(0, 2)
      .select(
        col("id").as("timestamp_ns"),
        lit(0L).as("sample_rate"),
        expr("""transform(sequence(0, 0), c -> named_struct(
                 'channel', cast(c as bigint),
                 'voltage', array(cast(1 as int))))""").as("channels"))
    val e = intercept[Exception] {
      zeroRate.coalesce(1).write.format("trace-file").mode("overwrite").save(dir)
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("sample_rate must be a positive")), msgs.toString)
    // the explicit option bypasses the column entirely
    zeroRate.drop("sample_rate").coalesce(1).sortWithinPartitions("timestamp_ns")
      .write.format("trace-file").option("sample_time_ns", "2.0")
      .mode("overwrite").save(dir)
    assert(spark.read.format("trace-file").load(dir).count() == 2)
  }

  test("DataSource V2 write: mistyped frames and out-of-range samples fail closed") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gtf_badtype").toString
    // voltage typed bigint → rejected up front (ordinal getters would
    // otherwise write corrupt bytes)
    val badType = spark
      .range(0, 2)
      .select(
        col("id").as("timestamp_ns"),
        expr("""transform(sequence(0, 0), c -> named_struct(
                 'channel', cast(c as bigint),
                 'voltage', array(cast(1 as bigint))))""").as("channels"))
    val e1 = intercept[Exception] {
      badType.coalesce(1).write.format("trace-file").mode("overwrite").save(dir)
    }
    def causes(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).toSeq
    assert(causes(e1).exists(m => m != null && m.contains("array<int>")), e1.getMessage)

    // out-of-range sample (u16) → rejected in the task, not masked
    val badRange = spark
      .range(0, 2)
      .select(
        col("id").as("timestamp_ns"),
        expr("""transform(sequence(0, 0), c -> named_struct(
                 'channel', cast(c as bigint),
                 'voltage', array(70000)))""").as("channels"))
    val e2 = intercept[Exception] {
      badRange.coalesce(1).write.format("trace-file").mode("overwrite").save(dir)
    }
    assert(causes(e2).exists(m => m != null && m.contains("u16")), e2.getMessage)

    // out-of-order channels array → rejected (reader would relabel)
    val badOrder = spark
      .range(0, 2)
      .select(
        col("id").as("timestamp_ns"),
        expr("""transform(sequence(0, 1), c -> named_struct(
                 'channel', cast(1 - c as bigint),
                 'voltage', array(1)))""").as("channels"))
    val e3 = intercept[Exception] {
      badOrder.coalesce(1).write.format("trace-file").mode("overwrite").save(dir)
    }
    assert(causes(e3).exists(m => m != null && m.contains("channel order")), e3.getMessage)

    // user-specified read schema → fail fast, not silently ignored
    val e4 = intercept[Exception] {
      spark.read
        .schema("timestamp_ns LONG")
        .format("trace-file")
        .load(dir)
        .collect()
    }
    assert(e4.getMessage.contains("user-specified schema"), e4.getMessage)
  }

  test("DataSource V2 write: unsorted partition fails closed with the sort hint") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("gtf_unsorted").toString
    val df = spark
      .range(0, 5)
      .select(
        (lit(100L) - col("id")).as("timestamp_ns"), // decreasing — violates the invariant
        expr("""transform(sequence(0, 0), c -> named_struct(
                 'channel', cast(c as bigint),
                 'voltage', array(1, 2)))""").as("channels"))
    val e = intercept[Exception] {
      df.coalesce(1).write.format("trace-file").mode("overwrite").save(dir)
    }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else t.getMessage +: causes(t.getCause)
    assert(causes(e).exists(m => m != null && m.contains("sortWithinPartitions")), e.getMessage)
  }

  test("vec_dot expression: interpreted and codegen paths agree with the HOF chain") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.plans.VecDot.register(spark)
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0)),
      (Array(0.1, -0.2), Array(0.3, 0.4)),
      (Array.empty[Double], Array.empty[Double])).toDF("a", "b")
    val got = df
      .select(
        expr("vec_dot(a, b)").as("vd"),
        aggregate(zip_with(col("a"), col("b"), _ * _), lit(0.0), _ + _).as("hof"))
      .collect()
    got.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
    // null propagation
    val n = spark.sql("SELECT vec_dot(NULL, array(1.0d)) AS v").collect()
    assert(n.head.isNullAt(0))
  }
}
