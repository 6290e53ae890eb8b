package graft.streaming

import graft.queries.TraceFixtures
import graft.schemas.WireCodecs
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** BROKER-GATED integration suite for S1/K1/K2: the full wire topology —
  * encode → produce to a real Kafka topic → `format("kafka")` consume →
  * identifier routing → FlatBuffers decode — with ZERO code beyond what
  * ships in [[KafkaWiring]]/[[WireIngest]]. A cluster deployment
  * validates the Kafka surface by running exactly this suite; the
  * offline build environment (no broker, no `spark-sql-kafka` jars)
  * CANCELS every test via `assume`, which scalatest reports as canceled,
  * not failed.
  *
  * To run: add the connector
  * (`--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>`) and
  * point `GRAFT_KAFKA_BOOTSTRAP` at a broker with topic auto-creation
  * (or pre-create the `graft_it_*` topics). Topics are suffixed with a
  * per-run nonce so reruns never read a previous run's records.
  */
class KafkaIntegrationSpec extends AnyFunSuite {

  private val bootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP")
  private val nonce = java.util.UUID.randomUUID().toString.take(8)

  private def gate(): Unit = {
    assume(
      KafkaWiring.kafkaAvailable,
      "spark-sql-kafka connector not on the classpath — broker suite skips offline")
    assume(
      bootstrap.isDefined,
      "GRAFT_KAFKA_BOOTSTRAP not set — broker suite skips")
  }

  private lazy val spark: SparkSession = {
    val s = graft.Sessions.local("kafka-it", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Batch-produce raw wire buffers to a topic (the connector's batch
    * write path — no checkpoint needed for a bounded produce).
    */
  private def produce(topic: String, payloads: Seq[Array[Byte]]): Unit = {
    import spark.implicits._
    payloads.toDF("value")
      .write
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("topic", topic)
      .save()
  }

  /** Drain one streaming query built by `mk` into a memory sink and
    * return the sink table name. Trigger.AvailableNow processes the
    * topic's current contents and stops — bounded, deterministic.
    */
  private def drain(name: String)(df: org.apache.spark.sql.DataFrame): String = {
    val ckpt = java.nio.file.Files.createTempDirectory(s"kafka_it_$name").toString
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try {
      // a false return = the 120 s deadline fired with the drain still
      // running — fail HERE with the real diagnosis, not downstream on a
      // confusing partial row count
      assert(q.awaitTermination(120000L), s"$name did not drain within 120 s")
    } finally {
      try q.stop()
      finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
    name
  }

  test("S1: dat2 traces produce → consume → decode bit-identically") {
    gate()
    val topic = s"graft_it_dat2_$nonce"
    val traces = TraceFixtures
      .arithmeticTraces(spark, nFrames = 4, nDigitizers = 2, nSamples = 64)
      .collect()
      .toSeq
    produce(topic, traces.map(WireCodecs.encodeDat2))
    val consumed = KafkaWiring.traceStream(
      spark,
      KafkaWiring.SourceConfig(bootstrap.get, topic))
    val table = drain("it_dat2")(consumed.toDF())
    val back = spark.table(table)
    assert(back.count() === traces.size.toLong)
    // content check: per-message voltage checksum must survive the topic
    val sum = back
      .select(expr(
        """aggregate(channels, 0L, (acc, ch) -> acc +
             aggregate(ch.voltage, 0L, (a, v) -> a + v))""").as("s"))
      .agg(org.apache.spark.sql.functions.sum(col("s")))
      .head().getLong(0)
    val expected = traces.map(_.channels.map(_.voltage.map(_.toLong).sum).sum).sum
    assert(sum === expected)
  }

  test("S4/S5: mixed control topic routes pl72/6s4t and drops foreign buffers") {
    gate()
    val topic = s"graft_it_control_$nonce"
    val start = WireCodecs.encodePl72(graft.schemas.RunStart("run_it", 1700000000000L, "muon"))
    val stop = WireCodecs.encode6s4t(graft.schemas.RunStop("run_it", 1700000000500L))
    val foreign = "not a flatbuffer".getBytes("UTF-8")
    produce(topic, Seq(start, foreign, stop))
    val consumed = KafkaWiring.controlStream(
      spark,
      KafkaWiring.SourceConfig(bootstrap.get, topic))
    val table = drain("it_control")(consumed.toDF())
    val rows = spark.table(table).collect()
    assert(rows.length === 2, "foreign buffer must be dropped, not fail the stream")
    val byKind = rows.map(r => r.getAs[String]("kind") -> r.getAs[String]("runName")).toMap
    assert(byKind === Map("start" -> "run_it", "stop" -> "run_it"))
    // broker record timestamps ride along as the replay-stable ingest
    // stamp — every consumed control message must carry one
    assert(rows.forall(_.getAs[Long]("ingestTimeMs") > 0L))
  }

  test("K1: frameProducer writes aev2 buffers a consumer decodes back") {
    gate()
    implicit val sqlCtx = spark.sqlContext
    implicit val frameEnc = Encoders.product[graft.schemas.AssembledFrame]
    val topic = s"graft_it_aev2_$nonce"
    val frames = (0 until 8).map(i =>
      graft.schemas.AssembledFrame(
        metadata = graft.schemas.FrameMetadata(
          timestampNs = 1700000000000000000L + i * 20000000L,
          periodNumber = i % 4,
          protonsPerPulse = 4,
          running = true,
          frameNumber = i.toLong,
          vetoFlags = i % 16),
        time = Array.tabulate(i % 5)(j => (j * 13).toLong),
        voltage = Array.tabulate(i % 5)(j => j * 17),
        channel = Array.tabulate(i % 5)(j => (j % 8).toLong),
        complete = true,
        digitizersPresent = Array(0, 1)))
    val ckpt = java.nio.file.Files.createTempDirectory("kafka_it_prod").toString
    val input =
      org.apache.spark.sql.execution.streaming.runtime.MemoryStream[graft.schemas.AssembledFrame]
    input.addData(frames)
    val q = KafkaWiring.frameProducer(
      input.toDS(),
      KafkaWiring.SinkConfig(bootstrap.get, topic))
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000L), "producer did not drain within 120 s")
    finally {
      try q.stop()
      finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
    // read the topic back raw (batch) and decode through the ingest router
    implicit val binEnc = Encoders.BINARY
    val raw = spark.read
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap.get)
      .option("subscribe", topic)
      .option("startingOffsets", "earliest")
      .load()
      .select(col("value"))
      .as[Array[Byte]]
    val decoded = WireIngest.aev2FromBinary(raw, "it_aev2_ingest").collect()
    assert(decoded.length === frames.size)
    assert(
      decoded.map(_.metadata.frameNumber).sorted.toSeq ===
        frames.map(_.metadata.frameNumber).sorted)
    assert(
      decoded.map(f => (f.metadata.frameNumber, f.time.sum, f.channel.sum)).sortBy(_._1).toSeq ===
        frames.map(f => (f.metadata.frameNumber, f.time.sum, f.channel.sum)).sortBy(_._1))
  }
}
