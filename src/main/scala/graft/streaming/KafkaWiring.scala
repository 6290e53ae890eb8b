package graft.streaming

import graft.schemas.{AssembledFrame, EventListMessage, TraceMessage, WireCodecs}
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** S1/K1/K2 deployment wiring: the `readStream.format("kafka")` /
  * `writeStream.format("kafka")` plumbing around the broker-agnostic
  * [[WireIngest]] transforms, behind an availability check — this build
  * environment has no broker AND no `spark-sql-kafka` connector jars, so
  * the topology is a config change on a cluster that ships them, not a
  * code change (the reference consumes the same topics through rdkafka:
  * `trace-to-events/src/main.rs:200-256`, `nexus-writer/src/main.rs`).
  *
  * What the engine owns — identifier routing, FlatBuffers decode, drop
  * taxonomy, frame assembly, run lifecycle — runs identically on a
  * MemoryStream, a file stream, or the Kafka `value` column, and is
  * test-locked on the first two. This object adds ONLY the option
  * surface: source/sink option maps (pure, unit-testable offline) and
  * the stream constructors that apply them (guarded by
  * [[kafkaAvailable]] with a deployment-pointing error, since a missing
  * connector must fail at wiring time with advice, not at `start()` with
  * a ClassNotFoundException).
  *
  * Scale notes (SCALE.md "Kafka deployment"): `minPartitions` lets a
  * 1000-executor cluster split broker partitions into more Spark input
  * slices than the topic has; `maxOffsetsPerTrigger` bounds micro-batch
  * size so a backlog replay cannot OOM the first batch; offsets ride the
  * checkpoint, so crash recovery resumes exactly-once into the sinks
  * that are idempotent by batch id ([[NexusSink]]).
  */
object KafkaWiring {

  /** One subscribed source topic. */
  final case class SourceConfig(
      bootstrapServers: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None,
      minPartitions: Option[Int] = None,
      failOnDataLoss: Boolean = false)

  /** One producer topic. */
  final case class SinkConfig(bootstrapServers: String, topic: String)

  /** Whether the Kafka DSv2 connector is on the classpath (it is NOT in
    * this offline environment — deployments add the
    * `spark-sql-kafka-0-10` package).
    */
  def kafkaAvailable: Boolean =
    try {
      Class.forName("org.apache.spark.sql.kafka010.KafkaSourceProvider")
      true
    } catch {
      // a PRESENT-but-broken connector (missing transitive dependency →
      // NoClassDefFoundError/LinkageError) must also report unavailable,
      // or requireKafka's wiring-time deployment advice never fires and
      // the raw linkage error surfaces mid-query instead
      case _: ClassNotFoundException => false
      case _: LinkageError => false
    }

  /** Reader options for [[SourceConfig]] — pure, asserted by
    * KafkaWiringSpec offline.
    */
  def readerOptions(cfg: SourceConfig): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> cfg.bootstrapServers,
      "subscribe" -> cfg.topic,
      "startingOffsets" -> cfg.startingOffsets,
      "failOnDataLoss" -> cfg.failOnDataLoss.toString) ++
      cfg.maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString) ++
      cfg.minPartitions.map("minPartitions" -> _.toString)

  /** Writer options for [[SinkConfig]]. */
  def writerOptions(cfg: SinkConfig): Map[String, String] =
    Map("kafka.bootstrap.servers" -> cfg.bootstrapServers, "topic" -> cfg.topic)

  private def requireKafka(what: String): Unit =
    require(
      kafkaAvailable,
      s"$what needs the spark-sql-kafka connector on the classpath " +
        "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); " +
        "offline builds drive the same transforms from MemoryStream/file streams")

  /** `(value, broker timestamp ms)` stream from a topic — the shape
    * [[WireIngest.controlFromBinaryTimestamped]] wants, so "stop NOW"
    * resolution replays deterministically from the checkpointed offsets.
    */
  def rawStream(spark: SparkSession, cfg: SourceConfig): Dataset[(Array[Byte], Long)] = {
    requireKafka(s"reading topic ${cfg.topic}")
    implicit val enc = Encoders.tuple(Encoders.BINARY, Encoders.scalaLong)
    spark.readStream
      .format("kafka")
      .options(readerOptions(cfg))
      .load()
      .select(col("value"), unix_millis(col("timestamp")))
      .as[(Array[Byte], Long)]
  }

  /** dat2 trace topic → typed traces (the trace-to-events input side). */
  def traceStream(spark: SparkSession, cfg: SourceConfig): Dataset[TraceMessage] = {
    implicit val enc = Encoders.BINARY
    WireIngest.dat2FromBinary(rawStream(spark, cfg).map(_._1))
  }

  /** dev2 event-list topic → typed event lists (the aggregator input). */
  def eventListStream(spark: SparkSession, cfg: SourceConfig): Dataset[EventListMessage] = {
    implicit val enc = Encoders.BINARY
    WireIngest.dev2FromBinary(rawStream(spark, cfg).map(_._1))
  }

  /** Control topic (pl72 + 6s4t on one topic) → [[ControlMessage]]s with
    * the broker timestamp as the replay-stable ingest stamp.
    */
  def controlStream(spark: SparkSession, cfg: SourceConfig): Dataset[ControlMessage] =
    WireIngest.controlFromBinaryTimestamped(rawStream(spark, cfg))

  /** K1 producer: assembled frames → aev2 wire buffers → Kafka `value`
    * column. The encode is [[PipelineJobs.framesToWireTopic]]'s stage,
    * broker-agnostic; call `.option("checkpointLocation", …).start()` on
    * the returned writer.
    */
  def frameProducer(
      frames: Dataset[AssembledFrame],
      cfg: SinkConfig): DataStreamWriter[org.apache.spark.sql.Row] = {
    requireKafka(s"producing to topic ${cfg.topic}")
    frameWireBytes(frames).writeStream.format("kafka").options(writerOptions(cfg))
  }

  /** The producer's broker-agnostic half: frames encoded to a `value:
    * binary` column (unit-tested offline; also the parquet-topic
    * stand-in's payload).
    */
  def frameWireBytes(frames: Dataset[AssembledFrame]): DataFrame =
    frames.map(f => WireCodecs.encodeAev2(f))(Encoders.BINARY).toDF("value")
}
