package graft.streaming

import graft.schemas.{AssembledFrame, FrameMetadata, WireCodecs}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Offline lock for the Kafka deployment wiring: the option surface is
  * pure and asserted exactly; the guarded constructors must fail at
  * WIRING time with deployment advice (not at start() with a
  * ClassNotFoundException); the broker-agnostic producer half is
  * executed against the wire codec.
  */
class KafkaWiringSpec extends AnyFunSuite {
  import KafkaWiring._

  test("reader/writer option maps carry the full deployment surface") {
    val cfg = SourceConfig(
      bootstrapServers = "broker-1:9092,broker-2:9092",
      topic = "daq-traces",
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(5000000L),
      minPartitions = Some(256),
      failOnDataLoss = true)
    assert(readerOptions(cfg) === Map(
      "kafka.bootstrap.servers" -> "broker-1:9092,broker-2:9092",
      "subscribe" -> "daq-traces",
      "startingOffsets" -> "latest",
      "failOnDataLoss" -> "true",
      "maxOffsetsPerTrigger" -> "5000000",
      "minPartitions" -> "256"))
    // optional knobs absent by default — Kafka connector defaults apply
    assert(readerOptions(SourceConfig("b:9092", "t")) === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "earliest",
      "failOnDataLoss" -> "false"))
    assert(writerOptions(SinkConfig("b:9092", "frames")) === Map(
      "kafka.bootstrap.servers" -> "b:9092",
      "topic" -> "frames"))
  }

  test("offline: connector absence is detected and constructors fail fast with advice") {
    assume(!kafkaAvailable, "this environment ships no kafka connector")
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val e = intercept[IllegalArgumentException](
      rawStream(spark, SourceConfig("b:9092", "daq-traces")))
    assert(e.getMessage.contains("spark-sql-kafka"))
    // the guarded constructors share the same fail-fast
    intercept[IllegalArgumentException](traceStream(spark, SourceConfig("b:9092", "t")))
    intercept[IllegalArgumentException](controlStream(spark, SourceConfig("b:9092", "t")))
  }

  test("producer half encodes frames to a value:binary column a consumer decodes back") {
    val spark = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import spark.implicits._
    val frame = AssembledFrame(
      metadata = FrameMetadata(1700000000000000000L, 1L, 4, running = true, 5L, 3),
      time = Array(1L, 2L),
      voltage = Array(100, 200),
      channel = Array(0L, 1L),
      complete = true,
      digitizersPresent = Array(0, 1))
    val values = frameWireBytes(Seq(frame).toDS()).collect()
    assert(values.length === 1)
    val bytes = values.head.getAs[Array[Byte]]("value")
    assert(WireCodecs.hasIdentifier(bytes, "aev2"))
    val back = WireCodecs.decodeAev2(bytes)
    assert(back.metadata === frame.metadata)
    assert(back.time.toSeq === Seq(1L, 2L))
  }
}
