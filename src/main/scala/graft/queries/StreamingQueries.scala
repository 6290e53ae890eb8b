package graft.queries

import graft.dsp.{DetectorSettings, FixedThreshold}
import graft.operators.EventFormation
import graft.schemas.EventListMessage
import graft.sources.TraceGenerator
import graft.sources.TraceGenerator.GeneratorConfig
import graft.streaming.FrameAssemblyStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming surface exercised through the batch query
  * contract: generated dev2 messages are fed through a MemoryStream into
  * the stateful frame assembler and the emitted aev2 frames are returned
  * once all expected frames dispatched. This is the §3.2 pipeline running
  * on the real streaming engine (state store, timeouts), not the batch
  * group-by.
  */
object StreamingQueries {

  def streamFrameAssembly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val cfg = GeneratorConfig(nFrames = 8, nDigitizers = 4, timeBins = 200)
    val dev2: Array[EventListMessage] = EventFormation
      .formEvents(
        TraceGenerator.traces(s, cfg),
        DetectorSettings(FixedThreshold(threshold = 100.0), baseline = 50.0))
      .collect()

    val input = MemoryStream[EventListMessage]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString
    val name = s"stream_frames_${System.nanoTime()}"
    val query = FrameAssemblyStream
      .assemble(input.toDS(), Seq(0, 1, 2, 3), ttlMs = 2000L)
      .writeStream
      .format("memory")
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("100 milliseconds"))
      .start()
    try {
      // feed digitiser-by-digitiser so frames complete incrementally
      dev2.groupBy(_.digitizerId).toSeq.sortBy(_._1).foreach { case (_, msgs) =>
        input.addData(msgs.toSeq)
      }
      val deadline = System.currentTimeMillis() + 60000L
      while (s.table(name).count() < cfg.nFrames && System.currentTimeMillis() < deadline)
        Thread.sleep(100L)
    } finally query.stop()
    s.table(name)
      .select(
        col("metadata.frameNumber").as("frame_number"),
        col("complete"),
        col("digitizersPresent"),
        size(col("time")).as("n_events"))
  }
}
