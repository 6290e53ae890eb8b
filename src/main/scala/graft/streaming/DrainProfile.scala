package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener

import java.util.concurrent.ConcurrentLinkedQueue

/** Global accumulator for [[DrainProfileListener]] — static because the
  * listener is installed via the STATIC SQL conf
  * `spark.sql.streaming.streamingQueryListeners`, which is the only
  * registration that reaches the SESSION CLONES the bounded drains run
  * on (`StreamingQueries.boundedDrainSession`): a listener added to the
  * outer session's `streams` manager never sees a clone's queries, but
  * the static conf registers at SharedState level and clones inherit it.
  */
object DrainProfileListener {
  final case class BatchRecord(
      queryName: String,
      batchId: Long,
      batchDurationMs: Long,
      inputRows: Long,
      durations: Map[String, Long])
  val records = new ConcurrentLinkedQueue[BatchRecord]()
}

final class DrainProfileListener extends StreamingQueryListener {
  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    import scala.jdk.CollectionConverters._
    DrainProfileListener.records.add(
      DrainProfileListener.BatchRecord(
        Option(p.name).getOrElse(p.id.toString),
        p.batchId,
        p.batchDuration,
        p.numInputRows,
        p.durationMs.asScala.map { case (k, v) => k -> v.longValue }.toMap))
  }
}

/** Fixed-cost adjudication harness for the bounded-drain q_stream_*
  * queries (VERDICT r13 ask #4): runs each named query exactly as the
  * bench does (construct → count) and splits its wall into
  *
  *   - engine batch time (Σ batchDuration over its micro-batches, with
  *     the per-batch durationMs breakdown: addBatch = plan+execute,
  *     triggerExecution, walCommit/commitOffsets = checkpoint I/O, …),
  *   - harness setup/teardown (wall − Σ batchDuration): session clone,
  *     schema-inference read, query start/plan, processAllAvailable
  *     polling slack, stop, memory-table read.
  *
  * Knobs: DRAIN_QUERIES (comma list), SPARK_GRAFT_SF_DIR, DRAIN_OUT.
  * Emits one JSON line per query plus a summary; numbers go to SCALE.md.
  */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    System.setProperty(
      "spark.sql.streaming.streamingQueryListeners",
      classOf[DrainProfileListener].getName)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("DRAIN_OUT", "/tmp/drain_profile.json")
    val names = sys.env
      .getOrElse(
        "DRAIN_QUERIES",
        "q_stream_outer_join,q_stream_join,q_stream_session_window," +
          "q_stream_dedup,q_stream_windowed_counts")
      .split(",").toSeq
    val spark = graft.Sessions.local("drain-profile", "32")
    spark.sparkContext.setLogLevel("WARN")
    // bench-parity warmup
    try graft.SparkEntry.entry(spark).count()
    catch { case _: Throwable => () }

    val lines = names.map { name =>
      DrainProfileListener.records.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000L
      import scala.jdk.CollectionConverters._
      val recs = DrainProfileListener.records.asScala.toVector
      val batchMs = recs.map(_.batchDurationMs).sum
      val keys = recs.flatMap(_.durations.keys).distinct.sorted
      val durSums = keys
        .map(k => s""""$k":${recs.map(_.durations.getOrElse(k, 0L)).sum}""")
        .mkString(",")
      val line =
        s"""{"query":"$name","rows":$n,"wall_ms":$wallMs,""" +
          s""""n_batches":${recs.size},"batch_ms_total":$batchMs,""" +
          s""""harness_ms":${wallMs - batchMs},"durations_ms":{$durSums}}"""
      println(line)
      line
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(out),
      lines.mkString("[", ",\n", "]"))
    spark.stop()
  }
}
