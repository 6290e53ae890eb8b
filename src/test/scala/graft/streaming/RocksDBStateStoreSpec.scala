package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** The RocksDB state-store opt-in (Sessions.stateStoreConfigure /
  * `graft.stateStore = rocksdb`): the provider must actually engage —
  * asserted via the rocksdb* custom metrics only that provider reports
  * — and stateful results must be identical to the default HDFS-backed
  * store. See SCALE.md §Streaming for the state-size envelope.
  */
class RocksDBStateStoreSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("rocksdb-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("opting in engages the RocksDB provider on a stateful query") {
    val s = spark.newSession()
    s.conf.set(graft.Sessions.StateStoreKey, "rocksdb")
    graft.Sessions.stateStoreConfigure(s)
    assert(
      s.conf.get("spark.sql.streaming.stateStore.providerClass") ===
        graft.Sessions.RocksDBProvider)
    implicit val sq = s.sqlContext
    import s.implicits._
    val input = MemoryStream[Int]
    input.addData(1, 2, 2, 3, 3, 3)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_rocksdb_ckpt").toString
    val q = input
      .toDF()
      .dropDuplicates("value")
      .writeStream
      .format("memory")
      .queryName("rocksdb_probe")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      q.processAllAvailable()
      assert(s.table("rocksdb_probe").count() === 3)
      val stateMetrics = q.recentProgress.toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().asScala)
      assert(
        stateMetrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb metrics in state operators: ${stateMetrics.distinct}")
    } finally {
      try q.stop()
      finally org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(ckpt))
    }
  }

  test("default session keeps the built-in provider (opt-in, not default)") {
    val s = graft.Sessions.stateStoreConfigure(spark.newSession())
    assert(
      !s.conf
        .getOption("spark.sql.streaming.stateStore.providerClass")
        .contains(graft.Sessions.RocksDBProvider))
  }

  test("streamDedup result is identical under RocksDB (conf carried across the drain clone)") {
    val dir = "/root/testdata/sf0.001"
    val base = graft.queries.StreamingQueries
      .streamDedup(spark, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val s = spark.newSession()
    s.conf.set(graft.Sessions.StateStoreKey, "rocksdb")
    val rocks = graft.queries.StreamingQueries
      .streamDedup(s, dir)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(rocks === base)
  }
}
