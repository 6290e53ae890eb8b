package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Executable proof of the SCALE.md bucketing claim: two fact tables
  * bucketed by their join key join WITHOUT a shuffle — the exchange that
  * dominates a 100 TB fact-fact join disappears when the layout already
  * co-locates the keys. The negative control (same join on unbucketed
  * parquet) must shuffle both sides, so the assertion pair pins the
  * mechanism, not an optimizer coincidence.
  */
class BucketedJoinSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  test("fact-fact join on bucketed layout runs shuffle-free; unbucketed control shuffles") {
    // isolated session, stopped at the end: this suite DISABLES
    // broadcast joins, and getOrCreate-applied confs leak into the
    // shared session other suites' plan asserts depend on (suites run
    // sequentially in the forked test JVM, so stop/create is safe —
    // same pattern as ExtensionsSpec)
    SparkSession.getDefaultSession.foreach(_.stop())
    val wh = java.nio.file.Files.createTempDirectory("graft_warehouse").toString
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.warehouse.dir", wh)
      // force the sort-merge path: broadcast would hide the exchange
      // question entirely at this test size
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      runScenario(spark)
    } finally spark.stop()
  }

  private def runScenario(spark: SparkSession): Unit = {
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_totalprice")

    // negative control: plain parquet join must exchange BOTH sides
    val control = lineitem.join(orders, lineitem("l_orderkey") === orders("o_orderkey"))
    control.collect()
    val controlPlan = control.queryExecution.executedPlan.toString
    assert(controlPlan.contains("Exchange hashpartitioning"),
      "unbucketed fact-fact join is expected to shuffle — control failed, test invalid")

    // bucketed layout: both sides clustered into the same bucket count
    // on the join key at WRITE time (the one-time cost a pipeline pays
    // so every later join/aggregation on that key is exchange-free)
    lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("lineitem_b")
    orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("orders_b")
    val li = spark.table("lineitem_b")
    val ob = spark.table("orders_b")
    val bucketed = li.join(ob, li("l_orderkey") === ob("o_orderkey"))
    val rows = bucketed.collect()
    val bucketedPlan = bucketed.queryExecution.executedPlan.toString
    assert(!bucketedPlan.contains("Exchange hashpartitioning"),
      s"bucketed join must be exchange-free, got:\n${bucketedPlan.take(2000)}")
    assert(rows.length === control.count(), "bucketed and control joins must agree")
  }
}
