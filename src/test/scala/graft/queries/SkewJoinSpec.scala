package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executable proof of the SCALE.md skew claim: a join whose shuffle
  * lands ~all rows on one key gets split by AQE's skew-join rule — the
  * final plan carries the `skew=true` marker and the straggler
  * partition is subdivided. Thresholds are lowered so the mechanism
  * triggers at test size; at 100 TB the defaults (256 MB / 5×median)
  * trigger on real stragglers. This is the runtime half of the skew
  * story — the static half (salting) is only needed when a single KEY
  * exceeds what one task should own even after AQE splits, because AQE
  * can split a partition but never a key-group that must aggregate
  * together.
  */
class SkewJoinSpec extends AnyFunSuite {

  test("AQE splits the skewed shuffle partition (skew=true in the final plan)") {
    // isolated session (this suite lowers skew thresholds and disables
    // broadcast): stop any shared session first so getOrCreate cannot
    // hand back one with foreign confs, and stop ours at the end —
    // suites run sequentially in the forked test JVM
    SparkSession.getDefaultSession.foreach(_.stop())
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("skew-audit")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      // scale the skew detector down to test size: a partition is skewed
      // when > 1 KB and > 1× the median, and splits aim at ~4 KB chunks
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      // 50k rows on ONE key + a thin uniform tail: the classic hot-key
      // fact; the dimension side stays small but is forced off the
      // broadcast path so the skewed exchange actually exists
      val fact = spark.range(50000).select(lit(7L).as("k"), col("id").as("payload"), lit("x").as("pad"))
        .unionByName(spark.range(100).select((col("id") % 4).as("k"), col("id").as("payload"), lit("x").as("pad")))
      val dim = Seq((7L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("k", "name")
      val joined = fact.join(dim, Seq("k"))
      // execute THIS dataframe (count() would execute a different plan
      // and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length === 50100)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"AQE must mark the join skew-handled, got:\n${plan.take(2000)}")
    } finally spark.stop()
  }
}
