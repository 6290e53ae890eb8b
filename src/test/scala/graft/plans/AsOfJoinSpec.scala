package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics lock for the custom whole-operator as-of join
  * ([[AsOfJoinNode]]/[[AsOfJoinExec]]): inclusive timestamp match,
  * last-match-wins, left rows without a match null-extended, null keys
  * never matching, and candidate state cleared across key transitions —
  * each on a fixture small enough to hand-verify, run through the real
  * planner (exchanges + sorts inserted by EnsureRequirements).
  */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def fixture = {
    import spark.implicits._
    val left = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "l1"),
      (1L, 20L, "l2"),
      (1L, 5L, "l3"),
      (2L, 10L, "l4"),
      (null, 10L, "l5"),
      (3L, 10L, "l6"),
      (1L, null, "l7"),
      (4L, 10L, "l8")).toDF("k", "ts", "lv")
    val right = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 5L, "a"),
      (1L, 10L, "b"),
      (1L, 15L, "c"),
      (2L, 50L, "d"),
      (null, 1L, "e"),
      (4L, null, "f")).toDF("rk", "rts", "rv")
    (left, right)
  }

  test("as-of semantics: inclusive ts, last match wins, no-match nulls, null keys/ts skip") {
    val (left, right) = fixture
    val out = AsOfJoin
      .join(left, right, Seq("k"), Seq("rk"), "ts", "rts")
      .collect()
      .map(r => (r.getAs[String]("lv"), r.getAs[String]("rv")))
      .toMap
    assert(out === Map(
      "l1" -> "b", // rts 10 == ts 10: inclusive, and later than rts 5
      "l2" -> "c", // last of {5, 10, 15} <= 20
      "l3" -> "a", // only rts 5 <= 5
      "l4" -> null, // right key 2 exists but rts 50 > 10
      "l5" -> null, // null key never matches (even though right has null key)
      "l6" -> null, // no right key 3
      "l7" -> null, // null left ts: `ts >= rts` is never true in SQL
      "l8" -> null)) // right key 4 exists but its rts is null
  }

  test("plans as the custom exec behind hash-clustered exchanges") {
    val (left, right) = fixture
    val df = AsOfJoin.join(left, right, Seq("k"), Seq("rk"), "ts", "rts")
    df.collect() // force AQE final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"))
  }

  test("rejects overlapping column names and mismatched key types") {
    import spark.implicits._
    val l = Seq((1L, 1L)).toDF("k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.join(l, Seq((1L, 1L)).toDF("k", "rts"), Seq("k"), Seq("k"), "ts", "rts")
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.join(
        l, Seq((1, 1L)).toDF("rk", "rts"), Seq("k"), Seq("rk"), "ts", "rts")
    }
  }

  test("matches the composed union+window variant on the events table") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val s = graft.Sessions.local("asof-parity", "4")
    val base = graft.queries.RelationalQueries.asofJoin(s, dir)
    val custom = graft.queries.RelationalQueries.asofJoinCustom(s, dir)
    val cols = base.columns.map(col).toSeq
    assert(custom.count() === base.count())
    assert(custom.select(cols: _*).exceptAll(base).count() === 0)
    assert(base.exceptAll(custom.select(cols: _*)).count() === 0)
  }
}
