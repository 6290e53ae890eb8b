package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** N-step funnel primitive: ordering semantics, degenerate shapes, and
  * the adding-steps-adds-no-shuffles plan property. The fixed 3-step
  * instance stays cross-engine-checked by the q_funnel_steps oracle.
  */
class FunnelSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("funnel-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("counts are monotone non-increasing along the funnel") {
    val rows = RelationalQueries
      .funnelSteps(spark, dir)
      .orderBy("step")
      .collect()
      .map(_.getAs[Long]("n_users"))
    assert(rows.length === 3)
    assert(rows.sliding(2).forall { case Array(a, b) => b <= a })
  }

  test("single-step funnel counts distinct users matching the predicate") {
    val got = RelationalQueries
      .funnel(spark, dir, Seq("any_view" -> (col("event_type") === "view")))
      .collect()
    assert(got.length === 1)
    val expected = graft.Tables
      .events(spark, dir)
      .filter(col("event_type") === "view")
      .select("user_id")
      .distinct()
      .count()
    assert(got.head.getAs[Long]("n_users") === expected)
    assert(got.head.getAs[Double]("conversion") === 1.0)
  }

  test("an unreachable step zeroes the tail but not the head") {
    val rows = RelationalQueries
      .funnel(
        spark,
        dir,
        Seq(
          "view" -> (col("event_type") === "view"),
          "never" -> lit(false),
          "click" -> (col("event_type") === "click")))
      .orderBy("step")
      .collect()
    assert(rows(0).getAs[Long]("n_users") > 0)
    assert(rows(1).getAs[Long]("n_users") === 0L)
    assert(rows(2).getAs[Long]("n_users") === 0L)
  }

  test("adding steps adds expressions, not shuffles: 5-step plan has the same 2 exchanges") {
    def exchanges(n: Int): Int = {
      val steps = (1 to n).map(i => s"s$i" -> (col("event_type").isNotNull && col("value") > lit(i / 10.0)))
      val df = RelationalQueries.funnel(spark, dir, steps)
      df.collect()
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val e2 = exchanges(2)
    val e5 = exchanges(5)
    assert(e5 === e2, s"5-step funnel must not shuffle more than 2-step ($e5 vs $e2)")
  }
}
