package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The count(DISTINCT) → bitmap optimizer rule, exercised through the
  * REAL deployment path (`spark.sql.extensions=GraftExtensions` →
  * `injectOptimizerRule`). The injected rule runs in the operator-
  * optimization batch — BEFORE Spark's RewriteDistinctAggregates — so
  * it sees `isDistinct` aggregates even in the mixed-aggregate case
  * that natively plans the 2×-row Expand. (`experimental.
  * extraOptimizations` would run AFTER that batch and miss them; that
  * is why the rule ships as an extension, and why this spec builds its
  * own context.)
  */
class BitmapRewriteSpec extends AnyFunSuite {

  test("injected rewrite: exact answers, Expand eliminated, guards hold") {
    SparkSession.getDefaultSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession
      .builder()
      .master("local[4]")
      .appName("bitmap-rewrite-spec")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      import spark.implicits._
      val rnd = new scala.util.Random(11)
      val rows = (1 to 4000).map { _ =>
        (rnd.nextInt(5).toString, rnd.nextInt(300).toLong, rnd.nextInt(40), s"s${rnd.nextInt(7)}")
      }
      rows.toDF("grp", "uid", "small", "name").createOrReplaceTempView("rw_facts")

      def withRule[A](on: Boolean)(f: => A): A = {
        spark.conf.set(RewriteCountDistinctToBitmap.ConfKey, on.toString)
        try f
        finally spark.conf.unset(RewriteCountDistinctToBitmap.ConfKey)
      }

      // mixed distinct + plain aggregates: natively an Expand plan
      val q =
        """SELECT grp, count(DISTINCT uid) AS n_uid, count(DISTINCT small) AS n_small,
                  count(*) AS n
           FROM rw_facts GROUP BY grp"""
      val native = withRule(false)(spark.sql(q).collect().map(_.toSeq).toSet)
      val nativePlan = withRule(false)(spark.sql(q).queryExecution.executedPlan.toString)
      assert(nativePlan.contains("Expand"), "fixture must be the shape the rewrite improves")
      withRule(true) {
        val df = spark.sql(q)
        val p = df.queryExecution.executedPlan.toString
        assert(p.contains("bitmap_distinct"), p.take(2000))
        assert(!p.contains("Expand"), p.take(2000))
        assert(df.collect().map(_.toSeq).toSet == native)
      }

      // global (ungrouped) distinct
      val g = "SELECT count(DISTINCT uid) AS n FROM rw_facts"
      val gNative = withRule(false)(spark.sql(g).head().getLong(0))
      withRule(true) {
        val df = spark.sql(g)
        assert(df.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
        assert(df.head().getLong(0) == gNative)
      }

      // FILTER clause carries across
      val f =
        """SELECT grp,
                  count(DISTINCT uid) FILTER (WHERE small < 10) AS n_f,
                  count(DISTINCT uid) AS n_all
           FROM rw_facts GROUP BY grp"""
      val fNative = withRule(false)(spark.sql(f).collect().map(_.toSeq).toSet)
      withRule(true) {
        val df = spark.sql(f)
        assert(df.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
        assert(df.collect().map(_.toSeq).toSet == fNative)
      }

      // guards: non-integral child, windows, and the opt-in default
      withRule(true) {
        val pStr = spark
          .sql("SELECT grp, count(DISTINCT name) AS n FROM rw_facts GROUP BY grp")
          .queryExecution.executedPlan.toString
        assert(!pStr.contains("bitmap_distinct"), "non-integral child must not rewrite")
        val win = spark.sql(
          """SELECT grp, uid, count(uid) OVER (PARTITION BY grp) AS w
             FROM rw_facts LIMIT 5""")
        assert(!win.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
        win.collect()
      }
      val offPlan = spark
        .sql("SELECT grp, count(DISTINCT uid) AS n FROM rw_facts GROUP BY grp")
        .queryExecution.executedPlan.toString
      assert(!offPlan.contains("bitmap_distinct"), "rule must be opt-in (default off)")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
