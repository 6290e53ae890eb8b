package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Locks for the mergeable exact-distinct bitmap family
  * ([[PagedBitmap]] + the three TypedImperativeAggregates). The DuckDB
  * oracle (q_bitmap_distinct) checks end-to-end count parity; these
  * tests pin the bitmap algebra itself (randomized against a Set model),
  * the serialization contract, and the physical plan tier
  * (ObjectHashAggregate with map-side partial, no Expand).
  */
class BitmapAggSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("bitmap-agg-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    BitmapAgg.register(s)
    s
  }

  test("PagedBitmap: add/contains/cardinality vs Set model, incl. negatives + page edges") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 30) {
      val bm = new PagedBitmap
      val model = scala.collection.mutable.Set.empty[Long]
      val edge = Seq(0L, -1L, 4095L, 4096L, -4096L, -4097L, Long.MaxValue, Long.MinValue)
      val vals = Array.fill(200)(rnd.nextLong() % 100000L) ++ edge
      vals.foreach { v => bm.add(v); model += v }
      assert(bm.cardinality == model.size, s"trial $trial")
      assert(vals.forall(bm.contains))
      assert(!bm.contains(999999999L))
    }
  }

  test("PagedBitmap: or() is set union; serde round-trips byte-identically") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 20) {
      val (a, b) = (new PagedBitmap, new PagedBitmap)
      val (ma, mb) = (Set.newBuilder[Long], Set.newBuilder[Long])
      Array.fill(100)(rnd.nextLong() % 50000L).foreach { v => a.add(v); ma += v }
      Array.fill(100)(rnd.nextLong() % 50000L).foreach { v => b.add(v); mb += v }
      a.or(b)
      assert(a.cardinality == (ma.result() ++ mb.result()).size, s"trial $trial")
      val rt = PagedBitmap.fromBytes(a.toBytes)
      assert(rt.cardinality == a.cardinality)
      // page-sorted serialization: equal sets serialize equal bytes
      assert(java.util.Arrays.equals(rt.toBytes, a.toBytes))
    }
  }

  test("bitmap_distinct == count(DISTINCT); build+merge_count == distinct across groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val rows = (1 to 5000).map { _ =>
      (rnd.nextInt(4).toString, rnd.nextInt(30), rnd.nextInt(700).toLong - 350L)
    }
    val df = rows.toDF("grp", "day", "id")
    df.createOrReplaceTempView("bm_facts")
    val got = spark
      .sql("""SELECT grp, bitmap_distinct(id) AS n FROM bm_facts GROUP BY grp""")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val rolled = spark
      .sql("""SELECT grp, bitmap_merge_count(bm) AS n FROM (
                SELECT grp, day, bitmap_build(id) AS bm FROM bm_facts GROUP BY grp, day
              ) GROUP BY grp""")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val expect = rows.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._3).distinct.size.toLong }
    assert(got == expect)
    assert(rolled == expect)
  }

  test("plan: ObjectHashAggregate tier with partial merge, no Expand") {
    val df = graft.queries.SketchQueries.bitmapDistinct(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Expand"), p.take(2000))
    // both legs present: direct bitmap_distinct and the build→merge rollup
    assert(p.contains("bitmap_distinct"), p.take(2000))
    assert(p.contains("bitmap_merge_count"), p.take(2000))
    // exactness end-to-end on real data
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") == r.getAs[Long]("n_users_rollup"))
    }
  }

  test("wrong arity raises a proper error, null ids are ignored") {
    import spark.implicits._
    val e = intercept[Exception](spark.sql("SELECT bitmap_distinct(1, 2)").collect())
    assert(e.getMessage.contains("exactly 1 argument"))
    val withNulls = Seq(Some(1L), None, Some(2L), Some(1L), None)
      .toDF("id")
      .selectExpr("bitmap_distinct(id) AS n")
      .collect()
    assert(withNulls.head.getLong(0) == 2L)
  }
}
