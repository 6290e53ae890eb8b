package graft.queries

import graft.functions.MinK
import org.scalatest.funsuite.AnyFunSuite

/** Locks for the sketch operators ([[SketchQueries]]) and the bounded
  * [[MinK]] aggregator. The DuckDB hash oracle checks exact counter /
  * minimum parity; these tests pin the semantic invariants: the KMV buffer
  * is always the true bottom-k distinct set (property-checked against a
  * brute-force model), and the count-min estimate never underestimates.
  */
class SketchSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("sketch-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("MinK: reduce/merge always hold the bottom-k distinct set (vs brute force)") {
    val k = 8
    val agg = new MinK(k)
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 50) {
      val n = rnd.nextInt(40)
      val values = Array.fill(n)(rnd.nextInt(30).toLong) // dense → many dupes
      // random split into partial buffers, reduced then merged in order
      val parts = values.grouped(math.max(1, 1 + rnd.nextInt(7))).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val expect = values.distinct.sorted.take(k)
      assert(merged.toSeq == expect.toSeq, s"trial $trial")
      assert(merged.length <= k)
    }
  }

  test("MinK: buffers stay bounded at k during reduce") {
    val k = 4
    val agg = new MinK(k)
    var buf = agg.zero
    for (v <- 100L to 1L by -1L) {
      buf = agg.reduce(buf, v)
      assert(buf.length <= k)
      assert(buf.toSeq == buf.toSeq.sorted)
    }
    assert(buf.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("kmv set algebra: union bounds, inclusion-exclusion sanity, exact legs consistent") {
    val rows = SketchQueries.kmvSetOps(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exU = r.getAs[Long]("n_exact_union")
      val exI = r.getAs[Long]("n_exact_inter")
      val estU = r.getAs[Double]("est_union")
      val estI = r.getAs[Double]("est_inter")
      assert(exI >= 0 && exI <= exU)
      assert(estU > 0.0 && estI >= 0.0)
      // bottom-k union estimate lands within 3x of exact (same bound the
      // per-source estimator test uses)
      assert(estU <= 3.0 * exU && estU >= exU / 3.0, s"estU=$estU exU=$exU")
      val jacc = r.getAs[Double]("jacc_exact")
      assert(jacc >= 0.0 && jacc <= 1.0)
    }
    spark.catalog.clearCache()
  }

  test("kmv_distinct: estimator engages and lands within 3x of exact") {
    val rows = SketchQueries.kmvDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_distinct")
      assert(est > 0.0)
      if (r.isNullAt(r.fieldIndex("kth_hash"))) {
        // fewer than k distinct values → exact passthrough
        assert(est == exact.toDouble)
      } else {
        // a k=16 KMV estimate is loose but must be the right order of magnitude
        assert(est > exact / 3.0 && est < exact * 3.0, s"source=${r.getString(0)}")
      }
    }
  }

  test("hll_distinct: registers engage and the estimate lands within 2x of exact") {
    val rows = SketchQueries.hllDistinct(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_distinct")
      val zeros = r.getAs[Long]("n_zero_registers")
      assert(zeros >= 0 && zeros <= 64)
      assert(est > 0.0)
      // m=64 HLL has ~13% relative error at 1 sigma; 2x is a loose
      // deterministic envelope for the fixture sources (hundreds of
      // distinct tokens each)
      assert(est > exact / 2.0 && est < exact * 2.0, s"source=${r.getString(0)}: est=$est exact=$exact")
    }
  }

  test("quantile_sketch: estimate brackets the discrete quantile within one bin") {
    val rows = SketchQueries.quantileSketch(spark, dir).collect()
    assert(rows.length >= 3) // >=1 event type x 3 quantiles
    val ev = graft.Tables.events(spark, dir)
    val mm = ev
      .agg(
        org.apache.spark.sql.functions.min("value"),
        org.apache.spark.sql.functions.max("value"))
      .head()
    val wBin = (mm.getDouble(1) - mm.getDouble(0)) / SketchQueries.QuantileBins
    // the sketch's contract is against the DISCRETE quantile (the
    // ceil(q*n)-th order statistic — the first value whose rank reaches
    // q*n, matching the cum >= q*total read-off); the interpolated
    // `percentile` in the output can legitimately sit several bins lower
    // when the tail is sparse (one position of interpolation can cross
    // empty bins), so the model here sorts the real values
    val byType = ev
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .groupBy(_._1)
      .view
      .mapValues(_.map(_._2).sorted)
      .toMap
    for (r <- rows) {
      val est = r.getAs[Double]("est_value")
      val vs = byType(r.getAs[String]("event_type"))
      val q = r.getAs[Double]("q")
      val disc = vs(math.ceil(q * vs.length).toInt - 1)
      // est is the upper edge of the bin holding the disc quantile
      assert(est >= disc - 1e-9, s"$r: upper edge below the disc quantile $disc")
      assert(est - disc <= wBin + 1e-9, s"$r: more than one bin above $disc (w=$wBin)")
    }
  }

  test("heavy_hitters: count-min never underestimates and top tokens are exact-descending") {
    val rows = SketchQueries
      .heavyHitters(spark, dir)
      .orderBy(org.apache.spark.sql.functions.col("exact_cnt").desc)
      .collect()
    assert(rows.length == 20)
    for (r <- rows)
      assert(r.getAs[Long]("est_cnt") >= r.getAs[Long]("exact_cnt"), r.toString)
    val exacts = rows.map(_.getAs[Long]("exact_cnt"))
    assert(exacts.zip(exacts.tail).forall { case (a, b) => a >= b })
  }
}
