package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics locks for the MinHash banding sweep: the S-curve direction
  * (more, shorter bands ⇒ more candidates) and exact agreement of the
  * sweep's default operating point with the headline q_minhash_pairs
  * operator — the cross-operator identity a hash-match alone would not
  * surface if one side's banding drifted.
  */
class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("dedup sweep: candidates monotone in band count; 8x16 point equals minhashPairs") {
    val rows = DedupQueries.dedupSweep(spark, sf).collect().map { r =>
      r.getAs[Long]("bands") ->
        (r.getAs[Long]("rows_per_band"), r.getAs[Long]("n_candidates"),
          r.getAs[Long]("n_verified"), r.getAs[Double]("pass_rate"))
    }.toMap
    assert(rows.keySet === Set(4L, 8L, 16L))
    rows.foreach { case (b, (rpb, _, _, _)) => assert(rpb === 128L / b) }
    // NOTE pure band nesting (a 2r-row collision implies both r-row
    // half-collisions) would make candidates monotone in band count, but
    // the mega-bucket cap breaks that cleanly-provable direction on
    // dup-heavy corpora (measured at sf0.01: 4 bands → 3151 candidates,
    // 8 → 2941, 16 → 10348 — the 8-band config caps more clique buckets).
    // Assert only the cap-robust properties: the weakest banding finds
    // the most candidates, and sharper bands never pass a SMALLER
    // fraction of their candidates.
    assert(rows(16L)._2 >= rows(8L)._2 && rows(16L)._2 >= rows(4L)._2,
      s"16x8 must be the widest net: $rows")
    assert(rows(4L)._4 >= rows(16L)._4,
      s"32-row bands must be at least as precise as 8-row bands: $rows")
    // verified pairs are a subset of candidates, pass_rate is their ratio
    rows.foreach { case (b, (_, cand, ver, rate)) =>
      assert(ver <= cand, s"bands=$b")
      if (cand > 0) assert(math.abs(rate - ver.toDouble / cand) < 1e-6)
    }
    // the sweep's 8x16 verified count IS the headline operator's output
    // size — same signatures, same banding, same threshold
    val headline = DedupQueries.minhashPairs(spark, sf).count()
    assert(rows(8L)._3 === headline,
      "sweep(bands=8).n_verified must equal q_minhash_pairs row count")
    spark.catalog.clearCache()
  }
}
