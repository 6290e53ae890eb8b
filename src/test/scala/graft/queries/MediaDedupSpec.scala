package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash media dedup: hash locality, pigeonhole recall, and
  * the near-dup fixture shape. Cross-engine values are checked by the
  * DuckDB oracle (q_media_dedup); these lock the algorithmic
  * guarantees locally.
  */
class MediaDedupSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("media-dedup-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def hashes: Map[Long, Long] = {
    import org.apache.spark.sql.functions._
    val hUdf = udf { (docId: Long, media: Array[Byte]) =>
      MultimodalQueries.dhash56(docId, media)
    }
    MultimodalQueries
      .mediaTable(spark, dir)
      .select(col("doc_id"), hUdf(col("doc_id"), col("media")).as("h"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("dhash56 is 56-bit and a single-byte perturbation moves it by at most 4 bits") {
    val h = hashes
    h.values.foreach(v => assert(v >= 0L && v < (1L << 56)))
    // payload-identical docs (doc_id ≡ mod 256) differ only in the
    // re-encode perturbation, which touches one byte → one 2×2 block →
    // at most 2 gradient comparisons per variant → Hamming ≤ 4
    val payloadTwins = h.keys.filter(d => h.contains(d + 256)).toSeq
    assert(payloadTwins.nonEmpty, "fixture must contain payload-identical doc pairs")
    payloadTwins.foreach { d =>
      val dist = java.lang.Long.bitCount(h(d) ^ h(d + 256))
      assert(dist <= 4, s"docs $d/${d + 256}: re-encode variant moved $dist bits")
    }
  }

  test("pigeonhole join finds EVERY pair within Hamming 3 (exact recall)") {
    val h = hashes
    val ids = h.keys.toSeq.sorted
    val expected = (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.size
      a = ids(i); b = ids(j)
      if java.lang.Long.bitCount(h(a) ^ h(b)) <= 3
    } yield (a, b)).toSet
    val got = DedupQueries
      .mediaDedup(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    spark.catalog.clearCache()
    assert(got === expected, s"missing: ${(expected -- got).take(5)}; extra: ${(got -- expected).take(5)}")
    assert(expected.nonEmpty, "fixture must produce near-dup pairs")
  }

  test("sampled pair contract is a ~1/8 subset of the full pair list") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = pairs(DedupQueries.mediaDedup(spark, dir))
    val sampled = pairs(DedupQueries.mediaDedupSampled(spark, dir))
    spark.catalog.clearCache()
    // subset with IDENTICAL per-pair values (same pipeline, one extra
    // pure-arithmetic predicate), and roughly 1/K of the volume — the
    // LCG must not systematically align with the fixture's id strides
    assert(sampled.subsetOf(full), s"extra: ${(sampled -- full).take(5)}")
    assert(full.nonEmpty && sampled.nonEmpty)
    val frac = sampled.size.toDouble / full.size
    assert(frac > 0.02 && frac < 0.4,
      s"sample fraction $frac (${sampled.size}/${full.size}) far from 1/8")
  }
}
