package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** ANN quality lock: both approximate paths must keep a minimum
  * recall@10 against the exact brute-force ranking. The harness corpus
  * is near-orthogonal synthetic noise — the hardest case for locality
  * structures (no clusters to exploit), so these floors are
  * conservative; clustered real-world embeddings sit well above them.
  */
class VectorSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val dir = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("approximate ANN paths keep recall@10 floors vs exact top-k") {
    val exact = pairs(VectorQueries.cosineTopK(spark, dir))
    assert(exact.size === 80) // 8 queries × k=10

    val ivf = pairs(VectorQueries.ivfAnn(spark, dir))
    val ivfRecall = (ivf & exact).size.toDouble / exact.size
    assert(ivfRecall >= 0.6, s"IVF recall@10 regressed: $ivfRecall")

    val lsh = pairs(VectorQueries.lshAnn(spark, dir))
    val lshRecall = (lsh & exact).size.toDouble / exact.size
    assert(lshRecall >= 0.3, s"LSH recall@10 regressed: $lshRecall")

    // probing every list must be exhaustive-equivalent: the IVF
    // candidate set then covers the corpus, so recall is exactly 1
    val allProbe = pairs(VectorQueries.ivfAnn(spark, dir, nProbe = 16))
    assert(allProbe === exact, "nProbe = nLists must reproduce the exact ranking")
  }
}
