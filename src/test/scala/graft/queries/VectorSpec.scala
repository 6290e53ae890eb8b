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

  test("IVF-PQ: ADC ranking keeps a recall floor vs exact L2 top-k; full probe stays sane") {
    // IVF-PQ ranks by L2 ADC — compare against the exact L2 top-k (which
    // differs from the dot-product exact set unless vectors are unit)
    val vecs = graft.Tables
      .embeddings(spark, dir)
      .select("vec_id", "embedding")
      .collect()
      .map(r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[scala.collection.Seq[Float]]("embedding").toArray.map(_.toDouble))
      .toMap
    def l2(a: Array[Double], b: Array[Double]): Double =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val exactL2 = (for {
      q <- 0L until 8L
      (id, _) <- vecs.toSeq
        .filter(_._1 != q)
        .sortBy { case (id, v) => (l2(vecs(q), v), id) }
        .take(10)
    } yield (q, id)).toSet
    val result = VectorQueries.ivfPqAnn(spark, dir).collect()
    val got = result.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (got & exactL2).size.toDouble / exactL2.size
    // the harness corpus is near-orthogonal random vectors — PQ's WORST
    // case (4-bit codes can't separate uniformly-spread residuals, so
    // ADC ordering is noisy; clustered real-world embeddings fare far
    // better). The floor is therefore modest but still ~4× the
    // random-ranking baseline of k/n ≈ 0.05, which is the signal check.
    assert(recall >= 0.15, s"IVF-PQ recall@10 vs exact L2 regressed: $recall")
    // distances are non-negative and ranked ascending per query (same
    // collected result — no second end-to-end run)
    val rows = result
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rank"), r.getAs[Double]("adc")))
    assert(rows.forall(_._3 >= 0.0))
    rows.groupBy(_._1).values.foreach { g =>
      val sorted = g.sortBy(_._2).map(_._3)
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("annRecall agrees with independently computed set intersections") {
    val exact = pairs(VectorQueries.cosineTopK(spark, dir))
    val byMethod = Map(
      "lsh" -> pairs(VectorQueries.lshAnn(spark, dir)),
      "ivf" -> pairs(VectorQueries.ivfAnn(spark, dir)))
    val got = VectorQueries.annRecall(spark, dir).collect().map { r =>
      (r.getAs[String]("method"), r.getAs[Long]("query_id")) ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall_at_k"))
    }.toMap
    assert(got.size === 16) // 2 methods × 8 queries
    got.foreach { case ((method, q), (nHit, recall)) =>
      val want = (byMethod(method) & exact).count(_._1 == q)
      assert(nHit === want.toLong, s"$method query $q")
      assert(recall === nHit / 10.0)
    }
  }

  test("annSweep: recall and cost both monotone in the dial; default points match annRecall") {
    val rows = VectorQueries.annSweep(spark, dir).collect().map { r =>
      (r.getAs[String]("method"), r.getAs[Long]("param")) ->
        (r.getAs[Long]("n_candidates"), r.getAs[Long]("n_hit"), r.getAs[Double]("recall_at_k"))
    }.toMap
    assert(rows.size === 6)
    // turning the dial up buys recall AND costs candidates — both
    // monotone nondecreasing along each method's sweep (the property
    // that makes the table an operating-point menu at all)
    def sweep(method: String, params: Seq[Long]) = {
      val pts = params.map(rows(method, _))
      assert(pts.map(_._1) == pts.map(_._1).sorted, s"$method candidates not monotone: $pts")
      assert(pts.map(_._2) == pts.map(_._2).sorted, s"$method hits not monotone: $pts")
    }
    sweep("lsh", Seq(2L, 4L, 8L))
    sweep("ivf", Seq(2L, 6L, 12L))
    // the sweep's default operating points must agree with the annRecall
    // harness aggregated over queries (same components, same ground truth)
    val agg = VectorQueries.annRecall(spark, dir).collect()
      .groupBy(_.getAs[String]("method"))
      .view.mapValues(_.map(_.getAs[Long]("n_hit")).sum).toMap
    assert(rows(("lsh", 4L))._2 === agg("lsh"))
    assert(rows(("ivf", 6L))._2 === agg("ivf"))
    // recall_at_k is n_hit / (nQueries * k) exactly
    rows.foreach { case ((m, p), (_, hit, rec)) =>
      assert(rec === hit / 80.0, s"$m param=$p")
    }
    spark.catalog.clearCache()
  }

  test("pq codes: deterministic, 32-bit-bounded, and better than the zero codebook") {
    import org.apache.spark.sql.functions._
    val a = VectorQueries.pqCodes(spark, dir).collect().sortBy(_.getLong(0))
    val b = VectorQueries.pqCodes(spark, dir).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "encoding must be deterministic")
    // 8 subspaces × 4-bit codes pack into the low 32 bits
    assert(a.forall(r => { val c = r.getAs[Long]("pq_code"); c >= 0L && c <= 0xFFFFFFFFL }))
    // quantisation must beat the trivial all-zeros reconstruction: mean
    // PQ residual below the mean squared norm of the vectors themselves
    val meanErr = a.map(_.getAs[Double]("err")).sum / a.length
    val meanNorm = graft.Tables
      .embeddings(spark, dir)
      .select(aggregate(
        transform(col("embedding"), x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("n2"))
      .agg(avg(col("n2")))
      .head()
      .getDouble(0)
    assert(meanErr < meanNorm,
      s"PQ reconstruction ($meanErr) must beat the zero codebook ($meanNorm)")
    // codes spread across the codebook: at least half the 16 centroids
    // of subspace 0 are used on the harness corpus
    val used = a.map(r => (r.getAs[Long]("pq_code") & 0xFL).toInt).distinct.length
    assert(used >= 8, s"subspace-0 codebook collapse: only $used centroids used")
  }

  test("pq codes: encoding is a pure map — zero shuffles in the plan") {
    val df = VectorQueries.pqCodes(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PQ encode must not shuffle\n${p.take(2000)}")
  }

  test("cluster assign: pure map plan; assignment consistent with the IVF cells") {
    val df = VectorQueries.clusterAssign(spark, dir)
    val rows = df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"cluster assignment must not shuffle\n${p.take(2000)}")
    assert(rows.length.toLong === graft.Tables.embeddings(spark, dir).count())
    assert(rows.forall(r => r.getAs[Double]("dist2") >= 0.0))
    val used = rows.map(_.getAs[Long]("cluster")).distinct.length
    assert(used >= 8, s"centroid collapse: only $used of 16 clusters used")
  }

  test("semdedup: verdict covers the corpus; drops have lower-id witnesses in-cell") {
    val rows = VectorQueries.semDedup(spark, dir).collect()
    assert(rows.length.toLong === graft.Tables.embeddings(spark, dir).count())
    val byId = rows.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val dropped = rows.filter(!_.getAs[Boolean]("keep"))
    // the drop rule is greedy-by-id: the LOWEST id in any cell is always kept
    val cells = rows.groupBy(_.getAs[Long]("cluster"))
    for ((_, members) <- cells) {
      val lowest = members.map(_.getAs[Long]("vec_id")).min
      assert(byId(lowest).getAs[Boolean]("keep"), s"lowest id $lowest must be kept")
    }
    // every dropped vector carries its witness similarity; kept ones carry null
    for (r <- dropped) assert(!r.isNullAt(r.fieldIndex("nn_sim")))
    for (r <- rows if r.getAs[Boolean]("keep")) assert(r.isNullAt(r.fieldIndex("nn_sim")))
  }

  test("distributed Lloyd k-means: partition of the corpus, deterministic rerun, " +
    "tighter than the 1-round clustering") {
    val rows = VectorQueries.kmeansTrain(spark, dir).collect()
    assert(rows.length === VectorQueries.KmK)
    val total = rows.map(_.getAs[Long]("n_assigned")).sum
    val nVec = graft.Tables.embeddings(spark, dir).count()
    assert(total === nVec, "every vector must land in exactly one cluster")
    rows.foreach(r => assert(r.getAs[Long]("n_assigned") > 0))
    val again = VectorQueries.kmeansTrain(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("embedding drift: per-dim means match a driver-side quantized model") {
    val rows = VectorQueries.embeddingDrift(spark, dir).collect()
    val vecs = graft.Tables
      .embeddings(spark, dir)
      .select("embedding", "label")
      .collect()
      .map(r => (r.getSeq[Float](0).toArray, r.getInt(1)))
    val dims = vecs.head._1.length
    assert(rows.length == dims)
    for (r <- rows) {
      val d = r.getAs[Long]("dim").toInt - 1
      def mean(p: ((Array[Float], Int)) => Boolean): Double = {
        val sel = vecs.filter(p)
        sel.map(v => math.floor(v._1(d).toDouble * 1e6).toLong).sum.toDouble /
          sel.length.toDouble / 1e6
      }
      val mr = mean(_._2 < 5)
      val mc = mean(_._2 >= 5)
      assert(math.abs(r.getAs[Double]("mean_ref") - mr) < 1e-6, r.toString)
      assert(math.abs(r.getAs[Double]("mean_cur") - mc) < 1e-6, r.toString)
      assert(math.abs(r.getAs[Double]("shift") - (mc - mr)) < 2e-6, r.toString)
    }
  }

  test("sampled embedding dedup is a ~1/9 vertex-sample subset of the exact kernel") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(VectorQueries.dedupEmbedding(spark, dir))
    val sampled = pairs(VectorQueries.dedupEmbeddingSampled(spark, dir))
    // same pipeline over 1-in-3 sampled sides: a subset with identical
    // per-pair sims, roughly 1/9 of the volume
    assert(sampled.subsetOf(full), s"extra: ${(sampled -- full).take(5)}")
    assert(full.nonEmpty && sampled.nonEmpty)
    val frac = sampled.size.toDouble / full.size
    assert(frac > 0.01 && frac < 0.4,
      s"sample fraction $frac (${sampled.size}/${full.size}) far from 1/9")
  }
}
