package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Locks for the data-engineering operator batch: SCD2 interval build,
  * RFM segmentation, blocked fuzzy matching, one-pass profiling, the
  * data-quality gate, χ² association, readability scoring, incremental
  * aggregate merge, seasonality profile, and kNN label classification.
  * The DuckDB harness is the exactness gate; these specs lock the
  * structural invariants each operator promises.
  */
class DataOpsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("dataops-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("scd2_intervals: intervals tile each user's history, one open row per user") {
    val rows = RelationalQueries.scd2Intervals(spark, dir).collect()
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    for ((_, urows) <- byUser) {
      val sorted = urows.sortBy(_.getAs[Long]("version"))
      // versions are contiguous from 1
      assert(sorted.map(_.getAs[Long]("version")).toSeq == (1L to sorted.length).toSeq)
      // exactly one current (open) interval, and it is the last version
      val current = sorted.filter(_.getAs[Boolean]("is_current"))
      assert(current.length == 1 && (current.head eq sorted.last))
      // consecutive rows never repeat a state (CDC compression) and tile:
      // each interval's valid_to equals the next interval's valid_from
      // collected times are java.sql.Timestamp or java.time.LocalDateTime
      // depending on the parquet physical type — compare as values / µs
      def tsMicros(v: Any): Long = v match {
        case t: java.sql.Timestamp =>
          t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        case d: java.time.LocalDateTime =>
          val i = d.toInstant(java.time.ZoneOffset.UTC)
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        case l: Long => l
      }
      for (Array(a, b) <- sorted.sliding(2)) {
        assert(a.getAs[String]("state") != b.getAs[String]("state"))
        assert(a.getAs[Any]("valid_to") == b.getAs[Any]("valid_from"))
      }
      // closed intervals are strictly forward in time
      for (r <- sorted.dropRight(1))
        assert(tsMicros(r.getAs[Any]("valid_from")) <=
          tsMicros(r.getAs[Any]("valid_to")))
    }
  }

  test("rfm_segments: one row per ordering customer, scores in 1..4, labels consistent") {
    val rows = RelationalQueries.rfmSegments(spark, dir).collect()
    val nCust = graft.Tables
      .orders(spark, dir)
      .select(countDistinct(col("o_custkey")))
      .head()
      .getLong(0)
    assert(rows.length == nCust)
    for (r <- rows) {
      for (c <- Seq("r_score", "f_score", "m_score")) {
        val v = r.getAs[Long](c)
        assert(v >= 1 && v <= 4, s"$c=$v out of range")
      }
      assert(r.getAs[Long]("monetary_cents") > 0)
      assert(r.getAs[Long]("recency_days") >= 0)
      val seg = r.getAs[String]("segment")
      val (rs, fs) = (r.getAs[Long]("r_score"), r.getAs[Long]("f_score"))
      val expected =
        if (rs >= 3 && fs >= 3) "champion"
        else if (fs >= 3) "at_risk_loyal"
        else if (rs >= 3) "recent_light"
        else "hibernating"
      assert(seg == expected)
    }
    // quartile scoring: each score bucket holds between 10% and 40% of
    // customers (exact quartiles of a distribution with ties)
    val byR = rows.groupBy(_.getAs[Long]("r_score")).view.mapValues(_.length)
    assert(byR.values.sum == rows.length)
  }

  test("fuzzy_match: canonical blocked pairs; distances agree with a reference DP") {
    val rows = RelationalQueries.fuzzyMatch(spark, dir).collect()
    assert(rows.nonEmpty)
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val names = graft.Tables
      .customer(spark, dir)
      .select("c_custkey", "c_name", "c_nationkey")
      .collect()
      .map(r => r.getAs[Long]("c_custkey") ->
        (r.getAs[String]("c_name"), r.getAs[Int]("c_nationkey")))
      .toMap
    for (r <- rows) {
      val (a, b) = (r.getAs[Long]("cust_a"), r.getAs[Long]("cust_b"))
      assert(a < b, "pairs must be canonical")
      val ((na, blockA), (nb, blockB)) = (names(a), names(b))
      assert(blockA.toLong == r.getAs[Long]("block") && blockB == blockA,
        "pair crosses a blocking group")
      val d = lev(na, nb)
      assert(d == r.getAs[Long]("dist") && d <= 2)
    }
    // completeness within one block: every qualifying pair of block 0 is present
    val block0 = names.toSeq.filter(_._2._2 == 0).sortBy(_._1)
    val expect = (for {
      (ka, (na, _)) <- block0; (kb, (nb, _)) <- block0
      if ka < kb && lev(na, nb) <= 2
    } yield (ka, kb)).toSet
    val got = rows
      .filter(_.getAs[Long]("block") == 0L)
      .map(r => (r.getAs[Long]("cust_a"), r.getAs[Long]("cust_b")))
      .toSet
    assert(got == expect)
  }

  test("data_profile: one row per column, counts/nulls/bounds match the table") {
    val rows = RelationalQueries.dataProfile(spark, dir).collect()
    assert(rows.length == 11)
    val li = graft.Tables.lineitem(spark, dir)
    val n = li.count()
    for (r <- rows) {
      assert(r.getAs[Long]("n_rows") == n)
      assert(r.getAs[Long]("n_null") == 0L)
      assert(r.getAs[Long]("n_distinct") > 0)
    }
    val byCol = rows.map(r => r.getAs[String]("column_name") -> r).toMap
    assert(byCol("l_quantity").getAs[Double]("min_value") == 1.0)
    assert(byCol("l_quantity").getAs[Double]("max_value") == 50.0)
    assert(byCol("l_linenumber").getAs[Long]("n_distinct") ==
      li.select(countDistinct(col("l_linenumber"))).head().getLong(0))
    // string columns profile length; flags are single chars
    assert(byCol("l_returnflag").getAs[Double]("min_value") == 1.0)
  }

  test("quality_checks: clean rules report zero, fractions are consistent") {
    val rows = RelationalQueries.qualityChecks(spark, dir).collect()
    assert(rows.length == 7)
    val byName = rows.map(r => r.getAs[String]("check_name") -> r).toMap
    // referentially-intact and consistency-clean by construction
    for (clean <- Seq(
        "orders_fk_customer", "documents_n_chars_consistent",
        "lineitem_qty_in_1_50", "orders_status_known"))
      assert(byName(clean).getAs[Long]("n_violations") == 0L, clean)
    // the discount book runs to 0.1, so the 0.08 gate must fire
    assert(byName("lineitem_discount_le_008").getAs[Long]("n_violations") > 0)
    for (r <- rows) {
      val frac = r.getAs[Double]("violation_frac")
      val expect = r.getAs[Long]("n_violations").toDouble / r.getAs[Long]("n_checked")
      assert(math.abs(frac - expect) < 1e-6)
      assert(r.getAs[Long]("n_checked") > 0)
    }
  }

  test("chi2_assoc: expected margins reproduce observed margins; stats well-formed") {
    val rows = TextQueries.chi2Assoc(spark, dir).collect()
    assert(rows.nonEmpty)
    val chi2 = rows.head.getAs[Double]("chi2")
    val v = rows.head.getAs[Double]("cramers_v")
    assert(rows.forall(r => r.getAs[Double]("chi2") == chi2), "chi2 must be constant")
    assert(chi2 >= 0.0 && v >= 0.0 && v <= 1.0)
    val nDocs = graft.Tables.documents(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nDocs)
    // expected cell masses reproduce each language's observed margin
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    for ((_, cells) <- byLang) {
      val obsTot = cells.map(_.getAs[Long]("n_obs")).sum.toDouble
      val expTot = cells.map(_.getAs[Double]("expected")).sum
      assert(math.abs(obsTot - expTot) < 1e-3)
    }
    val dof = rows.head.getAs[Long]("dof")
    val nl = rows.map(_.getAs[String]("lang")).distinct.length
    val ns = rows.map(_.getAs[String]("source")).distinct.length
    // the FULL lattice is emitted — zero-observation cells carry their
    // expected mass into χ² rather than being silently dropped
    assert(rows.length == nl * ns)
    assert(dof == (nl - 1).toLong * (ns - 1))
  }

  test("readability: formulas recompute from the raw counts") {
    val rows = TextQueries.readability(spark, dir).collect()
    assert(rows.length == graft.Tables.documents(spark, dir).count())
    for (r <- rows) {
      val w = r.getAs[Long]("n_words").toDouble
      val sn = r.getAs[Long]("n_sentences").toDouble
      val sy = r.getAs[Long]("n_syllables").toDouble
      assert(w >= 1 && sn >= 1)
      val ease = 206.835 - 1.015 * (w / sn) - 84.6 * (sy / w)
      val grade = 0.39 * (w / sn) + 11.8 * (sy / w) - 15.59
      assert(math.abs(r.getAs[Double]("flesch_ease") - ease) < 1e-3)
      assert(math.abs(r.getAs[Double]("fk_grade") - grade) < 1e-3)
    }
  }

  test("incremental_agg: merged base+delta states equal a direct full aggregate") {
    val merged = SignalQueries.incrementalAgg(spark, dir).collect()
    // direct recompute: same pipeline with a split that makes base empty,
    // so the "merge" degenerates to the delta-only aggregate
    val direct = SignalQueries.incrementalAgg(spark, dir, splitDay = "1970-01-01").collect()
    val key = (r: org.apache.spark.sql.Row) => r.getAs[String]("event_type")
    val m = merged.map(r => key(r) -> r).toMap
    assert(merged.length == direct.length && merged.nonEmpty)
    for (d <- direct) {
      val r = m(key(d))
      for (c <- Seq("n_events"))
        assert(r.getAs[Long](c) == d.getAs[Long](c))
      for (c <- Seq("mean_value", "var_value", "min_value", "max_value"))
        assert(r.getAs[Double](c) == d.getAs[Double](c), s"$c differs")
    }
    // variance is positive and sane for real-valued event amounts
    assert(merged.forall(_.getAs[Double]("var_value") > 0))
  }

  test("seasonal_profile: shares sum to 1 per type and lift is share*24") {
    val rows = SignalQueries.seasonalProfile(spark, dir).collect()
    assert(rows.nonEmpty)
    for ((_, cells) <- rows.groupBy(_.getAs[String]("event_type"))) {
      val share = cells.map(_.getAs[Double]("share")).sum
      assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
      for (c <- cells)
        assert(math.abs(c.getAs[Double]("lift") - c.getAs[Double]("share") * 24.0) < 1e-4)
    }
  }

  test("knn_classify: predictions match a brute-force kNN vote") {
    val rows = VectorQueries.knnClassify(spark, dir).collect()
    val all = graft.Tables
      .embeddings(spark, dir)
      .collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray,
        r.getAs[Int]("label")))
    val (qs, corpus) = all.partition(_._1 < 40)
    assert(rows.length == qs.length)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val byQuery = rows.map(r => r.getAs[Long]("query_id") -> r).toMap
    for ((qid, qemb, qlabel) <- qs) {
      val top = corpus
        .map { case (vid, emb, lab) => (vid, lab, dot(emb, qemb)) }
        .sortBy { case (vid, _, sim) => (-sim, vid) }
        .take(5)
      val votes = top.groupBy(_._2).view.mapValues(_.length).toSeq
      val (predLabel, nVotes) = votes.minBy { case (lab, n) => (-n, lab) }
      val r = byQuery(qid)
      assert(r.getAs[Int]("true_label") == qlabel)
      assert(r.getAs[Int]("pred_label") == predLabel, s"query $qid")
      assert(r.getAs[Long]("n_votes") == nVotes)
      assert(r.getAs[Boolean]("correct") == (predLabel == qlabel))
    }
  }
}
