package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functional locks for the round-9 mining/ML-feature operators —
  * invariants the oracle compare can't see (it checks equality, not
  * lawfulness): PSI non-negativity, rank-sum identities, token
  * conservation, leave-one-fold-out arithmetic, and the SAX word grid.
  */
class MiningSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("mining-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("assoc rules: metrics lawful; support re-derives from the basket count") {
    val rows = MiningQueries.assocRules(spark, dir).collect()
    assert(rows.nonEmpty)
    val nOrders = graft.Tables
      .lineitem(spark, dir)
      .join(graft.Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey"))
      .distinct()
      .count()
    rows.foreach { r =>
      val (nPair, support) = (r.getAs[Long]("n_pair"), r.getAs[Double]("support"))
      assert(support > 0 && support <= 1)
      val cab = r.getAs[Double]("conf_a_to_b")
      val cba = r.getAs[Double]("conf_b_to_a")
      assert(cab > 0 && cab <= 1 && cba > 0 && cba <= 1)
      assert(r.getAs[Double]("lift") > 0)
      assert(math.abs(support - nPair.toDouble / nOrders) < 1e-6)
      assert(r.getAs[String]("item_a") < r.getAs[String]("item_b"))
    }
  }

  test("drift PSI: non-negative (Jensen), flag consistent with threshold") {
    val rows = MiningQueries.driftPsi(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val psi = r.getAs[Double]("psi")
      assert(psi >= 0.0, s"PSI must be >= 0, got $psi")
      assert(r.getAs[Boolean]("drifted") == (psi > 0.1))
      assert(r.getAs[Long]("n_ref") > 0 && r.getAs[Long]("n_cur") > 0)
    }
  }

  test("target encoding: out-of-fold mean re-derives from the raw complement") {
    val enc = MiningQueries.targetEncoding(spark, dir).collect()
    assert(enc.length > 0)
    val sample = enc.minBy(r => (r.getAs[String]("event_type"), r.getAs[Long]("fold")))
    val (et, fold) = (sample.getAs[String]("event_type"), sample.getAs[Long]("fold"))
    val raw = graft.Tables
      .events(spark, dir)
      .filter(col("event_type") === et)
      .select(
        expr(
          "cast(conv(substring(md5(cast(cast(event_id as string) as binary)), 1, 4), 16, 10) as long) % 5")
          .as("f"),
        round(col("value") * 100).cast("long").as("cents"))
      .filter(col("f") =!= fold)
      .agg((sum(col("cents")) / 100.0 / count(lit(1))).as("m"))
      .collect()(0)
      .getAs[Double]("m")
    assert(math.abs(sample.getAs[Double]("oof_mean") - raw) < 1e-6)
  }

  test("feature hashing: bucket loads conserve the corpus token count") {
    val buckets = MiningQueries.featureHashing(spark, dir).collect()
    val hashed = buckets.map(_.getAs[Long]("n_tokens")).sum
    val direct = graft.Tables
      .documents(spark, dir)
      .select(explode(split(lower(col("text")), "\\s+", -1)).as("tok"))
      .filter(col("tok") =!= "")
      .count()
    assert(hashed == direct, s"hashed=$hashed direct=$direct")
    buckets.foreach { r =>
      assert(r.getAs[Long]("n_distinct_tokens") >= 1)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_distinct_tokens"))
    }
  }

  test("Mann-Whitney: U1 + U2 = n1*n2 (rank-sum identity); z finite") {
    val r = MiningQueries.mannWhitney(spark, dir).collect()(0)
    val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
    val (u1, u2) = (r.getAs[Double]("u1"), r.getAs[Double]("u2"))
    assert(n1 > 0 && n2 > 0)
    assert(math.abs(u1 + u2 - n1.toDouble * n2) < 1e-9)
    assert(u1 >= 0 && u2 >= 0)
    assert(!r.getAs[Double]("z_score").isNaN)
  }

  test("skew diagnose: ratios lawful; salt factor is the ceiling of the ratio") {
    val rows = MiningQueries.skewDiagnose(spark, dir).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("skew_ratio")
      assert(ratio >= 1.0 - 1e-9)
      val ent = r.getAs[Double]("norm_entropy")
      assert(ent > 0 && ent <= 1.0 + 1e-9)
      assert(r.getAs[Long]("salt_factor") == math.ceil(ratio - 1e-9).toLong)
      assert(r.getAs[Long]("max_per_key") <= r.getAs[Long]("n_rows"))
    }
  }

  test("path mining: triple counts conserve Σ max(0, n_user − 2)") {
    val all = MiningQueries.pathMining(spark, dir, k = 1000000).collect()
    val total = all.map(_.getAs[Long]("n_occurrences")).sum
    val expected = graft.Tables
      .events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(sum(greatest(col("n") - 2, lit(0L))).as("t"))
      .collect()(0)
      .getAs[Long]("t")
    assert(total == expected, s"total=$total expected=$expected")
    all.foreach(r => assert(r.getAs[String]("path").split(">").length == 3))
  }

  test("item kNN: ranks contiguous per item; similarity lawful") {
    val rows = MiningQueries.itemKnn(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("item")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.toSeq == (1L to ranks.length).toSeq, ranks.mkString(","))
      assert(ranks.length <= 5)
    }
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim")
      assert(sim > 0 && sim <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_co") >= 1)
      assert(r.getAs[Long]("item") != r.getAs[Long]("neighbor"))
    }
  }

  test("k-anonymity: risk shrinks monotonically as generalization coarsens") {
    val rows = MiningQueries.kAnonymity(spark, dir).collect()
    assert(rows.length == 3)
    val byLevel = rows.map(r => r.getAs[String]("level") -> r).toMap
    val l3 = byLevel("nation+segment+balband")
    val l2 = byLevel("nation+segment")
    val l1 = byLevel("nation")
    assert(l3.getAs[Long]("n_groups") >= l2.getAs[Long]("n_groups"))
    assert(l2.getAs[Long]("n_groups") >= l1.getAs[Long]("n_groups"))
    assert(l3.getAs[Double]("risk_rate") >= l2.getAs[Double]("risk_rate"))
    assert(l2.getAs[Double]("risk_rate") >= l1.getAs[Double]("risk_rate"))
    rows.foreach(r => assert(r.getAs[Long]("n_at_risk") <= 5L * r.getAs[Long]("n_violating")))
  }

  test("survival KM: monotone curve, shrinking risk set, first-step identity") {
    val rows = MiningQueries.survivalKm(spark, dir).collect().sortBy(_.getAs[Long]("duration"))
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Double]("survival") >= b.getAs[Double]("survival") - 1e-9)
        assert(a.getAs[Long]("n_at_risk") > b.getAs[Long]("n_at_risk"))
      case _ =>
    }
    val first = rows.head
    val expected = 1.0 -
      first.getAs[Long]("n_converted").toDouble / first.getAs[Long]("n_at_risk")
    assert(math.abs(first.getAs[Double]("survival") - expected) < 1e-6)
    rows.foreach(r => assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_at_risk")))
  }

  test("stratified survival KM: per-stratum monotone curve and shrinking risk set; " +
    "strata partition the global risk set") {
    val rows = MiningQueries.survivalKmStrata(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Int]("cohort"))
    assert(byCohort.size >= 2, s"expected multiple signup-week strata, got ${byCohort.keySet}")
    byCohort.foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("duration"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("survival") >= b.getAs[Double]("survival") - 1e-9)
          assert(a.getAs[Long]("n_at_risk") > b.getAs[Long]("n_at_risk"))
        case _ =>
      }
      ordered.foreach(r => assert(r.getAs[Long]("n_converted") <= r.getAs[Long]("n_at_risk")))
      val first = ordered.head
      val expected = 1.0 -
        first.getAs[Long]("n_converted").toDouble / first.getAs[Long]("n_at_risk")
      assert(math.abs(first.getAs[Double]("survival") - expected) < 1e-6)
    }
    // the strata's duration-0 risk sets partition the global cohort
    val globalFirst = MiningQueries.survivalKm(spark, dir)
      .collect().minBy(_.getAs[Long]("duration")).getAs[Long]("n_at_risk")
    val strataFirst = byCohort.values
      .map(_.minBy(_.getAs[Long]("duration")).getAs[Long]("n_at_risk")).sum
    assert(strataFirst == globalFirst,
      s"strata risk sets ($strataFirst) must partition the global one ($globalFirst)")
  }

  test("negative sampling: slots conserve (neg + collisions = k); deterministic rerun") {
    val a = MiningQueries.negativeSampling(spark, dir).collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      assert(r.getAs[Long]("n_neg") + r.getAs[Long]("n_collisions") == 8L)
      assert(r.getAs[Long]("n_pos") >= 1L)
    }
    val b = MiningQueries.negativeSampling(spark, dir).collect()
    assert(
      a.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq ==
        b.map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1).toSeq,
      "hash sampling must be reproducible across runs")
  }

  test("calibration bins: counts conserve; ECE terms lawful") {
    val rows = MiningQueries.calibrationBins(spark, dir).collect()
    val total = graft.Tables.events(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Double]("ece_term") >= 0)
      val pr = r.getAs[Double]("pos_rate")
      assert(pr >= 0 && pr <= 1)
      val ms = r.getAs[Double]("mean_score")
      assert(ms >= 0 && ms <= 1.0 + 1e-9)
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n"))
    }
  }

  test("SAX motifs: word grid complete per channel; alphabet closed") {
    val rows = SignalQueries.saxMotifs(spark, dir).collect()
    val byChannel = rows.groupBy(_.getAs[Long]("channel"))
    assert(byChannel.size == 16, "2 digitisers x 8 channels")
    byChannel.foreach { case (_, rs) =>
      // 4 frames x 25 word positions per trace
      assert(rs.map(_.getAs[Long]("n")).sum == 100L)
    }
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(w.length == 4 && w.forall(c => c >= 'a' && c <= 'd'), w)
      val fp = r.getAs[Long]("first_pos")
      assert(fp >= 0 && fp <= 24)
    }
  }

  test("logreg trainer: converges above 0.9 train accuracy, deterministic rerun") {
    val a = MiningQueries.logregTrain(spark, dir).collect()(0)
    val n = a.getAs[Long]("n")
    val correct = a.getAs[Long]("n_correct")
    assert(n > 0 && correct.toDouble / n > 0.9,
      s"trainer failed to learn the learnable label: $correct/$n")
    // a non-trivial model actually moved off the origin
    assert(math.abs(a.getAs[Double]("w1")) > 0.1)
    val b = MiningQueries.logregTrain(spark, dir).collect()(0)
    assert(a === b, "training must be bit-deterministic across reruns")
  }

  test("gbm stumps: positive-gain splits, leaves move predictions toward labels, " +
    "deterministic rerun") {
    val rows = MiningQueries.gbmStumps(spark, dir).collect()
    assert(rows.length === MiningQueries.GbmRounds)
    val n = rows.head.getAs[Long]("n")
    val correct = rows.head.getAs[Long]("n_correct")
    assert(correct.toDouble / n > 0.9, s"boosting failed to learn: $correct/$n")
    rows.foreach { r =>
      // a stump with equal leaves would be a zero-gain no-op split
      assert(r.getAs[Long]("left_leaf") !== r.getAs[Long]("right_leaf"))
      assert(Set(1, 2).contains(r.getAs[Int]("feature")))
    }
    val again = MiningQueries.gbmStumps(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq === again.map(_.toString).sorted.toSeq)
  }

  test("markov attribution: probabilities lawful, removal can only hurt, shares sum to 1") {
    val rows = MiningQueries.markovAttribution(spark, dir).collect()
    assert(rows.nonEmpty)
    val base = rows.map(_.getAs[Double]("conv_full")).distinct
    assert(base.length == 1, "conv_full must be one chain-wide value")
    assert(base.head > 0.0 && base.head <= 1.0)
    for (r <- rows) {
      val cr = r.getAs[Double]("conv_removed")
      assert(cr >= 0.0 && cr <= base.head + 1e-12,
        s"removing a channel cannot raise conversion: $r")
      assert(r.getAs[Double]("removal_effect") >= 0.0)
    }
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-6)
    val again = MiningQueries.markovAttribution(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("ks statistic: equals the max |TPR − FPR| over the ROC curve") {
    val ks = MiningQueries.ksStatistic(spark, dir).collect().head
    val curve = MiningQueries.rocCurve(spark, dir).collect()
    val want = curve
      .map(r => math.abs(r.getAs[Double]("tpr") - r.getAs[Double]("fpr")))
      .max
    // rocCurve rates are rounded at 1e-6, so the cross-check carries
    // that grid
    assert(math.abs(ks.getAs[Double]("ks_stat") - want) < 3e-6, s"$ks vs $want")
    assert(ks.getAs[Double]("ks_stat") >= 0.0 && ks.getAs[Double]("ks_stat") <= 1.0)
    spark.catalog.clearCache()
  }

  test("poststrat ATE: equals a driver-side stratified recompute") {
    import org.apache.spark.sql.functions._
    val row = MiningQueries.poststratAte(spark, dir).collect().head
    val users = graft.Tables
      .events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_ev"),
        sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
      .collect()
      .map { r =>
        val uid = r.getAs[Long]("user_id")
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(uid.toString.getBytes("UTF-8")).map(b => f"$b%02x").mkString
        val arm = java.lang.Long.parseLong(hex.take(4), 16) % 2
        (r.getAs[Long]("n_ev") / 20, arm, r.getAs[Long]("cents"))
      }
    val strata = users.groupBy(_._1).filter { case (_, us) =>
      us.exists(_._2 == 1) && us.exists(_._2 == 0)
    }
    var wsum = 0.0; var wtot = 0.0
    for ((_, us) <- strata.toSeq.sortBy(_._1)) {
      val t = us.filter(_._2 == 1); val c = us.filter(_._2 == 0)
      val diff = t.map(_._3).sum.toDouble / t.length - c.map(_._3).sum.toDouble / c.length
      wsum += (t.length + c.length).toDouble * diff
      wtot += (t.length + c.length).toDouble
    }
    assert(row.getAs[Long]("n_strata") == strata.size.toLong)
    assert(math.abs(row.getAs[Double]("ate") - wsum / wtot / 100.0) < 1e-5, row.toString)
  }

  test("shapley attribution: efficiency axiom (Σφ = v(grand)); shares sum to 1") {
    val rows = MiningQueries.shapleyAttribution(spark, dir).collect()
    assert(rows.length == 4)
    val vg = rows.map(_.getAs[Double]("v_grand")).distinct
    assert(vg.length == 1 && vg.head >= 0.0 && vg.head <= 1.0)
    // the Shapley efficiency axiom: credits sum exactly to the grand
    // coalition's value (v(∅) ≡ 0 here)
    assert(math.abs(rows.map(_.getAs[Double]("shapley")).sum - vg.head) < 1e-6)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-6)
  }

  test("l-diversity: coarser generalization never reduces diversity; bounds lawful") {
    val rows = MiningQueries.lDiversity(spark, dir).collect()
    val byLevel = rows.map(r => r.getAs[String]("level") -> r).toMap
    assert(byLevel.keySet == Set("nation+segment", "nation", "segment"))
    for (r <- rows) {
      assert(r.getAs[Long]("n_violating") <= r.getAs[Long]("n_groups"))
      assert(r.getAs[Long]("min_l") >= 1)
    }
    // merging groups can only grow each group's distinct-sensitive set
    assert(byLevel("nation").getAs[Long]("min_l") >=
      byLevel("nation+segment").getAs[Long]("min_l"))
  }

  test("hash bootstrap: CI brackets the mean; resample weights rebuild one point") {
    val r = MiningQueries.hashBootstrap(spark, dir).collect().head
    assert(r.getAs[Long]("n_resamples") == 32L)
    val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("boot_mean"),
      r.getAs[Double]("ci_hi"))
    assert(lo <= m && m <= hi, r.toString)
    assert(lo > 0, "purchase spend means must be positive")
  }

  test("diff-in-diff: contrast re-derives from the four cell means") {
    val r = MiningQueries.diffInDiff(spark, dir).collect()
    assert(r.length == 1)
    val row = r.head
    val did = (row.getAs[Double]("mean_t_post") - row.getAs[Double]("mean_t_pre")) -
      (row.getAs[Double]("mean_c_post") - row.getAs[Double]("mean_c_pre"))
    // did is computed pre-rounding from the same cells; the identity
    // holds to the 1e-6 output grid
    assert(math.abs(row.getAs[Double]("did") - did) < 2e-6, row.toString)
  }

  test("event_pattern: sequence length and pattern counts match a driver model") {
    import org.apache.spark.sql.functions._
    val rows = MiningQueries.eventPattern(spark, dir).collect()
    val events = graft.Tables
      .events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2).take(1)))
    val model = events.groupBy(_._1).map { case (u, es) =>
      val seq = es.sortBy(_._2).map(_._3).mkString
      def cnt(pat: String): Long = {
        var c = 0L; var i = seq.indexOf(pat)
        while (i >= 0) { c += 1; i = seq.indexOf(pat, i + pat.length) }
        c
      }
      u -> ((es.length.toLong, seq, cnt("vcp"), cnt("ep")))
    }
    assert(rows.map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("n_events"), r.getAs[String]("seq"),
        r.getAs[Long]("n_conversions"), r.getAs[Long]("n_error_purchase")))).toMap
      == model)
  }
}
