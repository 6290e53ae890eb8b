package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Driver-side replay models for the closed-form learners at sf0.001:
  * naive Bayes (full quantized-score recomputation), rank-1 ALS (all
  * four alternation rounds on the integer grid), and OLS (Cramer solve
  * from independently accumulated exact moments). The DuckDB oracles
  * already pin cross-engine equality; these pin the SEMANTICS against
  * a from-scratch Scala model.
  */
class LearnSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("learn-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def md5Bucket(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(key.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(4), 16) % 10
  }

  test("naive_bayes: argmax matches a from-scratch quantized NB model") {
    val docs = graft.Tables
      .documents(spark, dir)
      .select("doc_id", "text", "lang")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text"), r.getAs[String]("lang")))
    val (train, test) = docs.partition { case (id, _, _) => md5Bucket(id.toString) < 8 }
    def toks(t: String): Seq[String] = t.split(" ", -1).toSeq.filter(_.nonEmpty)
    val cnts = train
      .flatMap { case (_, t, l) => toks(t).map(l -> _) }
      .groupBy(identity)
      .view
      .mapValues(_.size.toLong)
      .toMap
    val tl = cnts.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cnts.keySet.map(_._2).size.toLong
    val dl = train.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val d = train.length.toLong
    def q(x: Double): Long = math.floor(math.log(x) * 1e12).toLong
    val langs = dl.keys.toSeq.sorted
    val model = test.map { case (id, t, actual) =>
      val wc = toks(t).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val best = langs
        .map { l =>
          val score = q(dl(l).toDouble / d.toDouble) + wc.map { case (w, c) =>
            c * q((cnts.getOrElse(l -> w, 0L) + 1).toDouble / (tl(l) + vocab).toDouble)
          }.sum
          (l, score)
        }
        .maxBy { case (l, sc) => (sc, -langs.indexOf(l)) } // desc score, asc lang
        ._1
      (id, actual, best)
    }.toSet
    val rows = LearnQueries
      .naiveBayes(spark, dir)
      .collect()
      .map(r =>
        (r.getAs[Long]("doc_id"), r.getAs[String]("actual"), r.getAs[String]("pred")))
      .toSet
    assert(rows == model)
  }

  test("als_rank1: factors equal the four-round integer-grid replay") {
    val ratings = graft.Tables
      .events(spark, dir)
      .groupBy("user_id", "event_type")
      .count()
      .collect()
      .map(r => ((r.getAs[Long]("user_id"), r.getAs[String]("event_type")), r.getAs[Long]("count")))
      .toMap
    val users = ratings.keySet.map(_._1)
    val items = ratings.keySet.map(_._2)
    var v = items.map(_ -> 1000L).toMap
    var u = Map.empty[Long, Long]
    for (_ <- 1 to 4) {
      // NB: .toSeq first — collecting (r, factor) PAIRS straight off the
      // ratings Map would build another Map keyed on r and silently
      // dedupe equal observations
      u = users.map { usr =>
        val obs = ratings.toSeq.collect { case ((uu, it), r) if uu == usr => (r, v(it)) }
        usr -> (obs.map { case (r, vq) => r * vq }.sum * 1000000L) / obs.map { case (_, vq) => vq * vq }.sum
      }.toMap
      v = items.map { it =>
        val obs = ratings.toSeq.collect { case ((uu, i2), r) if i2 == it => (r, u(uu)) }
        it -> (obs.map { case (r, uq) => r * uq }.sum * 1000000L) / obs.map { case (_, uq) => uq * uq }.sum
      }.toMap
    }
    val rows = LearnQueries.alsRank1(spark, dir).collect()
    val gotU = rows.filter(_.getAs[String]("kind") == "user")
      .map(r => r.getAs[String]("id").toLong -> r.getAs[Long]("fq")).toMap
    val gotV = rows.filter(_.getAs[String]("kind") == "item")
      .map(r => r.getAs[String]("id") -> r.getAs[Long]("fq")).toMap
    assert(gotU == u)
    assert(gotV == v)
  }

  test("ols_regression: betas equal the independent Cramer solve") {
    val feats = graft.Tables
      .lineitem(spark, dir)
      .select("l_quantity", "l_discount", "l_extendedprice")
      .collect()
      .map(r =>
        (r.getAs[Double]("l_quantity").toLong,
          math.round(r.getAs[Double]("l_discount") * 100),
          math.round(r.getAs[Double]("l_extendedprice") * 100)))
    val n = feats.length.toLong
    val s1 = feats.map(_._1).sum; val s2 = feats.map(_._2).sum
    val s11 = feats.map(f => f._1 * f._1).sum
    val s12 = feats.map(f => f._1 * f._2).sum
    val s22 = feats.map(f => f._2 * f._2).sum
    val sy = feats.map(_._3).sum
    val s1y = feats.map(f => f._1 * f._3).sum
    val s2y = feats.map(f => f._2 * f._3).sum
    val (a, b, c) = (n.toDouble, s1.toDouble, s2.toDouble)
    val (d, e, f) = (s11.toDouble, s12.toDouble, s22.toDouble)
    val (p, q, r) = (sy.toDouble, s1y.toDouble, s2y.toDouble)
    val det = a * (d * f - e * e) - b * (b * f - e * c) + c * (b * e - d * c)
    val det0 = p * (d * f - e * e) - b * (q * f - e * r) + c * (q * e - d * r)
    val det1 = a * (q * f - e * r) - p * (b * f - e * c) + c * (b * r - q * c)
    val det2 = a * (d * r - q * e) - b * (b * r - q * c) + p * (b * e - d * c)
    val row = LearnQueries.olsRegression(spark, dir).collect().head
    assert(row.getAs[Long]("n") == n)
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-6
    assert(close(row.getAs[Double]("beta0"), det0 / det))
    assert(close(row.getAs[Double]("beta1"), det1 / det))
    assert(close(row.getAs[Double]("beta2"), det2 / det))
    // sanity: the system is genuinely solvable (non-degenerate design)
    assert(det != 0.0)
  }
}
