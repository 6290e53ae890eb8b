package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decision-support join shapes — the classic warehouse query patterns
  * (min-cost supplier lookup, share-of-total stock screening, top-supplier
  * scalar-max, correlated small-quantity revenue, large-volume orders,
  * only-late-supplier blame) re-expressed Spark-first over the repo's
  * TPC-H-ish tables. There is no partsupp table in the test data, so the
  * supply relation is derived as the distinct (l_partkey, l_suppkey)
  * pairs actually observed in lineitem — same join topology, same
  * planning challenges (dimension broadcast, aggregate-then-rejoin,
  * scalar subquery, anti/semi composition).
  *
  * Exactness contract: every money aggregate runs in the exact integer
  * cent domain (`round(x*100)::BIGINT`; discounted revenue in 1e-4
  * dollars via `cents*(100-disc_hundredths)`), so sums are
  * order-independent and the DuckDB oracles match hash-for-hash.
  * Divisions happen once, after aggregation, with the identical
  * expression shape on both engines (IEEE doubles from identical
  * integer inputs are bit-deterministic).
  *
  * Scale notes (100 TB): the fixed dimensions (region, nation — 5/25
  * rows at every SF) ride explicit broadcasts; the growing dimensions
  * (supplier, part) are joined WITHOUT a hard broadcast hint so AQE
  * picks broadcast at small scale and falls back to shuffled hash when
  * they outgrow the threshold (the q_lm_perplexity lesson —
  * SCALE.md §broadcast-hints). Every aggregate is keyed on its natural
  * high-cardinality key (partkey / orderkey / suppkey), so partial
  * aggregation runs map-side and the shuffle carries one row per key.
  */
object DecisionSupportQueries {

  private val Late = "l_shipdate > o_orderdate + INTERVAL 90 DAYS"
  private val LateSql = "l_shipdate > o_orderdate + INTERVAL 90 DAY"

  /** Q2 shape — cheapest observed supplier per part. For LARGE-type
    * parts of size ≤ 10, find the EUROPE-region supplier with the
    * lowest observed unit cost (exact cent/quantity sums per
    * (part, supplier), one division at the end). Ties break on
    * suppkey via the rank window, which is PARTITIONED by partkey —
    * no global window, scales with the part dimension.
    */
  def minCostSupplier(s: SparkSession, dir: String): DataFrame = {
    val europe = Tables
      .supplier(s, dir)
      .join(
        broadcast(
          Tables
            .nation(s, dir)
            .join(
              broadcast(Tables.region(s, dir).filter(col("r_name") === "EUROPE")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val parts = Tables
      .part(s, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"))
    val supply = Tables
      .lineitem(s, dir)
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
    val ranked = supply
      .join(parts, supply("l_partkey") === parts("p_partkey"))
      .join(europe, supply("l_suppkey") === europe("s_suppkey"))
      .withColumn(
        "unit_cost",
        round(col("cents").cast("double") / (col("qty").cast("double") * 100.0), 6))
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("p_partkey")).orderBy(col("unit_cost"), col("s_suppkey"))))
    ranked
      .filter(col("rk") === 1)
      .select(col("p_partkey"), col("s_suppkey"), col("s_name"), col("n_name"), col("unit_cost"))
  }

  val minCostSupplierSql: String =
    """WITH europe AS (
         SELECT s_suppkey, s_name, n_name
         FROM supplier JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'),
       supply AS (
         SELECT l_partkey, l_suppkey,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents,
                CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
         FROM lineitem GROUP BY 1, 2),
       ranked AS (
         SELECT p_partkey, s_suppkey, s_name, n_name,
                round(CAST(cents AS DOUBLE) / (CAST(qty AS DOUBLE) * 100.0), 6) AS unit_cost,
                row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY round(CAST(cents AS DOUBLE) / (CAST(qty AS DOUBLE) * 100.0), 6), s_suppkey) AS rk
         FROM supply
         JOIN part ON l_partkey = p_partkey AND p_type = 'LARGE' AND p_size <= 10
         JOIN europe ON l_suppkey = s_suppkey)
       SELECT p_partkey, s_suppkey, s_name, n_name, unit_cost FROM ranked WHERE rk = 1"""

  /** Q11 shape — important stock screening: parts whose ASIA-region
    * supply value exceeds 0.1% of the total. The share test is the
    * exact integer comparison `part_cents * 1000 > total_cents`
    * (no float fraction), with the one-row total riding a broadcast
    * cross join — the canonical scalar-subquery plan.
    */
  def importantStock(s: SparkSession, dir: String): DataFrame = {
    val asiaSupp = Tables
      .supplier(s, dir)
      .join(
        broadcast(
          Tables
            .nation(s, dir)
            .join(
              broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val value = Tables
      .lineitem(s, dir)
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("value_cents"))
    val total = value.agg(sum(col("value_cents")).as("total_cents"))
    value
      .crossJoin(broadcast(total))
      .filter(col("value_cents") * 1000 > col("total_cents"))
      .select(col("l_partkey"), col("value_cents"))
  }

  val importantStockSql: String =
    """WITH asia AS (
         SELECT s_suppkey FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
       value AS (
         SELECT l_partkey,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS value_cents
         FROM lineitem JOIN asia ON l_suppkey = s_suppkey
         GROUP BY 1)
       SELECT l_partkey, value_cents FROM value
       WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM value)"""

  /** Q15 shape — top supplier(s) by 1996-Q1 discounted revenue.
    * Discounted revenue stays exact: `cents * (100 - disc_hundredths)`
    * sums in 1e-4-dollar units. The max is a one-row aggregate joined
    * back by broadcast — returns ALL tied suppliers (the Q15 contract)
    * rather than an arbitrary limit-1.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val revenue = Tables
      .lineitem(s, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
      .groupBy(col("l_suppkey"))
      .agg(
        sum(
          round(col("l_extendedprice") * 100).cast("long") *
            (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("revenue_e4"))
    val top = revenue.agg(max(col("revenue_e4")).as("max_e4"))
    revenue
      .crossJoin(broadcast(top))
      .filter(col("revenue_e4") === col("max_e4"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(
        col("s_suppkey"),
        col("s_name"),
        round(col("revenue_e4").cast("double") / 10000.0, 6).as("total_revenue"))
  }

  val topSupplierSql: String =
    """WITH revenue AS (
         SELECT l_suppkey,
                CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_e4
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
         GROUP BY 1)
       SELECT s_suppkey, s_name,
              round(CAST(revenue_e4 AS DOUBLE) / 10000.0, 6) AS total_revenue
       FROM revenue JOIN supplier ON l_suppkey = s_suppkey
       WHERE revenue_e4 = (SELECT max(revenue_e4) FROM revenue)"""

  /** Q17 shape — small-quantity-order revenue for one brand: lineitems
    * whose quantity is below 20% of the part's average quantity.
    * The correlated-average predicate is the exact integer cross
    * multiplication `qty * 5 * n < sum_qty` (quantities are integral),
    * so no float average ever exists. The per-part stats are a
    * partkey-keyed aggregate joined back — at scale the brand filter
    * prunes the part dimension before either side shuffles.
    */
  def smallQtyRevenue(s: SparkSession, dir: String): DataFrame = {
    val brandParts = Tables
      .part(s, dir)
      .filter(col("p_brand") === "Brand#13")
      .select(col("p_partkey"))
    val items = Tables
      .lineitem(s, dir)
      .join(brandParts, col("l_partkey") === col("p_partkey"))
      .select(
        col("l_partkey"),
        col("l_quantity").cast("long").as("qty"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"))
    val stats = items
      .groupBy(col("l_partkey").as("sp"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sum_qty"))
    items
      .join(stats, col("l_partkey") === col("sp"))
      .filter(col("qty") * 5 * col("n") < col("sum_qty"))
      .agg(round(sum(col("cents")).cast("double") / 700.0, 6).as("avg_yearly"))
  }

  val smallQtyRevenueSql: String =
    """WITH items AS (
         SELECT l_partkey, CAST(l_quantity AS BIGINT) AS qty,
                CAST(round(l_extendedprice*100) AS BIGINT) AS cents
         FROM lineitem JOIN part ON l_partkey = p_partkey AND p_brand = 'Brand#13'),
       stats AS (
         SELECT l_partkey AS sp, count(*) AS n,
                CAST(sum(qty) AS BIGINT) AS sum_qty
         FROM items GROUP BY 1)
       SELECT round(CAST(sum(cents) AS DOUBLE) / 700.0, 6) AS avg_yearly
       FROM items JOIN stats ON l_partkey = sp
       WHERE qty * 5 * n < sum_qty"""

  /** Q18 shape — large-volume orders: customers whose order exceeds
    * 250 total units. The orderkey-keyed quantity aggregate happens
    * BEFORE the customer/orders joins, so the (rare) qualifying
    * orders — not the raw lineitems — drive the join fan-in.
    */
  def bigOrders(s: SparkSession, dir: String): DataFrame = {
    val bigKeys = Tables
      .lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("long")).as("sum_qty"))
      .filter(col("sum_qty") > 250)
    bigKeys
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_name"),
        col("c_custkey"),
        col("o_orderkey"),
        col("o_orderdate"),
        col("o_totalprice"),
        col("sum_qty"))
  }

  val bigOrdersSql: String =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
       FROM (SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
             FROM lineitem GROUP BY 1) big
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE sum_qty > 250"""

  /** Q21 shape — suppliers who alone held up a multi-supplier order:
    * the order had ≥ 2 distinct suppliers, this supplier shipped
    * > 90 days after the order date, and no other supplier did.
    * Instead of the textbook EXISTS/NOT-EXISTS double self-join, ONE
    * orderkey-keyed aggregate computes (n_suppliers, n_late_suppliers)
    * and joins back to the late rows — two shuffles total on the same
    * key, so at scale the exchange is reused across the aggregate and
    * the rejoin.
    */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    val lo = Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), expr(Late).as("late"))
    val perOrder = lo
      .groupBy(col("l_orderkey").as("ok"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    lo.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .groupBy(col("l_suppkey"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .join(Tables.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(25)
  }

  val waitingSuppliersSql: String =
    s"""WITH lo AS (
         SELECT l_orderkey, l_suppkey, ($LateSql) AS late
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       per_order AS (
         SELECT l_orderkey AS ok,
                count(DISTINCT l_suppkey) AS n_supp,
                count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
         FROM lo GROUP BY 1
         HAVING count(DISTINCT l_suppkey) >= 2
            AND count(DISTINCT CASE WHEN late THEN l_suppkey END) = 1)
       SELECT s_suppkey, s_name, numwait FROM (
         SELECT l_suppkey, count(DISTINCT l_orderkey) AS numwait
         FROM lo JOIN per_order ON l_orderkey = ok
         WHERE late GROUP BY 1) w
       JOIN supplier ON l_suppkey = s_suppkey
       ORDER BY numwait DESC, s_name LIMIT 25"""

  /** Q4 shape — order-priority checking: 1996-H1 orders with at least
    * one lineitem shipped > 60 days after the order date, counted per
    * priority. The EXISTS is a left-semi join on orderkey (no
    * duplicate-order inflation, no distinct needed afterwards).
    */
  def orderPriorityCheck(s: SparkSession, dir: String): DataFrame = {
    val orders = Tables
      .orders(s, dir)
      .filter(
        col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1996-07-01")))
    val lateItems = Tables
      .lineitem(s, dir)
      .select(col("l_orderkey").as("lk"), col("l_shipdate"))
    orders
      .join(
        lateItems,
        col("o_orderkey") === col("lk") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
  }

  val orderPriorityCheckSql: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY 1"""
}
