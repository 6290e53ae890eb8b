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
    *
    * The unit cost is quantized to EXACT integer micro-dollars by
    * BIGINT floor division (`cents·10⁴ div qty`) — the r11 sf0.1 sweep
    * caught `round(cents/qty/100, 6)` landing on a decimal tie where
    * Spark (BigDecimal HALF_UP) and DuckDB round a last ulp apart; the
    * rank then ALSO orders on the integer, so winner selection can
    * never depend on a float tie.
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
    // Pre-filter the corpus BEFORE the (part, supplier) aggregate
    // (guide §3.2): both predicates are on GROUP KEYS, so filtering rows
    // first keeps the surviving groups' sums identical while the
    // aggregate input drops from every lineitem to the qualifying slice
    // (measured sf0.1: 600k rows → 591k groups pre-change, with 99.3%
    // of groups then discarded by the joins; post-change the aggregate
    // sees ~4k rows). The attribute joins ride the same dimension
    // subtrees, now over the tiny aggregate output.
    val supply = Tables
      .lineitem(s, dir)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .join(europe.select(col("s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"),
        sum(col("l_quantity").cast("long")).as("qty"))
    val ranked = supply
      .join(parts, supply("l_partkey") === parts("p_partkey"))
      .join(europe, supply("l_suppkey") === europe("s_suppkey"))
      .withColumn("cost_e6", expr("(cents * 10000) div qty"))
      .withColumn("unit_cost", col("cost_e6").cast("double") / 1000000.0)
      .withColumn(
        "rk",
        row_number().over(
          Window.partitionBy(col("p_partkey")).orderBy(col("cost_e6"), col("s_suppkey"))))
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
                CAST((cents * 10000) // qty AS DOUBLE) / 1000000.0 AS unit_cost,
                row_number() OVER (PARTITION BY p_partkey
                                   ORDER BY (cents * 10000) // qty, s_suppkey) AS rk
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
    * Instead of the textbook EXISTS/NOT-EXISTS double self-join, the
    * corpus collapses to ONE distinct (order, supplier, any_late)
    * aggregate, and everything downstream — the per-order
    * (n_supp, n_late) counts, the late-pair rejoin, the per-supplier
    * numwait — runs on that bounded pair table. One corpus-bearing
    * join + one pair-keyed exchange total (r15: the previous shape
    * evaluated the lineitem⋈orders join TWICE — visible at sf10 where
    * the join is past the broadcast tier and each evaluation is a full
    * sort-merge — and paid a countDistinct Expand on the corpus;
    * measured 82.5 → 26.7 s at sf10, identical results). The pair
    * table makes every countDistinct a plain count: (ok, sk) rows are
    * distinct by construction. "One join total" holds via
    * ReusedExchange, which needs the explicit null filter below —
    * without it the branches' inferred scan filters diverge and the
    * pair subtree still ran twice (second r15 fix: 36.3 → 22.1 s at
    * sf10, contended back-to-back A/B).
    */
  def waitingSuppliers(s: SparkSession, dir: String): DataFrame = {
    // The explicit null filter keeps BOTH consumers of `pairs`
    // canonically identical up to the pair exchange: without it the
    // late→numwait branch infers IsNotNull(l_suppkey) from its supplier
    // join while the per-order branch does not, the pushed scan filters
    // diverge, and ReuseExchange no longer dedups the two subtrees —
    // the corpus join and pair aggregate then run TWICE (visible at
    // sf10 where orders is past the broadcast tier and each evaluation
    // is a full sort-merge). With the filter shared, the pair shuffle
    // is computed once and both branches read its shuffle files — the
    // scale-right materialization (no corpus-sized persist needed).
    // Locked by the PlanAuditSpec single-lineitem-scan assert.
    val pairs = Tables
      .lineitem(s, dir)
      .filter(col("l_orderkey").isNotNull && col("l_suppkey").isNotNull)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), expr(Late).as("late"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("late"))
    val perOrder = pairs
      .groupBy(col("l_orderkey").as("ok"))
      .agg(
        count(lit(1)).as("n_supp"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"))
      .filter(col("n_supp") >= 2 && col("n_late") === 1)
    pairs
      .filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("ok"))
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
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

  /** Q3 shape — shipping-priority: the 10 highest-revenue orders taken
    * by BUILDING customers before the cutoff whose lineitems ship after
    * it. Revenue stays exact (1e-4 dollars); the top-10 is a
    * TakeOrdered, never a global sort.
    */
  def shippingPriority(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .customer(s, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") < to_timestamp(lit("1998-03-15")))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables
      .lineitem(s, dir)
      .filter(col("l_shipdate") > to_timestamp(lit("1998-03-15")))
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("revenue_e4"))
      .select(
        col("l_orderkey"),
        col("o_orderdate"),
        round(col("revenue_e4").cast("double") / 10000.0, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val shippingPrioritySql: String =
    """SELECT l_orderkey, o_orderdate,
              round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
                    / 10000.0, 6) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE c_mktsegment = 'BUILDING'
         AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       GROUP BY 1, 2
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  /** Q7 shape — volume shipping between two nations: revenue flowing
    * supplier-nation → customer-nation (both directions) per ship
    * year. Both nation dims ride broadcasts; the supplier and customer
    * joins stay hint-free.
    */
  def nationVolume(s: SparkSession, dir: String): DataFrame = {
    val nations = broadcast(
      Tables
        .nation(s, dir)
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select(col("n_nationkey"), col("n_name")))
    val supp = Tables
      .supplier(s, dir)
      .join(nations, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = Tables
      .customer(s, dir)
      .join(nations, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables
      .lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(
        col("supp_nation"),
        col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .select(
        col("supp_nation"),
        col("cust_nation"),
        col("l_year"),
        round(col("rev_e4").cast("double") / 10000.0, 6).as("revenue"))
  }

  val nationVolumeSql: String =
    """WITH ns AS (SELECT n_nationkey, n_name FROM nation
                  WHERE n_name IN ('NATION_1', 'NATION_2'))
       SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              CAST(year(l_shipdate) AS BIGINT) AS l_year,
              round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
                    / 10000.0, 6) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN ns sn ON s_nationkey = sn.n_nationkey
       JOIN customer ON o_custkey = c_custkey
       JOIN ns cn ON c_nationkey = cn.n_nationkey
       WHERE sn.n_name <> cn.n_name
       GROUP BY 1, 2, 3"""

  /** Q8 shape — market share: NATION_3 suppliers' share of PROMO-part
    * revenue sold to AMERICA-region customers, per order year. The
    * share is a ratio of two exact 1e-4-dollar sums (conditional
    * aggregation — one pass, no self-join).
    */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val americaCust = Tables
      .customer(s, dir)
      .join(
        broadcast(
          Tables
            .nation(s, dir)
            .join(
              broadcast(Tables.region(s, dir).filter(col("r_name") === "AMERICA")),
              col("n_regionkey") === col("r_regionkey"))
            .select(col("n_nationkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val promoParts = Tables
      .part(s, dir)
      .filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val n3Supp = Tables
      .supplier(s, dir)
      .join(
        broadcast(Tables.nation(s, dir).filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey").as("nk3"))),
        col("s_nationkey") === col("nk3"))
      .select(col("s_suppkey").as("sk3"))
    Tables
      .lineitem(s, dir)
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(americaCust, col("o_custkey") === col("c_custkey"))
      .join(n3Supp, col("l_suppkey") === col("sk3"), "left")
      .withColumn(
        "rev_e4",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(
        sum(col("rev_e4")).as("total_e4"),
        sum(when(col("sk3").isNotNull, col("rev_e4")).otherwise(0L)).as("n3_e4"))
      .select(
        col("o_year"),
        round(col("n3_e4").cast("double") / col("total_e4").cast("double"), 6)
          .as("mkt_share"))
  }

  val marketShareSql: String =
    """WITH america AS (
         SELECT c_custkey FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey AND r_name = 'AMERICA'),
       n3 AS (
         SELECT s_suppkey FROM supplier
         JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_3'),
       base AS (
         SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4,
                l_suppkey IN (SELECT s_suppkey FROM n3) AS is_n3
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN america ON o_custkey = c_custkey)
       SELECT o_year,
              round(CAST(sum(CASE WHEN is_n3 THEN rev_e4 ELSE 0 END) AS DOUBLE)
                    / CAST(sum(rev_e4) AS DOUBLE), 6) AS mkt_share
       FROM base GROUP BY 1"""

  /** Q10 shape — returned-item losses: top 20 customers by revenue on
    * R-flagged lineitems in a quarter. The orderkey aggregate happens
    * before the customer join; top-20 is a TakeOrdered.
    */
  def returnedItems(s: SparkSession, dir: String): DataFrame = {
    val q = Tables
      .orders(s, dir)
      .filter(
        col("o_orderdate") >= to_timestamp(lit("1997-10-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables
      .lineitem(s, dir)
      .filter(col("l_returnflag") === "R")
      .join(q, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(
        col("c_custkey"),
        col("c_name"),
        round(col("rev_e4").cast("double") / 10000.0, 6).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val returnedItemsSql: String =
    """SELECT c_custkey, c_name,
              round(CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                             * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)
                    / 10000.0, 6) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       WHERE l_returnflag = 'R'
         AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
         AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1, 2
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** Q12 shape — shipping-delay audit (the test data carries no
    * shipmode, so the bucket is the delay class itself): for 1997
    * shipments, orders counted into (late > 60 days vs on-time) ×
    * (urgent 1–2 vs normal priority) — the 2×2 operations dashboard.
    */
  def shipDelayAudit(s: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(s, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .groupBy(
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"))
      .agg(count(lit(1)).as("n_items"), countDistinct(col("o_orderkey")).as("n_orders"))
  }

  val shipDelayAuditSql: String =
    """SELECT l_shipdate > o_orderdate + INTERVAL 60 DAY AS late,
              o_orderpriority IN ('1-URGENT', '2-HIGH') AS urgent,
              count(*) AS n_items,
              count(DISTINCT o_orderkey) AS n_orders
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
       GROUP BY 1, 2"""

  /** Q14 shape — promo-revenue share for one month: one conditional
    * aggregate, the share an exact-integer ratio rounded once.
    */
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    Tables
      .lineitem(s, dir)
      .filter(
        col("l_shipdate") >= to_timestamp(lit("1997-09-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-10-01")))
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
      .withColumn(
        "rev_e4",
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long")))
      .agg(
        sum(when(col("p_type") === "PROMO", col("rev_e4")).otherwise(0L)).as("promo_e4"),
        sum(col("rev_e4")).as("total_e4"))
      .select(
        round(lit(100.0) * col("promo_e4").cast("double") / col("total_e4").cast("double"), 6)
          .as("promo_pct"))
  }

  val promoShareSql: String =
    """SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                          THEN CAST(round(l_extendedprice*100) AS BIGINT)
                                               * (100 - CAST(round(l_discount*100) AS BIGINT))
                                          ELSE 0 END) AS DOUBLE)
                   / CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                              * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE), 6)
              AS promo_pct
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
         AND l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'"""

  /** Q16 shape — parts/supplier relationship count: distinct suppliers
    * per (brand, type, size ∈ {1..8}) over the derived supply relation,
    * excluding one brand. The supply pairs aggregate BEFORE the part
    * join prunes them.
    */
  def partsSupplierCount(s: SparkSession, dir: String): DataFrame = {
    val supply = Tables
      .lineitem(s, dir)
      .select(col("l_partkey"), col("l_suppkey"))
      .distinct()
    supply
      .join(
        Tables
          .part(s, dir)
          .filter(col("p_brand") =!= "Brand#21" && col("p_size") <= 8),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  val partsSupplierCountSql: String =
    """SELECT p_brand, p_type, p_size,
              count(DISTINCT l_suppkey) AS supplier_cnt
       FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply
       JOIN part ON l_partkey = p_partkey
       WHERE p_brand <> 'Brand#21' AND p_size <= 8
       GROUP BY 1, 2, 3"""

  /** Q19 shape — bracketed discounted revenue: three OR'd
    * (brand, size-range, quantity-range) brackets — the disjunctive
    * predicate that exercises filter pushdown and join pruning. Output
    * is one exact-cent total per matching bracket.
    */
  def bracketRevenue(s: SparkSession, dir: String): DataFrame = {
    val joined = Tables
      .lineitem(s, dir)
      .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
    val bracket = when(
      col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11), lit(1))
      .when(
        col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20), lit(2))
      .when(
        col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 30), lit(3))
    joined
      .withColumn("bracket", bracket)
      .filter(col("bracket").isNotNull)
      .groupBy(col("bracket").cast("long").as("bracket"))
      .agg(sum(
        round(col("l_extendedprice") * 100).cast("long") *
          (lit(100L) - round(col("l_discount") * 100).cast("long"))).as("rev_e4"))
      .select(
        col("bracket"),
        round(col("rev_e4").cast("double") / 10000.0, 6).as("revenue"))
  }

  val bracketRevenueSql: String =
    """WITH b AS (
         SELECT CASE
                  WHEN p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
                       AND l_quantity BETWEEN 1 AND 11 THEN 1
                  WHEN p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
                       AND l_quantity BETWEEN 10 AND 20 THEN 2
                  WHEN p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
                       AND l_quantity BETWEEN 20 AND 30 THEN 3
                END AS bracket,
                CAST(round(l_extendedprice*100) AS BIGINT)
                  * (100 - CAST(round(l_discount*100) AS BIGINT)) AS rev_e4
         FROM lineitem JOIN part ON l_partkey = p_partkey)
       SELECT CAST(bracket AS BIGINT) AS bracket,
              round(CAST(sum(rev_e4) AS DOUBLE) / 10000.0, 6) AS revenue
       FROM b WHERE bracket IS NOT NULL GROUP BY 1"""

  /** Q22 shape — dormant high-balance customers: above the positive-
    * balance average (exact integer cross-multiplication `bal_cents *
    * n > total_cents`... with negatives kept out of the mean), with no
    * orders after 1999, counted per country code (nationkey mod 10).
    * The average is a broadcast scalar; the order check a left-anti
    * join.
    */
  def dormantCustomers(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables
      .customer(s, dir)
      .select(
        col("c_custkey"),
        (col("c_nationkey") % 10).cast("long").as("cntrycode"),
        round(col("c_acctbal") * 100).cast("long").as("bal_cents"))
    val avgPos = cust
      .filter(col("bal_cents") > 0)
      .agg(count(lit(1)).as("n"), sum(col("bal_cents")).as("total_cents"))
    val recent = Tables
      .orders(s, dir)
      .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
      .select(col("o_custkey"))
    cust
      .crossJoin(broadcast(avgPos))
      .filter(col("bal_cents") * col("n") > col("total_cents"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(
        count(lit(1)).as("n_custs"),
        round(sum(col("bal_cents")).cast("double") / 100.0, 6).as("total_bal"))
  }

  val dormantCustomersSql: String =
    """WITH cust AS (
         SELECT c_custkey, CAST(c_nationkey % 10 AS BIGINT) AS cntrycode,
                CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
         FROM customer),
       avg_pos AS (
         SELECT count(*) AS n, CAST(sum(bal_cents) AS BIGINT) AS total_cents
         FROM cust WHERE bal_cents > 0)
       SELECT cntrycode, count(*) AS n_custs,
              round(CAST(sum(bal_cents) AS DOUBLE) / 100.0, 6) AS total_bal
       FROM cust, avg_pos
       WHERE bal_cents * n > total_cents
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
       GROUP BY 1"""

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
