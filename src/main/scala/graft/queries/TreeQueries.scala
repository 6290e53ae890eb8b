package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hierarchical aggregation — the BOM-explosion / org-rollup pattern:
  * every node's subtree total over a parent-pointer forest, computed
  * level-synchronously (one keyed join + one compacting aggregate per
  * round, rounds = tree depth) instead of materializing the transitive
  * closure. The forest derives deterministically from the orders table:
  * `parent(k) = k div 7` when that key exists and differs from k, so
  * depth is log₇(N) (~7 levels at 10⁶ keys, ~12 at 10¹⁰ — the round
  * budget scales with the LOG of the data).
  *
  * Scale: the frontier starts at one row per node and only shrinks (it
  * is compacted by a parent-keyed sum each hop), so each round shuffles
  * at most |nodes| rows; the driver sees one count scalar per round.
  * The closure-based oracle materializes (node, ancestor) pairs — fine
  * for DuckDB at test scale, exactly the quadratic blow-up the
  * level-walk avoids in production.
  */
object TreeQueries {

  /** Per-node subtree sum (exact cents) and node count, self included.
    * Fail-closed on the round budget: a frontier still moving after
    * `maxRounds` means the tree is deeper than the oracle unroll.
    */
  def hierarchyRollup(s: SparkSession, dir: String, maxRounds: Int = 12): DataFrame = {
    val nodes = Tables
      .orders(s, dir)
      .select(
        col("o_orderkey").as("id"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .persist()
    val edges = nodes
      .select(col("id"), expr("id div 7").as("parent"))
      .filter(col("parent") =!= col("id"))
      .join(nodes.select(col("id").as("pid")), col("parent") === col("pid"), "left_semi")
      .persist()
    var frontier = nodes
      .select(col("id").as("cur"), col("cents"), lit(1L).as("cnt"))
      .persist()
    val levels = scala.collection.mutable.Buffer(frontier)
    var rounds = 0
    var n = frontier.count()
    while (n > 0 && rounds < maxRounds) {
      frontier = frontier
        .join(edges, col("cur") === col("id"))
        .groupBy(col("parent").as("cur2"))
        .agg(sum(col("cents")).as("cents"), sum(col("cnt")).as("cnt"))
        .withColumnRenamed("cur2", "cur")
        .persist()
      n = frontier.count() // the round's one action
      if (n > 0) levels += frontier
      rounds += 1
    }
    require(n == 0,
      s"hierarchy deeper than $maxRounds levels — raise maxRounds " +
        "(and the oracle's recursion is unbounded, so only this side caps)")
    val all = levels.reduce(_ unionByName _)
    val out = all
      .groupBy(col("cur").as("o_orderkey"))
      .agg(sum(col("cents")).as("subtree_cents"), sum(col("cnt")).as("n_nodes"))
    nodes.unpersist()
    edges.unpersist()
    out
  }

  val hierarchyRollupSql: String =
    """WITH RECURSIVE nodes AS (
         SELECT o_orderkey AS id, CAST(round(o_totalprice*100) AS BIGINT) AS cents
         FROM orders),
       edges AS (
         SELECT c.id, c.id // 7 AS parent
         FROM nodes c JOIN nodes p ON c.id // 7 = p.id
         WHERE c.id // 7 <> c.id),
       walk(node, anc) AS (
         SELECT id, id FROM nodes
         UNION ALL
         SELECT w.node, e.parent FROM walk w JOIN edges e ON w.anc = e.id)
       SELECT w.anc AS o_orderkey,
              CAST(sum(n.cents) AS BIGINT) AS subtree_cents,
              count(*) AS n_nodes
       FROM walk w JOIN nodes n ON w.node = n.id
       GROUP BY 1"""

  /** Node depth via POINTER DOUBLING — the O(log depth) complement to
    * [[hierarchyRollup]]'s level walk: every node starts with a pointer
    * to its parent and distance 1 (roots: self, 0); each round composes
    * pointers (`ptr ← ptr(ptr)`, `d ← d + d(ptr)`), so the walked
    * distance DOUBLES per round and a depth-D forest settles in
    * ⌈log₂ D⌉ rounds — 30 rounds covers a depth-10⁹ chain. Each round
    * is ONE self-join of the (node, ptr, d) table on the pointer key;
    * convergence is the "any pointer moved" count, a driver scalar.
    */
  def treeDepth(s: SparkSession, dir: String, maxRounds: Int = 8): DataFrame = {
    val nodes = Tables.orders(s, dir).select(col("o_orderkey").as("id"))
    val withParent = nodes
      .withColumn("parent", expr("id div 7"))
      .join(nodes.select(col("id").as("pid")), col("parent") === col("pid"), "left")
      .select(
        col("id"),
        when(col("pid").isNotNull && col("parent") =!= col("id"), col("parent"))
          .otherwise(col("id")).as("ptr"),
        when(col("pid").isNotNull && col("parent") =!= col("id"), lit(1L))
          .otherwise(lit(0L)).as("d"))
    var cur = withParent.persist()
    var rounds = 0
    var moving = 1L
    while (moving > 0 && rounds < maxRounds) {
      val next = cur
        .join(
          cur.select(col("id").as("jid"), col("ptr").as("ptr2"), col("d").as("d2")),
          col("ptr") === col("jid"))
        .select(col("id"), col("ptr2").as("ptr"), (col("d") + col("d2")).as("d"))
        .persist()
      // settled ⟺ the pointer targets a root (self-pointing row); the
      // anti-join count is the round's one driver scalar
      val roots = next.filter(col("ptr") === col("id")).select(col("id").as("rootid"))
      moving = next.join(roots, col("ptr") === col("rootid"), "left_anti").count()
      cur.unpersist()
      cur = next
      rounds += 1
    }
    require(moving == 0,
      s"pointer doubling not settled in $maxRounds rounds — raise maxRounds")
    cur.select(col("id").as("o_orderkey"), col("d").as("depth"))
  }

  val treeDepthSql: String =
    """WITH RECURSIVE ids AS (SELECT o_orderkey AS id FROM orders),
       edges AS (
         SELECT c.id, c.id // 7 AS parent
         FROM ids c JOIN ids p ON c.id // 7 = p.id
         WHERE c.id // 7 <> c.id),
       walk(id, anc, d) AS (
         SELECT id, id, 0 FROM ids
         UNION ALL
         SELECT w.id, e.parent, w.d + 1
         FROM walk w JOIN edges e ON w.anc = e.id)
       SELECT id AS o_orderkey, CAST(max(d) AS BIGINT) AS depth
       FROM walk GROUP BY 1"""
}
