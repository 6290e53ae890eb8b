package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph analytics over the document-similarity graph — the centrality
  * companion to the connected-components clustering
  * ([[graft.operators.ConnectedComponents]]): which documents sit at the
  * hubs of the near-duplicate neighborhood? High-centrality docs are the
  * canonical representatives a curation pipeline keeps; low-centrality
  * satellites are the drop candidates.
  */
object GraphQueries {

  /** PageRank (damping 0.85, `iters` synchronous iterations) over the
    * word-overlap similarity graph: nodes are documents (doc_id < 80,
    * keeping the demo graph bounded), edges connect same-language pairs
    * sharing ≥ `minCommon` distinct words, symmetrised so the graph has
    * no dangling nodes (every node with an out-edge also receives).
    *
    * Scale: the edge table is built once and persisted (it is consumed
    * `iters` times); each iteration is the canonical distributed
    * PageRank shape — one join of ranks to edges on the src key, one
    * aggregation on the dst key — so the per-iteration cost is two
    * bounded shuffles of the edge table regardless of iteration count,
    * and the rank/degree/node tables stay node-sized. The teleport
    * scalar rides a broadcast of the one-row node-count aggregate.
    *
    * Cross-engine float exactness: the per-node neighbor sum is an
    * explicitly ORDERED fold — `aggregate(array_sort(collect_list(c)))`
    * here, `list_reduce(list_sort(list(c)))` in DuckDB (the
    * [[CurationQueries.domainMixture]] sorted-fold trick) — so the
    * oracle unrolls all `iters` iterations and still matches the hash
    * bit-for-bit. (At production scale the sort is unnecessary — a
    * plain `sum` differs only in non-deterministic last-ulp ordering —
    * but the ordered fold is what makes the operator *provably* right.)
    */
  /** The word-overlap similarity graph shared by [[pagerank]] and
    * [[triangleCount]]: canonical edge list (doc_a < doc_b) of same-language
    * document pairs with ≥ `minCommon` common distinct words.
    */
  private def similarityPairs(s: SparkSession, dir: String, minCommon: Int): DataFrame = {
    val words = Tables
      .documents(s, dir)
      .filter(col("doc_id") < 80)
      .select(
        col("doc_id"),
        col("lang"),
        explode(array_distinct(split(col("text"), " ", -1))).as("w"))
    val a = words.select(col("doc_id").as("doc_a"), col("lang"), col("w"))
    val b = words.select(col("doc_id").as("doc_b"), col("lang").as("lang_b"), col("w"))
    a.join(b, Seq("w"))
      .filter(col("doc_a") < col("doc_b") && col("lang") === col("lang_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minCommon)
  }

  def pagerank(
      s: SparkSession,
      dir: String,
      iters: Int = 5,
      minCommon: Int = 12): DataFrame = {
    val pairs = similarityPairs(s, dir, minCommon)
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val nodes = edges.select(col("src").as("node")).distinct()
    val nn = nodes.agg(count(lit(1)).as("n_nodes"))
    var rank = nodes
      .crossJoin(broadcast(nn))
      .select(col("node"), (lit(1.0) / col("n_nodes").cast("double")).as("rank"))
    for (_ <- 1 to iters) {
      val contribs = edges
        .join(rank.withColumnRenamed("node", "src"), "src")
        .join(deg, "src")
        .select(col("dst"), (col("rank") / col("out_deg").cast("double")).as("c"))
      val sums = contribs
        .groupBy(col("dst"))
        .agg(
          aggregate(array_sort(collect_list(col("c"))), lit(0.0), (acc, x) => acc + x)
            .as("s"))
      rank = nodes
        .join(sums.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(nn))
        .select(
          col("node"),
          (lit(0.15) / col("n_nodes").cast("double") +
            lit(0.85) * coalesce(col("s"), lit(0.0))).as("rank"))
    }
    rank
      .join(deg.withColumnRenamed("src", "node"), "node")
      .select(
        col("node").as("doc_id"),
        col("out_deg").as("degree"),
        round(col("rank"), 6).as("pagerank"))
  }

  /** Per-node triangle count and local clustering coefficient over the
    * same similarity graph as [[pagerank]] — the community-density
    * companion to centrality: a high-clustering node sits inside a dense
    * near-duplicate clique (one canonical doc suffices); a high-degree
    * low-clustering node is a hub bridging distinct neighborhoods.
    *
    * Semantics: triangles are enumerated once each in canonical order
    * a < b < c by the standard two-hop join (e₁=(a,b) ⋈ e₂=(b,c) ⋈
    * closing edge e₃=(a,c)); each triangle credits all three corners.
    * clustering(v) = 2·T(v) / (deg(v)·(deg(v)−1)), 0 when deg ≤ 1.
    *
    * Scale: the canonical edge list is persisted once and feeds all three
    * join legs plus the degree/node tables. Each join is edge-keyed
    * (never a product); the wedge intermediate is Σ_v deg(v)² rows —
    * the known cost center, bounded in practice by orienting edges from
    * low id to high id (here) or low degree to high degree (the standard
    * refinement when a real corpus has power-law hubs; same plan shape,
    * just a different canonical order). AQE skew-join splits any hot
    * wedge partition.
    */
  def triangleCount(s: SparkSession, dir: String, minCommon: Int = 12): DataFrame = {
    val pairs = similarityPairs(s, dir, minCommon).select(col("doc_a"), col("doc_b")).persist()
    val tri = pairs
      .as("e1")
      .join(pairs.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(
        pairs.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .select(col("e1.doc_a").as("a"), col("e1.doc_b").as("b"), col("e2.doc_b").as("c"))
    val perNode = tri
      .select(col("a").as("node"))
      .unionByName(tri.select(col("b").as("node")))
      .unionByName(tri.select(col("c").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("triangles"))
    val deg = pairs
      .select(col("doc_a").as("node"))
      .unionByName(pairs.select(col("doc_b").as("node")))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("degree"))
    deg
      .join(perNode, Seq("node"), "left")
      .select(
        col("node").as("doc_id"),
        col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(
          when(
            col("degree") > 1,
            (lit(2) * coalesce(col("triangles"), lit(0L))).cast("double") /
              (col("degree") * (col("degree") - 1)).cast("double"))
            .otherwise(lit(0.0)),
          6).as("clustering"))
  }

  /** Exact DuckDB oracle for [[triangleCount]]: same canonical two-hop
    * enumeration, same corner credit, same coefficient arithmetic.
    */
  def triangleCountSql(minCommon: Int = 12): String =
    s"""WITH ${graphCtesSql(minCommon)},
       tri AS (
         SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
         FROM pairs e1
         JOIN pairs e2 ON e1.doc_b = e2.doc_a
         JOIN pairs e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
       corners AS (
         SELECT a AS node FROM tri
         UNION ALL SELECT b FROM tri
         UNION ALL SELECT c FROM tri),
       pern AS (SELECT node, count(*) AS triangles FROM corners GROUP BY 1),
       degs AS (
         SELECT node, count(*) AS degree FROM (
           SELECT doc_a AS node FROM pairs
           UNION ALL SELECT doc_b FROM pairs) GROUP BY 1)
       SELECT d.node AS doc_id, d.degree,
              COALESCE(p.triangles, 0) AS triangles,
              round(CASE WHEN d.degree > 1
                         THEN CAST(2 * COALESCE(p.triangles, 0) AS DOUBLE)
                              / CAST(d.degree * (d.degree - 1) AS DOUBLE)
                         ELSE CAST(0 AS DOUBLE) END, 6) AS clustering
       FROM degs d LEFT JOIN pern p ON d.node = p.node"""

  /** Shared oracle fragment: the similarity graph CTEs (`words`,
    * `pairs`) used by both graph oracles.
    */
  private def graphCtesSql(minCommon: Int): String =
    s"""words AS (
         SELECT doc_id, lang, unnest(list_distinct(string_split(text, ' '))) AS w
         FROM documents WHERE doc_id < 80),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM words a JOIN words b
           ON a.w = b.w AND a.doc_id < b.doc_id AND a.lang = b.lang
         GROUP BY 1, 2 HAVING count(*) >= $minCommon)"""

  /** Exact DuckDB oracle: the same graph, the same damping, all
    * iterations unrolled as chained CTEs, every neighbor sum the same
    * sorted fold.
    */
  def pagerankSql(iters: Int = 5, minCommon: Int = 12): String = {
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS (
         SELECT n.node,
                0.15 / CAST(nn.n_nodes AS DOUBLE) + 0.85 * COALESCE(s.s, 0.0) AS rank
         FROM nodes n CROSS JOIN nn
         LEFT JOIN (
           SELECT e.dst,
                  list_reduce(list_sort(list(r.rank / CAST(d.out_deg AS DOUBLE))),
                              (a, b) -> a + b) AS s
           FROM edges e
           JOIN r${k - 1} r ON e.src = r.node
           JOIN deg d ON e.src = d.src
           GROUP BY e.dst) s ON n.node = s.dst)"""
    }.mkString(",\n       ")
    s"""WITH ${graphCtesSql(minCommon)},
       edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
                 UNION ALL
                 SELECT doc_b AS src, doc_a AS dst FROM pairs),
       deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY 1),
       nodes AS (SELECT DISTINCT src AS node FROM edges),
       nn AS (SELECT count(*) AS n_nodes FROM nodes),
       r0 AS (SELECT node, 1.0 / CAST(n_nodes AS DOUBLE) AS rank
              FROM nodes CROSS JOIN nn),
       $iterCtes
       SELECT r.node AS doc_id, d.out_deg AS degree, round(r.rank, 6) AS pagerank
       FROM r$iters r JOIN deg d ON r.node = d.src"""
  }
}
