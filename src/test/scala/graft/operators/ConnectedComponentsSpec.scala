package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Direct lock for the component operator on adversarial graph shapes —
  * the dedup-cluster oracle only sees the near-dup graph the corpus
  * happens to produce; these fixtures pin the shapes that break naive
  * implementations (chains for round counts, multiple components for
  * label leakage, the convergence guard for silent truncation).
  */
class ConnectedComponentsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def comps(edges: Seq[(Long, Long)], maxIters: Int = 25): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents
      .components(edges.toDF("src", "dst"), maxIters)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
  }

  test("two cliques and a bridge-less pair: labels never leak across components") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), // clique {1,2,3}
      (10L, 11L), (11L, 12L), // path {10,11,12}
      (20L, 21L)) // pair {20,21}
    assert(comps(edges) === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L))
  }

  test("chain graph: pointer jumping converges in O(log n) rounds, worst-case orientation") {
    // a 64-node chain rooted at the FAR end (min id last) is the
    // adversarial case for plain propagation (64 rounds); with pointer
    // jumping ~log2(64)+c rounds suffice — assert it converges well
    // under the default cap AND produces the single right component
    val n = 64L
    val edges = (0L until n - 1).map(i => (n - 1 - i, n - 2 - i)) // (63,62),(62,61),…
    val got = comps(edges, maxIters = 10)
    assert(got.size === n.toInt)
    assert(got.values.toSet === Set(0L))
  }

  test("non-convergence fails closed, not silently truncated") {
    val edges = (0L until 32L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](comps(edges, maxIters = 1))
    assert(e.getMessage.contains("did not converge"))
  }

  test("self-loops and duplicate edges are harmless") {
    val edges = Seq((5L, 5L), (5L, 6L), (6L, 5L), (5L, 6L))
    assert(comps(edges) === Map(5L -> 5L, 6L -> 5L))
  }

  test("id-permuted long chain: root hooking + stats reset hold the default round budget") {
    // The r10 regression pair. (1) ROUNDS: a long path whose vertex ids
    // are PERMUTED adversarially (an LCG scramble, so the min id sits
    // mid-chain and id order anti-correlates with path order) defeated
    // the old leaf-only hooking — minima crawled one hop per round and
    // the media star graph needed 40+ rounds; Shiloach–Vishkin root
    // hooking converges well inside the default 25. (2) STATS: enough
    // rounds ALSO used to hang the driver — localCheckpoint propagated
    // the plan's sizeInBytes and the pointer-jump self-join squared it
    // per round into million-bit BigIntegers (minutes per round in
    // canBroadcastBySize); the per-round stats reset keeps this test
    // finishing in seconds, not hours.
    val n = 2048L
    def perm(i: Long): Long = (i * 1103515245L + 12345L) % n // gcd(a, n)=1 → bijection
    val edges = (0L until n - 1).map(i => (perm(i), perm(i + 1)))
    val minId = (0L until n).map(perm).min
    // ROUNDS lock, not a clock: with root hooking this converges in
    // ~10 rounds; leaf-only hooking needed 40+ and would blow the cap
    // below via the fail-closed non-convergence throw. The stats-reset
    // regression is covered structurally (truncate() rebuilds each
    // checkpoint from its RDD) — a load-dependent wall-clock assert
    // here would be exactly the flake class r9 ask #7 closed.
    val got = comps(edges, maxIters = 15)
    assert(got.size === n.toInt)
    assert(got.values.toSet === Set(minId))
  }

  test("seeded random graphs match a local union-find") {
    // independent reference implementation: union-by-min keeps every
    // set's root at its minimum id, so find(v) IS the expected component
    val rnd = new scala.util.Random(20260812L)
    (0 until 5).foreach { trial =>
      val n = 60 + rnd.nextInt(60)
      val m = 20 + rnd.nextInt(120)
      val edges = Seq.fill(m)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val ra = find(a.toInt)
        val rb = find(b.toInt)
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val expected = verts.map(v => v -> find(v.toInt).toLong).toMap
      assert(comps(edges) === expected, s"trial $trial (n=$n, m=$m)")
    }
  }
}
