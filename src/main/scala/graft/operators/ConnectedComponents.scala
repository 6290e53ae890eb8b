package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the clustering backbone of the near-dup surface
  * ([[graft.queries.DedupQueries.dedupClusters]]), reusable for any
  * "group the pair graph" task (entity resolution, dedup survivors,
  * record linkage).
  *
  * Algorithm (Shiloach–Vishkin shape since r10): per round, (1)
  * neighbor-min label propagation, (2) HOOKING AT THE ROOT — every
  * member of a component adopts the component-wide minimum candidate
  * via one groupBy(comp) + join — and (3) pointer jumping
  * (`comp ← comp(comp)`). Root hooking is what makes convergence
  * O(log n) rounds on chain-shaped graphs: with leaf-only hooking a
  * new minimum enters a tree at its leaves and crawls up one hop per
  * round (measured ~40+ rounds on the r10 media star graph vs ~10
  * after). Each round is three keyed joins + two aggregations; the
  * round's labeling is CHECKPOINTED
  * (`localCheckpoint`), not merely persisted — iterative plans that only
  * cache still accumulate one round of lineage per iteration and
  * Catalyst re-analysis goes super-linear (measured: persist-only made
  * 10 rounds take minutes; checkpointing makes them seconds). The driver
  * sees only one scalar per round — the changed-label count, collected
  * as an `observe()` metric DURING the checkpoint job so each round is
  * exactly one Spark job (control plane, not row data; measured ~12%
  * off the loop vs a separate count job). On a cluster, swap
  * localCheckpoint for reliable
  * `checkpoint` (HDFS-backed) so a lost executor does not lose the
  * labeling; the round structure is unchanged.
  *
  * Fails closed on non-convergence: a truncated labeling would split one
  * real component into several, which silently corrupts any downstream
  * "one survivor per component" logic. Rounds grow ~log₂(component
  * diameter), so hitting the cap means the graph needs a larger
  * `maxIters`, not a quietly wrong answer.
  */
object ConnectedComponents {

  /** One default for every caller (the dedup surface forwards it) so
    * the operator owns the convergence budget.
    */
  val DefaultMaxIters: Int = 25

  /** Free the block-manager storage behind a `localCheckpoint`'d frame.
    * `Dataset.unpersist` only reaches cache-manager entries — a
    * checkpoint's internal RDD is not one — so without this, every
    * superseded round labeling would sit in executor storage until
    * nondeterministic driver GC lets ContextCleaner reap it.
    */
  private def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Checkpoint a round labeling AND reset its size statistics.
    *
    * `localCheckpoint` truncates lineage but PROPAGATES the child
    * plan's sizeInBytes estimate onto the checkpointed node
    * (`LogicalRDD.rewriteStatsAndConstraints`). In this loop the
    * pointer-jump SELF-JOIN then squares that estimate every round —
    * the BigInt doubles in bit-length per iteration, and after ~15
    * rounds the optimizer spends minutes per round multiplying
    * million-bit integers inside `canBroadcastBySize` (observed r10 on
    * the media star graph: a 6,471-edge input hung for >8 minutes on
    * the DRIVER while every executor sat idle). Rebuilding the frame
    * from the checkpointed RDD resets the estimate to the default;
    * static planning then picks sort-merge inside the loop and AQE
    * re-plans to broadcast at runtime from ACTUAL shuffle sizes — the
    * decision that matters at any scale. (GraphFrames ships the same
    * reset as `getCachedDataFrame` for exactly this loop shape.)
    *
    * Returns (stats-reset frame, checkpoint owner) — `freeCheckpoint`
    * must target the OWNER: the wrapper's own LogicalRDD holds the
    * Row-conversion RDD, not the checkpointed blocks.
    */
  private def truncate(df: DataFrame): (DataFrame, DataFrame) = {
    val cp = df.localCheckpoint()
    (cp.sparkSession.createDataFrame(cp.rdd, cp.schema), cp)
  }

  /** @param edges  undirected edge list with two Long columns named
    *               `src` and `dst` (each edge listed once; both
    *               directions are derived internally)
    * @return one row per vertex appearing in `edges`: `(id, component)`
    *         where `component` is the minimum vertex id reachable.
    *         The result is checkpointed; storage is released when the
    *         session's ContextCleaner reaps it after the caller drops it.
    */
  def components(edges: DataFrame, maxIters: Int = DefaultMaxIters): DataFrame = {
    // loop shuffles are tiny (one narrow row per vertex) — AQE coalesces
    // them; the measured cost per round is job scheduling + checkpoint
    // I/O, not shuffle width, so no partition override here
    val directed = edges
      .select(col("src").as("a"), col("dst").as("b"))
      .unionByName(edges.select(col("dst").as("a"), col("src").as("b")))
      .persist()
    var propagated: DataFrame = null
    var hooked: DataFrame = null
    // try/finally so a mid-loop failure (or the non-convergence throw
    // below) cannot leak persisted blocks into a long-lived session
    try {
      // initial labeling folds the first neighbor-min step into the
      // vertex-dedup shuffle: comp₀(v) = min(v, min neighbor) — the
      // distinct() this replaces was a groupBy on the same key doing no
      // useful work, so round 1 comes free (this job also materializes
      // the `directed` persist — no separate warm-up count)
      var (labels, labelsCp) = truncate(
        directed
          .groupBy(col("a"))
          .agg(min(col("b")).as("nmin"))
          .select(col("a").as("id"), least(col("a"), col("nmin")).as("comp")))
      var changed = 1L
      var i = 0
      while (changed > 0 && i < maxIters) {
        // step 1: neighbor-min — cand(v) = min(comp(v), min of neighbor
        // comps). Persisted: it feeds both the root-min aggregate and
        // the hook join.
        val neighborMin = directed
          .join(labels.select(col("id").as("b"), col("comp").as("comp_b")), Seq("b"))
          .groupBy(col("a"))
          .agg(min(col("comp_b")).as("nmin"))
          .select(col("a").as("id"), col("nmin"))
        propagated = labels
          .join(neighborMin, Seq("id"), "left")
          .select(
            col("id"),
            col("comp"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("cand"))
          .persist()
        // step 2: hook at the ROOT (Shiloach–Vishkin hooking): every
        // member of a component adopts the component-wide minimum
        // candidate in one groupBy + join. Leaf-only hooking (the r1–r9
        // loop updated comp(v) but never comp of v's whole tree) makes
        // new minima enter a tree at its leaves and crawl up one hop
        // per round — measured ~40+ rounds on the r10 media star graph
        // where this converges in ~10.
        val rootMin = propagated
          .groupBy(col("comp"))
          .agg(min(col("cand")).as("rmin"))
        // persisted: hooked feeds BOTH sides of the pointer-jump
        // self-join below — unpersisted, the rootMin aggregate + hook
        // join subtree executes twice per round (ReuseExchange dedups
        // only the shuffles)
        hooked = propagated
          .join(rootMin, Seq("comp"))
          .select(col("id"), col("rmin").as("comp"), col("comp").as("prev"))
          .persist()
        // step 3: pointer jump — comp(v) ← comp(comp(v)); comp values
        // are themselves vertex ids (invariant: comp(v) ≤ v), so the
        // self-join resolves one indirection level and halves tree
        // depth per round. The changed-label count is an observe()
        // metric collected WHILE the checkpoint job materializes the
        // rows — one job per round, not a checkpoint plus a count job.
        val obs = new org.apache.spark.sql.Observation(s"cc_round_$i")
        // truncate(): lineage cut to one round AND size stats reset —
        // without the reset the self-join above squares the estimate
        // every round (see [[truncate]])
        val (updated, updatedCp) = truncate(
          hooked
            .join(
              hooked.select(col("id").as("comp"), col("comp").as("comp2")),
              Seq("comp"),
              "left")
            .select(
              col("id"),
              least(col("comp"), coalesce(col("comp2"), col("comp"))).as("comp"),
              col("prev"))
            .observe(
              obs,
              coalesce(sum(when(col("comp") < col("prev"), 1L).otherwise(0L)), lit(0L))
                .as("changed"))
            .select(col("id"), col("comp"))) // prev served the metric only
        changed = obs.get("changed").asInstanceOf[Long]
        propagated.unpersist()
        propagated = null
        hooked.unpersist()
        hooked = null
        // the superseded labeling's checkpoint blocks are dead now —
        // free them eagerly so storage holds 2 labelings, not maxIters
        freeCheckpoint(labelsCp)
        labels = updated
        labelsCp = updatedCp
        i += 1
      }
      require(
        changed == 0,
        s"connected components did not converge in $maxIters rounds " +
          s"($changed labels still changing) — raise maxIters for this graph")
      labels.select(col("id"), col("comp").as("component"))
    } finally {
      if (propagated != null) propagated.unpersist()
      if (hooked != null) hooked.unpersist()
      directed.unpersist()
    }
  }
}
