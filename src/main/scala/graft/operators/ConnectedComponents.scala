package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an undirected edge list —
  * the clustering backbone of the near-dup surface
  * ([[graft.queries.DedupQueries.dedupClusters]]), reusable for any
  * "group the pair graph" task (entity resolution, dedup survivors,
  * record linkage).
  *
  * Algorithm: iterative min-label propagation PLUS pointer jumping
  * (`comp ← comp(comp)`) each round, so convergence is O(log n) rounds
  * even on chain-shaped graphs (plain propagation is O(diameter) — a
  * 1M-node chain would need 1M rounds). Each round is two keyed joins +
  * one aggregation; the round's labeling is CHECKPOINTED
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
    // try/finally so a mid-loop failure (or the non-convergence throw
    // below) cannot leak persisted blocks into a long-lived session
    try {
      // initial labeling folds the first neighbor-min step into the
      // vertex-dedup shuffle: comp₀(v) = min(v, min neighbor) — the
      // distinct() this replaces was a groupBy on the same key doing no
      // useful work, so round 1 comes free (this job also materializes
      // the `directed` persist — no separate warm-up count)
      var labels = directed
        .groupBy(col("a"))
        .agg(min(col("b")).as("nmin"))
        .select(col("a").as("id"), least(col("a"), col("nmin")).as("comp"))
        .localCheckpoint()
      var changed = 1L
      var i = 0
      while (changed > 0 && i < maxIters) {
        // step 1: neighbor-min — comp(v) ← min(comp(v), min of neighbors)
        val neighborMin = directed
          .join(labels.select(col("id").as("b"), col("comp").as("comp_b")), Seq("b"))
          .groupBy(col("a"))
          .agg(min(col("comp_b")).as("nmin"))
          .select(col("a").as("id"), col("nmin"))
        // persisted: it feeds BOTH sides of the pointer-jump self-join —
        // unpersisted, the whole neighbor-min subtree executes twice per
        // round (ReuseExchange dedups only the shuffles). The round's
        // starting label rides along as `prev` so convergence detection
        // is a row-level comparison inside the round's own job.
        propagated = labels
          .join(neighborMin, Seq("id"), "left")
          .select(
            col("id"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
            col("comp").as("prev"))
          .persist()
        // step 2: pointer jump — comp(v) ← comp(comp(v)); comp values are
        // themselves vertex ids (invariant: comp(v) ≤ v), so the self-join
        // resolves one indirection level and halves tree depth per round.
        // The changed-label count is an observe() metric collected WHILE
        // the checkpoint job materializes the rows — one job per round,
        // not a checkpoint job plus a count job.
        val obs = new org.apache.spark.sql.Observation(s"cc_round_$i")
        val updated = propagated
          .join(
            propagated.select(col("id").as("comp"), col("comp").as("comp2")),
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
          .select(col("id"), col("comp")) // prev served the metric only
          .localCheckpoint() // truncate lineage: one round of plan, not i rounds
        changed = obs.get("changed").asInstanceOf[Long]
        propagated.unpersist()
        propagated = null
        // the superseded labeling's checkpoint blocks are dead now —
        // free them eagerly so storage holds 2 labelings, not maxIters
        freeCheckpoint(labels)
        labels = updated
        i += 1
      }
      require(
        changed == 0,
        s"connected components did not converge in $maxIters rounds " +
          s"($changed labels still changing) — raise maxIters for this graph")
      labels.select(col("id"), col("comp").as("component"))
    } finally {
      if (propagated != null) propagated.unpersist()
      directed.unpersist()
    }
  }
}
