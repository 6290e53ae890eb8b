package graft.dsp

import graft.Sessions
import org.apache.spark.sql.functions._

/** Event-formation throughput envelope — the signature workload (D1/D2/D3
  * detectors over traces) measured in samples/s/core at the REFERENCE
  * trace shape: 30 k-bin traces (`simulator/README.md:58-59`) against the
  * 1 GS/s-per-digitiser ceiling a single reference digitiser can emit
  * (`simulator/src/main.rs:422`, BASELINE.md) — i.e. "how many cores keep
  * one digitiser live" per detector, for BOTH execution skins:
  *
  *   - typed: [[ChannelEvents.findChannelEvents]] inside a Dataset map —
  *     the path [[graft.operators.EventFormation]] runs in the streaming
  *     chain (pays row deserialisation + iterator boxing);
  *   - expr: the fused Catalyst expressions (`detect_pulses`,
  *     `detect_pulses_differential`, `detect_pulses_advanced`) reading
  *     the trace straight from Tungsten ArrayData.
  *
  * Method: ONE generated corpus (deterministic pulse comb with
  * exponential falls, so the advanced FSM walks all its phases), cached
  * before any timing so generation is excluded; each detector×path pass
  * counts events (forcing full detection) `FB_PASSES` times and reports
  * the median and best wall. A parity check asserts the two skins found
  * the SAME event count — throughput that changed the answer is not
  * throughput.
  *
  * Knobs (env): FB_MSGS (34000 ≈ 1.02e9 samples at 30 k), FB_SAMPLES
  * (30000), FB_PASSES (3), FB_OUT (/tmp/formation_bench.json). Emits one
  * JSON line; recorded in SCALE.md §Streaming.
  */
object FormationBench {

  def main(args: Array[String]): Unit = {
    val nMsgs = sys.env.getOrElse("FB_MSGS", "34000").toLong
    val nSamples = sys.env.getOrElse("FB_SAMPLES", "30000").toInt
    val passes = sys.env.getOrElse("FB_PASSES", "3").toInt
    val outPath = sys.env.getOrElse("FB_OUT", "/tmp/formation_bench.json")
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val spark = Sessions.local("formation-bench", cores.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    graft.plans.DetectPulses.register(spark)
    graft.plans.DetectPulsesDifferential.register(spark)
    graft.plans.DetectPulsesAdvanced.register(spark)

    // Deterministic 30 k-bin trace: a pulse every 1500 samples (20/trace
    // at the reference shape) with a 10-sample linear rise and ~80-sample
    // exponential fall — the muon shape the advanced chain's
    // baseline→smooth→derivative FSM needs to traverse all phases — over
    // small integer noise. Amplitude varies per (msg, pulse) so event
    // heights aren't constant.
    def trace(id: Long): Array[Int] = {
      val out = new Array[Int](nSamples)
      var i = 0
      while (i < nSamples) {
        out(i) = ((id * 31 + i * 7) % 5).toInt // noise well under threshold
        i += 1
      }
      var p = 750
      while (p + 120 < nSamples) {
        val amp = 200 + ((id + p) % 300).toInt
        var j = 0
        while (j < 10) { out(p + j) += amp * j / 10; j += 1 } // rise
        var k = 0
        var v = amp.toDouble
        while (k < 80) { out(p + 10 + k) += v.toInt; v *= 0.95; k += 1 } // fall
        p += 1500
      }
      out
    }

    val corpus = spark
      .range(0, nMsgs, 1, numPartitions = cores * 4)
      .map(id => (id, trace(id)))
      .toDF("id", "trace")
      .persist()
    val total = corpus.count() * nSamples // materialize the cache
    println(s"[formation-bench] corpus cached: $total samples")

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }

    // one definition per detector: (typed settings, expr SQL)
    val detectors: Seq[(String, DetectorSettings, String)] = Seq(
      (
        "threshold",
        DetectorSettings(FixedThreshold(40.0, 1, 0)),
        "detect_pulses(cast(trace as array<double>), 40.0D, 1, 0)"),
      (
        "differential",
        DetectorSettings(DifferentialThreshold(5.0, 1, 0)),
        "detect_pulses_differential(cast(trace as array<double>), 5.0D, 1, 0)"),
      (
        "advanced",
        DetectorSettings(AdvancedMuon(2.0, -2.0, -0.5, 0.0, Some(0), Some(3))),
        "detect_pulses_advanced(cast(trace as array<double>), " +
          "2.0D, -2.0D, -0.5D, 0.0D, 0, 3)"))

    val results = detectors.map { case (name, settings, exprSql) =>
      def typedPass(): Long = corpus
        .as[(Long, Array[Int])]
        .map { case (_, tr) =>
          ChannelEvents.findChannelEvents(tr, 1.0, settings)._1.length.toLong
        }
        .toDF("n")
        .agg(sum(col("n")))
        .head()
        .getLong(0)
      def exprPass(): Long = corpus
        .select(expr(s"size($exprSql)").cast("long").as("n"))
        .agg(sum(col("n")))
        .head()
        .getLong(0)

      val typedRuns = (1 to passes).map(_ => timed(typedPass()))
      val exprRuns = (1 to passes).map(_ => timed(exprPass()))
      val nTyped = typedRuns.head._2
      val nExpr = exprRuns.head._2
      // cross-skin parity: same corpus, same FSM, same count — a faster
      // path that finds different events is a broken path. The typed
      // skin applies the saturating u32 time cast, which cannot merge
      // events; counts must match exactly.
      require(
        nTyped == nExpr,
        s"$name: typed found $nTyped events, expr found $nExpr")
      def stats(runs: Seq[(Double, Long)]): (Double, Double) = {
        val ws = runs.map(_._1).sorted
        (ws(ws.size / 2), ws.head)
      }
      val (typedMed, typedBest) = stats(typedRuns)
      val (exprMed, exprBest) = stats(exprRuns)
      (name, nTyped, typedMed, typedBest, exprMed, exprBest)
    }

    corpus.unpersist()
    val fields = results
      .map { case (name, nEvents, tMed, tBest, eMed, eBest) =>
        val typedSpsCore = total / tMed / cores
        val exprSpsCore = total / eMed / cores
        f""""$name":{"events":$nEvents,""" +
          f""""typed_wall_sec":$tMed%.2f,"typed_wall_best_sec":$tBest%.2f,""" +
          f""""expr_wall_sec":$eMed%.2f,"expr_wall_best_sec":$eBest%.2f,""" +
          f""""typed_samples_per_sec_core":$typedSpsCore%.0f,""" +
          f""""expr_samples_per_sec_core":$exprSpsCore%.0f,""" +
          f""""expr_over_typed":${tMed / eMed}%.2f,""" +
          f""""cores_per_live_digitiser_expr":${1e9 / exprSpsCore}%.1f}"""
      }
      .mkString(",")
    val json =
      s"""{"metric":"formation_bench","total_samples":$total,"msgs":$nMsgs,""" +
        s""""samples_per_trace":$nSamples,"cores":$cores,"passes":$passes,$fields}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println(json)
    spark.stop()
  }
}
