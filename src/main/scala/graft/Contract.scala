package graft

/** Machine-readable scale-contract class for one board query
  * (VERDICT r15 ask #5).
  *
  * The contract class of each query — which growth law its OUTPUT
  * obeys by construction, and therefore whether it belongs in a
  * big-scale-factor law sweep — used to live in scaladoc and SCALE.md
  * prose, with the sf10 exclusion list hand-maintained in an env var.
  * This manifest is the single source of truth: [[SparkEntry.contracts]]
  * covers every registered query, DocLintSpec locks it against the
  * query registry, and [[Bench]] (`SPARK_GRAFT_SWEEP=1`) and
  * `tools/bench_ratio.py` derive the sweep skip set from it instead of
  * a hand-typed list.
  *
  * @param cls        one of [[Contract.Linear]],
  *                   [[Contract.QuadraticByContract]],
  *                   [[Contract.SampledSibling]], [[Contract.OutputLaw]],
  *                   [[Contract.Streaming]]
  * @param sweepBigSf whether the query runs in big-SF (sf10) single-pass
  *                   law sweeps. False only for the by-contract
  *                   quadratic pair lists, whose ~100× wall on a 10×
  *                   step is their documented output law, not a plan
  *                   property — each is law-verified at sf2 instead and
  *                   has linear production siblings plus a sampled
  *                   sibling ON the sweep.
  * @param sibling    for sampled siblings: the exact kernel they shrink;
  *                   for excluded quadratics: the sampled sibling that
  *                   keeps their law measurable in-sweep.
  * @param note       the one-line adjudication (expected sweep ratio,
  *                   production siblings, SCALE.md section).
  */
final case class Contract(
    cls: String,
    sweepBigSf: Boolean,
    sibling: Option[String] = None,
    note: String = "")

object Contract {

  /** Wall scales ~linearly (or better) with corpus size; no caveat. */
  val Linear = "linear"

  /** The OUTPUT (a pair list) is quadratic in the corpus by the query's
    * own contract — no plan can beat its output cardinality. Excluded
    * from big-SF sweeps; law-verified at sf2; linear production
    * siblings carry the 100-TB path.
    */
  val QuadraticByContract = "quadratic-by-contract"

  /** Deterministic sampled shrink of an exact kernel ([[Contract.sibling]]).
    * Inherits the parent's growth law at a CONSTANT shrink factor, so it
    * stays on the sweep precisely to make that law measurable on a
    * budget (e.g. q_dedup_embedding_sampled: K²=9 shrink of the n²
    * kernel — expected ~100× on a 10× step, adjudicated 77.9× at sf10).
    */
  val SampledSibling = "sampled-sibling"

  /** Output cardinality itself grows super-linearly on the synthetic
    * fixture (a data property, not a plan property); the wall grows
    * SLOWER than the output, which is the soundness criterion. Stays on
    * the sweep with the expected ratio recorded in [[Contract.note]].
    */
  val OutputLaw = "output-law"

  /** Structured-Streaming drain-batch harness: wall includes a fixed
    * per-query streaming-engine overhead (trigger scheduling, state
    * store commit), so small-SF walls are floor-bounded and cross-SF
    * ratios read LOW, not high.
    */
  val Streaming = "streaming"

  val classes: Set[String] =
    Set(Linear, QuadraticByContract, SampledSibling, OutputLaw, Streaming)
}
