package graft.queries

/** Deterministic sampling predicates shared CHARACTER-FOR-CHARACTER
  * between the Spark plan and the DuckDB oracle — pure BIGINT
  * arithmetic, no engine hash function, so both engines select the
  * identical subset. The established pattern of q_chrf_sampled /
  * q_media_dedup_sampled: the exact query remains the contract, the
  * sampled sibling is the budgeted estimate a 100-TB run ships.
  */
object Sampling {

  /** 1-in-`k` pair sample keyed on a canonical (a, b) id pair,
    * overflow-free for ANY BIGINT ids: both ids are reduced mod 2²⁰
    * before packing (packed key < 2⁴⁰), then mod 2³¹ before the LCG
    * multiply (product < 2⁶²). The mix breaks the id-stride a bare
    * `(a + b) % k` would sample along.
    */
  def pairPred(a: String, b: String, k: Int): String =
    s"((((($a) % 1048576) * 1048576 + (($b) % 1048576)) % 2147483648" +
      s" * 1103515245 + 12345) % 2147483648) % $k = 0"

  /** 1-in-`k` VERTEX sample keyed on a single id — for ALL-PAIRS
    * kernels, where a pair-level predicate only prunes pairs after the
    * O(n²) enumeration has happened: sampling each SIDE 1-in-k shrinks
    * the enumeration itself to n²/k², the real budget lever. Pair
    * inclusion is uniform 1/k² (P(a)·P(b)), so totals scale by k²;
    * inclusions are correlated through shared endpoints (the standard
    * vertex-sampling trade — variance is higher on clique-heavy
    * structure than an independent pair sample of the same rate).
    */
  def idPred(a: String, k: Int): String =
    s"(((($a) % 2147483648) * 1103515245 + 12345) % 2147483648) % $k = 0"
}
