package graft.plans

import org.scalatest.funsuite.AnyFunSuite

/** Locks [[JaroWinkler]] to the RapidFuzz/DuckDB arithmetic conventions
  * the q_jaro_winkler oracle depends on (cross-checked bit-for-bit
  * against `jaro_winkler_similarity` on 52k fixture pairs when the
  * query landed).
  */
class JaroWinklerSpec extends AnyFunSuite {

  test("classic Winkler reference pair") {
    assert(JaroWinkler.jaro("martha", "marhta") == 0.9444444444444445)
    assert(JaroWinkler.similarity("martha", "marhta") == 0.9611111111111111)
  }

  test("integer-division transpositions (NOT the textbook half-count)") {
    // 3 half-transpositions: textbook t = 1.5 gives 0.6722…; the
    // RapidFuzz/DuckDB convention t = 3 / 2 = 1 gives exactly 0.7…
    assert(JaroWinkler.jaro("new plate", "cold plate") == 0.7000000000000001)
    // …which sits just above the 0.7 boost threshold: no common prefix,
    // so similarity equals jaro here
    assert(JaroWinkler.similarity("new plate", "cold plate") == 0.7000000000000001)
  }

  test("prefix boost only above the 0.7 threshold, prefix capped at 4") {
    val j = JaroWinkler.jaro("prefixes", "prefixed")
    assert(j > 0.7)
    assert(JaroWinkler.similarity("prefixes", "prefixed") == j + 0.1 * 4 * (1.0 - j))
  }

  test("degenerate inputs") {
    assert(JaroWinkler.similarity("", "") == 1.0)
    assert(JaroWinkler.similarity("a", "") == 0.0)
    assert(JaroWinkler.similarity("", "xyz") == 0.0)
    assert(JaroWinkler.similarity("abc", "abc") == 1.0)
    assert(JaroWinkler.similarity("abc", "xyz") == 0.0) // m = 0
  }

  test("identical under argument swap") {
    for ((a, b) <- Seq(("new plate", "cold plate"), ("martha", "marhta"), ("ab", "ba")))
      assert(JaroWinkler.similarity(a, b) == JaroWinkler.similarity(b, a))
  }
}
