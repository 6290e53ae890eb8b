package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Aho–Corasick automaton against a brute-force indexOf model —
  * randomized over small alphabets (dense overlap pressure), plus the
  * specific shapes failure links exist for: patterns inside patterns,
  * shared prefixes, matches through failure transitions, and the
  * borderless-pattern precondition the blocklist relies on.
  */
class AhoCorasickSpec extends AnyFunSuite {

  /** All-occurrence count (overlaps included) by sliding indexOf. */
  private def brute(text: String, p: String): Long = {
    var i = text.indexOf(p); var n = 0L
    while (i >= 0) { n += 1; i = text.indexOf(p, i + 1) }
    n
  }

  test("randomized: AC == brute force over a dense 3-letter alphabet") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 60) {
      val pats = (1 to (2 + rnd.nextInt(6)))
        .map(_ => Array.fill(1 + rnd.nextInt(4))(('a' + rnd.nextInt(3)).toChar).mkString)
        .distinct
      val ac = new AhoCorasick(pats)
      val text = Array.fill(200)(('a' + rnd.nextInt(3)).toChar).mkString
      val got = ac.countMatches(text)
      pats.zipWithIndex.foreach { case (p, i) =>
        assert(got(i) == brute(text, p), s"trial $trial pattern '$p' in '$text'")
      }
    }
  }

  test("nested and prefix-sharing patterns all counted (output-chain merge)") {
    val ac = new AhoCorasick(Seq("ab", "abab", "b", "ba"))
    val got = ac.countMatches("ababab")
    // ab: 0,2,4; abab: 0,2; b: 1,3,5; ba: 1,3
    assert(got.toSeq == Seq(3L, 2L, 3L, 2L))
  }

  test("match found THROUGH a failure transition") {
    // "bc" only matches after falling out of the "ab..." branch
    val ac = new AhoCorasick(Seq("abd", "bc"))
    assert(ac.countMatches("abc").toSeq == Seq(0L, 1L))
  }

  test("shipped blocklist patterns are all borderless") {
    import graft.queries.CurationQueries.BlocklistPatterns
    for (p <- BlocklistPatterns; k <- 1 until p.length)
      assert(p.take(k) != p.takeRight(k),
        s"'$p' has border '${p.take(k)}' — overlap counts would diverge from the oracle")
  }

  test("empty text and no-match text") {
    val ac = new AhoCorasick(Seq("xyz"))
    assert(ac.countMatches("").toSeq == Seq(0L))
    assert(ac.countMatches("aaaa").toSeq == Seq(0L))
  }
}
