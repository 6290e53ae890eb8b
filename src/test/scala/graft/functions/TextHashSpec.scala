package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class TextHashSpec extends AnyFunSuite {

  private def jaccard(a: Set[String], b: Set[String]): Double =
    if (a.isEmpty && b.isEmpty) 0.0 else (a & b).size.toDouble / (a | b).size

  test("minhash estimates Jaccard within ±0.1 at 128 perms") {
    val rng = new Random(7)
    val vocab = (0 until 200).map(i => s"w$i")
    for (_ <- 0 until 20) {
      val base = rng.shuffle(vocab).take(80).toSet
      val keep = base.filter(_ => rng.nextDouble() < 0.7)
      val other = keep ++ rng.shuffle(vocab).take(30).toSet
      val trueJ = jaccard(base, other)
      val sa = TextHash.minhashSignature(base.toArray, 128)
      val sb = TextHash.minhashSignature(other.toArray, 128)
      val est = TextHash.estimatedJaccard(sa, sb)
      assert(math.abs(est - trueJ) < 0.12, s"est=$est true=$trueJ")
    }
  }

  test("identical sets agree on every minhash position; banding collides") {
    val sh = TextHash.shingles("spark scan filter join agg sort", 1)
    val s1 = TextHash.minhashSignature(sh, 128)
    val s2 = TextHash.minhashSignature(sh.reverse, 128)
    assert(s1.toSeq === s2.toSeq)
    assert(TextHash.bandKeys(s1, 16).toSeq === TextHash.bandKeys(s2, 16).toSeq)
  }

  test("minhash signature equals the naive perm-outer permHash construction") {
    // the hoisted-constant, shingle-outer kernel must be a pure loop
    // reshape of min over permHash(polyHash(s), i) — checked for several
    // sizes incl. an empty set (all-zero signature) and numPerms ≠ 128
    val rng = new Random(11)
    for (n <- Seq(0, 1, 7, 80); perms <- Seq(16, 128)) {
      val sh = Array.fill(n)(s"tok${rng.nextInt(500)}").distinct
      val fast = TextHash.minhashSignature(sh, perms)
      val naive = Array.tabulate(perms) { i =>
        val hs = sh.map(x => TextHash.permHash(TextHash.polyHash(x), i.toLong))
        if (hs.isEmpty) 0L else hs.min
      }
      assert(fast.toSeq === naive.toSeq, s"n=$n perms=$perms")
    }
  }

  test("simhash: similar documents have small hamming distance") {
    val base = (0 until 100).map(i => s"tok${i % 37}").mkString(" ")
    val nearDup = base + " extra token tail"
    val unrelated = (0 until 100).map(i => s"other${i}").mkString(" ")
    val h1 = TextHash.simhash32(base)
    val h2 = TextHash.simhash32(nearDup)
    val h3 = TextHash.simhash32(unrelated)
    assert(TextHash.hamming(h1, h2) < 6)
    assert(TextHash.hamming(h1, h3) > 10)
  }

  test("winnow: shared passages share fingerprints, edits preserve most") {
    val a = "the quick brown fox jumps over the lazy dog again and again today"
    val b = "PREFIX " + a + " SUFFIX"
    val fa = TextHash.winnow(a).toSet
    val fb = TextHash.winnow(b).toSet
    assert((fa & fb).size.toDouble / fa.size > 0.7)
    assert(TextHash.winnow("ab").nonEmpty) // shorter than k
  }

  test("shingles: n-grams and unigram distinctness") {
    assert(TextHash.shingles("a b c d", 2).toSeq === Seq("a b", "b c", "c d"))
    assert(TextHash.shingles("a b a b", 1).toSeq === Seq("a", "b"))
    assert(TextHash.shingles("a", 3).toSeq === Seq("a"))
  }

  test("md5Lower64 matches DuckDB's md5_number_lower convention") {
    // pinned against `SELECT md5_number_lower('abc')` in DuckDB — the
    // LSH oracle depends on both engines deriving the same 64 bits
    // (digest bytes 8..15, little-endian)
    assert(TextHash.md5Lower64("abc") === 8250560606382298838L)
    // and the [−1, 1) unit mapping uses only exact arithmetic: top 53
    // bits, a power-of-two division, an exact *2 and −1
    val u = TextHash.md5Unit("abc")
    assert(u >= -1.0 && u < 1.0)
    assert(u === ((8250560606382298838L >>> 11).toDouble / 9007199254740992.0) * 2.0 - 1.0)
  }

  test("bandKeys/estimatedJaccard fail closed on malformed shapes") {
    val sig = TextHash.minhashSignature(TextHash.shingles("a b c d e", 1), 128)
    // non-dividing bands would silently drop tail entries; bands beyond
    // the length degenerate every key to a constant (all-pairs blowup)
    intercept[IllegalArgumentException](TextHash.bandKeys(sig, 24))
    intercept[IllegalArgumentException](TextHash.bandKeys(sig, 0))
    intercept[IllegalArgumentException](TextHash.bandKeys(sig.take(16), 32))
    intercept[IllegalArgumentException](
      TextHash.estimatedJaccard(sig, sig.take(64)))
  }
}
