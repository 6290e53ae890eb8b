package graft.functions

import scala.collection.mutable

/** Aho–Corasick multi-pattern automaton — single-pass substring counting
  * for blocklist / policy filtering over a corpus. One scan of the text
  * counts ALL patterns (O(len + matches)), where the naive alternative
  * is one `replace`/`instr` pass PER pattern (P full scans per
  * document — the cost the DuckDB oracle deliberately pays to verify
  * this from the other direction).
  *
  * Standard construction: goto trie over the pattern set, BFS failure
  * links, and per-node output sets pre-merged through the failure chain
  * (`out(n) = ends(n) ∪ out(fail(n))`), so the scan never walks fail
  * chains for reporting. Matches are counted at every position,
  * including overlaps BETWEEN different patterns; for borderless
  * patterns (no proper prefix that is also a suffix — the only kind the
  * shipped blocklist uses) this equals the non-overlapping count the
  * replace-based oracle computes.
  *
  * Serializable: the driver builds the automaton once from the pattern
  * list and ships it inside the UDF closure (one copy per task, same
  * pattern as the broadcast hash kernels); state is three flat arrays +
  * per-node child maps.
  */
final class AhoCorasick(val patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")

  private val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
  private val ends = mutable.ArrayBuffer(List.empty[Int])
  // trie construction
  patterns.zipWithIndex.foreach { case (p, pi) =>
    var node = 0
    p.foreach { c =>
      node = children(node).getOrElseUpdate(c, {
        children += mutable.Map.empty[Char, Int]
        ends += Nil
        children.size - 1
      })
    }
    ends(node) ::= pi
  }
  private val fail = new Array[Int](children.size)
  private val out = new Array[List[Int]](children.size)
  // BFS failure links + merged outputs
  locally {
    val queue = mutable.Queue.empty[Int]
    out(0) = ends(0)
    children(0).valuesIterator.foreach { c => fail(c) = 0; out(c) = ends(c); queue += c }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      children(u).foreach { case (ch, v) =>
        var f = fail(u)
        while (f != 0 && !children(f).contains(ch)) f = fail(f)
        fail(v) = if (children(f).contains(ch) && children(f)(ch) != v) children(f)(ch) else 0
        out(v) = ends(v) ++ out(fail(v))
        queue += v
      }
    }
  }

  /** Per-pattern match counts for `text` in one pass. */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.size)
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i)
      while (state != 0 && !children(state).contains(c)) state = fail(state)
      state = children(state).getOrElse(c, 0)
      out(state).foreach(pi => counts(pi) += 1)
      i += 1
    }
    counts
  }
}
