package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-lint (VERDICT r7): the README/COVERAGE query counts are derived
  * from [[SparkEntry]] itself, so documentation drift fails the build
  * instead of under- or over-claiming to the first reader.
  */
class DocLintSpec extends AnyFunSuite {

  private def read(name: String): String =
    new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(name)),
      "UTF-8")

  private val total = SparkEntry.queries.size
  private val oracled = SparkEntry.oracleNames.count(SparkEntry.queries.contains)

  test("oracle registry is consistent with the query registry") {
    val orphans = SparkEntry.oracleNames.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracles without a query: $orphans")
    assert(SparkEntry.dynamicOracleNames.subsetOf(SparkEntry.queries.keySet))
    // since r10 every query carries an oracle — the e2e bench units run
    // on the closed-form arithmetic grid and hash-match like the rest
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleNames)
    assert(unoracled.isEmpty, s"unexpected unoracled queries: $unoracled")
  }

  test("README.md carries the current query/oracle counts") {
    val readme = read("README.md")
    val want = s"currently $total queries, $oracled with\n  exact DuckDB oracles"
    assert(readme.contains(want),
      s"README.md counts drifted — update to: '$want' " +
        s"(queries=$total, oracled=$oracled)")
  }

  test("COVERAGE.md carries the current counts and no stale oracle claims") {
    val coverage = read("COVERAGE.md")
    assert(!coverage.contains("deliberately not oracled"),
      "COVERAGE.md still claims an operator is unoracled — D3/D4 have " +
        "been hash-matched since r6; re-check every 'not oracled' row")
    val countClaims = "(\\d+) oracle-backed".r
      .findAllMatchIn(coverage).map(_.group(1).toInt).toSeq
    countClaims.foreach { n =>
      assert(n == oracled,
        s"COVERAGE.md claims $n oracle-backed queries; code has $oracled")
    }
  }
}
