package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property lock on the shared quantizers ([[Quantize]]) at extreme
  * magnitudes — the r12 sf1 sweep's floor-saturation class, pinned so
  * it can never silently reappear:
  *
  *  - q6 is EXACT against a Scala double reference for |x| below the
  *    BIGINT floor bound (~9.2e12), and observably SATURATED above it —
  *    if a Spark upgrade ever turns the silent clamp into a loud ANSI
  *    error, the saturation assert fails and the domain rule on
  *    [[Quantize]] gets re-audited rather than drifting stale.
  *  - q6u matches the double-domain reference at EVERY magnitude
  *    1e0…1e19 (no saturation, graceful 2⁵³ pass-through).
  *  - the Column form and the SQL-string form (the one embedded in
  *    DuckDB oracles) evaluate identically in Spark, so the two mirrors
  *    cannot drift apart.
  */
class QuantizerSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("quantizer-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  // magnitudes 1e0…1e19 with non-trivial mantissas, plus the bound's
  // edges; negatives only within q6's symmetric small-value domain
  private val smallXs: Seq[Double] =
    (0 to 12).flatMap(e => Seq(1.0, 1.2345678901, 7.77)
      .map(m => m * math.pow(10, e))).flatMap(x => Seq(x, -x)) ++
      Seq(0.0, 0.4999994, -0.4999994, 123.4567891, 9.0e12)
  private val hugeXs: Seq[Double] =
    (13 to 19).flatMap(e => Seq(1.0, 1.2345678901, 7.77)
      .map(m => m * math.pow(10, e))) ++ Seq(9.3e12, 1.8e16, 9.2e18)

  private def refQ6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
  private def refQ6u(x: Double): Double = {
    val y = x * 1e6 + 0.5
    (y - y % 1.0) / 1e6
  }

  private def eval(xs: Seq[Double], build: String => String): Seq[Double] = {
    import spark.implicits._
    xs.toDF("x").selectExpr(build("x")).as[Double].collect().toSeq
  }

  test("q6: exact vs Scala reference across |x| <= 9.2e12; SQL == Column") {
    import spark.implicits._
    val df = smallXs.toDF("x")
    val got = df.select(Quantize.q6(col("x"))).as[Double].collect().toSeq
    val sql = eval(smallXs, x => Quantize.q6Sql(x))
    smallXs.indices.foreach { i =>
      assert(got(i) == refQ6(smallXs(i)), s"q6(${smallXs(i)})")
      assert(sql(i) == got(i), s"q6Sql drifted from q6 at ${smallXs(i)}")
    }
  }

  test("q6: observably saturated past the BIGINT bound (domain rule is real)") {
    val got = eval(hugeXs, x => Quantize.q6Sql(x))
    val sat = Long.MaxValue / 1e6
    hugeXs.indices.foreach { i =>
      // every x >= 9.3e12 clamps to exactly Long.MaxValue/1e6 — the
      // silent divergence the q6 domain rule exists to keep out of
      // unbounded-magnitude sites
      assert(got(i) == sat, s"q6(${hugeXs(i)}) = ${got(i)} — clamp changed; " +
        "re-audit the Quantize domain rules")
    }
  }

  test("q6u: exact at every magnitude 1e0…1e19; SQL == Column") {
    import spark.implicits._
    val xs = smallXs.filter(_ >= 0.0) ++ hugeXs
    val df = xs.toDF("x")
    val got = df.select(Quantize.q6u(col("x"))).as[Double].collect().toSeq
    val sql = eval(xs, x => Quantize.q6uSql(x))
    xs.indices.foreach { i =>
      assert(got(i) == refQ6u(xs(i)), s"q6u(${xs(i)}) = ${got(i)}")
      assert(sql(i) == got(i), s"q6uSql drifted from q6u at ${xs(i)}")
    }
  }

  test("q6 and q6u agree on the shared domain (0 <= x <= 9.2e12)") {
    val xs = smallXs.filter(_ >= 0.0)
    val a = eval(xs, x => Quantize.q6Sql(x))
    val b = eval(xs, x => Quantize.q6uSql(x))
    xs.indices.foreach(i => assert(a(i) == b(i), s"disagree at ${xs(i)}"))
  }
}
