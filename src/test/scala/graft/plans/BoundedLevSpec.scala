package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Locks [[BoundedLev]] to the builtin 3-arg `levenshtein` contract:
  * identical distance when ≤ k, identical −1 when over, across random
  * strings (including indel shapes, shared prefixes/suffixes, empty and
  * multi-byte inputs), in both the interpreted and codegen paths.
  */
class BoundedLevSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("boundedlev-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def ref(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("dist: agrees with a reference DP across a deterministic random corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "ab0123"
    def randStr(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = Seq.newBuilder[(String, String)]
    for (_ <- 1 to 500) {
      val a = randStr(rnd.nextInt(20))
      // near variants: substitutions, deletions, insertions on a
      val b = rnd.nextInt(3) match {
        case 0 => randStr(rnd.nextInt(20))
        case 1 =>
          val sb = new StringBuilder(a)
          for (_ <- 0 to rnd.nextInt(3); if sb.nonEmpty)
            sb.setCharAt(rnd.nextInt(sb.length), alphabet(rnd.nextInt(alphabet.length)))
          sb.toString
        case 2 =>
          val sb = new StringBuilder(a)
          for (_ <- 0 to rnd.nextInt(2); if sb.nonEmpty) sb.deleteCharAt(rnd.nextInt(sb.length))
          sb.toString
      }
      cases += ((a, b))
    }
    cases += (("", "")) += (("", "abc")) += (("same", "same"))
    cases += (("Customer#000000123", "Customer#000000124"))
    cases += (("Customer#000012345", "Customer#000123450")) // shift (indel) pair
    for ((a, b) <- cases.result(); k <- 0 to 4) {
      val expect = { val d = ref(a, b); if (d <= k) d else -1 }
      val got = BoundedLev.dist(UTF8String.fromString(a), UTF8String.fromString(b), k)
      assert(got == expect, s"dist('$a','$b',$k): got $got want $expect")
    }
  }

  test("dist: multi-byte input falls back to char-level semantics") {
    for ((a, b, k) <- Seq(("héllo", "hällo", 2), ("ünïcødé", "unicode", 7), ("日本語", "日本", 2))) {
      val expect = { val d = ref(a, b); if (d <= k) d else -1 }
      assert(BoundedLev.dist(UTF8String.fromString(a), UTF8String.fromString(b), k) == expect,
        s"($a,$b,$k)")
    }
  }

  test("SQL surface: bounded_lev matches builtin levenshtein(a,b,k) on the customer names") {
    BoundedLev.register(spark)
    import spark.implicits._
    val c = graft.Tables
      .customer(spark, "/root/testdata/sf0.001")
      .select(col("c_custkey"), col("c_name"))
    val pairs = c
      .crossJoin(c.select(col("c_custkey").as("k2"), col("c_name").as("n2")))
      .filter(col("c_custkey") < col("k2"))
      .limit(20000)
    val diff = pairs
      .select(
        expr("bounded_lev(c_name, n2, 2)").as("mine"),
        levenshtein(col("c_name"), col("n2"), 2).as("builtin"))
      .filter(col("mine") =!= col("builtin"))
      .count()
    assert(diff == 0L)
  }
}
