package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-function ↔ Scala-kernel parity: LogTables.strip is the
  * codegen'd `substring_index` built-in, and must agree with the P9
  * reference semantics in [[TimeFunctions.removePrefixes]] on every
  * shape of source name.
  */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("functions-spec", "2")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  test("strip column ≡ removePrefixes kernel (P9, incl. multi-marker and edge names)") {
    import spark.implicits._
    val names = Seq(
      "FE:SB1:CS:SB:temp",
      "A:CS:SB:B:CS:SB:C", // multi-marker: LAST marker wins
      ":CS:SB:",           // marker only → empty remainder
      ":CS:SB:x",
      "plain_name",        // no marker → pass-through
      "",
      "CS:SB",             // partial marker → pass-through
      "nested:CS:SB")
    val got = names
      .toDF("name")
      .select(graft.operators.LogTables.strip(col("name")))
      .collect()
      .map(_.getString(0))
    assert(got.toSeq === names.map(TimeFunctions.removePrefixes))
  }
}
