package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Rule-level behavior of the PII scrubber on hand-built strings, plus
  * the corpus-level invariants (span count ≡ n_* sums, redacted text
  * free of every pattern). The cross-engine value check is the DuckDB
  * oracle (q_pii_scrub); these tests pin the semantics locally.
  */
class PiiSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("pii-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def scrubOne(text: String): (Map[String, Seq[String]], String) = {
    import spark.implicits._
    val df = Seq(text).toDF("text")
    val matches = PiiQueries.matchColumns(col("text"))
    val row = df
      .select(
        matches.map { case (n, c) => c.as(n) } :+ PiiQueries.redact(col("text")).as("red"): _*)
      .head()
    val m = PiiQueries.rules.indices.map { i =>
      PiiQueries.rules(i)._1 -> row.getSeq[String](i).toSeq
    }.toMap
    (m, row.getString(PiiQueries.rules.length))
  }

  test("each rule finds its shape and redacts it") {
    val (m, red) = scrubOne(
      "mail a.user+tag@sub.example.co.uk or 12-345-678-9012, " +
        "from 192.168.0.1 id 123-45-6789 end")
    assert(m("email") === Seq("a.user+tag@sub.example.co.uk"))
    assert(m("phone") === Seq("12-345-678-9012"))
    assert(m("ip") === Seq("192.168.0.1"))
    assert(m("id") === Seq("123-45-6789"))
    assert(red === "mail [EMAIL] or [PHONE], from [IP] id [ID] end")
  }

  test("non-PII lookalikes stay untouched") {
    val (m, red) = scrubOne(
      "version 1.2.3 costs 12-34 at plainword@ not.an.ip.name x1-22-3333")
    assert(m.values.forall(_.isEmpty), m)
    assert(red.contains("version 1.2.3"))
    assert(red === "version 1.2.3 costs 12-34 at plainword@ not.an.ip.name x1-22-3333")
  }

  test("multiple matches per rule keep document order") {
    val (m, _) = scrubOne("b@x.com then a@y.org then 10.0.0.1 and 10.0.0.2")
    assert(m("email") === Seq("b@x.com", "a@y.org"))
    assert(m("ip") === Seq("10.0.0.1", "10.0.0.2"))
  }

  test("corpus query: counts reconcile with spans and redaction removes every match") {
    val df = PiiQueries.piiScrub(spark, "/root/testdata/sf0.001")
    val rows = df.collect()
    assert(rows.nonEmpty)
    val patterns = PiiQueries.rules.map(_._2.r)
    rows.foreach { r =>
      val total = Seq("n_email", "n_phone", "n_ip", "n_id")
        .map(f => r.getAs[Long](f))
        .sum
      val spans = r.getAs[String]("pii_spans")
      val spanCount = if (spans.isEmpty) 0L else spans.split("\\|").length.toLong
      assert(spanCount === total, s"doc ${r.getAs[Long]("doc_id")}: spans vs counts")
      val red = r.getAs[String]("redacted")
      patterns.foreach(p => assert(p.findFirstIn(red).isEmpty, s"unredacted match in: $red"))
    }
    // the injected fixture guarantees both match and no-match documents
    assert(rows.exists(_.getAs[Long]("n_email") > 0))
    assert(rows.exists(r => Seq("n_email", "n_phone", "n_ip", "n_id")
      .forall(f => r.getAs[Long](f) == 0L)))
  }
}
