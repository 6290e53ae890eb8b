package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection / redaction — the curation operator a training-data
  * pipeline runs before anything else ships: find email addresses, phone
  * numbers, IPv4 addresses, and national-ID-shaped tokens, report the
  * match spans, and emit a redacted text column.
  *
  * Design: a fixed, ordered rule table of (name, regex, replacement).
  * Rules are written in the common Java-regex ∩ RE2 dialect (no
  * lookaround, no backreferences) so the DuckDB oracle runs the *same*
  * patterns through `regexp_extract_all` / `regexp_replace(..., 'g')` —
  * the detection logic is verified cross-engine, not just exercised.
  *
  * Scale: one narrow projection over the corpus — `regexp_extract_all`,
  * `size`, `regexp_replace` are all codegen'd native expressions; zero
  * shuffles, zero UDFs, no driver participation. At 100 TB this is a
  * pure map stage that pipelines into whatever scan feeds it
  * (plan-locked in PlanAuditSpec: no Exchange anywhere in the plan).
  *
  * The synthetic `documents` corpus is PII-free word soup, so the query
  * augments it with deterministic, closed-form spans derived from
  * `doc_id` (emails on 3∣id, phones on 5∣id, IPs on 7∣id, SSN-shaped on
  * 11∣id) — the same fixture-augmentation idiom the detector chains use
  * with TraceFixtures: both engines derive the identical corpus, so
  * counts, spans, and the redacted text all hash-check, with both match
  * and no-match documents present.
  */
object PiiQueries {

  /** (rule name, pattern, replacement) — order is the application order
    * for redaction, and the concatenation order for the span list.
    */
  val rules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", "\\b\\d{2}-\\d{3}-\\d{3}-\\d{4}\\b", "[PHONE]"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("id", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[ID]")
  )

  /** Apply the rule table to `text`: per-rule match lists (document
    * order), and the sequentially redacted text. Pure column
    * expressions — reusable over any corpus.
    */
  def matchColumns(text: Column): Seq[(String, Column)] =
    rules.map { case (name, pat, _) =>
      name -> regexp_extract_all(text, lit(pat), lit(0))
    }

  def redact(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, pat, repl)) =>
      regexp_replace(c, lit(pat), lit(repl))
    }

  /** Deterministic PII-bearing corpus: `documents.text` plus closed-form
    * injected spans keyed on doc_id divisibility.
    */
  private def augmentedText: Column = {
    val id = col("doc_id")
    concat(
      col("text"),
      when(
        id % 3 === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.org now"))).otherwise(""),
      when(
        id % 5 === 0,
        concat(lit(" call 44-123-456-"), lpad((id % 10000).cast("string"), 4, "0"))).otherwise(""),
      when(
        id % 7 === 0,
        concat(lit(" host 10."), (id % 200).cast("string"), lit(".0."), (id % 250).cast("string")))
        .otherwise(""),
      when(
        id % 11 === 0,
        concat(
          lit(" ssn "),
          lpad((id % 1000).cast("string"), 3, "0"),
          lit("-"),
          lpad((id % 100).cast("string"), 2, "0"),
          lit("-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise("")
    )
  }

  def piiScrub(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .documents(s, dir)
      .select(col("doc_id"), augmentedText.as("text"))
    val matches = matchColumns(col("text"))
    val withLists = matches.foldLeft(base) { case (df, (name, c)) =>
      df.withColumn(s"m_$name", c)
    }
    withLists.select(
      col("doc_id") +:
        matches.map { case (name, _) => size(col(s"m_$name")).cast("long").as(s"n_$name") } :+
        array_join(
          concat(matches.map { case (name, _) => col(s"m_$name") }: _*),
          "|").as("pii_spans") :+
        redact(col("text")).as("redacted"): _*)
  }

  /** Oracle: same corpus derivation, same patterns, same application
    * order, in DuckDB's RE2 engine.
    */
  val piiScrubSql: String = {
    val aug =
      """text ||
         CASE WHEN doc_id % 3 = 0
              THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org now'
              ELSE '' END ||
         CASE WHEN doc_id % 5 = 0
              THEN ' call 44-123-456-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END ||
         CASE WHEN doc_id % 7 = 0
              THEN ' host 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.' || CAST(doc_id % 250 AS VARCHAR)
              ELSE '' END ||
         CASE WHEN doc_id % 11 = 0
              THEN ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' ||
                   lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE '' END"""
    // DuckDB single-quoted strings take backslashes literally, so the
    // patterns embed as-is (none contain a quote)
    val matchExprs = rules
      .map { case (name, pat, _) => s"regexp_extract_all(text, '$pat') AS m_$name" }
    val redactExpr = rules.foldLeft("text") { case (e, (_, pat, repl)) =>
      s"regexp_replace($e, '$pat', '$repl', 'g')"
    }
    s"""WITH aug AS (SELECT doc_id, $aug AS text FROM documents),
       m AS (SELECT doc_id, text, ${matchExprs.mkString(", ")} FROM aug)
       SELECT doc_id,
              ${rules.map { case (n, _, _) => s"len(m_$n)::BIGINT AS n_$n" }.mkString(", ")},
              COALESCE(array_to_string(${rules
      .map { case (n, _, _) => s"m_$n" }
      .mkString(" || ")}, '|'), '') AS pii_spans,
              $redactExpr AS redacted
       FROM m"""
  }

  /** Right-to-be-forgotten erasure audit — the compliance artifact a
    * deletion pipeline must emit: for the delete cohort (user/customer
    * keys ≡ 0 mod 13), each affected table's before/purged/after row
    * counts plus an integrity checksum over the RETAINED rows (so the
    * run is verifiable without re-reading the purged data, and a
    * partial purge or over-delete is visible as a count/checksum
    * mismatch on the next audit). Purges are key-based left-anti
    * joins — one shuffle per table on the erasure key, no full-table
    * rewrite semantics implied.
    */
  def erasureAudit(s: SparkSession, dir: String): DataFrame = {
    def leg(
        name: String,
        df: org.apache.spark.sql.DataFrame,
        key: Column,
        checksum: Column): DataFrame = {
      val tagged = df.select(key.as("k"), checksum.as("cs"))
      tagged
        .agg(
          lit(name).as("entity"),
          count(lit(1)).as("n_before"),
          sum(when(col("k") % 13 === 0, 1L).otherwise(0L)).as("n_purged"),
          sum(when(col("k") % 13 =!= 0, 1L).otherwise(0L)).as("n_after"),
          sum(when(col("k") % 13 =!= 0, col("cs")).otherwise(0L)).as("retained_checksum"))
    }
    val events = leg(
      "events",
      graft.Tables.events(s, dir),
      col("user_id"),
      col("event_id") * 31 + round(col("value") * 100).cast("long"))
    val customers = leg(
      "customer",
      graft.Tables.customer(s, dir),
      col("c_custkey"),
      col("c_custkey") * 31 + round(col("c_acctbal") * 100).cast("long"))
    events
      .unionByName(customers)
      .select("entity", "n_before", "n_purged", "n_after", "retained_checksum")
  }

  val erasureAuditSql: String =
    """SELECT 'events' AS entity, count(*) AS n_before,
              CAST(sum(CASE WHEN user_id % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_purged,
              CAST(sum(CASE WHEN user_id % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_after,
              CAST(sum(CASE WHEN user_id % 13 <> 0
                            THEN event_id * 31 + CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS retained_checksum
       FROM events
       UNION ALL
       SELECT 'customer', count(*),
              CAST(sum(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN c_custkey % 13 <> 0 THEN 1 ELSE 0 END) AS BIGINT),
              CAST(sum(CASE WHEN c_custkey % 13 <> 0
                            THEN c_custkey * 31 + CAST(round(c_acctbal * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT)
       FROM customer"""
}
