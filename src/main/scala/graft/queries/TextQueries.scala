package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis and deduplication operators over the `documents` table —
  * the LLM-training-pipeline surface (exact dedup, token statistics,
  * quality scores). Everything here is pure column expressions (codegen'd,
  * shuffle only where the semantics demand a group-by), so it scales to
  * 100 TB of documents as a single map + one small-key aggregation.
  */
object TextQueries {

  /** Exact deduplication by content hash (§LLM-ops): md5 over the raw
    * text, keep the smallest doc_id per hash. Scale: the only shuffle is
    * on the 128-bit hash — uniform keys, no skew; map-side partial agg
    * collapses duplicates early.
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS n_copies
       FROM documents GROUP BY 1"""

  /** Per-document token statistics (§LLM-ops text analysis): character
    * and whitespace-token counts, stopword hits, and a simple quality
    * score — all single-pass column expressions.
    */
  def textStats(s: SparkSession, dir: String): DataFrame = {
    val toks = size(split(col("text"), " ", -1)).cast("long")
    val theCount =
      ((length(col("text")) - length(regexp_replace(col("text"), " the ", ""))) / 5)
        .cast("long")
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        length(col("text")).cast("long").as("n_chars"),
        toks.as("n_tokens"),
        theCount.as("the_count"),
        round((length(col("text")).cast("double") / toks), 4).as("avg_token_span"))
  }

  /** The SQL mirror of the whitespace tokenizer's count — ONE definition
    * shared by [[textStatsSql]] and the curation oracle, so a tokenizer
    * change has a single SQL reflection.
    */
  private[queries] val nTokensSqlExpr: String = "len(string_split(text, ' '))"

  /** DuckDB oracle. Note `replace` vs Spark's `regexp_replace`: both do
    * non-overlapping left-to-right replacement of the literal ` the `, so
    * counts agree.
    */
  val textStatsSql: String =
    s"""SELECT doc_id, lang,
       length(text) AS n_chars,
       $nTokensSqlExpr AS n_tokens,
       CAST((length(text) - length(replace(text, ' the ', ''))) // 5 AS BIGINT) AS the_count,
       round(CAST(length(text) AS DOUBLE) / $nTokensSqlExpr, 4) AS avg_token_span
       FROM documents"""

  /** Corpus language/source profile: count + mean length per (lang,
    * source) — the "per-digitiser live stats" shape (§2.6 A5) applied to
    * documents.
    */
  def corpusProfile(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 4).as("mean_chars"),
        min(col("doc_id")).as("min_doc_id"))

  val corpusProfileSql: String =
    """SELECT lang, source, count(*) AS n_docs,
       round(avg(length(text)), 4) AS mean_chars,
       min(doc_id) AS min_doc_id
       FROM documents GROUP BY lang, source"""
}
