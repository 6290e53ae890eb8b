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

  /** Chi-squared test of association between `lang` and `source` — is the
    * corpus mix independent, or do sources specialise by language? Emits
    * the full contingency table (observed, expected, per-cell χ²
    * contribution) with the corpus-level χ², degrees of freedom, and
    * Cramér's V attached — the composition-drift monitor a curation
    * pipeline runs per ingest batch.
    *
    * Oracle parity: per-cell contributions are rounded to 6 dp, and the
    * corpus χ² is a SORTED fold of those rounded cells
    * (`aggregate(array_sort(collect_list(…)))` ↔ DuckDB
    * `list_reduce(list_sort(list(…)))`), so the float reduction is
    * order-identical across engines.
    *
    * Scale: documents is scanned ONCE into the (lang, source) counts —
    * one tiny-key shuffle with map-side partial agg; everything after
    * operates on |langs|×|sources| rows (broadcast joins, a bounded
    * collect_list), driver-size by construction.
    */
  def chi2Assoc(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables
      .documents(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_obs"))
      .persist()
    val rowTot = obs.groupBy(col("lang")).agg(sum(col("n_obs")).as("lang_tot"))
    val colTot = obs.groupBy(col("source")).agg(sum(col("n_obs")).as("source_tot"))
    val tot = obs.agg(
      sum(col("n_obs")).as("n_total"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    // the FULL lattice, zero-observation cells included — dropping empty
    // cells silently understates χ² (their contribution is `expected`)
    val cells = rowTot
      .crossJoin(colTot)
      .join(obs, Seq("lang", "source"), "left")
      .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn(
        "expected",
        round(
          col("lang_tot").cast("double") * col("source_tot").cast("double")
            / col("n_total").cast("double"),
          6))
      .withColumn(
        "contrib",
        round(
          (col("n_obs").cast("double") - col("expected"))
            * (col("n_obs").cast("double") - col("expected")) / col("expected"),
          6))
    val chi2 = cells.agg(
      aggregate(
        array_sort(collect_list(col("contrib"))),
        lit(0.0),
        (acc, x) => acc + x).as("chi2_raw"),
      first(col("n_total")).as("n_total"),
      first(col("n_langs")).as("n_langs"),
      first(col("n_sources")).as("n_sources"))
    val stats = chi2.select(
      round(col("chi2_raw"), 6).as("chi2"),
      ((col("n_langs") - 1) * (col("n_sources") - 1)).as("dof"),
      round(
        sqrt(
          col("chi2_raw") / (col("n_total").cast("double")
            * (least(col("n_langs"), col("n_sources")) - lit(1)).cast("double"))),
        6).as("cramers_v"))
    cells
      .select(col("lang"), col("source"), col("n_obs"), col("expected"), col("contrib"))
      .crossJoin(broadcast(stats))
  }

  val chi2AssocSql: String =
    """WITH obs AS (
         SELECT lang, source, count(*) AS n_obs
         FROM documents GROUP BY 1, 2),
       rowtot AS (SELECT lang, sum(n_obs) AS lang_tot FROM obs GROUP BY 1),
       coltot AS (SELECT source, sum(n_obs) AS source_tot FROM obs GROUP BY 1),
       tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total,
                      count(DISTINCT lang) AS n_langs,
                      count(DISTINCT source) AS n_sources
               FROM obs),
       cells AS (
         SELECT r.lang, c.source, COALESCE(o.n_obs, 0) AS n_obs,
                round(CAST(r.lang_tot AS DOUBLE) * CAST(c.source_tot AS DOUBLE)
                      / CAST(t.n_total AS DOUBLE), 6) AS expected
         FROM rowtot r CROSS JOIN coltot c
         LEFT JOIN obs o ON o.lang = r.lang AND o.source = c.source
         CROSS JOIN tot t),
       cells2 AS (
         SELECT lang, source, n_obs, expected,
                round((CAST(n_obs AS DOUBLE) - expected)
                      * (CAST(n_obs AS DOUBLE) - expected) / expected, 6) AS contrib
         FROM cells),
       agg AS (
         SELECT list_reduce(list_prepend(0.0, list_sort(list(contrib))),
                            (x, y) -> x + y) AS chi2_raw
         FROM cells2),
       stats AS (
         SELECT round(a.chi2_raw, 6) AS chi2,
                (t.n_langs - 1) * (t.n_sources - 1) AS dof,
                round(sqrt(a.chi2_raw / (CAST(t.n_total AS DOUBLE)
                      * CAST(least(t.n_langs, t.n_sources) - 1 AS DOUBLE))), 6)
                  AS cramers_v
         FROM agg a CROSS JOIN tot t)
       SELECT c.lang, c.source, c.n_obs, c.expected, c.contrib,
              s.chi2, s.dof, s.cramers_v
       FROM cells2 c CROSS JOIN stats s"""

  /** Per-document readability scores — Flesch reading-ease and
    * Flesch–Kincaid grade level over a deterministic proxy lexer: words
    * are whitespace tokens, sentences are `[.!?]+` runs (min 1),
    * syllables are vowel-group runs. The classic text-quality feature a
    * curation pipeline scores alongside [[CurationQueries]]' heuristics.
    *
    * Oracle parity: every value is per-row scalar arithmetic on the same
    * expression tree — no reductions, so IEEE results are bit-identical
    * across engines; regex semantics for these character classes agree
    * between Java regex and RE2.
    *
    * Scale: pure narrow projection — zero shuffles, codegen'd end to
    * end, scan pruned to (doc_id, lang, text).
    */
  def readability(s: SparkSession, dir: String): DataFrame = {
    val words = size(split(col("text"), " ", -1)).cast("double")
    val sentences = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1)).cast("double")
    val syllables = regexp_count(lower(col("text")), lit("[aeiouy]+")).cast("double")
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        words.cast("long").as("n_words"),
        sentences.cast("long").as("n_sentences"),
        syllables.cast("long").as("n_syllables"),
        round(
          lit(206.835) - lit(1.015) * (words / sentences)
            - lit(84.6) * (syllables / words),
          4).as("flesch_ease"),
        round(
          lit(0.39) * (words / sentences) + lit(11.8) * (syllables / words)
            - lit(15.59),
          4).as("fk_grade"))
  }

  val readabilitySql: String =
    s"""WITH m AS (
         SELECT doc_id, lang,
                CAST($nTokensSqlExpr AS DOUBLE) AS words,
                CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)
                  AS sentences,
                CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                  AS syllables
         FROM documents)
       SELECT doc_id, lang,
              CAST(words AS BIGINT) AS n_words,
              CAST(sentences AS BIGINT) AS n_sentences,
              CAST(syllables AS BIGINT) AS n_syllables,
              round(206.835 - 1.015 * (words / sentences)
                    - 84.6 * (syllables / words), 4) AS flesch_ease,
              round(0.39 * (words / sentences) + 11.8 * (syllables / words)
                    - 15.59, 4) AS fk_grade
       FROM m"""
}
