package graft.queries

import graft.Tables
import graft.functions.TextHash
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for large-scale training-data pipelines:
  * repetition/quality statistics (Gopher-style), corpus-level boilerplate
  * n-gram detection, deterministic hash-based train/val/test splitting,
  * TF-IDF salient-term extraction, and balanced per-language mixture
  * sampling. Each query has an exact DuckDB oracle (the hash functions and
  * n-gram constructions are re-derived from the text in ANSI SQL).
  *
  * Scale design: the per-document statistics are zero-shuffle higher-order
  * -function scans (whole-stage codegen'd, no explode → no row blow-up);
  * the corpus-level operators shuffle only on bounded-cardinality keys
  * (n-gram, term, language) with map-side partial aggregation.
  */
object CurationQueries {

  /** One shared tokenizer (whitespace) — the SQL mirror lives in
    * [[TextQueries.nTokensSqlExpr]]'s family; here we need the list
    * itself, `string_split(text, ' ')`.
    */
  private def toks = split(col("text"), " ", -1)

  /** k-gram array via index arithmetic over the token list — a pure
    * column expression (`transform` over `sequence`), no explode. Spark
    * `slice` is 1-based and length-bounded exactly like DuckDB's
    * inclusive `w[i:i+k-1]` slice, so both engines enumerate the same
    * n-grams in the same order. Documents shorter than k tokens yield
    * an EMPTY array — guarded explicitly, because Spark's
    * `sequence(1, 0)` infers a DESCENDING step and `slice(w, 0, k)`
    * then throws, where DuckDB's `generate_series(1, 0)` is simply
    * empty.
    */
  private def gramsExpr(k: Int): String =
    s"""CASE WHEN size(w) >= $k
        THEN transform(sequence(1, size(w) - ${k - 1}), i -> concat_ws(' ', slice(w, i, $k)))
        ELSE cast(array() as array<string>) END"""

  /** The deterministic md5 bucket shared by [[hashSplit]] and
    * [[sequencePack]] — ONE definition per engine so split and shard
    * assignment stay aligned by construction.
    */
  private def md5BucketExpr(mod: Int): String =
    OracleHash.bucketExpr("cast(doc_id as string)", mod)

  private def md5BucketSql(mod: Int): String =
    OracleHash.bucketSql("CAST(doc_id AS VARCHAR)", mod)

  private def gramsSql(k: Int): String =
    s"array_to_string(w[i:i+${k - 1}], ' ')"

  // --------------------------------------------------------------------
  // q_repetition_stats — per-document repetition metrics, zero shuffle
  // --------------------------------------------------------------------

  /** Gopher-style repetition statistics per document, adapted to the
    * newline-free synthetic corpus: distinct-token ratio, the fraction of
    * bigram slots covered by the single most-repeated bigram, and the
    * duplicate-trigram fraction. Everything is computed inside ONE narrow
    * projection: the max-multiplicity bigram is found by sorting the
    * bigram array and scanning runs with `aggregate` — no explode, no
    * groupBy, no shuffle. At 100 TB this is a pure map over the corpus.
    */
  def repetitionStats(s: SparkSession, dir: String): DataFrame = {
    // longest run in the sorted bigram array = max bigram multiplicity
    val maxRun =
      """aggregate(
           array_sort(g2),
           named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
           (acc, x) -> named_struct(
             'prev', x,
             'run',  CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END,
             'best', greatest(acc.best,
                       CASE WHEN x <=> acc.prev THEN acc.run + 1L ELSE 1L END)),
           acc -> acc.best)"""
    Tables
      .documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .withColumn("g2", expr(gramsExpr(2)))
      .withColumn("g3", expr(gramsExpr(3)))
      .select(
        col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        round(size(array_distinct(col("w"))).cast("double") / size(col("w")), 4)
          .as("distinct_ratio"),
        round(expr(maxRun).cast("double") / size(col("g2")), 4)
          .as("top_bigram_frac"),
        round(
          (size(col("g3")) - size(array_distinct(col("g3")))).cast("double") /
            size(col("g3")),
          4).as("dup_trigram_frac"))
  }

  /** DuckDB oracle: the same statistics derived the relational way —
    * explode the n-grams and GROUP BY — proving the run-scan shortcut
    * computes the true max multiplicity.
    */
  val repetitionStatsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        g2 AS (SELECT doc_id, ${gramsSql(2)} g
               FROM t, unnest(generate_series(1, len(w) - 1)) AS s(i)),
        top2 AS (SELECT doc_id, max(c) best FROM
                   (SELECT doc_id, g, count(*) c FROM g2 GROUP BY 1, 2)
                 GROUP BY 1),
        g3 AS (SELECT doc_id, ${gramsSql(3)} g
               FROM t, unnest(generate_series(1, len(w) - 2)) AS s(i)),
        d3 AS (SELECT doc_id, count(*) n3, count(DISTINCT g) nd3 FROM g3 GROUP BY 1)
        SELECT t.doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          round(CAST(len(list_distinct(w)) AS DOUBLE) / len(w), 4) AS distinct_ratio,
          round(CAST(top2.best AS DOUBLE) / (len(w) - 1), 4) AS top_bigram_frac,
          round(CAST(d3.n3 - d3.nd3 AS DOUBLE) / d3.n3, 4) AS dup_trigram_frac
        FROM t JOIN top2 USING (doc_id) JOIN d3 USING (doc_id)"""

  // --------------------------------------------------------------------
  // q_boilerplate_ngrams — corpus-level boilerplate detection
  // --------------------------------------------------------------------

  /** Corpus-level boilerplate coverage: a 4-gram is boilerplate when it
    * occurs in ≥ [[BoilerplateMinDocs]] distinct documents (the shared
    * header/footer signature of web corpora); each document reports what
    * fraction of its 4-gram slots are boilerplate. Plan: one narrow
    * explode → ONE shuffle keyed on the gram (uniform hash keys,
    * map-side partial agg) to build the boilerplate dimension → one join
    * back (AQE broadcasts it when small) → one groupBy on doc_id. No
    * all-pairs stage anywhere, so the plan survives 100×.
    *
    * STORAGE CONTRACT: the gram stream feeds BOTH the boilerplate-
    * dimension build and the probe join. The narrow (doc_id, tokens)
    * projection is `persist()`ed — NOT the exploded grams: the token
    * array is ~1× corpus size where the 4-gram stream is ~4× (each token
    * appears in four grams), and re-exploding from the cache is a
    * codegen'd map while materializing the gram cache is a measured
    * 1.5× slowdown. `documents` is scanned and tokenized ONCE
    * (plan-audit-locked). Session owners `clearCache()` when done, as
    * Verify/Bench do between queries; a production pipeline would write
    * the gram dimension out as its own artifact instead.
    */
  val BoilerplateMinDocs = 3

  def boilerplateNgrams(s: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; gram explode otherwise 1-core
      .select(col("doc_id"), toks.as("w"))
      .persist()
    val grams = tokens.select(col("doc_id"), explode(expr(gramsExpr(4))).as("g"))
    val boiler = grams
      .groupBy(col("g"))
      .agg(countDistinct(col("doc_id")).as("n_docs_with"))
      .filter(col("n_docs_with") >= BoilerplateMinDocs)
      .select(col("g"), lit(1).as("is_boiler"))
    grams
      .join(boiler, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("is_boiler")).as("n_boiler"))
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_boiler"),
        round(col("n_boiler").cast("double") / col("n_grams"), 4).as("boiler_frac"))
  }

  val boilerplateNgramsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        grams AS (SELECT doc_id, ${gramsSql(4)} g
                  FROM t, unnest(generate_series(1, len(w) - 3)) AS s(i)),
        boiler AS (SELECT g FROM
                     (SELECT g, count(DISTINCT doc_id) n FROM grams GROUP BY 1)
                   WHERE n >= $BoilerplateMinDocs)
        SELECT doc_id,
          count(*) AS n_grams,
          count(b.g) AS n_boiler,
          round(CAST(count(b.g) AS DOUBLE) / count(*), 4) AS boiler_frac
        FROM grams LEFT JOIN boiler b USING (g)
        GROUP BY doc_id"""

  // --------------------------------------------------------------------
  // q_hash_split — deterministic stratified train/val/test assignment
  // --------------------------------------------------------------------

  /** Deterministic dataset splitting: bucket = md5(doc_id) mod 10 →
    * 8/1/1 train/val/test. Content-independent, seedless, and stable
    * under re-runs and re-partitioning — the property a 100 TB pipeline
    * needs so that split membership never changes when the corpus is
    * re-processed. Reported per (lang, split) so stratification skew is
    * visible. The only shuffle is the tiny (lang, split) rollup.
    */
  def hashSplit(s: SparkSession, dir: String): DataFrame = {
    val bucket = expr(md5BucketExpr(10))
    Tables
      .documents(s, dir)
      .withColumn(
        "split",
        when(bucket <= 7, "train").when(bucket === 8, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"))
  }

  val hashSplitSql: String =
    s"""WITH b AS (SELECT *, ${md5BucketSql(10)} AS bucket FROM documents)
       SELECT lang,
         CASE WHEN bucket <= 7 THEN 'train'
              WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
         count(*) AS n_docs, min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id
       FROM b GROUP BY 1, 2"""

  // --------------------------------------------------------------------
  // q_text_normalize — canonicalization before hashing/dedup
  // --------------------------------------------------------------------

  /** Text canonicalization — the step every dedup/fingerprint pipeline
    * runs FIRST so cosmetic variation (case, runs of whitespace, stray
    * punctuation) doesn't defeat exact-hash dedup: lowercase, strip
    * non-alphanumeric characters (keeping spaces), collapse whitespace
    * runs, trim. Reported with before/after lengths and a `changed`
    * flag so the downstream can measure how much normalization bit.
    * Pure codegen'd map stage — zero shuffles, zero UDFs; the regexes
    * are in the Java∩RE2 dialect so the oracle runs the same rules.
    *
    * The synthetic corpus is already clean, so (as with the PII
    * fixture) deterministic dirt is injected keyed on doc_id — case
    * mangling on 3∣id, punctuation + double spaces on 5∣id — so every
    * rule fires on real rows and no-op rows stay present.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame = {
    val raw = concat(
      when(col("doc_id") % 3 === 0, upper(col("text"))).otherwise(col("text")),
      when(col("doc_id") % 5 === 0, lit("  -- [END]!!  ")).otherwise(lit("")))
    val norm = trim(
      regexp_replace(regexp_replace(lower(raw), lit("[^a-z0-9 ]"), lit("")), lit(" +"), lit(" ")))
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        length(raw).cast("long").as("raw_len"),
        norm.as("norm_text"),
        length(norm).cast("long").as("norm_len"),
        (norm =!= raw).as("changed"))
  }

  val textNormalizeSql: String =
    """WITH raw AS (
         SELECT doc_id,
                (CASE WHEN doc_id % 3 = 0 THEN upper(text) ELSE text END) ||
                (CASE WHEN doc_id % 5 = 0 THEN '  -- [END]!!  ' ELSE '' END) AS text
         FROM documents
       )
       SELECT doc_id, length(text)::BIGINT AS raw_len,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                  ' +', ' ', 'g')) AS norm_text,
              length(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                         ' +', ' ', 'g')))::BIGINT AS norm_len,
              trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                  ' +', ' ', 'g')) <> text AS changed
       FROM raw"""

  // --------------------------------------------------------------------
  // q_stratified_sample — per-source deterministic downsampling
  // --------------------------------------------------------------------

  /** Stratified sampling with per-source keep rates — the mixture
    * downsampler a training-data pipeline runs to rebalance sources
    * WITHOUT any shuffle: sampling is a pure filter. The keep decision
    * compares the document's md5 4-hex-digit prefix (lowercase in both
    * engines) LEXICOGRAPHICALLY against the source's threshold string —
    * string comparison needs no hex parsing, so the predicate is
    * byte-identical cross-engine. Rates cycle deterministically with
    * the source index (20/40/60/80% of 0x10000 → thresholds
    * 3333/6666/9999/cccc); the hash keys on doc_id, so the sample is
    * stable under re-runs and independent of row order — at 100 TB this
    * is one codegen'd map stage that pipelines into the scan, and
    * changing the mixture means changing literals, not the plan.
    */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val srcIdx = substring(col("source"), 4, 8).cast("int")
    val threshold = element_at(
      array(lit("3333"), lit("6666"), lit("9999"), lit("cccc")),
      (srcIdx % 4) + 1)
    Tables
      .documents(s, dir)
      .filter(
        substring(md5(col("doc_id").cast("string").cast("binary")), 1, 4) < threshold)
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
  }

  val stratifiedSampleSql: String =
    """SELECT doc_id, source, lang, n_chars
       FROM documents
       WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
             (['3333', '6666', '9999', 'cccc'])[(CAST(substr(source, 4) AS INTEGER) % 4) + 1]"""

  // --------------------------------------------------------------------
  // q_tfidf_terms — salient-term extraction per document
  // --------------------------------------------------------------------

  /** Top-3 salient terms per document ranked by term frequency with
    * document-frequency and lexicographic tie-breaks (integer-only
    * ranking — no transcendental idf in the hash-checked output; tf and
    * df are reported so any idf weighting is a client-side map). Plan:
    * tf = groupBy(doc, term) [shuffle 1, key cardinality ≈ corpus
    * tokens]; df = groupBy(term) over the tf table [shuffle 2, key
    * cardinality = vocabulary]; df is broadcast back (vocabulary ≪
    * corpus); final per-doc rank window shuffles on doc_id.
    */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val tf = Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; explode otherwise 1-core
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(broadcast(df), Seq("term"))
      .withColumn("trank", row_number().over(w).cast("long"))
      .filter(col("trank") <= 3)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("trank"))
  }

  val tfidfTermsSql: String =
    """WITH tok AS (SELECT doc_id, t.term FROM documents,
                    unnest(string_split(text, ' ')) AS t(term)),
        tf AS (SELECT doc_id, term, count(*) tf FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(*) df FROM tf GROUP BY 1),
        ranked AS (SELECT tf.doc_id, tf.term, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                       ORDER BY tf.tf DESC, df.df ASC, tf.term ASC) AS trank
                   FROM tf JOIN df USING (term))
        SELECT doc_id, term, tf, df, trank FROM ranked WHERE trank <= 3"""

  // --------------------------------------------------------------------
  // q_substring_dedup — duplicated-span coverage across the corpus
  // --------------------------------------------------------------------

  /** Substring-level deduplication (the train-data technique of removing
    * repeated spans rather than whole documents): every
    * [[SubstringSpanTokens]]-token span that occurred earlier in the
    * corpus — in a lower doc_id, or earlier in the same document — is a
    * duplicate occurrence; per document, overlapping duplicate spans are
    * merged (gaps-and-islands) and the covered token count reported.
    *
    * Scale: shingling is a narrow `inline` explode (≈ n_tokens rows per
    * doc, same blow-up every shingle sketch pays). First-occurrence is a
    * `min(struct(doc_id, pos))` groupBy — partial aggregation collapses
    * hot shingles map-side, so a boilerplate 5-gram appearing 10⁹ times
    * does NOT funnel one reducer (a row_number window would); the join
    * back on the shingle key is skew-handled by AQE. Span merging is one
    * window per doc_id — bounded by document length.
    */
  val SubstringSpanTokens = 5

  def substringDedup(s: SparkSession, dir: String): DataFrame = {
    val L = SubstringSpanTokens
    val docs = Tables
      .documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"), col("w"))
    // same short-doc guard as gramsExpr: sequence(1, size-k+1) descends
    // through 0 when size < k and slice(w, 0, k) throws
    val occ = docs.select(
      col("doc_id"),
      expr(s"""inline(CASE WHEN size(w) >= $L
                 THEN transform(sequence(1, size(w) - ${L - 1}),
                   i -> struct(cast(i as long) AS pos,
                               concat_ws(' ', slice(w, i, $L)) AS gram))
                 ELSE cast(array() as array<struct<pos: bigint, gram: string>>) END)"""))
    val firsts = occ
      .groupBy(col("gram"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val dups = occ
      .join(firsts, Seq("gram"))
      .filter(struct(col("doc_id"), col("pos")) =!= col("first"))
      .select(col("doc_id"), col("pos"))
    // merge overlapping [pos, pos+L-1] spans per doc: island starts when
    // this span begins past the running max end of all earlier spans
    val wPrev = Window
      .partitionBy(col("doc_id"))
      .orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val covered = dups
      .withColumn("prev_max_end", max(col("pos") + (L - 1)).over(wPrev))
      .withColumn(
        "new_island",
        when(col("prev_max_end").isNull || col("pos") > col("prev_max_end"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg((max(col("pos")) - min(col("pos")) + L).as("cov"))
      .groupBy(col("doc_id"))
      .agg(sum(col("cov")).cast("long").as("dup_tokens"))
    docs
      .join(covered, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"), 4)
          .as("dup_frac"))
  }

  /** DuckDB oracle: first occurrence re-derived with a row_number window
    * (fine at oracle scale; the engine avoids it for skew), identical
    * islands arithmetic.
    */
  val substringDedupSql: String = {
    val L = SubstringSpanTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        occ AS (SELECT doc_id, CAST(i AS BIGINT) pos, ${gramsSql(L)} gram
                FROM t, unnest(generate_series(1, len(w) - ${L - 1})) AS s(i)),
        ranked AS (SELECT *, row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) rn
                   FROM occ),
        dups AS (SELECT doc_id, pos FROM ranked WHERE rn > 1),
        marked AS (SELECT doc_id, pos,
                     max(pos + ${L - 1}) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) prev_max_end
                   FROM dups),
        flagged AS (SELECT doc_id, pos,
                      CASE WHEN prev_max_end IS NULL OR pos > prev_max_end
                           THEN 1 ELSE 0 END new_island FROM marked),
        islands AS (SELECT doc_id, pos,
                      sum(new_island) OVER (PARTITION BY doc_id ORDER BY pos) island
                    FROM flagged),
        cov AS (SELECT doc_id, island, max(pos) - min(pos) + $L cov
                FROM islands GROUP BY 1, 2),
        per_doc AS (SELECT doc_id, CAST(sum(cov) AS BIGINT) dup_tokens FROM cov GROUP BY 1)
        SELECT t.doc_id,
          CAST(len(w) AS BIGINT) AS n_tokens,
          coalesce(per_doc.dup_tokens, 0) AS dup_tokens,
          round(CAST(coalesce(per_doc.dup_tokens, 0) AS DOUBLE) / len(w), 4) AS dup_frac
        FROM t LEFT JOIN per_doc USING (doc_id)"""
  }

  // --------------------------------------------------------------------
  // q_line_dedup — line-level dedup with document reassembly
  // --------------------------------------------------------------------

  /** Line-level deduplication with reassembly (the RefinedWeb/CCNet
    * technique: drop every LINE whose exact content appeared earlier in
    * the corpus, keep the rest of the document): documents are chunked
    * into fixed [[LineDedupBlockTokens]]-token pseudo-lines (the corpus
    * has no newline structure), each line's first occurrence — lowest
    * (doc_id, line_idx) — survives, every later copy is dropped, and the
    * retained lines are stitched back into a `clean_text` column in
    * original order. Unlike [[substringDedup]] (which *reports* duplicated
    * span coverage), this emits the scrubbed corpus itself — the actual
    * training-data transform.
    *
    * Scale: first-occurrence is the same skew-proof `min(struct)` partial
    * aggregate as [[substringDedup]] — a boilerplate line repeated 10⁹
    * times collapses map-side instead of funnelling one reducer through a
    * row_number window; the join back is line-content-keyed with AQE skew
    * handling. Reassembly is a per-document sorted fold over that
    * document's own lines (bounded by doc length, no window over the
    * corpus). One corpus scan end-to-end.
    */
  val LineDedupBlockTokens = 16

  def lineDedup(s: SparkSession, dir: String, blockTokens: Int = LineDedupBlockTokens): DataFrame = {
    val B = blockTokens
    val docs = Tables
      .documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(
        col("doc_id"),
        expr(s"cast(((size(w) - 1) div $B) + 1 as long)").as("n_lines"),
        col("w"))
      // one corpus scan: the token projection feeds the line explode
      // (twice: firsts + probe) AND the final n_lines join
      .persist()
    val lines = docs.select(
      col("doc_id"),
      expr(s"""inline(transform(sequence(0, (size(w) - 1) div $B),
                 b -> struct(cast(b as long) AS line_idx,
                             concat_ws(' ', slice(w, b*$B + 1, $B)) AS line)))"""))
    val firsts = lines
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("first"))
    val kept = lines
      .join(firsts, Seq("line"))
      .filter(struct(col("doc_id"), col("line_idx")) === col("first"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_idx"), col("line")))),
            x => x.getField("line")),
          " ").as("clean_text"))
    docs
      .select(col("doc_id"), col("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** DuckDB oracle: first occurrence via a row_number window (fine at
    * oracle scale), reassembly via ordered string_agg.
    */
  def lineDedupSql(blockTokens: Int = LineDedupBlockTokens): String = {
    val B = blockTokens
    s"""WITH ws AS (
         SELECT doc_id, string_split(text, ' ') AS w FROM documents
       ), lines AS (
         SELECT doc_id, b AS line_idx,
                array_to_string(list_slice(w, b*$B + 1, b*$B + $B), ' ') AS line
         FROM ws, LATERAL (SELECT unnest(range((len(w) - 1) // $B + 1)) AS b)
       ), ranked AS (
         SELECT doc_id, line_idx, line,
                row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx) AS rn
         FROM lines
       ), kept AS (
         SELECT doc_id, count(*) AS n_kept,
                string_agg(line, ' ' ORDER BY line_idx) AS clean_text
         FROM ranked WHERE rn = 1 GROUP BY doc_id
       )
       SELECT ws.doc_id,
              (len(w) - 1) // $B + 1 AS n_lines,
              COALESCE(n_kept, 0) AS n_kept,
              COALESCE(clean_text, '') AS clean_text
       FROM ws LEFT JOIN kept USING (doc_id)"""
  }

  // --------------------------------------------------------------------
  // q_quality_score — linear quality model over narrow text features
  // --------------------------------------------------------------------

  /** Model-based quality filtering plumbing: a fixed linear model over
    * three single-pass text features (distinct-token ratio, mean word
    * length, stopword density), banded into keep tiers. The weights are
    * powers of two, so every multiply is EXACT in IEEE arithmetic and
    * the score is bit-identical across engines — the property that lets
    * the DuckDB oracle hash-match a float-scored model. Swapping in
    * learned weights (or a real classifier via a scoring UDF) keeps the
    * same one-narrow-scan plan: features never leave the projection.
    */
  /** The quality logit shared by [[qualityScore]] and [[skylineDocs]] —
    * ONE expression tree per engine so both consumers agree bitwise.
    */
  private def qualityLogit = {
    val nTokens = size(split(col("text"), " ", -1)).cast("long")
    val distinctRatio =
      size(array_distinct(split(col("text"), " ", -1))).cast("double") / nTokens
    val meanWordLen =
      (length(col("text")) - nTokens + 1).cast("double") / nTokens
    val theCount =
      ((length(col("text")) - length(regexp_replace(col("text"), " the ", ""))) / 5)
        .cast("long")
    val stopDensity = theCount.cast("double") / nTokens
    lit(2.0) * distinctRatio + lit(0.25) * meanWordLen - lit(0.5) * stopDensity - lit(1.0)
  }

  /** Deterministic 4-dp quantization of the (bit-identical) logit:
    * `floor(x·10⁴ + 0.5)/10⁴` — the SAME IEEE multiply/add/floor/divide
    * in both engines, so the result is bit-identical too. Decimal
    * `round(x, 4)` is NOT: the r11 sf0.1 sweep caught a doc whose logit
    * sits on a decimal tie at the 5th digit, where Spark (BigDecimal
    * HALF_UP over the exact binary expansion) and DuckDB round one ulp
    * apart. Half-ties here round toward +∞ — a semantics we own.
    */
  private def quant4(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    floor(c * 10000.0 + 0.5).cast("double") / 10000.0

  private def quant4Sql(e: String): String =
    s"floor(($e) * 10000 + 0.5) / 10000.0"

  def qualityScore(s: SparkSession, dir: String): DataFrame = {
    val logit = qualityLogit
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        quant4(logit).as("score"),
        when(logit >= 0.75, "high")
          .when(logit >= 0.25, "mid")
          .otherwise("low")
          .as("band"))
  }

  /** DuckDB mirror — the logit expression is written in the SAME
    * left-to-right order so the doubles agree bitwise.
    */
  private def qualityLogitSql: String = {
    val n = TextQueries.nTokensSqlExpr
    s"""(2.0 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) / $n)
        + 0.25 * (CAST(length(text) - $n + 1 AS DOUBLE) / $n)
        - 0.5 * (CAST((length(text) - length(replace(text, ' the ', ''))) // 5 AS DOUBLE) / $n)
        - 1.0)"""
  }

  val qualityScoreSql: String = {
    val logit = qualityLogitSql
    s"""SELECT doc_id, ${quant4Sql(logit)} AS score,
        CASE WHEN $logit >= 0.75 THEN 'high'
             WHEN $logit >= 0.25 THEN 'mid' ELSE 'low' END AS band
        FROM documents"""
  }

  // --------------------------------------------------------------------
  // q_skyline — Pareto frontier (shortest docs of highest quality)
  // --------------------------------------------------------------------

  /** Pareto-skyline mining over (length, quality): a document is on the
    * frontier iff no other document is at most as long with a strictly
    * higher score, and none is strictly shorter with at least its score —
    * the "best quality per length budget" set a curation pass keeps when
    * both axes matter.
    *
    * Scale: the 2-D skyline is order-decomposable, so NO global-order
    * window: documents bucket by length range ([[SkylineBucketChars]]
    * chars); the strictly-shorter running max splits into (a) a
    * per-bucket local window over bounded groups and (b) a running max
    * over the tiny bucket-maxima table, broadcast back. Same-length
    * dominance is a bounded `partition by len` max. Scores compare after
    * round(…,4) so the dominance cuts are cross-engine identical.
    */
  val SkylineBucketChars = 256L

  /** The (doc_id, len, rounded score) point set [[skylineDocs]] ranks —
    * also the input of the spec's brute-force dominance model, so test
    * and operator share one projection by construction.
    */
  def skylineAllPoints(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("n_chars").as("len"),
        quant4(qualityLogit).as("score"))

  def skylineDocs(s: SparkSession, dir: String): DataFrame = {
    val docs = skylineAllPoints(s, dir)
      .withColumn("b", (col("len") / lit(SkylineBucketChars)).cast("long"))
    val bucketMax = docs.groupBy(col("b")).agg(max(col("score")).as("bmax"))
    val wPrior = Window.orderBy(col("b")).rowsBetween(Window.unboundedPreceding, -1)
    val prior = bucketMax
      .withColumn("prior_max", max(col("bmax")).over(wPrior))
      .select(col("b"), col("prior_max"))
    val wLocal = Window
      .partitionBy(col("b"))
      .orderBy(col("len"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("len"))
    docs
      .join(broadcast(prior), Seq("b"))
      .withColumn("local_max", max(col("score")).over(wLocal))
      .withColumn(
        "m1",
        greatest(
          coalesce(col("local_max"), lit(-1.0e308)),
          coalesce(col("prior_max"), lit(-1.0e308))))
      .withColumn("eq_max", max(col("score")).over(wEq))
      .filter(col("m1") < col("score") && col("eq_max") <= col("score"))
      .select(col("doc_id"), col("len"), col("score"))
  }

  /** DuckDB re-derivation of [[skylineDocs]]: same buckets, same two-level
    * running max, same dominance cuts.
    */
  val skylineDocsSql: String =
    s"""WITH d AS (
         SELECT doc_id, n_chars AS len, ${quant4Sql(qualityLogitSql)} AS score,
                n_chars // $SkylineBucketChars AS b
         FROM documents),
       bm AS (SELECT b, max(score) AS bmax FROM d GROUP BY 1),
       pr AS (SELECT b, max(bmax) OVER (ORDER BY b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_max
              FROM bm),
       e AS (
         SELECT d.doc_id, d.len, d.score,
                max(d.score) OVER (PARTITION BY d.b ORDER BY d.len
                     RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS local_max,
                max(d.score) OVER (PARTITION BY d.len) AS eq_max,
                pr.prior_max
         FROM d JOIN pr USING (b))
       SELECT doc_id, len, score FROM e
       WHERE greatest(COALESCE(local_max, -1e308), COALESCE(prior_max, -1e308)) < score
         AND eq_max <= score"""

  // --------------------------------------------------------------------
  // q_top_ngrams — corpus-wide frequent n-gram statistics
  // --------------------------------------------------------------------

  /** Corpus-level top-20 4-grams by occurrence (doc counts alongside) —
    * the corpus statistics view of the Gopher "top n-gram fraction"
    * signal, and the inspection table behind [[boilerplateNgrams]]'s
    * threshold. One shuffle on the gram (map-side partial agg), then a
    * 20-row total order — the sort input is already collapsed to
    * distinct grams, never the corpus stream. Deterministic tie-break by
    * gram text.
    */
  def topNgrams(s: SparkSession, dir: String): DataFrame =
    Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; gram explode otherwise 1-core
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), explode(expr(gramsExpr(4))).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("gram").asc)
      .limit(20)

  val topNgramsSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        g AS (SELECT doc_id, ${gramsSql(4)} gram
              FROM t, unnest(generate_series(1, len(w) - 3)) AS s(i))
        SELECT gram, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        FROM g GROUP BY gram
        ORDER BY n_occ DESC, gram ASC LIMIT 20"""

  // --------------------------------------------------------------------
  // q_decontaminate — eval-set n-gram overlap scan
  // --------------------------------------------------------------------

  /** Benchmark decontamination: flag every training document sharing an
    * [[DecontGramTokens]]-token n-gram with the held-out evaluation set
    * (the standard n-gram-overlap rule for keeping eval answers out of
    * training data). The harness corpus has no separate benchmark table,
    * so the eval set is the deterministic `doc_id % 50 == 0` slice —
    * swap in a real benchmark table and the plan is unchanged.
    *
    * Scale: eval n-grams are a benchmark-sized dimension (thousands of
    * grams even for a large suite) — built once, broadcast; the corpus
    * side is one narrow shingle explode + broadcast probe + per-doc
    * aggregation. No shuffle touches the corpus-sized gram stream except
    * the final doc_id rollup.
    *
    * STORAGE CONTRACT: the gram stream feeds both the eval-set dimension
    * and the training-side probe — the narrow (doc_id, tokens) projection
    * is `persist()`ed so `documents` is scanned and tokenized once (same
    * contract and same cache-the-tokens-not-the-explode rationale as
    * [[boilerplateNgrams]]; callers `clearCache()` when done).
    */
  val DecontGramTokens = 8

  def decontaminate(s: SparkSession, dir: String): DataFrame = {
    val L = DecontGramTokens
    val tokens = Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; gram explode otherwise 1-core
      .select(col("doc_id"), toks.as("w"))
      .persist()
    val grams = tokens
      .select(col("doc_id"), explode(expr(gramsExpr(L))).as("gram"))
    val evalGrams = grams
      .filter(col("doc_id") % 50 === 0)
      .select(col("gram"))
      .distinct()
      .select(col("gram"), lit(1).as("hit"))
    grams
      .filter(col("doc_id") % 50 =!= 0)
      .join(broadcast(evalGrams), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_grams"),
        count(col("hit")).as("n_hits"),
        countDistinct(when(col("hit").isNotNull, col("gram"))).as("n_distinct_hits"))
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_hits"),
        col("n_distinct_hits"),
        (col("n_hits") > 0).as("contaminated"))
  }

  val decontaminateSql: String = {
    val L = DecontGramTokens
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        g AS (SELECT doc_id, ${gramsSql(L)} gram
              FROM t, unnest(generate_series(1, len(w) - ${L - 1})) AS s(i)),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0)
        SELECT g.doc_id,
          count(*) AS n_grams,
          count(ev.gram) AS n_hits,
          count(DISTINCT ev.gram) AS n_distinct_hits,
          count(ev.gram) > 0 AS contaminated
        FROM g LEFT JOIN ev USING (gram)
        WHERE g.doc_id % 50 != 0
        GROUP BY g.doc_id"""
  }

  // --------------------------------------------------------------------
  // q_bloom_prune — broadcast Bloom-filter decontamination pre-filter
  // --------------------------------------------------------------------

  /** Bloom-filter pre-filter for decontamination — the broadcast-bloom
    * join-pruning pattern: the held-out eval set's 8-grams are folded into
    * a [[BloomBits]]-bit Bloom filter ([[BloomHashes]] hash functions from
    * the SQL-reproducible family), and every corpus gram probes the filter
    * instead of joining the eval grams directly. A gram "maybe hits" iff
    * ALL of its probe bits are set; Bloom's contract — no false negatives,
    * bounded false positives — means `bloom_contaminated ⊇
    * exact_contaminated`, and only the (rare) maybe-docs need the exact
    * verification join. Both verdicts are emitted so the containment is
    * the oracle-checked property, not just a claim.
    *
    * Scale: THIS is how the [[decontaminate]] broadcast shrinks when the
    * eval set stops being small — the filter is BloomBits/8 bytes (4 KiB
    * here) regardless of eval-gram count, vs broadcasting every distinct
    * gram string. The filter itself is a set of distinct bucket ids —
    * semantically identical to the bit array and exactly re-derivable in
    * SQL (Spark's own runtime BloomFilterAggregate is the same idea with
    * an opaque binary layout the oracle couldn't check). One corpus scan
    * (shared token projection), zero extra shuffles: the probe is a
    * broadcast join on bucket id.
    */
  val BloomBits = 32768
  val BloomHashes = 4

  def bloomPrune(s: SparkSession, dir: String): DataFrame = {
    val L = DecontGramTokens
    val bUdf = udf { (g: String, j: Int) =>
      TextHash.permHash(TextHash.polyHash(g), 500L + j) % BloomBits
    }
    val tokens = Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; gram explode otherwise 1-core
      .select(col("doc_id"), toks.as("w"))
      .persist()
    val grams = tokens
      .select(col("doc_id"), posexplode(expr(gramsExpr(L))).as(Seq("pos", "gram")))
    val evalGrams = grams
      .filter(col("doc_id") % 50 === 0)
      .select(col("gram"))
      .distinct()
    val bits = evalGrams
      .withColumn("j", explode(sequence(lit(0), lit(BloomHashes - 1))))
      .select(bUdf(col("gram"), col("j")).as("bucket"))
      .distinct()
    val corpus = grams.filter(col("doc_id") % 50 =!= 0)
    val maybe = corpus
      .withColumn("j", explode(sequence(lit(0), lit(BloomHashes - 1))))
      .withColumn("bucket", bUdf(col("gram"), col("j")))
      .join(broadcast(bits), Seq("bucket"))
      .groupBy(col("doc_id"), col("pos"))
      .agg(count(lit(1)).as("nj"))
      .filter(col("nj") === BloomHashes)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_maybe"))
    val exact = corpus
      .join(broadcast(evalGrams.select(col("gram"), lit(1).as("hit"))), Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), count(col("hit")).as("n_hits"))
    exact
      .join(maybe, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("n_grams"),
        coalesce(col("n_maybe"), lit(0L)).as("n_maybe"),
        (coalesce(col("n_maybe"), lit(0L)) > 0).as("bloom_contaminated"),
        (col("n_hits") > 0).as("exact_contaminated"))
  }

  /** DuckDB re-derivation of [[bloomPrune]]: the bucket set, every probe,
    * and both verdicts rebuilt from scratch.
    */
  val bloomPruneSql: String = {
    val L = DecontGramTokens
    val m = BloomBits
    val poly = SketchQueries.polySql("gram")
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        g AS (SELECT doc_id, i AS pos, ${gramsSql(L)} gram
              FROM t, unnest(generate_series(1, len(w) - ${L - 1})) AS s(i)),
        ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 50 = 0),
        evh AS (SELECT gram, $poly AS h FROM ev),
        bits AS (
          SELECT DISTINCT (${SketchQueries.permSql("h", "500 + j")}) % $m AS bucket
          FROM evh CROSS JOIN range($BloomHashes) rj(j)),
        corpus AS (
          SELECT doc_id, pos, gram, $poly AS h FROM g WHERE doc_id % 50 != 0),
        probe AS (
          SELECT doc_id, pos, j, (${SketchQueries.permSql("h", "500 + j")}) % $m AS bucket
          FROM corpus CROSS JOIN range($BloomHashes) rj(j)),
        hits AS (
          SELECT doc_id, pos, count(*) AS nj
          FROM probe JOIN bits USING (bucket) GROUP BY 1, 2),
        maybe AS (
          SELECT doc_id, count(*) AS n_maybe FROM hits WHERE nj = $BloomHashes GROUP BY 1),
        ex AS (
          SELECT c.doc_id, count(*) AS n_grams, count(e.gram) AS n_hits
          FROM corpus c LEFT JOIN ev e USING (gram) GROUP BY 1)
        SELECT ex.doc_id, ex.n_grams,
               COALESCE(m.n_maybe, 0) AS n_maybe,
               COALESCE(m.n_maybe, 0) > 0 AS bloom_contaminated,
               ex.n_hits > 0 AS exact_contaminated
        FROM ex LEFT JOIN maybe m USING (doc_id)"""
  }

  // --------------------------------------------------------------------
  // q_sequence_pack — concat-and-chunk into fixed training sequences
  // --------------------------------------------------------------------

  /** Sequence packing: concatenate documents and chunk the token stream
    * into fixed [[PackSeqTokens]]-token training sequences, packed
    * independently per shard (the production layout — global packing
    * would serialize the corpus through one partition; per-shard packing
    * is embarrassingly parallel and what a 1000-file training dataset
    * actually looks like). Shard assignment is the same deterministic
    * md5 bucketing as [[hashSplit]]; within a shard, documents pack in
    * doc_id order. Output: each document's token offset and the
    * first/last sequence it lands in (a doc may straddle a boundary).
    *
    * Scale: one running-sum window per shard key; shard count is the
    * parallelism knob ([[PackShards]] here; a cluster uses O(10³)).
    */
  val PackSeqTokens = 256
  val PackShards = 8

  def sequencePack(s: SparkSession, dir: String): DataFrame = {
    val bucket = expr(md5BucketExpr(PackShards))
    val w = Window
      .partitionBy(col("shard"))
      .orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .documents(s, dir)
      .select(col("doc_id"), toks.as("w"))
      .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
      .withColumn("shard", bucket)
      .withColumn("cum_end", sum(col("n_tokens")).over(w))
      .select(
        col("doc_id"),
        col("shard"),
        col("n_tokens"),
        (col("cum_end") - col("n_tokens")).as("start_off"),
        expr(s"(cum_end - n_tokens) div $PackSeqTokens").as("first_seq"),
        expr(s"(cum_end - 1) div $PackSeqTokens").as("last_seq"))
  }

  val sequencePackSql: String =
    s"""WITH b AS (SELECT doc_id, len(string_split(text, ' ')) n_tokens,
          ${md5BucketSql(PackShards)} AS shard
        FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_end FROM b)
        SELECT doc_id, shard, CAST(n_tokens AS BIGINT) n_tokens,
          CAST(cum_end - n_tokens AS BIGINT) AS start_off,
          CAST((cum_end - n_tokens) // $PackSeqTokens AS BIGINT) AS first_seq,
          CAST((cum_end - 1) // $PackSeqTokens AS BIGINT) AS last_seq
        FROM c"""

  // --------------------------------------------------------------------
  // q_epoch_shuffle — deterministic per-epoch global shuffle into shards
  // --------------------------------------------------------------------

  /** Deterministic epoch shuffle: assign every packed training sequence
    * (the [[sequencePack]] layout) to `(epoch, out_shard, position)` so
    * each epoch is a REPRODUCIBLE global permutation of the corpus with
    * balanced output shards — the "reshuffle between epochs" step of a
    * training-data loader, computed entirely from hash arithmetic (the
    * [[hashSplit]] convention: md5 of a seeded key), never from a random
    * number generator, so any worker can recompute any epoch's layout
    * from scratch.
    *
    * Per (epoch, sequence): the shuffle key is the top 60 bits of
    * `md5(epoch:pack_shard:seq)`; `out_shard` = key mod
    * [[ShuffleShards]] (balanced in expectation like any hash
    * partitioner), and `position` = the key's rank within its
    * (epoch, out_shard) — i.e. sequences stream into each output shard
    * in hash order, which IS the permutation.
    *
    * Scale: the sequence universe comes from per-document spans
    * (`sequence(first_seq, last_seq)` — amplification bounded by
    * doc_len/[[PackSeqTokens]]) + one distinct, NOT from a per-shard
    * `sequence(0, n)` array that would materialize a shard's whole
    * epoch in one row. Rank never global-sorts: same two-level scheme
    * as [[langMixture]] — local `row_number` inside (epoch, out_shard,
    * top-8-hash-bits bucket), running bucket offsets over the tiny
    * (epochs × shards × 256) count table broadcast back. Plan-locked:
    * no rangepartitioning exchange anywhere (PlanAuditSpec).
    */
  val ShuffleEpochs = 3
  val ShuffleShards = 8

  def epochShuffle(s: SparkSession, dir: String): DataFrame = {
    val seqs = sequencePack(s, dir)
      .select(
        col("shard").as("pack_shard"),
        explode(expr("sequence(first_seq, last_seq)")).as("seq"))
      .distinct()
    val base = seqs
      .select(
        explode(expr(s"sequence(1L, ${ShuffleEpochs}L)")).as("epoch"),
        col("pack_shard"),
        col("seq"))
      .withColumn(
        "hkey",
        expr(
          "cast(conv(substring(md5(cast(concat_ws(':', " +
            "cast(epoch as string), cast(pack_shard as string), " +
            "cast(seq as string)) as binary)), 1, 15), 16, 10) as long)"))
      .withColumn("out_shard", col("hkey") % ShuffleShards)
      // top 8 bits of the 60-bit key ≡ the first two hex chars: an
      // order-consistent bucket prefix, so bucketed ranks compose into
      // the global hash order
      .withColumn("hb", shiftright(col("hkey"), 52))
      // persisted: feeds the local rank AND the bucket-offset table —
      // same clearCache() session contract as langMixture's projection
      .persist()
    val wLocal = Window
      .partitionBy(col("epoch"), col("out_shard"), col("hb"))
      .orderBy(col("hkey"), col("pack_shard"), col("seq"))
    val ranked = base.withColumn("local_rank", row_number().over(wLocal).cast("long"))
    val wOff = Window.partitionBy(col("epoch"), col("out_shard")).orderBy(col("hb"))
    val offsets = base
      .groupBy(col("epoch"), col("out_shard"), col("hb"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", sum(col("bc")).over(wOff) - col("bc"))
      .select(col("epoch"), col("out_shard"), col("hb"), col("off"))
    ranked
      .join(broadcast(offsets), Seq("epoch", "out_shard", "hb"))
      .select(
        col("epoch"),
        col("pack_shard"),
        col("seq"),
        col("out_shard"),
        (col("off") + col("local_rank") - 1).as("position"))
  }

  val epochShuffleSql: String =
    s"""WITH b AS (SELECT doc_id, len(string_split(text, ' ')) n_tokens,
          ${md5BucketSql(PackShards)} AS pack_shard
        FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (PARTITION BY pack_shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_end FROM b),
        seqs AS (SELECT DISTINCT pack_shard,
                   unnest(generate_series(
                     ((cum_end - n_tokens) // $PackSeqTokens)::BIGINT,
                     ((cum_end - 1) // $PackSeqTokens)::BIGINT)) AS seq
                 FROM c),
        keyed AS (SELECT e.epoch, pack_shard, seq,
                    CAST(concat('0x', substr(md5(e.epoch::VARCHAR || ':' ||
                      pack_shard::VARCHAR || ':' || seq::VARCHAR), 1, 15)) AS BIGINT) AS hkey
                  FROM seqs
                  CROSS JOIN (SELECT unnest(generate_series(1, $ShuffleEpochs)) AS epoch) e)
        SELECT epoch, pack_shard, seq, hkey % $ShuffleShards AS out_shard,
               row_number() OVER (PARTITION BY epoch, hkey % $ShuffleShards
                                  ORDER BY hkey, pack_shard, seq) - 1 AS position
        FROM keyed"""

  // --------------------------------------------------------------------
  // q_lang_mixture — balanced per-language downsample
  // --------------------------------------------------------------------

  /** Balanced language mixture: downsample every language to the size of
    * the smallest one, choosing documents by deterministic md5 order (a
    * seedless uniform draw that is stable across runs and partitionings).
    * The target size is a scalar aggregate broadcast to the filter. This
    * is the domain-mixture primitive of training-data curation: swap the
    * min-count target for externally supplied per-domain quotas and the
    * plan is unchanged.
    *
    * Scale: language is a skewed LOW-cardinality key — a naive
    * `row_number() OVER (PARTITION BY lang ORDER BY md5)` funnels every
    * language's documents through ONE reducer (a multi-TB external sort
    * per task at 100 TB). Instead the rank is computed two-level, exploiting
    * that md5 hex strings order lexicographically and therefore a PREFIX
    * of the hash is an order-consistent bucket key:
    *
    *   1. rank within (lang, first-2-hex-chars bucket) — 256 buckets per
    *      language, each partition sorts 1/256th of a language;
    *   2. per-bucket counts (a map-side partial aggregate, ≤ langs×256
    *      rows) turned into running offsets by a window over the TINY
    *      count table;
    *   3. global per-lang rank = bucket offset + local rank, broadcast
    *      joined back.
    *
    * Same semantics bit-for-bit (the oracle is unchanged); no
    * single-partition-per-language sort anywhere — locked by
    * PlanAuditSpec.
    */
  def langMixture(s: SparkSession, dir: String): DataFrame = {
    // persisted: the bucketed projection feeds the rank window, the
    // bucket-offset table AND the quota target — unpersisted, each
    // consumer rescans documents and re-md5s every doc_id (the window
    // and partial-agg exchanges differ, so ReuseExchange cannot dedup
    // them). Same clearCache() session contract as the sketch tables;
    // plan-audit-locked to one FileScan.
    val bucketed = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("lang"),
        expr("md5(cast(cast(doc_id as string) as binary))").as("ord"))
      .withColumn("bucket", substring(col("ord"), 1, 2))
      .persist()
    val target = bucketed
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("c"))
      .agg(min(col("c")).as("target"))
    // local rank inside each (lang, md5-prefix) bucket: 256× the
    // parallelism of a per-lang sort, order-consistent with global md5
    // order because the bucket IS the ordering prefix
    val wLocal = Window
      .partitionBy(col("lang"), col("bucket"))
      .orderBy(col("ord"), col("doc_id"))
    val ranked = bucketed
      .withColumn("local_rank", row_number().over(wLocal).cast("long"))
    // running bucket offsets over the tiny (lang × bucket) count table
    val wOff = Window.partitionBy(col("lang")).orderBy(col("bucket"))
    val offsets = bucketed
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", sum(col("bc")).over(wOff) - col("bc"))
      .select(col("lang"), col("bucket"), col("off"))
    ranked
      .join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("pick_rank", col("off") + col("local_rank"))
      .crossJoin(broadcast(target))
      .filter(col("pick_rank") <= col("target"))
      .select(col("doc_id"), col("lang"), col("pick_rank"))
  }

  val langMixtureSql: String =
    """WITH ranked AS (SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS pick_rank
         FROM documents)
       SELECT doc_id, lang, pick_rank FROM ranked
       WHERE pick_rank <= (SELECT min(c) FROM
         (SELECT count(*) c FROM documents GROUP BY lang) t)"""

  // --------------------------------------------------------------------
  // q_domain_mixture — temperature (α) sampling weights per language
  // --------------------------------------------------------------------

  /** The OTHER half of domain mixing ([[langMixture]] picks documents;
    * this computes the WEIGHTS): α-temperature sampling over language
    * token mass — `q_i ∝ p_i^α` with α = 0.5, the standard multilingual
    * rebalancing rule. Output per language: document/token counts, the
    * natural mass `p`, the tempered share `q`, and `boost = q/p` (the
    * up/down-sampling factor a sampler applies).
    *
    * Cross-engine determinism: token totals are exact BIGINTs; `p` is
    * one IEEE division; `sqrt` is correctly rounded in both engines. The
    * ONE order-sensitive step — the normalizer Σ√p over languages — is
    * computed as a SORTED left fold over the collected per-language
    * array (`aggregate(array_sort(collect_list(…)), 0, +)` ≡ DuckDB
    * `list_reduce(list_sort(list(…)), +)`; the zero seed is exact), so
    * both engines add in the identical order. The per-language table is
    * O(languages) — the fold is a scalar broadcast, not a data-plane
    * pattern.
    */
  def domainMixture(s: SparkSession, dir: String): DataFrame = {
    // persisted: the O(languages) aggregate feeds the total, the
    // normalizer fold, and the final projection — unpersisted, each
    // consumer would rescan and retokenize the WHOLE corpus for a
    // 4-row table (3 corpus passes at 100 TB). Same clearCache()
    // session contract as the sketch tables.
    val perLang = Tables
      .documents(s, dir)
      .select(col("lang"), size(toks).cast("long").as("n_tokens"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("lang_tokens"))
      .persist()
    val tot = perLang.agg(sum(col("lang_tokens")).as("total_tokens"))
    val withP = perLang
      .crossJoin(broadcast(tot))
      .withColumn("p", col("lang_tokens").cast("double") / col("total_tokens").cast("double"))
      .withColumn("sq", sqrt(col("p")))
    val denom = withP.agg(
      expr("aggregate(array_sort(collect_list(sq)), 0D, (a, x) -> a + x)").as("denom"))
    withP
      .crossJoin(broadcast(denom))
      .select(
        col("lang"),
        col("n_docs"),
        col("lang_tokens"),
        col("p"),
        (col("sq") / col("denom")).as("q"),
        (col("sq") / col("denom") / col("p")).as("boost"))
  }

  val domainMixtureSql: String =
    """WITH per_lang AS (
         SELECT lang, count(*) AS n_docs,
                CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS lang_tokens
         FROM documents GROUP BY lang
       ), withp AS (
         SELECT *, CAST(lang_tokens AS DOUBLE) /
                   CAST((SELECT sum(lang_tokens) FROM per_lang) AS DOUBLE) AS p
         FROM per_lang
       ), withsq AS (SELECT *, sqrt(p) AS sq FROM withp),
       d AS (SELECT list_reduce(list_sort(list(sq)), (a, b) -> a + b) AS denom FROM withsq)
       SELECT lang, n_docs, lang_tokens, p,
              sq / d.denom AS q,
              sq / d.denom / p AS boost
       FROM withsq, d"""

  // --------------------------------------------------------------------
  // q_token_budget — tempered per-source token quotas, greedily filled
  // --------------------------------------------------------------------

  /** Token-budget sampler — the operator that EXECUTES a mixture plan:
    * [[domainMixture]] computes tempered shares; this turns them into
    * per-source token quotas (`budget_i = ceil(frac × total × q_i)`,
    * α = 0.5 over source token mass) and fills each quota in
    * deterministic md5 document order as a PREFIX CUT — a document is
    * kept iff the cumulative token mass through it (kept or dropped
    * predecessors alike) still fits the quota, i.e. the kept set is the
    * longest md5-order prefix within budget, and the first overflowing
    * document closes the source (no partial documents, no
    * skip-and-backfill: backfilling with later smaller docs would bias
    * the sample toward short documents, which is why recipe samplers
    * cut rather than pack). Output per document: token count, tokens consumed
    * before it, its source's budget, and the keep verdict. Unlike
    * [[langMixture]] (equal DOC counts), the quota is token MASS — what
    * a pre-training data recipe actually budgets.
    *
    * Cross-engine exactness: quotas go through the same sorted-fold
    * denominator as [[domainMixture]] (both engines add identical
    * doubles in identical order; `0 + x ≡ x` bridges the seed
    * difference), `ceil` to BIGINT on an identically-associated
    * product; the fill cut compares exact BIGINT cumsums.
    *
    * Scale: the budget table is O(sources) — broadcast. The per-source
    * cumulative sum NEVER total-orders a source through one reducer:
    * same two-level decomposition as [[langMixture]]/[[epochShuffle]] —
    * running sums inside (source, md5-prefix bucket), bucket totals
    * rolled into offsets over the tiny (sources × 256) table, broadcast
    * back (plan-locked: no rangepartitioning, windows bucket-salted).
    */
  def tokenBudget(s: SparkSession, dir: String, frac: Double = 0.5): DataFrame = {
    // persisted: feeds the quota aggregate, the local cumsum AND the
    // bucket-offset table — same clearCache() session contract as the
    // sketch tables
    val base = Tables
      .documents(s, dir)
      .select(
        col("doc_id"),
        col("source"),
        size(toks).cast("long").as("n_tokens"),
        expr("md5(cast(cast(doc_id as string) as binary))").as("ord"))
      .withColumn("bucket", substring(col("ord"), 1, 2))
      .persist()
    val perSrc = base.groupBy(col("source")).agg(sum(col("n_tokens")).as("src_tokens"))
    val tot = perSrc.agg(sum(col("src_tokens")).as("total"))
    val withQ = perSrc
      .crossJoin(broadcast(tot))
      .withColumn("p", col("src_tokens").cast("double") / col("total").cast("double"))
      .withColumn("sq", sqrt(col("p")))
    val denom = withQ.agg(
      expr("aggregate(array_sort(collect_list(sq)), 0D, (a, x) -> a + x)").as("denom"))
    val budgets = withQ
      .crossJoin(broadcast(denom))
      .select(
        col("source"),
        ceil(lit(frac) * col("total") * (col("sq") / col("denom")))
          .cast("long")
          .as("budget"))
    val wLocal = Window
      .partitionBy(col("source"), col("bucket"))
      .orderBy(col("ord"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base.withColumn("cum_in_bucket", sum(col("n_tokens")).over(wLocal))
    val wOff = Window.partitionBy(col("source")).orderBy(col("bucket"))
    val offsets = base
      .groupBy(col("source"), col("bucket"))
      .agg(sum(col("n_tokens")).as("btok"))
      .withColumn("off", sum(col("btok")).over(wOff) - col("btok"))
      .select(col("source"), col("bucket"), col("off"))
    local
      .join(broadcast(offsets), Seq("source", "bucket"))
      .join(broadcast(budgets), Seq("source"))
      .select(
        col("doc_id"),
        col("source"),
        col("n_tokens"),
        (col("off") + col("cum_in_bucket") - col("n_tokens")).as("cum_before"),
        col("budget"),
        (col("off") + col("cum_in_bucket") <= col("budget")).as("kept"))
  }

  def tokenBudgetSql(frac: Double = 0.5): String =
    s"""WITH b AS (SELECT doc_id, source,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                md5(CAST(doc_id AS VARCHAR)) AS ord
         FROM documents),
       s AS (SELECT source, sum(n_tokens) AS src_tokens FROM b GROUP BY 1),
       w AS (SELECT source, src_tokens,
                    CAST(src_tokens AS DOUBLE) /
                    CAST((SELECT sum(src_tokens) FROM s) AS DOUBLE) AS p,
                    (SELECT sum(src_tokens) FROM s) AS total
             FROM s),
       wq AS (SELECT *, sqrt(p) AS sq FROM w),
       d AS (SELECT list_reduce(list_sort(list(sq)), (a, x) -> a + x) AS denom FROM wq),
       bud AS (SELECT source,
                      CAST(ceil($frac * total * (sq / denom)) AS BIGINT) AS budget
               FROM wq CROSS JOIN d),
       c AS (SELECT doc_id, source, n_tokens,
                    sum(n_tokens) OVER (PARTITION BY source ORDER BY ord, doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_end
             FROM b)
       SELECT c.doc_id, c.source, c.n_tokens,
              CAST(c.cum_end - c.n_tokens AS BIGINT) AS cum_before,
              bud.budget, (c.cum_end <= bud.budget) AS kept
       FROM c JOIN bud USING (source)"""

  // --------------------------------------------------------------------
  // q_source_profile — per-domain corpus report
  // --------------------------------------------------------------------

  /** The per-domain report a curation pipeline publishes before mixing:
    * document count, language spread, exact-duplicate count (docs minus
    * distinct content hashes), token mass, and mean document length.
    * One shuffle on the bounded `source` key with map-side partial
    * aggregation; the mean is a single division of exact integers.
    */
  def sourceProfile(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .select(
        col("source"),
        col("lang"),
        md5(col("text").cast("binary")).as("h"),
        size(toks).cast("long").as("n_tokens"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        (count(lit(1)) - countDistinct(col("h"))).as("dup_docs"),
        sum(col("n_tokens")).as("tok_total"),
        (sum(col("n_tokens")).cast("double") / count(lit(1)).cast("double"))
          .as("tok_avg"))

  val sourceProfileSql: String =
    """SELECT source, count(*) AS n_docs,
              count(DISTINCT lang) AS n_langs,
              count(*) - count(DISTINCT md5(text)) AS dup_docs,
              CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tok_total,
              CAST(sum(len(string_split(text, ' '))) AS DOUBLE) /
                CAST(count(*) AS DOUBLE) AS tok_avg
       FROM documents GROUP BY source"""

  // --------------------------------------------------------------------
  // q_length_histogram — integer-bucketed token-length distribution
  // --------------------------------------------------------------------

  /** Token-length histogram per language over power-of-two buckets —
    * the length-distribution view used to pick packing sequence lengths
    * and spot truncation cliffs. Buckets are integer CASE comparisons
    * (no float log), so the bucketing is trivially identical across
    * engines; one shuffle on (lang, bucket) with partial aggregation.
    */
  def lengthHistogram(s: SparkSession, dir: String): DataFrame = {
    val n = size(toks).cast("long")
    val bucket = when(n < 64, "0-63")
      .when(n < 128, "64-127")
      .when(n < 256, "128-255")
      .when(n < 512, "256-511")
      .otherwise("512+")
    Tables
      .documents(s, dir)
      .select(col("lang"), n.as("n_tokens"), bucket.as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
  }

  val lengthHistogramSql: String =
    """WITH t AS (SELECT lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
       SELECT lang,
              CASE WHEN n < 64 THEN '0-63' WHEN n < 128 THEN '64-127'
                   WHEN n < 256 THEN '128-255' WHEN n < 512 THEN '256-511'
                   ELSE '512+' END AS bucket,
              count(*) AS n_docs, min(n) AS min_tokens, max(n) AS max_tokens
       FROM t GROUP BY 1, 2"""

  // --------------------------------------------------------------------
  // q_ngram_novelty — novelty vs the corpus prefix (doc_id order)
  // --------------------------------------------------------------------

  /** Per-document novelty against everything EARLIER in the corpus: the
    * fraction of a document's 4-gram slots whose gram first appears in
    * this document (global first occurrence = min doc_id). The
    * dedup-aware data-ordering signal: a document of recycled grams
    * scores near 0, fresh text near 1.
    *
    * Scale: persisted token projection (documents scanned once,
    * plan-audit-locked); the gram stream is FIRST collapsed to
    * (gram, doc, occurrence-count) rows — a map-side partial aggregate,
    * so hot grams shrink before any network hop — then the first-doc
    * dimension is a second partial `min` over those pairs. UNLIKE
    * boilerplate's filtered dimension, first-doc has one row per
    * DISTINCT corpus gram and cannot broadcast at scale, so the
    * join-back is a gram-keyed shuffle join over the deduped (gram,
    * doc) pairs — per-gram row counts are bounded by the gram's
    * DOCUMENT frequency (not its slot count), and AQE skew-split
    * handles a pathological gram beyond that.
    */
  def ngramNovelty(s: SparkSession, dir: String): DataFrame = {
    // MEASURED trade (r7 A/B at sf0.1, min-of-3 warm: tokens-persisted
    // 1.34–1.94 s vs perDocGram-persisted 1.75–2.21 s): caching the
    // collapsed (gram, doc, occ) aggregate instead of the token
    // projection is SLOWER, not faster — n-grams are mostly unique per
    // document, so the "collapse" has nearly one string-keyed row per
    // gram slot and materializing it costs more than re-running the
    // codegen'd explode from the compact token cache. Same conclusion
    // as r5's single-scan work: the token projection is the right
    // persist point. Both consumers still read one file scan
    // (plan-audit-locked); the per-consumer recompute is the explode +
    // map-side partial agg only.
    val tokens = Tables.spread(Tables.documents(s, dir)) // 1-row-group scan; gram explode otherwise 1-core
      .select(col("doc_id"), toks.as("w"))
      .persist()
    val grams = tokens.select(col("doc_id"), explode(expr(gramsExpr(4))).as("g"))
    // slot counts per (gram, doc): the map-side combine that keeps a
    // boilerplate gram occurring 10⁹ times from shipping 10⁹ probe rows
    val perDocGram = grams
      .groupBy(col("g"), col("doc_id"))
      .agg(count(lit(1)).as("occ"))
    val firstDoc = perDocGram
      .groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
    perDocGram
      .join(firstDoc, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("occ")).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), col("occ")).otherwise(0L))
          .as("n_novel"))
      .select(
        col("doc_id"),
        col("n_grams"),
        col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams").cast("double"))
          .as("novelty_frac"))
  }

  val ngramNoveltySql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') w FROM documents),
        grams AS (SELECT doc_id, ${gramsSql(4)} g
                  FROM t, unnest(generate_series(1, len(w) - 3)) AS s(i)),
        fd AS (SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g)
        SELECT doc_id, count(*) AS n_grams,
               count(CASE WHEN first_doc = doc_id THEN 1 END) AS n_novel,
               CAST(count(CASE WHEN first_doc = doc_id THEN 1 END) AS DOUBLE) /
                 CAST(count(*) AS DOUBLE) AS novelty_frac
        FROM grams JOIN fd USING (g)
        GROUP BY doc_id"""

  /** RAG / context-window chunking defaults: 600-char chunks on a
    * 400-char stride (50% of a chunk carries over into the next — the
    * overlap retrieval pipelines use so no fact straddles a boundary
    * unseen).
    */
  val ChunkChars = 600
  val ChunkStride = 400

  /** Fixed-size overlapping document chunking — the retrieval-corpus
    * preparation step (RAG indexing, context-window packing): every
    * document becomes chunks at offsets 0, stride, 2·stride, …, each
    * [[ChunkChars]] characters (the last one shorter). Output is the
    * per-document chunk manifest: chunk count, character/token totals,
    * boundary lengths, and an order-sensitive content checksum (the
    * mod-prime poly hash of each chunk weighted by its 1-based index) so
    * the oracle pins exact chunk CONTENT and ORDER, not just counts.
    *
    * Scale: chunking is a pure per-row explode→project — zero shuffles
    * until the per-doc re-aggregation, which partial-aggregates map-side
    * (sums/min/max/count), so the wide exploded form never crosses the
    * wire. At 100 TB the explode factor is n_chars/stride ≈ 2.5× chars —
    * the downstream embedding pass dominates; this stage stays
    * scan-bound. No UDF on the size/count legs; the checksum leg is the
    * established SQL-reproducible [[TextHash.polyHash]] kernel.
    */
  /** The (doc_id, idx, chunk) grid shared by [[docChunk]] and
    * [[SearchQueries.ragE2e]] — ONE derivation (and ONE SQL mirror,
    * [[chunkGridCte]]) so the RAG pipeline can never chunk differently
    * from the chunk manifest it builds on.
    */
  private[queries] def chunkGrid(s: SparkSession, dir: String): DataFrame =
    Tables
      .documents(s, dir)
      .filter(length(col("text")) > 0)
      .select(
        col("doc_id"),
        col("text"),
        explode(sequence(lit(0), length(col("text")) - 1, lit(ChunkStride))).as("off"))
      .select(
        col("doc_id"),
        ((col("off") / ChunkStride).cast("long") + 1).as("idx"),
        expr(s"substring(text, off + 1, $ChunkChars)").as("chunk"))

  /** DuckDB mirror of [[chunkGrid]] as a CTE body. */
  private[queries] val chunkGridCte: String =
    s"""SELECT doc_id, i // $ChunkStride + 1 AS idx,
              substring(text, i + 1, $ChunkChars) AS chunk
       FROM (SELECT doc_id, text FROM documents WHERE length(text) > 0) d,
            unnest(generate_series(0, length(text) - 1, $ChunkStride)) s(i)"""

  def docChunk(s: SparkSession, dir: String): DataFrame = {
    val polyUdf = udf { (chunk: String) => TextHash.polyHash(chunk) }
    val chunks = chunkGrid(s, dir)
      .select(
        col("doc_id"),
        col("idx"),
        length(col("chunk")).cast("long").as("clen"),
        size(filter(split(col("chunk"), " ", -1), w => w =!= lit("")))
          .cast("long")
          .as("ctok"),
        polyUdf(col("chunk")).as("chash"))
    chunks
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum("clen").as("total_chunk_chars"),
        sum("ctok").as("total_chunk_tokens"),
        max(when(col("idx") === 1, col("clen"))).as("first_len"),
        max_by(col("clen"), col("idx")).as("last_len"),
        sum(col("idx") * col("chash")).as("chunk_checksum"))
  }

  /** DuckDB oracle for [[docChunk]]: the same offset grid, substring,
    * token filter, and weighted poly-hash checksum, re-derived in SQL.
    */
  val docChunkSql: String = {
    val poly = SketchQueries.polySql("chunk")
    s"""WITH ch AS ($chunkGridCte), st AS (
         SELECT doc_id, idx,
                length(chunk) AS clen,
                len(list_filter(string_split(chunk, ' '), w -> w <> '')) AS ctok,
                $poly AS chash
         FROM ch
       )
       SELECT doc_id, count(*) AS n_chunks,
              CAST(sum(clen) AS BIGINT) AS total_chunk_chars,
              CAST(sum(ctok) AS BIGINT) AS total_chunk_tokens,
              max(CASE WHEN idx = 1 THEN clen END) AS first_len,
              max_by(clen, idx) AS last_len,
              CAST(sum(idx * chash) AS BIGINT) AS chunk_checksum
       FROM st GROUP BY doc_id"""
  }

  /** Blocklist patterns for [[blocklistScan]] — SUBSTRING patterns (not
    * token matches: "tab" hits inside "table"), all borderless (no
    * proper prefix that is also a suffix), so overlap-counting AC equals
    * the non-overlapping count the replace-based oracle computes.
    */
  val BlocklistPatterns: Seq[String] =
    Seq("slow", "tab", "join", "scan", "stream", "merge", "windo", "agg",
      "has", "batch", "vector", "quer", "in")

  /** Hit-count threshold above which a document is flagged. */
  val BlocklistFlagThreshold = 40L

  /** Multi-pattern blocklist scan — the content-policy filtering pass of
    * a curation pipeline (badword/PII-keyword/license-string screens),
    * implemented as ONE [[graft.functions.AhoCorasick]] automaton pass
    * per document counting all patterns simultaneously.
    *
    * Verification is deliberately cross-algorithm: the DuckDB oracle
    * counts each pattern independently via the replace-length identity
    * `(len(t) − len(replace(t, p, ''))) / len(p)` — P scans per doc vs
    * the automaton's one — so an automaton bug (wrong failure link,
    * unmerged output chain) cannot be mirrored by the oracle.
    *
    * Scale: pure map stage, zero shuffles before the tiny per-doc
    * project; the automaton is built once on the driver and ships in
    * the closure. Cost is O(len + matches) per doc INDEPENDENT of
    * pattern count — at a 10⁵-entry production blocklist the naive
    * per-pattern pass is 10⁵ scans per doc and the automaton is still
    * one.
    */
  def blocklistScan(s: SparkSession, dir: String): DataFrame = {
    val ac = new graft.functions.AhoCorasick(BlocklistPatterns)
    val countsUdf = udf { (text: String) => ac.countMatches(text) }
    Tables
      .documents(s, dir)
      .select(col("doc_id"), countsUdf(col("text")).as("counts"))
      .select(
        col("doc_id"),
        aggregate(col("counts"), lit(0L), (a, x) => a + x).as("n_hits"),
        size(filter(col("counts"), _ > 0L)).cast("long").as("n_patterns"))
      .withColumn("flagged", col("n_hits") >= BlocklistFlagThreshold)
  }

  /** DuckDB oracle for [[blocklistScan]]: per-pattern replace-length
    * counting, summed per document.
    */
  val blocklistScanSql: String = {
    val vals = BlocklistPatterns.map(p => s"('$p')").mkString(", ")
    s"""WITH pats AS (SELECT * FROM (VALUES $vals) p(pat)),
        hits AS (
          SELECT d.doc_id, p.pat,
                 (length(d.text) - length(replace(d.text, p.pat, ''))) // length(p.pat) AS c
          FROM documents d CROSS JOIN pats p)
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_hits,
               CAST(count(CASE WHEN c > 0 THEN 1 END) AS BIGINT) AS n_patterns,
               sum(c) >= $BlocklistFlagThreshold AS flagged
        FROM hits GROUP BY doc_id"""
  }

  /** Number of BPE merge steps [[bpeTrain]] learns. */
  val BpeSteps = 8

  /** How many times the padded-replace is applied per merge — enough
    * passes to reach the replace fixpoint for any fixture word (each
    * pass merges at least one remaining pair).
    */
  val BpeReplacePasses = 8

  /** BPE tokenizer TRAINING — the vocabulary-learning step every LLM
    * data pipeline runs before token counting/packing means anything:
    * start from characters, repeatedly merge the highest-frequency
    * adjacent symbol pair (ties → lexicographically smallest pair, so
    * the whole run is deterministic), emit the learned merge table with
    * per-step pair frequency and resulting vocabulary size.
    *
    * Merge application semantics (IDENTICAL in both engines by
    * construction): symbols live in a space-separated padded string
    * `' a b c '`; a merge replaces `' l r '` with `' lr '`, re-applied
    * [[BpeReplacePasses]] times to its fixpoint. For alternating or
    * distinct symbols this equals standard left-to-right BPE (`a a a`
    * merges once, `a b a b` merges twice); for a run of 5+ IDENTICAL
    * symbols the pass-restarting replace deviates from textbook BPE —
    * each consumed pair also consumes the separator the next pair
    * needs, so `a a a a a a` reaches ` aa a aa a `, not ` aa aa aa `
    * (CurationSpec pins this). Training and encoding share the exact
    * same semantics in BOTH engines, so the tokenizer is
    * self-consistent end-to-end; the deviation only matters if the
    * learned merges were exported to a textbook-BPE encoder, and the
    * fixture vocabulary (max 8-char words, no 5+ same-letter runs)
    * never exercises it.
    *
    * Scale: training state is the WORD-frequency table (Zipf-bounded,
    * ≪ corpus — the standard BPE trick), rebuilt once from one corpus
    * scan; each step is one distributed pair-count aggregate + a 1-row
    * driver collect (the same control-plane scalar-per-round pattern as
    * [[graft.operators.ConnectedComponents]]) + a map-stage replace. The
    * DuckDB oracle replays all [[BpeSteps]] argmax/apply stages as
    * chained CTEs — static SQL, no data-dependent derivation.
    */
  /** The shared training loop: learn `steps` merges, returning the merge
    * log and the final tokenization of the word table (w, toks, cnt).
    * Caller unpersists the returned DataFrame.
    */
  private def bpeLearn(
      s: SparkSession,
      dir: String,
      steps: Int,
      needVocab: Boolean = true): (Seq[(Int, String, String, String, Long, Long)], DataFrame) = {
    val words = Tables
      .documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("cnt"))
    var toks = words
      .select(
        col("w"),
        concat(
          lit(" "),
          concat_ws(" ", expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")),
          lit(" ")).as("toks"),
        col("cnt"))
      .persist()
    // Per-round control plane, ONE action per round (r16): the round's
    // best pair and the previous round's vocab size are BOTH aggregates
    // over the same tokenization table, so they ride one tagged-union
    // collect (≤ 2 one-row subtrees over the persisted table) instead of
    // two driver round-trips — bpeTrain drops from 2 jobs/step to
    // 1 job/step + 1 seed job. The encoder (needVocab = false) was
    // already at 1 job/step; its shape is unchanged.
    def bestPair(t: DataFrame): DataFrame = t
      .select(col("cnt"), split(trim(col("toks")), " ").as("arr"))
      .filter(size(col("arr")) >= 2)
      .select(
        col("cnt"),
        explode(expr(
          "transform(sequence(0, size(arr) - 2), j -> concat(element_at(arr, j + 1), ' ', element_at(arr, j + 2)))"))
          .as("p"))
      .groupBy(col("p"))
      .agg(sum(col("cnt")).as("total"))
      .orderBy(col("total").desc, col("p").asc)
      .limit(1)
      .select(lit("best").as("tag"), col("p"), col("total"))
    def vocabCount(t: DataFrame): DataFrame = t
      .select(explode(split(trim(col("toks")), " ")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
      .select(lit("vocab").as("tag"), lit("").as("p"), col("v").as("total"))
    // tagged one-action collect: best pair of `t`, plus its vocab size
    // when the caller needs it (the union keeps the vocab row even when
    // no pair remains, which a crossJoin of the two would lose)
    def stats(t: DataFrame, withVocab: Boolean): (Option[(String, Long)], Long) = {
      val df = if (withVocab) bestPair(t).unionAll(vocabCount(t)) else bestPair(t)
      val got = df.collect()
      val best = got.find(_.getString(0) == "best").map(r => (r.getString(1), r.getLong(2)))
      val vocab = got.find(_.getString(0) == "vocab").map(_.getLong(2)).getOrElse(0L)
      (best, vocab)
    }
    val rows = Seq.newBuilder[(Int, String, String, String, Long, Long)]
    var step = 1
    // seed: the first round's best pair (the initial table's vocab is
    // not reported, so no vocab leg here)
    var pending = stats(toks, withVocab = false)._1
    while (step <= steps && pending.nonEmpty) {
      val (pair, total) = pending.get
      val Array(l, r) = pair.split(" ")
      // merge tokens are corpus-derived strings heading into a SQL
      // literal — escape the literal delimiters (quote, backslash)
      // so an apostrophe-bearing word cannot break the expression
      def esc(t: String) = t.replace("\\", "\\\\").replace("'", "\\'")
      val pat = s" ${esc(l)} ${esc(r)} "
      val rep = s" ${esc(l)}${esc(r)} "
      val applied = (1 to BpeReplacePasses)
        .foldLeft("toks")((acc, _) => s"replace($acc, '$pat', '$rep')")
      val next = toks.select(col("w"), expr(applied).as("toks"), col("cnt")).persist()
      // one action on the merged table: next round's best pair + (train
      // only) this round's vocab size. A None best ends the loop — every
      // word is a single symbol, return the merges learned so far. After
      // the FINAL merge no next pair is needed: the trainer collects just
      // the vocab leg, the encoder skips the action entirely.
      val (nextBest, vocab) =
        if (step < steps) stats(next, withVocab = needVocab)
        else if (needVocab)
          (None, vocabCount(next).collect().headOption.map(_.getLong(2)).getOrElse(0L))
        else (None, 0L)
      toks.unpersist()
      toks = next
      rows += ((step, l, r, l + r, total, vocab))
      pending = nextBest
      step += 1
    }
    (rows.result(), toks)
  }

  def bpeTrain(s: SparkSession, dir: String, steps: Int = BpeSteps): DataFrame = {
    val (rows, toks) = bpeLearn(s, dir, steps)
    toks.unpersist()
    import s.implicits._
    rows.toDF("step", "lhs", "rhs", "merged", "pair_count", "vocab_after")
  }

  /** BPE ENCODING with the vocabulary [[bpeTrain]] learns — the
    * trainer→encoder round trip: re-derive the merge table, apply it to
    * the word inventory, and report per-document subword statistics
    * (token count, distinct subwords, chars-per-token compression). The
    * per-word token counts come from the final training tokenization —
    * one broadcast-sized (word → n_subwords) map joined onto the
    * exploded corpus, exactly how a production encoder amortizes BPE
    * over a Zipf vocabulary instead of re-merging every occurrence.
    *
    * Scale: everything [[bpeTrain]] says, plus one broadcast join of the
    * word→stats map onto the corpus explode (map-side; the corpus never
    * shuffles) and a per-doc partial aggregation.
    */
  def bpeEncode(s: SparkSession, dir: String, steps: Int = BpeSteps): DataFrame = {
    val (_, toks) = bpeLearn(s, dir, steps, needVocab = false)
    val wordStats = toks.select(
      col("w"),
      size(split(trim(col("toks")), " ")).cast("long").as("n_sub"))
    val out = Tables
      .documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .join(broadcast(wordStats), "w")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("n_sub")).as("n_bpe_tokens"),
        sum(length(col("w"))).as("n_word_chars"))
      .select(
        col("doc_id"),
        col("n_words"),
        col("n_bpe_tokens"),
        round(col("n_word_chars").cast("double") / col("n_bpe_tokens").cast("double"), 6)
          .as("chars_per_token"))
    // toks stays persisted until the session's clearCache — the result is
    // lazy and wordStats reads it at materialization time
    out
  }

  /** DuckDB oracle for [[bpeTrain]]: the same [[BpeSteps]] greedy stages
    * as chained CTEs — per stage an argmax over adjacent-pair
    * frequencies (same tie-break) and the same [[BpeReplacePasses]]×
    * padded replace.
    */
  /** Shared WITH-clause body replaying the [[BpeSteps]] training stages
    * (words → t0 → pairs/best/t/vocab/row per step), words carried
    * through for the encode leg.
    */
  private def bpeStagesSql: String = {
    def stage(i: Int): String = {
      val prev = if (i == 1) "t0" else s"t${i - 1}"
      val applied = (1 to BpeReplacePasses).foldLeft("t.toks")((acc, _) =>
        s"replace($acc, ' ' || b.p || ' ', ' ' || replace(b.p, ' ', '') || ' ')")
      s"""pairs_$i AS (
           SELECT arr[j] || ' ' || arr[j+1] AS p, CAST(sum(cnt) AS BIGINT) AS total
           FROM (SELECT string_split(trim(toks), ' ') AS arr, cnt FROM $prev),
                unnest(generate_series(1, len(arr) - 1)) s(j)
           WHERE len(arr) >= 2
           GROUP BY 1
         ), best_$i AS (
           SELECT p, total FROM pairs_$i ORDER BY total DESC, p LIMIT 1
         ), t$i AS (
           SELECT t.w, $applied AS toks, t.cnt FROM $prev t CROSS JOIN best_$i b
         ), vocab_$i AS (
           SELECT count(DISTINCT tok) AS v
           FROM (SELECT unnest(string_split(trim(toks), ' ')) AS tok FROM t$i)
         ), row_$i AS (
           SELECT $i AS step,
                  split_part(b.p, ' ', 1) AS lhs,
                  split_part(b.p, ' ', 2) AS rhs,
                  replace(b.p, ' ', '') AS merged,
                  b.total AS pair_count,
                  v.v AS vocab_after
           FROM best_$i b CROSS JOIN vocab_$i v
         )"""
    }
    val stages = (1 to BpeSteps).map(stage).mkString(",\n")
    s"""words AS (
         SELECT w, count(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         WHERE w <> '' GROUP BY w
       ), t0 AS (
         SELECT w, ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS toks, cnt
         FROM words
       ),
       $stages"""
  }

  val bpeTrainSql: String = {
    val unions = (1 to BpeSteps).map(i => s"SELECT * FROM row_$i").mkString(" UNION ALL ")
    s"WITH $bpeStagesSql\n$unions"
  }

  /** DuckDB oracle for [[bpeEncode]]: the same replayed stages, final
    * tokenization joined back onto the exploded corpus.
    */
  val bpeEncodeSql: String =
    s"""WITH $bpeStagesSql,
        enc AS (
          SELECT w, CAST(len(string_split(trim(toks), ' ')) AS BIGINT) AS n_sub
          FROM t$BpeSteps
        ), dw AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
        )
        SELECT dw.doc_id,
               count(*) AS n_words,
               CAST(sum(e.n_sub) AS BIGINT) AS n_bpe_tokens,
               round(CAST(sum(length(dw.w)) AS DOUBLE) / CAST(sum(e.n_sub) AS DOUBLE), 6)
                 AS chars_per_token
        FROM dw JOIN enc e USING (w)
        WHERE dw.w <> ''
        GROUP BY 1"""

  /** Mixture budget for [[temperatureMix]]. */
  private val MixBudget = 200L

  /** Temperature-based source mixing — the multilingual/multi-source
    * sampling step of a training-data pipeline: per-source quotas
    * ∝ n_s^0.5 (√-temperature flattens the head; sqrt is
    * IEEE-correctly-rounded, unlike pow(x, 0.7), so the weights are
    * bit-stable cross-engine), allocated over a fixed budget by the
    * LARGEST-REMAINDER method in exact integer arithmetic (quantized
    * ⌊10¹²·w/Σw⌋ shares; ties break on source name), then each
    * source's quota filled by deterministic md5 order through a
    * two-level (source, hex-bucket) rank — no source-wide window, the
    * q_token_budget salt discipline. The quota table is a bounded
    * source dimension — the only partition-less window in the plan
    * ranks ITS remainders, never documents.
    *
    * Budget caveat (documented, spec-exercised on a skewed corpus):
    * √-temperature deliberately over-weights tiny sources, so a quota
    * can exceed a source's document count; the fill then yields
    * min(quota, n) rows and the total under-shoots the budget. The
    * standard remedies (iterative redistribution) trade determinism
    * for exactness-of-budget; this operator keeps the allocation
    * closed-form and reports the quota so the shortfall is visible.
    */
  def temperatureMix(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // ONE persisted corpus projection feeds both the source counts and
    // the selection pass (the documents-scanned-once discipline)
    val base = Tables
      .documents(s, dir)
      .select(
        col("source"),
        col("doc_id"),
        md5(col("doc_id").cast("string").cast("binary")).as("h"))
      // md5 hex strings order lexicographically, so the first hex char
      // is an order-consistent bucket prefix — the q_token_budget /
      // q_epoch_shuffle salt that keeps the per-source fill off a
      // single reducer
      .withColumn("hb", substring(col("h"), 1, 1))
      .persist()
    val counts = base
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", sqrt(col("n").cast("double")))
    val d = counts.agg(
      expr("aggregate(array_sort(collect_list(struct(source, w as t))), 0.0D, (a, x) -> a + x.t)")
        .as("dsum"))
    val quotas = counts
      .crossJoin(broadcast(d))
      // q-domain (Quantize): w/dsum ≤ 1, so the floor operand is ≤ 1e12
      // at any corpus size — far inside the BIGINT bound
      .withColumn("q", expr("cast(floor(1e12 * w / dsum) as bigint)"))
      .withColumn("base_q", expr(s"$MixBudget * q div 1000000000000"))
      .withColumn("rem", expr(s"$MixBudget * q % 1000000000000"))
    val leftover = quotas.agg((lit(MixBudget) - sum(col("base_q"))).as("leftover"))
    val ranked = quotas
      .crossJoin(broadcast(leftover))
      .withColumn(
        "rk",
        row_number().over(Window.orderBy(col("rem").desc, col("source"))))
      .withColumn("quota",
        col("base_q") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
      .select(col("source"), col("quota"))
    // two-level rank: local row_number per (source, hex bucket) + the
    // broadcast bucket-offset table, composed in bucket order — the
    // global per-source md5 rank with NO source-wide window
    val wLocal = Window.partitionBy(col("source"), col("hb")).orderBy(col("h"), col("doc_id"))
    val wOff = Window.partitionBy(col("source")).orderBy(col("hb"))
    val offsets = base
      .groupBy(col("source"), col("hb"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum(col("bc")).over(wOff) - col("bc"), lit(0L)))
      .select(col("source"), col("hb"), col("off"))
    base
      .withColumn("lr", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("source", "hb"))
      .withColumn("sel_rank", col("off") + col("lr"))
      .join(broadcast(ranked), Seq("source"))
      .filter(col("sel_rank") <= col("quota"))
      .select(col("source"), col("doc_id"), col("sel_rank"), col("quota"))
  }

  val temperatureMixSql: String =
    s"""WITH counts AS (
         SELECT source, count(*) AS n, sqrt(count(*)) AS w
         FROM documents GROUP BY 1),
       d AS (SELECT list_reduce(list_prepend(0.0, list(w ORDER BY source)),
                                (a, x) -> a + x) AS dsum FROM counts),
       quotas AS (
         SELECT source, n,
                CAST(floor(1e12 * w / dsum) AS BIGINT) AS q
         FROM counts, d),
       alloc AS (
         SELECT source, n,
                $MixBudget * q // 1000000000000 AS base,
                $MixBudget * q % 1000000000000 AS rem
         FROM quotas),
       lo AS (SELECT $MixBudget - CAST(sum(base) AS BIGINT) AS leftover FROM alloc),
       ranked AS (
         SELECT source, n,
                CAST(base + CASE WHEN row_number()
                    OVER (ORDER BY rem DESC, source) <= leftover
                  THEN 1 ELSE 0 END AS BIGINT) AS quota
         FROM alloc, lo),
       sel AS (
         SELECT source, doc_id,
                row_number() OVER (PARTITION BY source
                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sel_rank
         FROM documents)
       SELECT s.source, s.doc_id, CAST(s.sel_rank AS BIGINT) AS sel_rank, r.quota
       FROM sel s JOIN ranked r ON s.source = r.source
       WHERE s.sel_rank <= r.quota"""

  /** Curriculum ordering — shortest-first training order WITHOUT a
    * global sort: bucket = n_chars div 64 (order-preserving), local
    * rank per bucket, broadcast bucket-count offsets accumulated in
    * bucket order — the q_epoch_shuffle two-level discipline, so the
    * emitted position equals the global (n_chars, doc_id) rank while
    * no corpus-wide window or range partitioning ever exists in the
    * plan.
    */
  def curriculumOrder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables
      .documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("bkt", expr("n_chars div 64"))
      .persist()
    val wLocal = org.apache.spark.sql.expressions.Window
      .partitionBy(col("bkt"))
      .orderBy(col("n_chars"), col("doc_id"))
    val wOff = org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
    val offsets = docs
      .groupBy(col("bkt"))
      .agg(count(lit(1)).as("bc"))
      .withColumn("off", coalesce(sum(col("bc")).over(wOff) - col("bc"), lit(0L)))
      .select(col("bkt"), col("off"))
    docs
      .withColumn("lr", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), Seq("bkt"))
      .select(col("doc_id"), col("n_chars"), (col("off") + col("lr")).as("curriculum_pos"))
  }

  val curriculumOrderSql: String =
    """SELECT doc_id, n_chars,
              CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT)
                AS curriculum_pos
       FROM documents"""
}
