package graft.queries

import graft.Tables
import graft.functions.{MinK, TextHash}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probabilistic summary sketches over the `documents` corpus — the
  * cardinality / frequency estimators a 100 TB profiling pass runs where
  * exact answers would need an unbounded shuffle. Both sketches use the
  * SQL-reproducible mod-prime universal hash family ([[TextHash.permHash]]),
  * so the DuckDB oracle re-derives every counter and minimum bit-for-bit —
  * the estimates are checked exactly, not statistically.
  *
  * The small-SF queries also carry the exact answer alongside the estimate
  * (the verification leg); at production scale the exact leg is what you
  * drop — the sketch legs alone are one bounded-state shuffle each.
  */
object SketchQueries {

  private val P = TextHash.P

  /** DuckDB fragment: [[TextHash.polyHash]] of column/binding `w`. */
  private[queries] def polySql(w: String): String =
    s"""list_reduce(list_prepend(0::BIGINT, [unicode(c)::BIGINT FOR c IN string_split($w, '')]),
                    (acc, c) -> (acc*31 + c + 1) % $P)"""

  /** DuckDB fragment: [[TextHash.permHash]] of hash expression `h` with
    * seed expression `i` (both SQL expressions; every intermediate < 2⁶²).
    */
  private[queries] def permSql(h: String, i: String): String =
    s"""((1 + ((($i)::BIGINT*1103515245 + 12345) % ${P - 1})) * ($h)
         + (($i)::BIGINT*2654435761 + 1013904223) % $P) % $P"""

  /** KMV (k-minimum-values) distinct-count sketch: estimated number of
    * distinct word bigrams per source vs the exact count.
    *
    * The estimator: hash every bigram through a fixed bijection of
    * [0, P) ([[TextHash.permHash]] seed 7 — P prime makes every family
    * member invertible, so distinct hashes ≡ distinct bigram hashes); keep
    * the k smallest distinct hash values per source; if the k-th smallest
    * is h₍ₖ₎, the set behaves like a uniform sample of density k/h₍ₖ₎ and
    * the cardinality estimate is (k−1)·P / h₍ₖ₎ (the classic KMV/bottom-k
    * estimator). Sources with fewer than k distinct values report exactly.
    *
    * Scale: the sketch leg is ONE shuffle with O(k) state per key at every
    * stage — [[graft.functions.MinK]] is a bounded sorted-array
    * `Aggregator`, duplicate-insensitive, so map-side partial aggregation
    * never buffers more than k longs per source per partition. The exact
    * leg (distinct + count) exists only as the verification comparison;
    * a 100 TB profiling pass runs the sketch leg alone. Both legs share
    * one persisted hashed projection so the corpus is scanned once.
    */
  def kmvDistinct(s: SparkSession, dir: String, k: Int = 16): DataFrame = {
    val hUdf = udf { (g: String) => TextHash.permHash(TextHash.polyHash(g), 7L) }
    val grams = Tables
      .documents(s, dir)
      .select(col("source"), split(col("text"), " ", -1).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(
        col("source"),
        explode(array_distinct(expr(
          "transform(sequence(0, size(ws) - 2), i -> concat(element_at(ws, i + 1), ' ', element_at(ws, i + 2)))")))
          .as("g"))
      .select(col("source"), hUdf(col("g")).as("h"))
      .persist()
    val minK = udaf(new MinK(k))
    val sketch = grams.groupBy(col("source")).agg(minK(col("h")).as("mins"))
    val exact = grams.distinct().groupBy(col("source")).agg(count(lit(1)).as("n_exact"))
    sketch
      .join(exact, "source")
      .select(
        col("source"),
        col("n_exact"),
        get(col("mins"), lit(k - 1)).as("kth_hash"),
        round(
          when(size(col("mins")) < k, col("n_exact").cast("double"))
            .otherwise(lit((k - 1).toDouble * P) / get(col("mins"), lit(k - 1)).cast("double")),
          4).as("est_distinct"))
  }

  /** DuckDB re-derivation of [[kmvDistinct]]: same bigrams, same hash
    * bijection, `list_sort(list(h))[1:k]` as the bottom-k, same estimator.
    */
  def kmvDistinctSql(k: Int = 16): String =
    s"""WITH ws AS (
         SELECT source, string_split(text, ' ') AS ws FROM documents
       ), grams AS (
         SELECT source,
                unnest(list_distinct([ws[i+1] || ' ' || ws[i+2] FOR i IN range(len(ws) - 1)])) AS g
         FROM ws WHERE len(ws) >= 2
       ), hs AS (
         SELECT DISTINCT source, ${permSql(polySql("g"), "7")} AS h
         FROM grams
       ), agg AS (
         SELECT source, count(*) AS n_exact, list_sort(list(h))[1:$k] AS mins
         FROM hs GROUP BY source
       )
       SELECT source, n_exact,
              CASE WHEN len(mins) >= $k THEN mins[$k] END AS kth_hash,
              round(CASE WHEN len(mins) < $k THEN CAST(n_exact AS DOUBLE)
                         ELSE (CAST(${k - 1} AS DOUBLE) * $P) / CAST(mins[$k] AS DOUBLE)
                    END, 4) AS est_distinct
       FROM agg"""

  /** Count-min sketch heavy hitters: a depth×width grid of counters
    * (counter[d][b] = total occurrences of every token hashing to bucket b
    * under family member 100+d), read back for the exact top-`topN` tokens.
    * `est_cnt = min_d counter[d][bucket_d(w)]` — the count-min guarantee is
    * est ≥ exact always, with overestimates only from bucket collisions.
    *
    * Scale: the sketch build is a groupBy over at most depth·width keys —
    * map-side combine collapses every partition to ≤ depth·width partial
    * counters, so the shuffle moves O(grid) rows per partition no matter
    * how many tokens flow through (the whole point of count-min at 100 TB).
    * The read-back joins the tiny grid to the top-N list. The exact counts
    * (one token-keyed shuffle) are the verification leg.
    */
  def heavyHitters(
      s: SparkSession,
      dir: String,
      depth: Int = 4,
      width: Int = 256,
      topN: Int = 20): DataFrame = {
    val bUdf = udf { (w: String, d: Int) =>
      TextHash.permHash(TextHash.polyHash(w), 100L + d) % width
    }
    val toks = Tables
      .documents(s, dir)
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "")
      .persist()
    val cells = toks
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .select(col("d"), bUdf(col("w"), col("d")).as("bucket"))
      .groupBy(col("d"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val top = toks
      .groupBy(col("w"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("w"))
      .limit(topN)
    top
      .withColumn("d", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bUdf(col("w"), col("d")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("w"), col("exact_cnt"))
      .agg(min(col("cnt")).as("est_cnt"))
      .select(col("w").as("token"), col("exact_cnt"), col("est_cnt"))
  }

  /** DuckDB re-derivation of [[heavyHitters]]: every grid counter rebuilt
    * from the token stream, the same min-over-rows read-back.
    */
  def heavyHittersSql(depth: Int = 4, width: Int = 256, topN: Int = 20): String =
    s"""WITH toks AS (
         SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
         FROM documents
       ), th AS (
         SELECT w, ${polySql("w")} AS h FROM toks
       ), cells AS (
         SELECT d, (${permSql("h", "100 + d")}) % $width AS bucket, count(*) AS cnt
         FROM th CROSS JOIN (SELECT unnest(range($depth)) AS d) dd
         GROUP BY 1, 2
       ), wh AS (
         SELECT w, count(*) AS exact_cnt, ${polySql("w")} AS h
         FROM toks GROUP BY w
       ), top AS (
         SELECT w, exact_cnt, h FROM wh ORDER BY exact_cnt DESC, w LIMIT $topN
       )
       SELECT t.w AS token, t.exact_cnt, min(c.cnt) AS est_cnt
       FROM top t
       CROSS JOIN (SELECT unnest(range($depth)) AS d) dd
       JOIN cells c
         ON c.d = dd.d
        AND c.bucket = (${permSql("t.h", "100 + dd.d")}) % $width
       GROUP BY 1, 2"""
}
