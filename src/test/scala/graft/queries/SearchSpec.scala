package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Functional locks for the search/sampling operators ([[SearchQueries]]).
  * The DuckDB hash oracle checks exact parity; these tests pin the
  * *semantic* invariants that would survive an oracle rewrite: ranking
  * monotonicity, cumulative-curve consistency, and sampling determinism.
  */
class SearchSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("search-spec", "4")
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  test("bm25: ranks are 1..k, scores non-increasing, all query-term hits scored") {
    val rows = SearchQueries.bm25Search(spark, dir).orderBy(col("rank")).collect()
    assert(rows.length == 50)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to 50L))
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every returned doc matched at least one query term (positive score)
    assert(scores.forall(_ > 0.0))
  }

  test("bm25: a document with more query-term hits outranks an otherwise-similar one") {
    val rows = SearchQueries.bm25Search(spark, dir).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // among same-length docs in the result, total tf orders with score
    val sameDl = rows.groupBy(_.getAs[Long]("dl")).values.filter(_.length >= 2)
    for (group <- sameDl; a <- group; b <- group) {
      val tfSum = (r: org.apache.spark.sql.Row) =>
        SearchQueries.Bm25QueryTerms.map(t => r.getAs[Long](s"tf_$t")).sum
      if (tfSum(a) > tfSum(b) &&
        SearchQueries.Bm25QueryTerms.forall(t =>
          a.getAs[Long](s"tf_$t") >= b.getAs[Long](s"tf_$t")))
        assert(a.getAs[Double]("bm25") >= b.getAs[Double]("bm25"),
          s"dominating tf vector must not score lower: $a vs $b")
    }
    assert(byId.nonEmpty)
  }

  test("vocab growth: cumulative curves are monotone and close the corpus totals") {
    val rows = SearchQueries.vocabGrowth(spark, dir).orderBy(col("bucket")).collect()
    assert(rows.nonEmpty)
    val cumV = rows.map(_.getAs[Long]("cum_vocab"))
    val cumT = rows.map(_.getAs[Long]("cum_tokens"))
    assert(cumV.zip(cumV.tail).forall { case (a, b) => a <= b }, "vocab curve must be monotone")
    assert(cumT.zip(cumT.tail).forall { case (a, b) => a < b }, "token curve must be strictly growing")
    // the last checkpoint equals independent corpus-wide recounts
    val docs = graft.Tables.documents(spark, dir)
    val vocab = docs
      .select(explode(split(col("text"), " ", -1)).as("t"))
      .agg(countDistinct(col("t")))
      .head()
      .getLong(0)
    val toks = docs
      .select(size(split(col("text"), " ", -1)).cast("long").as("n"))
      .agg(sum(col("n")))
      .head()
      .getLong(0)
    assert(cumV.last == vocab)
    assert(cumT.last == toks)
    // per-bucket new_terms sums to the vocabulary
    assert(rows.map(_.getAs[Long]("new_terms")).sum == vocab)
  }

  test("weighted sample: deterministic across runs, k rows, ranks contiguous") {
    val a = SearchQueries.weightedSample(spark, dir).collect()
    val b = SearchQueries.weightedSample(spark, dir).collect()
    assert(a.length == 100)
    assert(a.map(_.toString).sorted.toSeq == b.map(_.toString).sorted.toSeq)
    assert(a.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 100L))
    // priorities are ln(u)/w ≤ 0 and non-increasing in rank order
    val byRank = a.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("priority"))
    assert(byRank.forall(_ <= 0.0))
    assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y })
  }

  test("lm perplexity: scores are negative log-probs, bounded by the vocabulary, deterministic") {
    val rows = SearchQueries.lmPerplexity(spark, dir).collect()
    // the operator scores documents with >= 2 tokens — mirror that
    // filter here so a future corpus with a 1-token doc doesn't fail
    // the suite on documented behavior
    val docs = graft.Tables
      .documents(spark, dir)
      .filter(size(split(col("text"), " ", -1)) >= 2)
      .count()
    assert(rows.length == docs, "every document with >= 2 tokens must be scored")
    val scores = rows.map(_.getAs[Double]("avg_logprob"))
    // MLE bigram probs are in (0, 1]: mean log-prob is <= 0, and can
    // never be below ln(1/total-bigram-count)
    assert(scores.forall(_ <= 0.0))
    val totalBigrams = rows.map(_.getAs[Long]("n_bigrams")).sum
    assert(scores.forall(_ >= math.log(1.0 / totalBigrams)))
    val again = SearchQueries.lmPerplexity(spark, dir).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("weighted sample: size-biased — kept docs are longer than the corpus average") {
    val kept = SearchQueries.weightedSample(spark, dir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    val corpus = graft.Tables.documents(spark, dir)
      .agg(avg(col("n_chars"))).head().getDouble(0)
    // ES sampling with weight = n_chars keeps long docs more often; with
    // k=100 of 500 the kept-mean exceeding the corpus-mean is a stable
    // deterministic property of the fixed hash draw, not a flaky t-test
    assert(kept > corpus, s"kept mean $kept should exceed corpus mean $corpus")
  }

  test("phrase oracle precondition: substring occurrences are token-aligned on every fixture") {
    // The DuckDB oracle counts raw substring occurrences (replace-length
    // trick); the operator counts token-aligned ones. They agree only
    // while no corpus token has a phrase as a boundary-crossing
    // substring. Pin that property on both verify-relevant fixtures so
    // a corpus change fails HERE with a message, not as an inscrutable
    // oracle mismatch on a correct implementation.
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val texts =
        graft.Tables.documents(spark, d).select("text").collect().map(_.getString(0))
      for (phrase <- SearchQueries.SearchPhrases) {
        val words = phrase.split(" ").toSeq
        var substr = 0L
        var aligned = 0L
        texts.foreach { t =>
          var i = t.indexOf(phrase)
          while (i >= 0) { substr += 1; i = t.indexOf(phrase, i + phrase.length) }
          val toks = t.split(" ", -1).filter(_.nonEmpty).toSeq
          aligned += toks.indices.count(j =>
            j + words.length <= toks.length && toks.slice(j, j + words.length) == words)
        }
        assert(
          substr == aligned,
          s"$d phrase '$phrase': substring=$substr aligned=$aligned — the corpus now " +
            "has boundary-crossing matches and the replace-length oracle is invalid")
      }
    }
  }

  test("phrase search: position-join model on sf0.001 matches brute-force token scan") {
    val got = SearchQueries
      .phraseSearch(spark, dir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(got.keySet == SearchQueries.SearchPhrases.toSet)
    val docs = graft.Tables
      .documents(spark, dir)
      .select("doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq))
    for (phrase <- SearchQueries.SearchPhrases) {
      val words = phrase.split(" ").toSeq
      val perDoc = docs.map { case (_, toks) =>
        toks.indices.count(i =>
          i + words.length <= toks.length && toks.slice(i, i + words.length) == words)
      }
      val expect = (perDoc.count(_ > 0).toLong, perDoc.map(_.toLong).sum)
      assert(got(phrase) == expect, s"phrase '$phrase'")
    }
    // the multi-hop path must be exercised by at least one live trigram
    assert(got.exists { case (p, (d, _)) => p.split(" ").length >= 3 && d > 0 },
      "no 3+-word phrase with matches — the chained join path is untested")
    spark.catalog.clearCache()
  }

  test("phrase search: oracle precondition — substring counts align to token boundaries") {
    // The replace-length oracle counts RAW substring occurrences; the
    // engine counts token adjacency. They agree iff no phrase occurrence
    // can be misaligned: a phrase's first word must not be a proper
    // SUFFIX of any corpus token, nor its last word a proper PREFIX
    // (middle words sit between literal spaces, so they are always whole
    // tokens). This guard fails LOUDLY if the corpus is ever regenerated
    // with e.g. plural forms ('joins', 'scans') instead of silently
    // passing a diverged oracle. Checked on the correctness-gate corpus.
    val vocab = graft.Tables
      .documents(spark, "/root/testdata/sf0.01")
      .selectExpr("explode(split(text, ' ')) AS w")
      .filter("w <> ''")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    for (phrase <- SearchQueries.SearchPhrases) {
      val words = phrase.split(" ")
      val (first, last) = (words.head, words.last)
      val badSuffix = vocab.filter(t => t != first && t.endsWith(first))
      val badPrefix = vocab.filter(t => t != last && t.startsWith(last))
      assert(badSuffix.isEmpty,
        s"'$phrase': corpus tokens $badSuffix end with boundary word '$first' — oracle would overcount")
      assert(badPrefix.isEmpty,
        s"'$phrase': corpus tokens $badPrefix start with boundary word '$last' — oracle would overcount")
    }
  }

  test("text_rank: damped weighted ranks are lawful and deterministic") {
    val a = SearchQueries.textRank(spark, dir).collect()
    assert(a.nonEmpty && a.length <= 20)
    val ranks = a.map(_.getAs[Double]("textrank"))
    // every rank sits above the teleport floor and below total mass 1
    assert(ranks.forall(r => r > 0.0 && r < 1.0))
    // output is the rank-desc, word-asc prefix — verify the ordering law
    val pairs = a.map(r => (r.getAs[Double]("textrank"), r.getAs[String]("word")))
    assert(pairs.sliding(2).forall {
      case Array((r1, w1), (r2, w2)) => r1 > r2 || (r1 == r2 && w1 < w2)
      case _ => true
    })
    val b = SearchQueries.textRank(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    spark.catalog.clearCache()
  }
}
