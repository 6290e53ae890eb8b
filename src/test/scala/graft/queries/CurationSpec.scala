package graft.queries

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Semantics locks for the corpus-curation operators: each test pins a
  * property a DuckDB hash-match alone would not explain well (the oracle
  * proves equality, these prove the *intent* on hand-built corpora), plus
  * plan shape asserts for the zero-shuffle claims.
  */
class CurationSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession
    .builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  /** Run a curation query on an in-memory documents table by temp-view
    * substitution: Tables.documents reads parquet, so for hand-built
    * corpora we write a tiny parquet dir.
    */
  private def withDocs(rows: Seq[(Long, String, String, String, Long)])(
      f: String => Unit): Unit = {
    val dir = java.nio.file.Files.createTempDirectory("curation_docs").toString
    import spark.implicits._
    rows
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    try f(dir)
    finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("repetition stats: constructed repetition is measured exactly") {
    // doc 1: "a b a b a b" — 6 tokens, 2 distinct, bigrams are
    // [a b, b a, a b, b a, a b] → top bigram multiplicity 3 of 5 slots;
    // trigrams [aba, bab, aba, bab] → 4 slots, 2 distinct → dup frac 0.5
    // doc 2: all-distinct tokens → ratios 1.0 / (1/n-1) / 0.0
    withDocs(
      Seq(
        (1L, "a b a b a b", "en", "s", 11L),
        (2L, "p q r s t u", "en", "s", 11L))) { dir =>
      val out = CurationQueries
        .repetitionStats(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> r)
        .toMap
      val d1 = out(1L)
      assert(d1.getLong(1) == 6L)
      assert(d1.getDouble(2) == (2.0 / 6 * 10000).round / 10000.0)
      assert(d1.getDouble(3) == 0.6) // 3/5
      assert(d1.getDouble(4) == 0.5) // (4-2)/4
      val d2 = out(2L)
      assert(d2.getDouble(2) == 1.0)
      assert(d2.getDouble(3) == 0.2) // every bigram unique: 1/5
      assert(d2.getDouble(4) == 0.0)
    }
  }

  test("repetition stats plan is a zero-shuffle narrow scan") {
    val plan = CurationQueries
      .repetitionStats(spark, sf)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
  }

  test("boilerplate: a 4-gram shared by 3 docs is flagged, coverage exact") {
    val shared = "x1 x2 x3 x4" // the boilerplate 4-gram
    withDocs(
      Seq(
        (1L, s"$shared a b c", "en", "s", 0L), // 7 tokens → 4 slots, 1 boiler
        (2L, s"d $shared e", "en", "s", 0L), // 6 tokens → 3 slots, 1 boiler
        (3L, s"f g $shared", "en", "s", 0L), // 6 tokens → 3 slots, 1 boiler
        (4L, "h i j k l m", "en", "s", 0L) // no boilerplate
      )) { dir =>
      val out = CurationQueries
        .boilerplateNgrams(spark, dir)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(out(1L) == ((4L, 1L, 0.25)))
      assert(out(2L) == ((3L, 1L, 0.3333)))
      assert(out(3L) == ((3L, 1L, 0.3333)))
      assert(out(4L) == ((3L, 0L, 0.0)))
    }
  }

  test("hash split: assignment is deterministic, content-independent, 8/1/1-ish") {
    val a = CurationQueries.hashSplit(spark, sf).collect()
    val b = CurationQueries.hashSplit(spark, sf).collect()
    assert(a.toSet == b.toSet) // stable across runs
    val bySplit = a.groupBy(_.getString(1)).view.mapValues(_.map(_.getLong(2)).sum)
    val total = bySplit.values.sum.toDouble
    // 16-bit md5 prefix mod 10: expect ~80/10/10 with generous slack at
    // tiny corpus sizes
    assert(bySplit("train") / total > 0.6)
    assert(bySplit.getOrElse("val", 0L) / total < 0.25)
    assert(bySplit.getOrElse("test", 0L) / total < 0.25)
  }

  test("tf-idf terms: exactly top-3 per doc, ordered by tf desc with tie-breaks") {
    withDocs(
      Seq(
        // tf: a=3, b=2, c=1, d=1 → top3 = a, b, then c vs d tie on tf →
        // df tie too (both once in corpus) → term asc picks c
        (1L, "a a a b b c d", "en", "s", 0L))) { dir =>
      val out = CurationQueries
        .tfidfTerms(spark, dir)
        .collect()
        .sortBy(_.getLong(4))
        .map(r => (r.getString(1), r.getLong(2), r.getLong(4)))
      assert(out.toSeq == Seq(("a", 3L, 1L), ("b", 2L, 2L), ("c", 1L, 3L)))
    }
  }

  test("substring dedup: repeated spans merge into covered islands, first occurrence exempt") {
    // doc 1 carries the original span; doc 2 repeats it twice with an
    // overlap-free gap; doc 3 has no 5-token overlap with anything.
    // Span = 5 tokens (SubstringSpanTokens).
    val span = "s1 s2 s3 s4 s5"
    withDocs(
      Seq(
        (1L, s"$span a b c d e", "en", "s", 0L), // first occurrence — no dups
        // positions 1..5 and 7..11 duplicate `span` (pos 1 exactly, pos 7
        // after 'z1'): spans [1,5] and [7,11] → two islands, 10 tokens
        (2L, s"$span z1 $span", "en", "s", 0L),
        (3L, "t1 t2 t3 t4 t5 t6", "en", "s", 0L))) { dir =>
      val out = CurationQueries
        .substringDedup(spark, dir)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      assert(out(1L) == ((10L, 0L, 0.0)))
      assert(out(2L) == ((11L, 10L, 0.9091)))
      assert(out(3L) == ((6L, 0L, 0.0)))
    }
  }

  test("substring dedup: overlapping duplicate spans merge, not double-count") {
    // doc 2 = doc 1's 6-token prefix → duplicate 5-gram occurrences at
    // pos 1 and 2 overlap: [1,5] ∪ [2,6] = [1,6] → 6 covered tokens
    withDocs(
      Seq(
        (1L, "u1 u2 u3 u4 u5 u6 x y", "en", "s", 0L),
        (2L, "u1 u2 u3 u4 u5 u6", "en", "s", 0L))) { dir =>
      val out = CurationQueries
        .substringDedup(spark, dir)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(2), r.getDouble(3))))
        .toMap
      assert(out(1L) == ((0L, 0.0)))
      assert(out(2L) == ((6L, 1.0)))
    }
  }

  test("short documents (< k tokens) don't crash the gram queries and match empty-gram semantics") {
    // Spark sequence(1, 0) infers a DESCENDING step and slice(w, 0, k)
    // throws — the gram expressions guard with an empty array, matching
    // DuckDB's empty generate_series. 2 tokens < every k in use (3,4,5,8).
    withDocs(
      Seq(
        (1L, "only two", "en", "s", 0L),
        (2L, "a proper document with quite a few more tokens in it", "en", "s", 0L))) { dir =>
      // gram-free doc: no 4-gram slots → absent from boilerplate output
      val boiler = CurationQueries.boilerplateNgrams(spark, dir).collect()
      assert(boiler.map(_.getLong(0)).toSet == Set(2L))
      // substring dedup keeps ALL docs (left join): zero coverage
      val sub = CurationQueries.substringDedup(spark, dir).collect()
      assert(sub.map(_.getLong(0)).toSet == Set(1L, 2L))
      assert(sub.find(_.getLong(0) == 1L).get.getLong(2) == 0L)
      // decontamination: doc 1 has no 8-grams → no gram rows → absent
      // (a doc with no spans can't be contaminated; oracle agrees)
      val dec = CurationQueries.decontaminate(spark, dir).collect()
      assert(dec.map(_.getLong(0)).toSet == Set(2L))
      // top-ngrams only sees the long doc's grams
      assert(CurationQueries.topNgrams(spark, dir).collect().nonEmpty)
    }
  }

  test("quality score: exact on a constructed doc; bands split the corpus") {
    // "a b the c" → 4 tokens, 4 distinct, 9 chars, one " the " hit
    // f1 = 1.0, f2 = (9-4+1)/4 = 1.5, f3 = 1/4
    // logit = 2*1 + 0.25*1.5 - 0.5*0.25 - 1 = 1.25
    withDocs(Seq((1L, "a b the c", "en", "s", 0L))) { dir =>
      val r = CurationQueries.qualityScore(spark, dir).collect().head
      assert(r.getDouble(1) == 1.25)
      assert(r.getString(2) == "high")
    }
    val bands = CurationQueries
      .qualityScore(spark, sf)
      .groupBy("band")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(bands.values.sum == nDocs) // every doc lands in exactly one band
  }

  test("top n-grams: deterministic order, bounded output, doc counts consistent") {
    val out = CurationQueries.topNgrams(spark, sf).collect()
    assert(out.length <= 20)
    // sorted by n_occ desc then gram asc; n_docs never exceeds n_occ
    val occ = out.map(r => (r.getLong(1), r.getString(0)))
    assert(occ.sortBy { case (n, g) => (-n, g) }.toSeq == occ.toSeq)
    out.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
  }

  test("decontamination: only docs sharing an 8-gram with the eval slice are flagged") {
    val evalSpan = "e1 e2 e3 e4 e5 e6 e7 e8"
    withDocs(
      Seq(
        (0L, s"$evalSpan tail0 tail1", "en", "s", 0L), // eval (id % 50 == 0)
        (1L, s"lead $evalSpan", "en", "s", 0L), // training, contaminated
        (2L, "c1 c2 c3 c4 c5 c6 c7 c8 c9", "en", "s", 0L), // training, clean
        (50L, "f1 f2 f3 f4 f5 f6 f7 f8", "en", "s", 0L) // eval again
      )) { dir =>
      val out = CurationQueries
        .decontaminate(spark, dir)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3), r.getBoolean(4))))
        .toMap
      assert(out.keySet == Set(1L, 2L), "eval docs must not appear in the output")
      assert(out(1L) == ((1L, 1L, true)))
      assert(out(2L) == ((0L, 0L, false)))
    }
  }

  test("line dedup: duplicate lines dropped, survivors reassembled in order") {
    // 4-token lines for a compact fixture
    val lineA = "a1 a2 a3 a4"
    val lineB = "b1 b2 b3 b4"
    val lineC = "c1 c2 c3 c4"
    withDocs(
      Seq(
        (1L, s"$lineA $lineB", "en", "s", 0L), // both lines first occurrences
        (2L, s"$lineA $lineC", "en", "s", 0L), // lineA is a dup; lineC survives
        (3L, s"$lineB $lineA", "en", "s", 0L), // both lines dups -> empty doc
        (4L, "tail one two", "en", "s", 0L) // short doc: one partial line
      )) { dir =>
      val out = CurationQueries
        .lineDedup(spark, dir, blockTokens = 4)
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
        .toMap
      assert(out(1L) == ((2L, 2L, s"$lineA $lineB")))
      assert(out(2L) == ((2L, 1L, lineC)))
      assert(out(3L) == ((2L, 0L, "")))
      assert(out(4L) == ((1L, 1L, "tail one two")))
    }
  }

  test("sequence packing: offsets contiguous per shard, boundary straddles exact") {
    val out = CurationQueries.sequencePack(spark, sf).collect()
    val L = CurationQueries.PackSeqTokens
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      // within a shard (ordered by doc_id) each doc starts where the
      // previous ended — the packed stream has no holes and no overlaps
      val ordered = rows.sortBy(_.getLong(0))
      ordered.foldLeft(0L) { (expectedStart, r) =>
        assert(r.getLong(3) == expectedStart, s"gap at doc ${r.getLong(0)}")
        expectedStart + r.getLong(2)
      }
      ordered.foreach { r =>
        val (n, start, first, last) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
        assert(first == start / L)
        assert(last == (start + n - 1) / L)
        assert(first <= last)
      }
    }
    // determinism
    assert(CurationQueries.sequencePack(spark, sf).collect().toSet == out.toSet)
  }

  test("epoch shuffle: each (epoch, shard) holds positions 0..n-1; epochs permute differently") {
    val out = CurationQueries.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val epochs = out.map(_._1).distinct.sorted
    assert(epochs.toSeq == Seq(1L, 2L, 3L))
    // every epoch covers the SAME sequence universe exactly once
    val universe = out.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
    epochs.foreach { e =>
      val seqs = out.filter(_._1 == e).map(t => (t._2, t._3))
      assert(seqs.length == universe.size && seqs.toSet == universe,
        s"epoch $e must be a permutation of the sequence universe")
    }
    // positions within each (epoch, out_shard) are a gapless 0..n-1 run —
    // i.e. the assignment is a valid dense layout a loader can mmap
    out.groupBy(t => (t._1, t._4)).foreach { case ((e, sh), rows) =>
      val pos = rows.map(_._5).sorted.toSeq
      assert(pos == (0L until rows.length.toLong),
        s"epoch $e shard $sh positions not dense: ${pos.take(5)}...")
    }
    // the permutation actually CHANGES between epochs (the point of
    // reshuffling): some sequence lands in different shards across epochs
    val moved = universe.exists { case (ps, sq) =>
      out.filter(t => t._2 == ps && t._3 == sq).map(_._4).distinct.length > 1
    }
    assert(moved, "epochs must not produce the identical layout")
    // determinism: a second evaluation is bit-identical
    assert(CurationQueries.epochShuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet == out.toSet)
    spark.catalog.clearCache()
  }

  test("token budget: greedy prefix property and quota arithmetic hold") {
    val out = CurationQueries.tokenBudget(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))
    // per source: kept docs are EXACTLY the md5-order prefix that fits —
    // cum_before of any kept doc is the sum of kept docs before it, and
    // the first dropped doc would have overflowed the budget
    out.groupBy(_._2).foreach { case (src, rows) =>
      val budget = rows.head._5
      assert(rows.forall(_._5 == budget))
      val ordered = rows.sortBy(_._4) // by cum_before
      ordered.foldLeft(0L) { (cum, r) =>
        assert(r._4 == cum, s"$src doc ${r._1}: cum_before ${r._4} != $cum")
        cum + r._3
      }
      ordered.foreach { r =>
        assert(r._6 == (r._4 + r._3 <= budget), s"$src doc ${r._1} verdict")
      }
      // the fill is maximal: every doc after the last kept one would
      // individually overflow from its own position (prefix property)
      val keptTok = rows.filter(_._6).map(_._3).sum
      assert(keptTok <= budget)
    }
    // global: kept token mass lands within one max-doc of frac × total
    val total = out.map(_._3).sum
    val kept = out.filter(_._6).map(_._3).sum
    assert(kept <= total && kept > 0)
    spark.catalog.clearCache()
  }

  test("lang mixture: every language downsampled to the minimum count") {
    val out = CurationQueries.langMixture(spark, sf).collect()
    val byLang = out.groupBy(_.getString(1)).view.mapValues(_.length)
    assert(byLang.values.toSet.size == 1, s"unbalanced: ${byLang.toMap}")
    // rank sequence per language is 1..target with no gaps
    val target = byLang.values.head
    out.groupBy(_.getString(1)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(2)).sorted.toSeq == (1L to target.toLong))
    }
    // deterministic: same selection on a second run
    assert(CurationQueries.langMixture(spark, sf).collect().toSet == out.toSet)
  }

  test("lang mixture: salted two-level rank ≡ naive per-language window (property)") {
    // the bit-equivalence claim behind the skew-safe rewrite: on random
    // corpora (seeded), the bucketed rank + running offsets must equal
    // row_number() OVER (PARTITION BY lang ORDER BY md5, doc_id) exactly
    val rng = new scala.util.Random(6L)
    val langs = Seq("en", "de", "fr", "zh")
    val rows = (0 until 400).map { i =>
      // sparse, shuffled doc_ids so bucket occupancy is uneven
      (rng.nextInt(1000000).toLong * 1000 + i, "t", langs(rng.nextInt(langs.size)), "s", 0L)
    }
    withDocs(rows) { dir =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val naive = docs
        .withColumn(
          "pick_rank",
          row_number()
            .over(Window
              .partitionBy(col("lang"))
              .orderBy(expr("md5(cast(cast(doc_id as string) as binary))"), col("doc_id")))
            .cast("long"))
        .select(col("doc_id"), col("lang"), col("pick_rank"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // compare the FULL rank assignment (drop the quota filter by
      // construction: target = min lang count, so compare only ranks the
      // query emits, then separately check the emitted set is a prefix)
      val out = CurationQueries.langMixture(spark, dir).collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        val key = (r.getLong(0), r.getString(1))
        assert(naive(key) == r.getLong(2), s"rank mismatch at $key")
      }
      // completeness (ADVICE r6): rank equality over EMITTED rows can't
      // see rows silently dropped by the offsets join-back — assert the
      // emitted set is exactly the per-language 1..target prefix, so
      // count = n_langs × min per-lang count and no rank is missing
      val perLangCounts = naive.keys.groupBy(_._2).view.mapValues(_.size).toMap
      val targetN = perLangCounts.values.min
      assert(out.length === perLangCounts.size * targetN,
        s"emitted ${out.length}, expected ${perLangCounts.size} langs × $targetN")
      out.groupBy(_.getString(1)).foreach { case (lang, rows) =>
        assert(rows.map(_.getLong(2)).sorted.toSeq === (1L to targetN.toLong),
          s"$lang: emitted ranks are not the exact 1..$targetN prefix")
      }
      spark.catalog.clearCache()
    }
  }

  test("domain mixture: α=0.5 tempering boosts the minority, shares sum to 1") {
    // lang masses 4:16 tokens → p = 0.2/0.8; q ∝ √p → √.2/(√.2+√.8) = 1/3
    withDocs(
      Seq(
        (1L, "a b c d", "de", "s", 0L),
        (2L, "a b c d e f g h a b c d e f g h", "en", "s", 0L))) { dir =>
      val out = CurationQueries
        .domainMixture(spark, dir)
        .collect()
        .map(r => r.getString(0) -> r)
        .toMap
      val de = out("de"); val en = out("en")
      assert(de.getAs[Long]("lang_tokens") == 4L && en.getAs[Long]("lang_tokens") == 16L)
      assert(de.getAs[Double]("p") == 0.2 && en.getAs[Double]("p") == 0.8)
      assert(math.abs(de.getAs[Double]("q") - 1.0 / 3) < 1e-12)
      assert(math.abs(de.getAs[Double]("q") + en.getAs[Double]("q") - 1.0) < 1e-12)
      // tempering boosts the minority above its natural share, trims the
      // majority below
      assert(de.getAs[Double]("boost") > 1.0 && en.getAs[Double]("boost") < 1.0)
    }
  }

  test("source profile: duplicate content counted, language spread exact") {
    withDocs(
      Seq(
        (1L, "same text here", "en", "sA", 0L),
        (2L, "same text here", "de", "sA", 0L), // exact dup of 1
        (3L, "other words entirely", "en", "sA", 0L),
        (4L, "solo doc", "fr", "sB", 0L))) { dir =>
      val out = CurationQueries
        .sourceProfile(spark, dir)
        .collect()
        .map(r => r.getString(0) -> r)
        .toMap
      val a = out("sA")
      assert(a.getAs[Long]("n_docs") == 3L)
      assert(a.getAs[Long]("n_langs") == 2L)
      assert(a.getAs[Long]("dup_docs") == 1L)
      assert(a.getAs[Long]("tok_total") == 9L)
      assert(a.getAs[Double]("tok_avg") == 3.0)
      assert(out("sB").getAs[Long]("dup_docs") == 0L)
    }
  }

  test("length histogram: boundary tokens land in the integer-exact bucket") {
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("w").mkString(" "), "en", "s", 0L)
    withDocs(Seq(doc(1, 63), doc(2, 64), doc(3, 127), doc(4, 128), doc(5, 512))) { dir =>
      val out = CurationQueries
        .lengthHistogram(spark, dir)
        .collect()
        .map(r => r.getString(1) -> r.getAs[Long]("n_docs"))
        .toMap
      assert(out == Map("0-63" -> 1L, "64-127" -> 2L, "128-255" -> 1L, "512+" -> 1L))
    }
  }

  test("ngram novelty: recycled text scores 0, fresh text 1, partial overlap exact") {
    val base = "n1 n2 n3 n4 n5" // 5 tokens → 2 gram slots
    withDocs(
      Seq(
        (1L, base, "en", "s", 0L), // first occurrence of both grams
        (2L, base, "en", "s", 0L), // 100% recycled
        (3L, s"$base f1 f2 f3", "en", "s", 0L))) { dir =>
      // doc 3: 8 tokens → 5 slots; the 2 grams inside `base` are old,
      // the 3 slots crossing into f1..f3 are new
      val out = CurationQueries
        .ngramNovelty(spark, dir)
        .collect()
        .map(r => r.getLong(0) -> r)
        .toMap
      assert(out(1L).getAs[Double]("novelty_frac") == 1.0)
      assert(out(2L).getAs[Double]("novelty_frac") == 0.0)
      assert(out(3L).getAs[Long]("n_grams") == 5L)
      assert(out(3L).getAs[Long]("n_novel") == 3L)
    }
  }

  test("bloom_prune: no false negatives, and verdicts agree with the exact decontaminate") {
    val bloom = CurationQueries
      .bloomPrune(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    val exact = CurationQueries
      .decontaminate(spark, sf)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r)
      .toMap
    assert(bloom.keySet == exact.keySet)
    for ((id, b) <- bloom) {
      val e = exact(id)
      // the Bloom contract: every exact hit is a bloom hit (no false negatives)
      if (e.getAs[Boolean]("contaminated"))
        assert(b.getAs[Boolean]("bloom_contaminated"), s"false negative on doc $id")
      // per-position containment: maybe-count can never undercount true hits
      assert(b.getAs[Long]("n_maybe") >= e.getAs[Long]("n_hits"), s"doc $id")
      // the exact leg must agree with the dedicated exact operator
      assert(b.getAs[Boolean]("exact_contaminated") == e.getAs[Boolean]("contaminated"))
      assert(b.getAs[Long]("n_grams") == e.getAs[Long]("n_grams"))
    }
    spark.catalog.clearCache()
  }

  test("BPE train: greedy merge choice, overlap handling, symbol recombination") {
    // corpus: 'abab' ×3, 'aaa' ×2, 'ab' ×1  (weights via repetition)
    //   step1 pairs: (a,b): 2*3+1 = 7; (b,a): 1*3 = 3; (a,a): 2*2 = 4 → merge 'a b'
    //   'abab' → 'ab ab', 'aaa' stays 'a a a', 'ab' → 'ab'
    //   step2 pairs: (ab,ab): 3; (a,a): 4 → merge 'a a'; 'a a a' → 'aa a' (overlap: once!)
    //   step3 pairs: (ab,ab): 3; (aa,a): 2 → merge 'ab ab'
    withDocs(
      Seq(
        (1L, "abab abab abab aaa", "en", "s", 0L),
        (2L, "aaa ab", "en", "s", 0L))) { dir =>
      val rows = CurationQueries
        .bpeTrain(spark, dir, steps = 3)
        .collect()
        .sortBy(_.getInt(0))
        .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
      assert(rows(0) == (("a", "b", 7L)), rows.mkString(";"))
      assert(rows(1) == (("a", "a", 4L)), rows.mkString(";"))
      assert(rows(2) == (("ab", "ab", 3L)), rows.mkString(";"))
    }
  }

  test("doc chunk: grid boundaries — stride-fit, stride+1, multi-chunk, and 1-char docs") {
    import CurationQueries.{ChunkChars, ChunkStride}
    val texts = Seq(
      1L -> "x", // 1 chunk of 1 char
      2L -> ("a " * 200).trim, // 399 chars → 1 chunk
      3L -> "b" * (ChunkStride + 1), // 401 chars → 2 chunks (second = 1 char)
      4L -> ("w " * 500).trim) // 999 chars → 3 chunks: 600, 599, 199
    withDocs(texts.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }) { dir =>
      val out = CurationQueries
        .docChunk(spark, dir)
        .collect()
        .map(r => r.getAs[Long]("doc_id") -> r)
        .toMap
      def model(t: String) = {
        val offs = 0 to (t.length - 1) by ChunkStride
        offs.map(o => t.substring(o, math.min(o + ChunkChars, t.length)))
      }
      for ((id, t) <- texts) {
        val chunks = model(t)
        val r = out(id)
        assert(r.getAs[Long]("n_chunks") == chunks.length.toLong, s"doc $id")
        assert(r.getAs[Long]("total_chunk_chars") == chunks.map(_.length.toLong).sum, s"doc $id")
        assert(
          r.getAs[Long]("total_chunk_tokens") ==
            chunks.map(_.split(" ", -1).count(_.nonEmpty).toLong).sum,
          s"doc $id")
        assert(r.getAs[Long]("first_len") == chunks.head.length.toLong, s"doc $id")
        assert(r.getAs[Long]("last_len") == chunks.last.length.toLong, s"doc $id")
        val checksum = chunks.zipWithIndex.map { case (c, i) =>
          (i + 1).toLong * graft.functions.TextHash.polyHash(c)
        }.sum
        assert(r.getAs[Long]("chunk_checksum") == checksum, s"doc $id")
      }
    }
  }

  test("bpe padded-replace: identical-symbol runs pin the documented non-textbook fixpoint") {
    // The pass-restarting replace deviates from textbook left-to-right
    // BPE for runs of 5+ identical symbols (bpeTrain scaladoc): each
    // consumed pair also consumes the separator the next pair needs.
    // Pin the exact fixpoints so a future change to the replace chain
    // is a conscious semantic decision, not silent drift — both
    // engines share these semantics, so train/encode stay consistent.
    def fix(s0: String): String =
      (1 to CurationQueries.BpeReplacePasses)
        .foldLeft(s0)((s, _) => s.replace(" a a ", " aa "))
    assert(fix(" a a ") == " aa ")
    assert(fix(" a a a ") == " aa a ") // textbook
    assert(fix(" a a a a ") == " aa aa ") // textbook
    assert(fix(" a a a a a a ") == " aa a aa a ") // deviation, pinned
    assert(fix(" a a a a a ") == " aa a aa ") // deviation, pinned
  }

  test("temperature mix: budget conserved; quotas match a largest-remainder recompute") {
    val rows = CurationQueries.temperatureMix(spark, sf).collect()
    assert(rows.length == 200, s"budget not conserved: ${rows.length}")
    val quotas = rows
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.length.toLong).toMap
    // every source's selected count equals its reported quota
    for (r <- rows) assert(quotas(r.getAs[String]("source")) == r.getAs[Long]("quota"))
    // driver-side largest-remainder recompute from the raw counts
    val counts = graft.Tables
      .documents(spark, sf)
      .groupBy("source").count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    val d = counts.toSeq.sortBy(_._1).map(c => math.sqrt(c._2.toDouble)).foldLeft(0.0)(_ + _)
    val q = counts.view.mapValues(n => math.floor(1e12 * math.sqrt(n.toDouble) / d).toLong).toMap
    val base = q.view.mapValues(v => 200L * v / 1000000000000L).toMap
    val leftover = 200L - base.values.sum
    val order = q.toSeq
      .map { case (s2, v) => (s2, 200L * v % 1000000000000L) }
      .sortBy { case (s2, rem) => (-rem, s2) }
      .map(_._1)
    val expect = base ++ order.take(leftover.toInt).map(s2 => s2 -> (base(s2) + 1))
    assert(quotas == expect.filter(_._2 > 0), s"$quotas vs $expect")
  }

  test("temperature mix on a skewed corpus: remainder distribution and quota capping") {
    // hand-built skew: sf0.001's uniform 20×25 sources leave leftover=0
    // and never exercise the +1 remainder branch or the quota>n cap
    val docs = (1L to 40L).map(i => (i, s"text $i", "en", "big", 10L)) ++
      (41L to 43L).map(i => (i, s"text $i", "en", "tiny", 10L))
    withDocs(docs) { dir =>
      val rows = CurationQueries.temperatureMix(spark, dir).collect()
      val quotas = rows.map(r => r.getAs[String]("source") -> r.getAs[Long]("quota")).toMap
      // driver-side largest-remainder recompute (same formula)
      val n = Map("big" -> 40L, "tiny" -> 3L)
      val d = Seq("big", "tiny").map(s2 => math.sqrt(n(s2).toDouble)).foldLeft(0.0)(_ + _)
      val q = n.view.mapValues(v => math.floor(1e12 * math.sqrt(v.toDouble) / d).toLong).toMap
      val base = q.view.mapValues(v => 200L * v / 1000000000000L).toMap
      val leftover = (200L - base.values.sum).toInt
      assert(leftover > 0, "skewed corpus must exercise the remainder branch")
      val order = q.toSeq.map { case (s2, v) => (s2, 200L * v % 1000000000000L) }
        .sortBy { case (s2, rem) => (-rem, s2) }.map(_._1)
      val expect = base ++ order.take(leftover).map(s2 => s2 -> (base(s2) + 1))
      assert(quotas == expect, s"$quotas vs $expect")
      // √-temperature over-allocates the tiny source (quota > n), the
      // fill yields min(quota, n), and the shortfall is visible
      assert(expect("tiny") > n("tiny"))
      val selected = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length.toLong)
      assert(selected("tiny") == n("tiny"))
      assert(selected("big") == math.min(expect("big"), n("big")))
    }
  }

  test("curriculum order: positions are the exact global (n_chars, doc_id) permutation") {
    val rows = CurationQueries
      .curriculumOrder(spark, sf)
      .collect()
      .sortBy(_.getAs[Long]("curriculum_pos"))
    assert(rows.map(_.getAs[Long]("curriculum_pos")).toSeq == (1L to rows.length).toSeq)
    val keys = rows.map(r => (r.getAs[Long]("n_chars"), r.getAs[Long]("doc_id")))
    assert(keys.sliding(2).forall {
      case Array(a, b) => a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
      case _ => true
    }, "positions not monotone in the curriculum key")
    spark.catalog.clearCache()
  }
}
