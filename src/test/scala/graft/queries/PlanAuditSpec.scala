package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan locks for the scale-critical queries: the properties
  * that make these plans survive a 100× scale-up — dimension joins
  * BROADCAST (no all-to-all shuffle of the fact side), filters and
  * column pruning PUSHED into the parquet scan, and no accidental
  * cartesian products — are asserted on the executed plan string, so a
  * refactor that silently degrades a plan (a lost broadcast hint, a
  * filter that stops folding into the scan, a join that collapses to a
  * cross product) fails the suite, not just the benchmark.
  *
  * Deliberate exceptions are asserted too: q_cosine_topk's
  * BroadcastNestedLoopJoin is the documented exact-baseline kernel
  * (small broadcast query set × one corpus pass) — the assert pins that
  * it stays the broadcast-side build, never a shuffled cartesian.
  */
class PlanAuditSpec extends AnyFunSuite {

  private lazy val spark = {
    val s = graft.Sessions.local("plan-audit", "4")
    s.sparkContext.setLogLevel("ERROR")
    // PushedFilters asserts read the scan's metadata string; the default
    // 100-char cap truncates it once timestamp literals appear in the
    // pushed list (µs-timestamp ts columns), hiding later entries
    s.conf.set("spark.sql.maxMetadataStringLength", "2000")
    s
  }
  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, dir)
    // execute so AQE finalizes: broadcast decisions and WholeStageCodegen
    // stages only appear in the final adaptive plan
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q_region_revenue: dimension chain broadcasts; fact scan pruned to 3 columns") {
    val p = plan("q_region_revenue")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // lineitem contributes exactly the join key + the two measure columns
    assert(
      p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan must be pruned to orderkey/extendedprice/discount")
    // WholeStageCodegen stages print as "*(n)" operator prefixes in the
    // final adaptive plan
    assert("""\*\(\d+\) HashAggregate""".r.findFirstIn(p).isDefined,
      "aggregation chain must stay codegen'd")
  }

  test("q_scan_prune: range + equality predicates reach the parquet scan") {
    val p = plan("q_scan_prune")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(2000))
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range must push down")
    assert(!p.contains("l_comment"), "untouched wide columns must not be read")
  }

  test("q_time_travel: timestamp bound and type filter push down") {
    val p = plan("q_time_travel")
    assert(p.contains("EqualTo(event_type,error)"), p.take(2000))
    assert(p.contains("PushedFilters: [IsNotNull("))
  }

  test("q_interval_join: runs dimension broadcasts with the range predicate inline") {
    val p = plan("q_interval_join")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_spectrum_map: wire-decoded df12 dimension joins as a broadcast") {
    val p = plan("q_spectrum_map")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("q_minhash_pairs: banded candidate join is keyed, never cartesian") {
    val p = plan("q_minhash_pairs")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the pair join is equi-keyed on the band; the similarity threshold
    // rides the join as a post-condition, not a cross-product filter
    assert(p.contains("Join [band") || p.contains("BroadcastHashJoin [band") ||
      p.contains("SortMergeJoin [band") || p.contains("ShuffledHashJoin [band"),
      "candidate join must be keyed on the LSH band")
  }

  test("q_lsh_ann / q_ivf_ann: candidate joins are keyed (bucket / cell), never cartesian") {
    for (name <- Seq("q_lsh_ann", "q_ivf_ann")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name: ANN candidate join must stay equi-keyed, not degrade to the exact kernel")
    }
  }

  test("q_cosine_topk: documented exact kernel = broadcast queries, one corpus pass") {
    val p = plan("q_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.take(2000))
    // corpus scan reads only id + embedding
    assert(p.contains("struct<vec_id:bigint,embedding:array<float>>"))
  }

  test("q_tfidf_terms: document-frequency dimension broadcasts; scan pruned to id+text") {
    val p = plan("q_tfidf_terms")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(
      p.contains("struct<doc_id:bigint,text:string>"),
      "documents scan must be pruned to doc_id/text")
  }

  /** Count FileScans reachable in the EXECUTED plan tree without passing
    * through an InMemoryTableScan — i.e. scans NOT served by a persisted
    * relation. (The plan STRING can't answer this: adaptive plans print
    * each cached relation's child plan once per reference.)
    */
  private def uncachedFileScans(root: org.apache.spark.sql.execution.SparkPlan): Int = {
    import org.apache.spark.sql.execution._
    var n = 0
    def walk(x: SparkPlan): Unit = x match {
      case a: adaptive.AdaptiveSparkPlanExec => walk(a.executedPlan)
      case s: adaptive.QueryStageExec => walk(s.plan)
      case _: columnar.InMemoryTableScanExec => () // cached — stop here
      case _: FileSourceScanExec => n += 1
      case other =>
        other.children.foreach(walk)
        other.subqueries.foreach(walk)
    }
    walk(root)
    n
  }

  test("q_boilerplate_ngrams / q_decontaminate / q_ngram_novelty / q_domain_mixture: documents scanned once") {
    for (
      name <- Seq(
        "q_boilerplate_ngrams",
        "q_decontaminate",
        "q_ngram_novelty",
        "q_domain_mixture",
        "q_lang_mixture")
    ) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      // every consumer of the shared projection (dimension build, probe,
      // normalizer) must read the persisted cache: exactly ZERO file
      // scans may sit outside an InMemoryTableScan, and the cache itself
      // must exist (one FileScan inside it feeds everything)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("InMemoryRelation"), s"$name: shared projection must be persisted")
      val uncached = uncachedFileScans(df.queryExecution.executedPlan)
      assert(uncached == 0,
        s"$name: $uncached FileScan(s) outside the persisted cache — " +
          "a consumer is rescanning documents")
      spark.catalog.clearCache()
    }
  }

  test("q_media_dedup: pigeonhole candidate join is keyed on the segment, never cartesian") {
    val df = graft.SparkEntry.queries("q_media_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), "hamming join must stay equi-keyed")
    assert(
      p.contains("Join [seg_key") || p.contains("HashJoin [seg_key") ||
        p.contains("SortMergeJoin [seg_key"),
      "candidate join must be keyed on the pigeonhole segment")
    assert(p.contains("InMemoryRelation"), "hash+segment projection must be persisted")
    spark.catalog.clearCache()
  }

  test("q_media_dedup_sampled: same keyed-join shape, sample predicate pre-verify") {
    val df = graft.SparkEntry.queries("q_media_dedup_sampled")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), "hamming join must stay equi-keyed")
    // the LCG predicate must sit in the plan (pairs pruned before the
    // Hamming verify and the pair dedup, not sampled from the output)
    assert(p.contains("1103515245"), "sample predicate missing from the plan")
    spark.catalog.clearCache()
  }

  test("q_dedup_embedding_sampled: sides filtered BEFORE the all-pairs join") {
    val df = graft.SparkEntry.queries("q_dedup_embedding_sampled")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    // the documented exact-kernel exception: a broadcast nested-loop,
    // never a shuffled cartesian
    assert(p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // vertex sampling is the point: the 1-in-K id filter must apply to
    // the SIDES (before the join), shrinking the n² enumeration itself —
    // a filter only above the join would re-create the measured
    // no-faster-than-exact pair-predicate shape
    val joinAt = p.indexOf("BroadcastNestedLoopJoin")
    val filterAt = p.indexOf("1103515245")
    assert(filterAt >= 0, "vertex-sample predicate missing from the plan")
    assert(filterAt > joinAt,
      "sample filter must sit below the join in the tree (on the scan side)")
  }

  test("q_stratified_sample: sampling is a pure filter — zero shuffles, no text read") {
    val df = graft.SparkEntry.queries("q_stratified_sample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"stratified sampling must not shuffle\n${p.take(2000)}")
    assert(!p.contains("text:string"), "sampling must not read the text column")
  }

  test("q_pii_scrub: pure map stage — zero shuffles, scan pruned to doc_id/text") {
    val df = graft.SparkEntry.queries("q_pii_scrub")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"PII scrub must not shuffle\n${p.take(2000)}")
    assert(
      p.contains("struct<doc_id:bigint,text:string>"),
      "documents scan must be pruned to doc_id/text")
  }

  test("q_retention_cohorts: cohort-size dimension broadcasts; events scanned once") {
    val df = graft.SparkEntry.queries("q_retention_cohorts")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    // the (user_id, day) projection is persisted; cohort reduction and
    // join probe must both read the cache, never rescan events
    assert(p.contains("InMemoryRelation"), "events projection must be persisted")
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 0,
      "a consumer is rescanning events")
    spark.catalog.clearCache()
  }

  test("q_lang_mixture: no single-partition-per-language sort (rank is bucket-salted)") {
    val df = graft.SparkEntry.queries("q_lang_mixture")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the skew-safe property: the ONLY row_number over the full corpus is
    // partitioned by (lang, bucket) — 256 md5-prefix buckets per language —
    // never by lang alone (which would total-order each language through
    // one reducer). The sole lang-alone window allowed is the running-sum
    // over the tiny (lang × bucket) count table.
    val rankSpecs = """row_number\(\) windowspecdefinition\(lang#\d+(, \w+#\d+)?,"""
      .r.findAllIn(p).toList
    assert(rankSpecs.nonEmpty, s"expected the salted rank window\n${p.take(3000)}")
    assert(
      rankSpecs.forall(_.contains("bucket")),
      s"row_number must be salted with the md5-prefix bucket: $rankSpecs")
    assert(p.contains("BroadcastHashJoin"), "offset join-back must broadcast")
  }

  test("q_epoch_shuffle: permutation ranks are hash-bucketed, no global sort") {
    val df = graft.SparkEntry.queries("q_epoch_shuffle")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the epoch permutation is pure hash arithmetic + bucketed ranks: a
    // rangepartitioning exchange would mean someone reintroduced a global
    // orderBy over the sequence universe
    assert(!p.contains("rangepartitioning"),
      s"global range-partitioned sort leaked into the epoch shuffle\n${p.take(2000)}")
    // the per-(epoch, out_shard) rank must be salted with the hash-prefix
    // bucket hb — never a bare (epoch, out_shard) window over the corpus
    val rankSpecs = """row_number\(\) windowspecdefinition\((\w+#\d+L?, )+"""
      .r.findAllIn(p).toList
    assert(rankSpecs.nonEmpty, s"expected the bucketed rank window\n${p.take(3000)}")
    assert(rankSpecs.forall(_.contains("hb")),
      s"row_number must include the hash-prefix bucket hb: $rankSpecs")
    assert(p.contains("BroadcastHashJoin"), "offset join-back must broadcast")
    spark.catalog.clearCache()
  }

  test("q_token_budget: quota fill is hash-bucketed, no global sort; budget join broadcasts") {
    val df = graft.SparkEntry.queries("q_token_budget")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("rangepartitioning"),
      s"global range-partitioned sort leaked into the quota fill\n${p.take(2000)}")
    // the per-source running sum must be salted with the md5-prefix
    // bucket; the only source-alone window runs over the tiny
    // (source × bucket) offset table
    assert(p.contains("BroadcastHashJoin"), "budget/offset join-back must broadcast")
    assert(!p.contains("CartesianProduct"))
    spark.catalog.clearCache()
  }

  test("q_bm25_search / q_weighted_sample: top-k is TakeOrderedAndProject, never a full sort") {
    for (name <- Seq("q_bm25_search", "q_weighted_sample")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // per-partition heaps of k rows — no global Sort of the corpus, and
      // the only total-order window runs AFTER the top-k truncation
      assert(p.contains("TakeOrderedAndProject"), s"$name\n${p.take(2000)}")
      assert(!p.contains("CartesianProduct"), name)
      // a full corpus orderBy would need a range-partitioned shuffle; the
      // only Sort allowed is the single-partition one feeding the rank
      // window over the ≤ k already-truncated rows
      assert(!p.contains("rangepartitioning"),
        s"$name: global range-partitioned sort leaked into the plan")
    }
  }

  test("q_weighted_sample: priority key is a pure map — text column never read") {
    val df = graft.SparkEntry.queries("q_weighted_sample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("text:string"), "sampling key must not read the text column")
  }

  test("q_vocab_growth: first-occurrence is a partial-agg groupBy; windows only on the bucket table") {
    val df = graft.SparkEntry.queries("q_vocab_growth")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"))
    // no total-order or per-term window over corpus-sized data: the only
    // windowspec keys on the bounded bucket column
    val specs = """windowspecdefinition\((\w+)#""".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(specs.subsetOf(Set("bucket")), s"unexpected window keys: $specs")
    assert(!"""windowspecdefinition\(term""".r.findFirstIn(p).isDefined)
  }

  test("q_pivot_event_matrix / q_user_ewma: ONE keyed shuffle, no cartesian") {
    for (name <- Seq("q_pivot_event_matrix", "q_user_ewma")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), name)
      // partial agg below, final agg above, exactly one hash exchange on
      // the grouping key — the shape that holds at any corpus size
      val exchanges = "Exchange hashpartitioning\\(user_id".r.findAllIn(p).size
      assert(exchanges >= 1, s"$name: expected the user_id exchange\n${p.take(2000)}")
      assert("Exchange".r.findAllIn(p).size == exchanges,
        s"$name: extra non-key exchanges leaked into the plan")
    }
  }

  test("q_time_resample: generated calendar, keyed fill join, no cartesian blow-up") {
    val df = graft.SparkEntry.queries("q_time_resample")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the only nested-loop join allowed is the broadcast of the ONE-ROW
    // day range; the gap-fill join must stay equi-keyed
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("Range") || p.contains("Generate"),
      "calendar must be generated, not scanned")
  }

  test("q_substring_dedup: first-occurrence is a partial-agg groupBy, no window on the shingle") {
    val df = graft.SparkEntry.queries("q_substring_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the skew-safe property: min(struct(doc,pos)) per gram is an
    // Aggregate (map-side partial combine), and the only Window operators
    // run per doc_id (bounded groups), never per gram. The aggregate sits
    // on the broadcast build side — collapsed to a QueryStage reference
    // in the adaptive plan string — so it is asserted on the optimized
    // logical plan; the window absence on the physical one.
    val opt = df.queryExecution.optimizedPlan.toString
    assert("""Aggregate \[gram""".r.findFirstIn(opt).isDefined, opt.take(3000))
    assert(
      !"""windowspecdefinition\(gram""".r.findFirstIn(p).isDefined,
      "no row_number window keyed on the shingle (skew funnel)")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_semdedup / q_triangle_count: candidate joins stay keyed, never a product") {
    for (name <- Seq("q_semdedup", "q_triangle_count")) {
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name\n${p.take(2000)}")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name: pair join degenerated to an unkeyed product")
    }
  }

  test("q_heavy_hitters: grid joins as a broadcast; top-k is TakeOrderedAndProject") {
    val p = plan("q_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "the 1024-row grid must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_kmv_distinct: bounded-state sketch aggregate — no windows anywhere") {
    val df = graft.SparkEntry.queries("q_kmv_distinct")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("windowspecdefinition"), "KMV must not need any window")
    // the custom Aggregator runs with a partial (map-side) phase
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"expected the typed MinK aggregate\n${p.take(2000)}")
  }

  test("q_quantile_sketch: windows only over the bounded counter table; min/max broadcasts") {
    val df = graft.SparkEntry.queries("q_quantile_sketch")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // cum/total windows key on event_type over the types×bins COUNTER
    // table (post-aggregate), never over raw events
    val specs =
      """windowspecdefinition\((\w+)#""".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(specs.subsetOf(Set("event_type")), s"unexpected window keys: $specs")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "the one-row min/max bound must ride a broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_user_deciles: rank windows only on the bounded totals key; dims broadcast") {
    val df = graft.SparkEntry.queries("q_user_deciles")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs =
      """windowspecdefinition\((\w+)#""".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(specs.subsetOf(Set("total")), s"unexpected window keys: $specs")
    assert(p.contains("BroadcastHashJoin"), "offset table must broadcast")
    assert(!p.contains("rangepartitioning"),
      "no global range sort — ranking must stay offset-based")
  }

  test("q_skyline: no corpus-wide window — only bucket/length-keyed and bucket-table windows") {
    val df = graft.SparkEntry.queries("q_skyline")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val specs =
      """windowspecdefinition\((\w+)#""".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(specs.subsetOf(Set("b", "len")), s"unexpected window keys: $specs")
    assert(p.contains("BroadcastHashJoin"), "bucket prior-max table must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_bloom_prune: filter bits and eval grams both broadcast — corpus never shuffles for the probe") {
    val df = graft.SparkEntry.queries("q_bloom_prune")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 2, s"expected bits + eval-gram broadcasts, got $broadcasts")
    assert(!p.contains("CartesianProduct"))
  }

  test("q_line_dedup: first-occurrence is a partial-agg groupBy, no window on the line key") {
    val df = graft.SparkEntry.queries("q_line_dedup")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the same skew-safe shape as q_substring_dedup: a hot boilerplate
    // line collapses in the map-side min(struct) partial aggregate; the
    // ONLY window-free reassembly is a per-doc collect_list aggregate
    val opt = df.queryExecution.optimizedPlan.toString
    assert("""Aggregate \[line""".r.findFirstIn(opt).isDefined, opt.take(3000))
    assert(
      !"""windowspecdefinition\(line""".r.findFirstIn(p).isDefined,
      "no window keyed on the line content (skew funnel)")
    assert(!p.contains("CartesianProduct"))
    assert(
      uncachedFileScans(df.queryExecution.executedPlan) == 0,
      "corpus must be scanned once via the persisted token projection")
    spark.catalog.clearCache()
  }

  test("q_event_pmi / q_anomaly_mad: dimensions broadcast; fact never re-shuffles for them") {
    for (name <- Seq("q_event_pmi", "q_anomaly_mad")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), s"$name: tiny dimension must broadcast")
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("q_label_propagation / q_neighborhood: per-round joins stay keyed, never a product") {
    for (name <- Seq("q_label_propagation", "q_neighborhood")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name\n${p.take(2000)}")
    }
  }

  test("q_hll_distinct / q_source_divergence: corpus scanned once (shared persisted projection)") {
    for (name <- Seq("q_hll_distinct", "q_source_divergence")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val n = uncachedFileScans(df.queryExecution.executedPlan)
      assert(n == 0, s"$name: $n uncached FileScans outside the persisted projection")
      spark.catalog.clearCache()
    }
  }

  test("q_rfm_segments: orders scanned once; quartile thresholds broadcast; no global sort") {
    val df = graft.SparkEntry.queries("q_rfm_segments")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the ntile(4) formulation would range-partition every customer into
    // one total order — threshold scoring must keep the final pass
    // shuffle-free: tiny horizon/threshold rows ride broadcasts
    assert(!p.contains("rangepartitioning"), s"global sort leaked\n${p.take(2000)}")
    assert(p.contains("InMemoryRelation"), "per-customer aggregate must be persisted")
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 0,
      "a consumer is rescanning orders")
    assert(!p.contains("CartesianProduct"))
    spark.catalog.clearCache()
  }

  test("q_scd2_intervals: one user_id exchange; both windows share it") {
    val df = graft.SparkEntry.queries("q_scd2_intervals")(spark, dir)
    df.collect()
    // count only the final adaptive plan — the string also prints the
    // initial plan, which would double-count exchanges
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val specs =
      """windowspecdefinition\((\w+)#""".r.findAllMatchIn(p).map(_.group(1)).toSet
    assert(specs == Set("user_id"), s"unexpected window keys: $specs")
    // the change-detect and interval-close windows use the same
    // partitioning+ordering: ONE exchange serves both
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p.take(2000))
    assert("Exchange".r.findAllIn(p).size == 1, "extra exchange leaked into the plan")
  }

  test("q_fuzzy_match: every candidate join is keyed on a composite key, never block alone") {
    val df = graft.SparkEntry.queries("q_fuzzy_match")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to an unkeyed product")
    // the r11 regression this guards against: a join keyed on the
    // nation block ALONE re-creates Σ block² candidate growth. Every
    // shuffled pair join must carry a selective composite key — the
    // pigeonhole class chars or a deletion-neighborhood variant —
    // next to the block key.
    val joinKeys =
      """(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]""".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
    val blockKeyed = joinKeys.filter(_.contains("block#"))
    assert(blockKeyed.nonEmpty, p.take(2000))
    blockKeyed.foreach { ks =>
      assert(ks.contains("cand_key"),
        s"pair join keyed on [$ks] lacks a selective composite key")
    }
  }

  test("q_entity_resolution: match edges ride the composite candidate generator") {
    // audit the edge plan directly: the CC operator materializes edges
    // through an RDD barrier, so the full query's final plan no longer
    // shows the candidate joins
    val df = graft.queries.RelationalQueries.entityResolutionPairs(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "candidate generation degenerated to an unkeyed product")
    // the r15 rework this locks: the naive (nation, band)-block all-pairs
    // join re-created the r11 Σ block² regression inside entity
    // resolution. Every pair join keyed on the block must also carry a
    // selective composite key (pigeonhole class chars or a deletion
    // variant) — block-alone joins are exactly the shape that dies at
    // 100 TB.
    val joinKeys =
      """(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[([^\]]*)\]""".r
        .findAllMatchIn(p).map(_.group(1)).toSeq
    val blockKeyed = joinKeys.filter(_.contains("block#"))
    assert(blockKeyed.nonEmpty, p.take(2000))
    blockKeyed.foreach { ks =>
      assert(ks.contains("cand_key"),
        s"pair join keyed on [$ks] lacks a selective composite key")
    }
  }

  test("q_fuzzy_match: pigeonhole classes are entropy-balanced on the profile") {
    // the r12 residual this locks against: a FIXED position→class map
    // (round-robin mod 3) left one class holding only the corpus's
    // near-constant positions — ~20 distinct values at sf1 — and that
    // class carried most of the surviving candidates. The data-driven
    // snake deal must (a) meet its balance guarantee and (b) never
    // leave a class less selective than the fixed map's worst class.
    import graft.queries.RelationalQueries.{FuzzyClassCount => Q, FuzzyClassPairs}
    val profs = graft.queries.RelationalQueries.fuzzyClassProfiles(spark, dir)
    assert(profs.nonEmpty)
    profs.foreach { pr =>
      assert(pr.classes.length == Q)
      // positions partition {1..len} exactly
      assert(pr.classes.flatten.sorted.toSeq == (1 to pr.len),
        s"len ${pr.len}: classes are not a partition of positions")
      // snake-deal guarantee: class imbalance bounded by the single
      // heaviest position
      assert(pr.weights.max - pr.weights.min <= pr.maxPositionWeight + 1e-9,
        s"len ${pr.len}: weights ${pr.weights.toSeq} exceed the snake bound")
      // no starved class: the weakest class still keys at least
      // exp(total/Q − maxPos) effective distinct values on the profile
      val total = pr.weights.sum
      assert(pr.weights.min >= total / Q - pr.maxPositionWeight - 1e-9)
    }
    // compare the MEASURED joint selectivity (not the independence
    // estimate) of the actual join keys — the 6 class-pair keys — for
    // the entropy deal vs a fixed round-robin deal over the same
    // corpus: the weakest dealt key must be at least as selective as
    // the weakest round-robin key (the r12 failure shape was exactly a
    // starved fixed-map key)
    val c = graft.Tables.customer(spark, dir)
      .select(org.apache.spark.sql.functions.col("c_name").as("nm"))
      .collect().map(_.getString(0))
    val byLen = c.groupBy(_.length)
    profs.foreach { pr =>
      val names = byLen(pr.len)
      def collEnt(positions: Array[Int]): Double = {
        val keys = names.groupBy(nm => positions.map(p => nm(p - 1)).mkString)
        val n = names.length.toDouble
        val cp = keys.values.map(g => (g.length / n) * (g.length / n)).sum
        -math.log(math.max(cp, 1e-300))
      }
      def pairMin(classes: Array[Array[Int]]): Double =
        FuzzyClassPairs
          .map { case (i, j) => collEnt((classes(i) ++ classes(j)).sorted) }
          .min
      val rr = Array.tabulate(Q)(i =>
        (1 to pr.len).filter(p => (p - 1) % Q == i).toArray)
      val dealtMin = pairMin(pr.classes)
      val rrMin = pairMin(rr)
      assert(dealtMin >= rrMin - 1e-9,
        s"len ${pr.len}: entropy deal ($dealtMin) weaker than round-robin ($rrMin)")
    }
  }

  test("q_pelt: one pruned scan, two bounded aggregates, decode fused in projection") {
    val df = graft.SparkEntry.queries("q_pelt")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    // the corpus crosses exactly two exchanges: (type, day) count and
    // the per-type series assembly — everything after is the bounded
    // day-axis array and the codegen'd pelt_cps in the projection
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p.take(2000))
    assert(!p.contains("Window"), "PELT must not window the corpus")
    // scan pruned to the two columns the day counts need
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p).map(_.group(1))
    assert(read.exists(r => r.contains("ts") && r.contains("event_type") &&
      !r.contains("value") && !r.contains("props")),
      s"events scan not pruned: $read")
  }

  test("q_chi2_assoc: documents scanned once into the persisted contingency table") {
    val df = graft.SparkEntry.queries("q_chi2_assoc")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("InMemoryRelation"), "observed counts must be persisted")
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 0,
      "margins/totals are rescanning documents")
    spark.catalog.clearCache()
  }

  test("q_data_profile: ONE scan, one aggregation pass — no Expand, no re-reads") {
    val df = graft.SparkEntry.queries("q_data_profile")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // exact distincts ride size(collect_set(c)) since r13 — one plain
    // partial-aggregation pass; the 12-way Expand (12x row blow-up
    // through the first aggregate) is the regression this guards
    // against, and per-column re-scans would multiply IO by the column
    // count at 100 TB
    assert(!p.contains("Expand"), p.take(2000))
    assert(p.contains("ObjectHashAggregate"), "collect_set tier expected\n" + p.take(2000))
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 1,
      "profiling must read lineitem exactly once")
  }

  test("q_random_projection / q_sq8_codes: encoding is a pure map — zero shuffles") {
    for (name <- Seq("q_random_projection", "q_sq8_codes")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      // range stats / projection matrix are broadcast constants; the
      // returned encode plan must stay a narrow map at any corpus size
      assert(!p.contains("Exchange"), s"$name must not shuffle\n${p.take(1500)}")
    }
  }

  test("q_cdc_apply: latest-per-key is ONE partial aggregate — no window, single exchange") {
    val df = graft.SparkEntry.queries("q_cdc_apply")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "latest-per-key must be max(struct), not a window")
    // one keyed exchange fed by a partial (map-side) aggregate — AQE's
    // plan string repeats the exchange in its initial-plan section, so
    // assert the shape, not an occurrence count
    assert(p.contains("Exchange hashpartitioning(user_id"), p.take(1500))
    assert(p.contains("partial_max"), "map-side combine must run before the shuffle")
  }

  test("q_concurrency: the sweep window is DAY-partitioned — no global-order funnel") {
    val df = graft.SparkEntry.queries("q_concurrency")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the full point set must go through a day-keyed window; only the
    // tiny per-day offset table may pass a single-partition window
    assert("windowspecdefinition\\(day".r.findAllIn(p).nonEmpty,
      s"point sweep must partition by day\n${p.take(2000)}")
    assert(p.contains("Window"), p.take(1500))
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 1,
      "both sweep boundary points and day totals must come from ONE scan")
  }

  test("q_benford: single corpus scan — the total folds over the digit table") {
    val df = graft.SparkEntry.queries("q_benford")(spark, dir)
    df.collect()
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 1,
      "the scalar total must aggregate the 9-row digit table, not rescan")
  }

  test("q_top_per_group: rank filter runs as WindowGroupLimit(Partial) below the exchange") {
    val df = graft.SparkEntry.queries("q_top_per_group")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the map-side per-group limit is what keeps the shuffle at k rows
    // per (group, partition) — without it this is a full-table window
    assert(p.contains("WindowGroupLimit"), p.take(2000))
    assert(p.contains("Partial"), "the group limit must run below the exchange")
  }

  test("q_grouping_sets: one scan, one Expand — the lattice never re-reads") {
    val df = graft.SparkEntry.queries("q_grouping_sets")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p.take(1500))
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 1,
      "grouping sets must read lineitem exactly once")
  }

  test("dataProfile default (approx) mode: one plain pass — NO Expand, no row blow-up") {
    val df = graft.queries.RelationalQueries.dataProfile(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the 100-TB mode trades exact distincts for HLL sketches so every
    // per-column aggregate fuses into one partial aggregation — the
    // 12-way Expand of the exact mode (above) must be gone
    assert(!p.contains("Expand"), p.take(2000))
    assert(uncachedFileScans(df.queryExecution.executedPlan) == 1,
      "profiling must read lineitem exactly once")
  }

  test("q_readability: pure map stage — zero shuffles, scan pruned to id/text/lang") {
    val df = graft.SparkEntry.queries("q_readability")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"readability must not shuffle\n${p.take(2000)}")
    assert(p.contains("struct<doc_id:bigint,text:string,lang:string>"),
      "documents scan must be pruned to doc_id/text/lang")
  }

  test("q_knn_classify: broadcast query set, one corpus pass, scan pruned to id/emb/label") {
    val df = graft.SparkEntry.queries("q_knn_classify")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.take(2000))
    assert(p.contains("struct<vec_id:bigint,embedding:array<float>,label:int>"),
      "corpus scan must be pruned to vec_id/embedding/label")
  }

  test("q_seasonal_profile / q_incremental_agg: bounded-key aggregates, dims broadcast, no product") {
    for (name <- Seq("q_seasonal_profile", "q_incremental_agg")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), name)
      assert(!p.contains("windowspecdefinition"), s"$name must not need a window")
    }
  }

  test("q_overlap_join: bin rewrite plans an EQUI join — no nested loop, no cartesian") {
    val p = plan("q_overlap_join")
    // the naive overlap predicate (a.s <= b.e AND b.s <= a.e) would force
    // BroadcastNestedLoopJoin; the (suppkey, bin) bucketing must keep it
    // a keyed hash/merge join with the range predicates as residuals
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(
      p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
      p.take(2000))
  }

  test("q_doc_chunk: chunk explode never crosses the wire — partial agg before one exchange") {
    val p = plan("q_doc_chunk")
    assert(!p.contains("CartesianProduct"))
    // the exploded chunk rows reduce map-side; only per-doc partials shuffle
    assert(p.contains("partial_"), "chunk stats must partial-aggregate map-side\n" + p.take(1500))
    assert(p.contains("Generate explode"), p.take(1500))
  }

  test("q_weighted_quantiles: windows only on the bucket table and single-bucket slices") {
    val p = plan("q_weighted_quantiles")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the quantile spec and min/max scalars join as broadcasts; the
    // full value set is never globally sorted — no Sort covering the
    // whole vw relation outside a window over the bounded bucket table
    assert(p.contains("BroadcastExchange"), p.take(2000))
    assert(p.contains("partial_sum"), "value-weight pre-aggregation must partial-agg map-side")
  }

  test("q_interpolate: one series-key exchange serves both neighbor windows") {
    val p = plan("q_interpolate")
    assert(!p.contains("CartesianProduct"))
    // both direction windows partition by event_type — a single
    // hashpartitioning(event_type) exchange must be planned, not one per
    // window direction
    val exchanges = "Exchange hashpartitioning\\(event_type".r.findAllIn(p).size
    assert(exchanges >= 1, p.take(1500))
    assert(p.contains("Window"), p.take(1500))
  }

  test("q_blocklist_scan: pure map stage — zero shuffles, scan pruned to doc_id/text") {
    val p = plan("q_blocklist_scan")
    assert(!p.contains("Exchange"), "blocklist scan must not shuffle\n" + p.take(1500))
    assert(p.contains("struct<doc_id:bigint,text:string>"), p.take(1500))
  }

  test("q_incremental_join: delta terms broadcast — maintenance cost scales with the delta") {
    val p = plan("q_incremental_join")
    assert(!p.contains("CartesianProduct"))
    // the three delta-side joins must be BroadcastHashJoin; the one
    // stored-view join (vOld) may shuffle — it models the already-
    // materialized table, built once
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2500))
    assert(p.contains("InMemoryTableScan"), "the stored view must be persisted, not recomputed")
  }

  test("q_rag_e2e: chunk embeddings persisted once; retrieval is the broadcast-queries kernel") {
    val p = plan("q_rag_e2e")
    assert(p.contains("InMemoryTableScan"), "chunk embeddings must be persisted, not re-chunked")
    // documented exact kernel: bounded query set broadcast, one corpus pass
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q_hll_rollup: one persisted scan serves sketch and exact legs; registers partial-agg") {
    val p = plan("q_hll_rollup")
    assert(p.contains("InMemoryTableScan"), "the entity projection must be persisted, not re-read")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_max"), "register max must combine map-side\n" + p.take(1500))
  }

  test("q_ivfpq_ann: candidate join keyed on cell — no cartesian, no nested loop") {
    val p = plan("q_ivfpq_ann")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // per-query top-k window is fine (8 query partitions); the corpus
    // side must reach the join through the cell equi-key
    assert(p.contains("cell"), p.take(1500))
  }

  test("q_bitmap_distinct: ObjectHashAggregate tier, no Expand, both legs partial-agg") {
    val p = plan("q_bitmap_distinct")
    assert(p.contains("ObjectHashAggregate"), p.take(2000))
    assert(!p.contains("Expand"), "bitmap distinct must not plan the multi-distinct Expand")
    assert(p.contains("partial_bitmap_distinct") || p.contains("partial_bitmapdistinct"),
      "map-side partial OR must run before the shuffle\n" + p.take(2000))
  }

  test("q_partition_pruned_join: dim dates reach the fact scan as a dynamic partition filter") {
    val p = plan("q_partition_pruned_join")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // the runtime DPP subquery must appear in the partitioned scan's
    // PartitionFilters — the whole point of the date-partitioned layout
    assert(p.contains("dynamicpruning"), "fact scan must carry a dynamicpruning filter\n" + p.take(3000))
  }

  test("q_assoc_rules: one basket shuffle; pairs expand in-row; supports broadcast") {
    val p = plan("q_assoc_rules")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the Apriori frequent set and the per-item supports join as broadcasts
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // pairs expand IN-ROW from the basket array (the r12 shape's
    // order-keyed self-join — a second corpus-sized shuffle — is the
    // regression this guards against): explode present, and NO
    // shuffle-keyed join anywhere in the plan — every join is broadcast
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "pair generation must not shuffle-join the corpus\n" + p.take(3000))
    // pair counts partial-aggregate map-side before the tiny pair exchange
    assert(p.contains("partial_count"), p.take(2000))
  }

  test("q_drift_psi: reference edges join as a broadcast dimension") {
    val p = plan("q_drift_psi")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("partial_sum"), "bin counts must partial-agg map-side")
  }

  test("q_item_knn: top-5 rank filter plans as map-side WindowGroupLimit; pairs in-row") {
    val p = plan("q_item_knn")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("WindowGroupLimit"), "rank<=k must plan the group-limit pushdown\n" + p.take(2000))
    // the one corpus-keyed exchange is the basket collect_set; pair
    // expansion is the in-row upper triangle, never a corpus self-join
    assert(p.contains("hashpartitioning(l_orderkey"), p.take(2000))
    assert(p.contains("Generate explode"), p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "co-occurrence must not shuffle-join the corpus\n" + p.take(3000))
    // r14 lock: the pair aggregate must materialize in EXACTLY ONE
    // shuffle stage. The r13 shape symmetrized via self-union and relied
    // on ReuseExchange, which the adaptive plan did NOT apply — the
    // explode+partial-agg ran twice (ShuffleQueryStage 4 AND 5). The
    // in-row 2-struct explode keeps a single (pa, pb) exchange.
    val paStages =
      """ShuffleQueryStage \d+[^\n]*\n[^\n]*Exchange hashpartitioning\(pa""".r
        .findAllIn(p).size
    assert(paStages == 1,
      s"pair aggregate must shuffle exactly once, saw $paStages stages\n" + p.take(3000))
  }

  test("q_mannwhitney: rank windows partition by bucket — no full-domain sort") {
    val p = plan("q_mannwhitney")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the per-value rank window runs inside bkt partitions; the only
    // unpartitioned window is over the ~bounded bucket-carry table
    assert(p.contains("hashpartitioning(bkt"), p.take(2000))
    assert(p.contains("partial_sum"), "per-value group counts must partial-agg map-side")
  }

  test("q_zipf_slope: every window partitioned; no vocabulary-sized single row") {
    val df = graft.SparkEntry.queries("q_zipf_slope")(spark, dir)
    df.collect()
    // the r9-verdict lock: NO partition-less window anywhere in the plan
    // (the old global rank funneled the whole vocabulary into one task)
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "rank must come from bucketed windows")
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"partition-less window in plan: $w")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(2000))
    // the only collect_list is the <=63-row band-offset fold — the old
    // whole-vocabulary (lx, ly) array must stay gone. ONE aggregate
    // prints its function at most 4x (partial/final x function/output).
    assert("collect_list\\(".r.findAllIn(p).size <= 4,
      "a second collect_list suggests the vocabulary-sized row came back\n" + p.take(2000))
    assert("collect_list\\(struct\\(band".r.findFirstIn(p).isDefined,
      "the surviving collect_list must be the band-offset fold\n" + p.take(2000))
    // regression sums partial-agg map-side as exact integers
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q_roc_curve: cumulative TP/FP windows partition by bucket; rates from broadcast scalar") {
    val p = plan("q_roc_curve")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // in-bucket DESC windows run inside bkt partitions (the mannWhitney
    // carry scheme); the only unpartitioned window is the bounded
    // bucket-offset table
    assert(p.contains("hashpartitioning(bkt"), p.take(2000))
    assert(p.contains("partial_sum"), "per-cent counts must partial-agg map-side")
  }

  test("q_rrf_fusion: both rankings truncate as TakeOrderedAndProject before any window") {
    val p = plan("q_rrf_fusion")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k inputs must plan as per-partition heaps, not a full sort\n" + p.take(2000))
  }

  test("q_survival_km_strata: every curve window partitions by cohort") {
    val df = graft.SparkEntry.queries("q_survival_km_strata")(spark, dir)
    df.collect()
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach(w => assert(w.partitionSpec.nonEmpty, s"partition-less window: $w"))
  }

  test("q_cluster_best_survivor: argmax is a partial max(struct), never a per-cluster window") {
    val p = plan("q_cluster_best_survivor")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // skew discipline: a mega-clique must collapse map-side
    assert(p.contains("partial_max"), "survivor argmax must partial-agg map-side\n" + p.take(2000))
    assert(!p.contains("row_number"), "a rank window would funnel mega-cliques\n" + p.take(2000))
  }

  test("q_source_divergence: quantized sums — no per-source vocabulary array") {
    val df = graft.SparkEntry.queries("q_source_divergence")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p.take(2000))
    // the entropy/KL folds are integer partial sums now; the old
    // collect_list(ent_term)/collect_list(kl_term) arrays must stay gone
    assert(!p.contains("collect_list"),
      "vocabulary-sized per-source array came back\n" + p.take(2000))
    assert(p.contains("partial_sum"), p.take(2000))
  }

  test("q_spatial_join: candidate join is equi on the cell key — never all-pairs") {
    val p = plan("q_spatial_join")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "radius join must route through the 3×3 cell equi-key\n" + p.take(2000))
    assert(p.contains("jx"), "cell-key join columns missing\n" + p.take(1500))
  }

  test("q_spatial_knn: candidate scan is cell-keyed (ring search), top-5 as WindowGroupLimit") {
    val df = graft.SparkEntry.queries("q_spatial_knn")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the candidate fetch must be an EQUI join on the grid cell key —
    // the r10 per-probe linear scan (points × probes nested loop) is the
    // banned shape
    assert(
      """(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[jx""".r.findFirstIn(p).isDefined,
      "candidate join must be equi on the cell key\n" + p.take(2500))
    assert(p.contains("WindowGroupLimit"),
      "top-5 must prune before the final shuffle\n" + p.take(2000))
    // the one remaining nested-loop join is the ring-radius phase:
    // RASTER (post-aggregate cell counts) × ≤64 probes — every
    // nested-loop join in the plan must sit above a cell aggregate, so
    // no per-POINT row ever crosses a nested loop
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val bnlj = df.queryExecution.executedPlan.collect {
      case j: BroadcastNestedLoopJoinExec => j
    }
    bnlj.foreach { j =>
      assert(
        j.children.exists(_.collectFirst { case a: HashAggregateExec => a }.isDefined),
        "nested-loop join fed by raw points — ring phase must cross cell AGGREGATES\n" +
          j.toString.take(1500))
    }
  }

  test("q_min_cost_supplier: fixed dims broadcast; rank window keyed by part") {
    val p = plan("q_min_cost_supplier")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastHashJoin"), "region/nation chain must broadcast\n" + p.take(2000))
    // the Window operator line prints "Window [fns], [partition spec],
    // [order spec]" — assert the partition spec actually carries the
    // part key (the previous "No Partition Defined" check matched a
    // runtime LOG string that never appears in explain output)
    assert("""Window \[[^\]]*\], \[p_partkey""".r.findFirstIn(p).isDefined,
      "rank window lost its part key\n" + p.take(2000))
  }

  test("q_waiting_suppliers: aggregate and rejoin share the orderkey partitioning") {
    val p = plan("q_waiting_suppliers")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("hashpartitioning(l_orderkey") || p.contains("hashpartitioning(ok"),
      "per-order aggregate must key on the orderkey\n" + p.take(2000))
    // r15 collapse locks: the pre-r15 shape evaluated the
    // lineitem⋈orders join TWICE (two lineitem scans — a full sort-merge
    // each at sf10) and planned a countDistinct Expand over the corpus;
    // the pair-table shape scans lineitem once and needs no Expand
    // (pairs are distinct by construction, so every countDistinct is a
    // plain count)
    assert(!p.contains("Expand"),
      "a countDistinct Expand crept back into the corpus aggregate\n" + p.take(2000))
    // count scans in the FINAL adaptive plan only (the Initial Plan
    // section re-prints pre-reuse subtrees); the two pair-table
    // consumers must dedup to one evaluation via ReusedExchange
    val finalPlan = p.split("== Initial Plan ==").head
    assert("lineitem\\.parquet".r.findAllIn(finalPlan).size <= 1,
      "the corpus join is being evaluated more than once\n" + finalPlan.take(2000))
    assert(finalPlan.contains("ReusedExchange"),
      "the pair-table exchange is not shared between its two consumers\n" +
        finalPlan.take(2000))
  }

  test("q_dormant_customers: scalar average broadcasts; recency check is left-anti") {
    val p = plan("q_dormant_customers")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "one-row average must broadcast\n" + p.take(2000))
    assert(p.contains("LeftAnti"), "recency check must plan as an anti join\n" + p.take(2000))
  }

  test("q_curriculum_order: two-level rank — no global sort, doc window keyed by bucket") {
    val p = plan("q_curriculum_order")
    assert(!p.contains("rangepartitioning"),
      "global sort crept into the curriculum ranking\n" + p.take(2000))
    assert(p.contains("hashpartitioning(bkt"),
      "document rank window must partition by the length bucket\n" + p.take(2000))
    spark.catalog.clearCache() // the query persists its projection
  }

  test("q_temperature_mix: quota fill is hex-bucket salted — no source-wide doc window") {
    val p = plan("q_temperature_mix")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    // the document rank window must partition by (source, hb), never by
    // source alone (one reducer per source at corpus scale)
    assert(p.contains("hashpartitioning(source, hb") ||
      p.contains("hashpartitioning(source#") && p.contains(", hb#"),
      "per-source fill lost its hex-bucket salt\n" + p.take(2500))
    spark.catalog.clearCache()
  }

  test("q_grid_density: smoothing shuffles cell aggregates, not points") {
    val p = plan("q_grid_density")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("InMemoryTableScan"),
      "cell counts must be persisted once and reused\n" + p.take(1500))
    assert(p.contains("partial_count") || p.contains("partial_sum"), p.take(2000))
  }

  // ------------------------------------------------------------------
  // robust-stats / eval family (r11): every nested-loop join must sit
  // above an AGGREGATE (bounded series / bin / scalar tables — never raw
  // fact rows), and every UNPARTITIONED window must rank an aggregate,
  // not the data. These two properties are exactly what makes the
  // family's O(n²)-looking math safe at 100 TB.
  // ------------------------------------------------------------------

  private def assertBoundedShapes(name: String): String = {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, SortAggregateExec, ObjectHashAggregateExec}
    import org.apache.spark.sql.execution.window.WindowExec
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    def hasAgg(n: org.apache.spark.sql.execution.SparkPlan): Boolean =
      n.collectFirst {
        case a: HashAggregateExec => a
        case a: SortAggregateExec => a
        case a: ObjectHashAggregateExec => a
      }.isDefined
    val root = df.queryExecution.executedPlan
    root.collect { case j: BroadcastNestedLoopJoinExec => j }.foreach { j =>
      assert(j.children.exists(hasAgg),
        s"$name: nested-loop join fed by raw rows\n" + j.toString.take(1500))
    }
    root.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }.foreach { w =>
      assert(hasAgg(w.child),
        s"$name: unpartitioned window over non-aggregate input\n" + w.toString.take(1500))
    }
    root.toString
  }

  test("q_theil_sen / q_mann_kendall: pair join is nation-keyed; windows partitioned or bounded") {
    for (q <- Seq("q_theil_sen", "q_mann_kendall")) {
      val p = assertBoundedShapes(q)
      assert(
        """(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[n_name""".r.findFirstIn(p).isDefined,
        s"$q: series pair join must be equi on n_name\n" + p.take(2500))
    }
  }

  test("q_conformal_interval: rank-k selection never sorts globally — bucket windows only") {
    val p = assertBoundedShapes("q_conformal_interval")
    assert(!p.contains("rangepartitioning"),
      "global sort crept into the conformity-quantile selection\n" + p.take(2500))
  }

  test("q_isotonic_fit / q_dtw / q_ndcg / q_hits: all solve phases ride bounded aggregates") {
    for (q <- Seq("q_isotonic_fit", "q_dtw", "q_ndcg", "q_hits")) assertBoundedShapes(q)
    spark.catalog.clearCache() // q_hits persists its edge list
  }

  test("q_bleu / q_rouge / q_bh_fdr: gram rollups partial-agg; global windows on bounded cells") {
    for (q <- Seq("q_bleu", "q_rouge", "q_bh_fdr")) {
      val p = assertBoundedShapes(q)
      assert(p.contains("partial_count") || p.contains("partial_sum"),
        s"$q: gram/cell rollup lost its map-side combine\n" + p.take(2000))
    }
  }

  test("q_viterbi / q_cohens_kappa: one keyed aggregate, decode fused, no extra shuffle") {
    for (q <- Seq("q_viterbi", "q_cohens_kappa")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      // AQE's toString repeats the plan under "== Initial Plan ==" — count
      // exchanges only in the executed (final) section
      val finalPlan = p.split("== Initial Plan ==").head
      val exchanges = "Exchange hashpartitioning".r.findAllIn(finalPlan).size
      assert(exchanges <= 1, s"$q: expected a single keyed shuffle, saw $exchanges\n" + p.take(2500))
    }
  }

  test("q_jaro_winkler: blocked equi-join, >=0.9 filter below the per-part window") {
    val p = assertBoundedShapes("q_jaro_winkler")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair generation must stay a blocked equi-join\n" + p.take(2500))
    assert(p.contains("hashpartitioning(key_a"),
      "best-match ranking must partition by key_a\n" + p.take(2500))
    // the similarity threshold must run in the join stage, not above the
    // window shuffle: the Filter containing jaro_winkler sits below Window
    val idxWin = p.indexOf("Window")
    val idxFil = p.toLowerCase.indexOf("jarowinkler") // expression prints by class name
    assert(idxFil > idxWin && idxWin >= 0,
      "jw filter not below the ranking window\n" + p.take(2500))
  }

  test("q_info_gain: one stack scan to a keyed aggregate; folds on bounded cells") {
    val p = assertBoundedShapes("q_info_gain")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "cell rollup lost its map-side combine\n" + p.take(2000))
  }

  test("q_wilcoxon / q_kendall_tau: ranks windowed per-source; pair grid month-bounded") {
    for (q <- Seq("q_wilcoxon", "q_kendall_tau")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
    }
    // the signed-rank window must partition by source, never globally
    val pw = plan("q_wilcoxon")
    assert(pw.contains("hashpartitioning(source"),
      "signed-rank window lost its source partition\n" + pw.take(2500))
  }

  test("q_runs_test / q_page_hinkley: type-partitioned windows over the bounded day axis") {
    for (q <- Seq("q_runs_test", "q_page_hinkley")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
    }
    val p = plan("q_page_hinkley")
    assert(p.contains("hashpartitioning(event_type"),
      "PH cumulative windows must partition by event_type\n" + p.take(2500))
  }

  test("q_effect_size / q_spearman: keyed aggregates; rank windows nation-partitioned") {
    for (q <- Seq("q_effect_size", "q_spearman")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      assert(p.contains("partial_"), s"$q: rollup lost its map-side combine\n" + p.take(2000))
    }
    val p = plan("q_spearman")
    assert(p.contains("hashpartitioning(n_name"),
      "rank windows must partition by n_name\n" + p.take(2500))
  }

  test("q_grubbs: per-type argmax under a partitioned window, moments broadcast") {
    val p = assertBoundedShapes("q_grubbs")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(p.contains("hashpartitioning(event_type"),
      "argmax window must partition by event_type\n" + p.take(2500))
  }

  test("q_mahalanobis: moments broadcast back; top-20 is a WindowGroupLimit, not a sort") {
    val p = assertBoundedShapes("q_mahalanobis")
    assert(!p.contains("rangepartitioning"), "global sort crept in\n" + p.take(2000))
    assert(p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"),
      "top-20 must run as a partial top-k, never a full sort\n" + p.take(2500))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      "moment row must broadcast\n" + p.take(2000))
  }

  test("q_mcnemar / q_yule_walker: one keyed aggregate, constant tail math") {
    for (q <- Seq("q_mcnemar", "q_yule_walker")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      assert(p.contains("partial_"), s"$q: rollup lost its map-side combine\n" + p.take(2000))
    }
  }

  test("q_ktruss: edge-keyed wedge joins, no cartesian, prune rounds truncated") {
    val p = assertBoundedShapes("q_ktruss")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(!p.contains("rangepartitioning"), p.take(2000))
    // the final plan must hang off the checkpointed round-4 edge set,
    // not re-derive the whole prune chain
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD") ||
      p.contains("LogicalRDD"),
      "edge iterate lost its localCheckpoint truncation\n" + p.take(2500))
  }

  test("q_granger: pair moments from the month-bounded grid, one keyed aggregate") {
    val p = assertBoundedShapes("q_granger")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("partial_"), "moment rollup lost its map-side combine\n" + p.take(2000))
  }

  test("q_chrf / q_burst_detect: gram rollup map-side; gap window user-partitioned") {
    for (q <- Seq("q_chrf", "q_burst_detect")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
    }
    val p = plan("q_burst_detect")
    assert(p.contains("hashpartitioning(user_id"),
      "gap lag window must partition by user_id\n" + p.take(2500))
  }

  test("q_anderson_darling: per-type ranking window, order-independent integer term sum") {
    val p = assertBoundedShapes("q_anderson_darling")
    assert(!p.contains("rangepartitioning"), "global sort crept in\n" + p.take(2000))
    assert(p.contains("hashpartitioning(event_type"),
      "rank window must partition by event_type\n" + p.take(2500))
    assert(p.contains("partial_sum"), "term sum lost its map-side combine\n" + p.take(2000))
  }

  test("q_anova_oneway / q_levene / q_ljung_box: keyed aggregates, constant tail math") {
    for (q <- Seq("q_anova_oneway", "q_levene", "q_ljung_box")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      assert(p.contains("partial_"), s"$q: rollup lost its map-side combine\n" + p.take(2000))
    }
  }

  test("q_ucb_replay: one keyed day-arm aggregate; replay fold on a single bounded row") {
    val p = assertBoundedShapes("q_ucb_replay")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(p.contains("partial_"), "day-arm rollup lost its map-side combine\n" + p.take(2000))
  }

  test("q_yule_k / q_keyword_llr / q_hellinger: one word-cell aggregate; no global sort") {
    for (q <- Seq("q_yule_k", "q_keyword_llr", "q_hellinger")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      assert(p.contains("partial_"), s"$q: word rollup lost its map-side combine\n" + p.take(2000))
    }
    val p = plan("q_keyword_llr")
    assert(p.contains("hashpartitioning(source"),
      "keyword top-5 window must partition by source\n" + p.take(2500))
  }

  test("q_hurst / q_fleiss_kappa: bounded grids over one keyed aggregate") {
    for (q <- Seq("q_hurst", "q_fleiss_kappa")) {
      val p = assertBoundedShapes(q)
      assert(!p.contains("rangepartitioning"), s"$q: global sort crept in\n" + p.take(2000))
      assert(p.contains("partial_"), s"$q: rollup lost its map-side combine\n" + p.take(2000))
    }
  }

  test("q_pacf: Durbin-Levinson rides the per-type daily aggregate, no extra shuffle") {
    val p = assertBoundedShapes("q_pacf")
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(p.contains("partial_"), "daily rollup lost its map-side combine\n" + p.take(2000))
  }

  test("q_smith_waterman: DP fused into the pair-join projection, sample filter in scan stage") {
    val p = assertBoundedShapes("q_smith_waterman")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "pair set must come from the doc_id equi-join\n" + p.take(2500))
    assert(!p.contains("rangepartitioning"), p.take(2000))
    assert(p.toLowerCase.contains("swscore"), "sw kernel not in the plan\n" + p.take(2000))
  }

  test("q_mmr_rerank: corpus scan ranked per-probe (partitioned window), probes broadcast") {
    val p = assertBoundedShapes("q_mmr_rerank")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "probe set must broadcast against the corpus scan\n" + p.take(2500))
    assert(p.contains("hashpartitioning(query_id"),
      "pool ranking must partition by query_id\n" + p.take(2500))
  }
}
