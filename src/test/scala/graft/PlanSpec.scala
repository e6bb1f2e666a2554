package graft

/** Plan-shape regression tests: the scale properties are part of the
  * contract, not an accident — filters reach the parquet scan, small dims
  * broadcast, hot aggregations avoid window sorts, scans prune columns.
  * (String-level checks over the executed plan; they fail loudly if a
  * refactor silently de-optimizes a query.) */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q03: filter pushed to the parquet scan, columns pruned") {
    val p = plan("q03_filter")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderstatus), Not(EqualTo(o_orderstatus,F))]"), p)
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint," +
      "o_orderstatus:string,o_totalprice:double>"), p)
  }

  test("q06: dimension joins broadcast; fact side never shuffles") {
    val p = plan("q06_lookup_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q13: latest-row-per-key is an aggregation, not a window sort") {
    val p = plan("q13_materialize_latest")
    assert(p.contains("max_by") || p.contains("HashAggregate"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q05: filter pushdown through the join, partial aggregation present") {
    val p = plan("q05_fact_join_agg")
    assert(p.contains("Not(EqualTo(o_orderstatus,F))"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q37: document-frequency side broadcasts; corpus never re-shuffles for scoring") {
    val p = plan("q37_tfidf_topk")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q38: bigram counts partially aggregate map-side, no window") {
    val p = plan("q38_bigram_counts")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q47: line items aggregate BELOW the outer join") {
    val p = plan("q47_left_outer")
    // the HashAggregate must sit under the join (one row per key enters
    // the join), visible as aggregate operators on the build side
    assert(p.contains("HashAggregate"), p)
    assert("LeftOuter|BuildRight".r.findFirstIn(p).isDefined, p)
  }

  test("q45: as-of is one key-partitioned window, no nested-loop probes") {
    val p = plan("q45_asof_join")
    assert(p.contains("Window ["), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q54: LM tables aggregate map-side; no window in the scoring path") {
    val p = plan("q54_lm_score")
    assert(p.contains("partial_count"), p) // LM counts combine before shuffle
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q56: exact percentiles plan as partial+final aggregation, not a global sort") {
    val p = plan("q56_length_percentiles")
    assert(p.contains("partial_percentile"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q57: centroids broadcast back; distance pass never shuffles twice") {
    val p = plan("q57_cluster_diagnostics")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_avg"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q59: window self-join is keyed, never nested-loop") {
    val p = plan("q59_substring_dup")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q58: bucketed join + aggregation runs with ZERO Exchange") {
    val p = plan("q58_bucketed_join")
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"), p) // neither shuffle nor broadcast
    assert(p.contains("Bucketed: true"), p)
  }

  test("q58: bucketed result equals the plain shuffled join") {
    val bucketed = SparkEntry.queries("q58_bucketed_join")(spark, dir)
      .collect().toSet
    val o = graft.sources.Tables.load(spark, dir, "orders")
    val l = graft.sources.Tables.load(spark, dir, "lineitem")
    import org.apache.spark.sql.functions._
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_items"),
        round(sum("l_quantity"), 6).as("sum_qty"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 6)
          .as("revenue"))
      .collect().toSet
    assert(bucketed == plain)
  }

  test("q61: chunking is a pure narrow transform — zero Exchange") {
    val p = plan("q61_doc_chunks")
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Generate explode"), p)
  }

  test("q62: top tokens plan as TakeOrderedAndProject, not a global sort") {
    val p = plan("q62_top_tokens")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_count"), p) // map-side combine before shuffle
  }

  test("q65: pivot plans as one aggregation pass, not one scan per event type") {
    val p = plan("q65_event_pivot")
    assert(p.contains("pivotfirst"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q66: decile binning runs without a global-order window") {
    val p = plan("q66_curriculum_bins")
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_percentile"), p) // distributed boundary agg
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)       // 1-row bounds broadcast back
  }

  test("q67: unpivot is a zero-shuffle Expand, one scan — not 4 unioned scans") {
    val p = plan("q67_metric_melt")
    assert(p.contains("Expand"), p)
    assert(!p.contains("Exchange"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
  }

  test("q68: gap window is PARTITIONED by user — hash exchange, no global sort") {
    val p = plan("q68_event_gaps")
    assert(p.contains("Window ["), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(!p.contains("rangepartitioning"), p) // a global sort would use one
  }

  test("q69: both session windows and the final agg share ONE user shuffle") {
    val p = plan("q69_sessionize")
    // LAG window, running-SUM window, and the per-(user, session)
    // aggregation all cluster by user_id: one hash Exchange feeds a
    // single sort, two Window operators, and a partial+final agg pair
    // with NO re-shuffle (user_id partitioning satisfies the grouping)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert("Window \\[".r.findAllIn(p).size == 2, p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q70: corpus-sized work is one partial+final agg; window sees only day rows") {
    val p = plan("q70_running_revenue")
    assert(p.contains("partial_sum"), p) // daily rollup combines map-side
    // the running-sum window sorts AFTER the aggregation, never the scan
    val aggIdx = p.indexOf("HashAggregate")
    val winIdx = p.indexOf("Window [")
    assert(aggIdx >= 0 && winIdx >= 0 && winIdx < aggIdx, p)
  }

  test("q74: moment table broadcasts; the corpus side never shuffles") {
    val p = plan("q74_length_outliers")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"), p)
    assert(p.contains("partial_avg"), p) // moments combine map-side
  }

  test("q75: CUBE is one Expand + one agg pass — not four scans") {
    val p = plan("q75_cube_stats")
    assert(p.contains("Expand"), p)
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count"), p)
  }

  test("q79: levenshtein runs on the candidate join, never corpus-wide") {
    val p = plan("q79_edit_distance")
    // the edit-distance filter must sit above equi-joins (candidates ⋈
    // prefixes), with no quadratic operator anywhere in the plan
    assert(p.contains("levenshtein"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q80: all DQ rules aggregate in ONE scan, melted by Expand") {
    val p = plan("q80_dq_report")
    assert("Scan parquet".r.findAllIn(p).size == 1, p)
    assert(p.contains("Expand"), p)
    assert(p.contains("partial_count"), p) // counters combine map-side
  }

  test("q64: salted join keys include the salt; result equals the plain join") {
    import org.apache.spark.sql.functions._
    val p = plan("q64_salted_join")
    // the equi-join condition must carry the salt column next to the key,
    // and the join must be SHUFFLED — a broadcast join would make the
    // salt meaningless (no reducer-side key concentration to spread)
    assert(p.contains("salt"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    val salted = SparkEntry.queries("q64_salted_join")(spark, dir)
      .collect().toSet
    val o = graft.sources.Tables.load(spark, dir, "orders")
    val l = graft.sources.Tables.load(spark, dir, "lineitem")
    val plain = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .collect().toSet
    assert(salted == plain)
  }

  test("q42: IVF search is a partition-pruned scan of probed cells only — " +
      "no corpus pass, no centroid recompute") {
    val df = SparkEntry.queries("q42_ivf_topk")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // the SEARCH plan must not contain the index-build work: no avg
    // aggregation over exploded dims (the centroid pass lives in the
    // one-time index build, not here). The only Generate allowed is the
    // k-row top-k unnest.
    assert(!p.contains("partial_avg"), p)
    assert(!p.contains("posexplode(embedding"), p)
    // the scan reads the hive cells layout with a partition filter of
    // ≤ NQ routed cells — never the whole corpus (AQE hides the scan
    // node from collectLeaves, so pin it at the string level)
    assert(p.contains("/cells"), p)
    val pf = raw"PartitionFilters: \[label#\d+ IN \(([-0-9,]+)\)".r
    val m = pf.findFirstMatchIn(p)
    assert(m.isDefined, p)
    assert(m.get.group(1).split(",").length <= 5, p) // ≤ one cell per probe
    // probes broadcast into the pruned scan — never a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q82: bloom prefilter culls the probe below a shuffled semi join; " +
      "values equal the plain semi join") {
    import org.apache.spark.sql.functions._
    val p = plan("q82_bloom_semi_join")
    // the verify join must be the SHUFFLED semi join the pattern exists
    // for (broadcastable build side ⇒ the bloom would be pointless), and
    // the bloom UDF must sit on the probe side BELOW the exchange —
    // i.e. inside the scan stage, so culled rows never shuffle
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("ShuffledHashJoin"), p)
    assert(!p.contains("BroadcastHashJoin"), p)
    // the optimizer may wrap the UDF argument in knownnotnull(...)
    val probeFilter = "Filter .*UDF\\((?:knownnotnull\\()?l_orderkey".r
    assert(probeFilter.findFirstIn(p).isDefined, p)
    // the filter and the lineitem scan share a codegen stage: no
    // exchange string may appear between the filter line and its scan
    val lines = p.linesIterator.toSeq
    val fi = lines.indexWhere(probeFilter.findFirstIn(_).isDefined)
    val si = lines.indexWhere(_.contains("Scan parquet"), fi)
    assert(fi >= 0 && si > fi &&
      !lines.slice(fi, si).exists(_.contains("Exchange")), p)
    val bloomed = SparkEntry.queries("q82_bloom_semi_join")(spark, dir)
      .collect().toSet
    val o = graft.sources.Tables.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000).select("o_orderkey")
    val l = graft.sources.Tables.load(spark, dir, "lineitem")
    val plain = l.join(o, col("l_orderkey") === col("o_orderkey"),
        "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,6)")).cast("double").as("revenue"))
      .collect().toSet
    assert(bloomed == plain)
  }

  test("q85: reads the session score memo; the BUILD's 1024-bucket " +
      "model broadcasts") {
    // the query side is a parquet scan of the memoized score table —
    // the train+score pass must NOT rerun per consumer (r7 memo)
    val p = plan("q85_quality_classifier")
    assert(p.contains("graft-cls-scores"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // the train-side shape is pinned on the build plan directly
    val b = graft.operators.TextAnalysis
      .classifierScoresBuild(spark, dir)
      .queryExecution.executedPlan.toString
    assert(b.contains("BroadcastHashJoin"), b)
    assert(!b.contains("CartesianProduct"), b)
  }

  test("q88: reads the session LM memo; the BUILD's model joins are " +
      "equi-joins with a 1-row |V| broadcast") {
    val p = plan("q88_lm_perplexity")
    assert(p.contains("graft-lm-scores"), p)
    // the c2/c1 joins are keyed equi-joins: Catalyst broadcasts them at
    // toy scale and shuffles at corpus scale — both fine; what must
    // never appear is an unkeyed product beyond the 1-row |V| broadcast
    val docs = sources.Tables.load(spark, dir, "documents")
      .select("doc_id", "text")
    val b = graft.operators.TextAnalysis.lmScoresOf(docs)
      .queryExecution.executedPlan.toString
    assert(b.contains("BroadcastNestedLoopJoin"), b)
    assert(b.contains("partial_count"), b)
    assert(!b.contains("CartesianProduct"), b)
    CacheScope.drain() // lmScoresOf persists its bigram frame
  }

  test("q89: gram counts combine map-side, keyed by doc⊕gram, no window") {
    val p = plan("q89_repetition_filters")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q90: stratum frame is bounded — the normalizer is a 1-row broadcast, not a window") {
    val p = plan("q90_source_mixture")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q91: funnel stages are user-keyed equi-joins, never nested-loop probes") {
    val p = plan("q91_funnel")
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q92: retention rollup partially aggregates; single join on user_id") {
    val p = plan("q92_retention_cohorts")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q93: PII scrub is one exchange-free narrow map fused at the scan") {
    val p = plan("q93_pii_redact")
    assert(!p.contains("Exchange"), p)
    // `*(1)` = the whole plan is a single whole-stage-codegen'd span
    assert(p.contains("*(1) Project"), p)
    assert(!p.contains("BatchEvalPython"), p)
  }

  test("q94: learned boilerplate vocabulary broadcasts back onto the " +
      "per-doc counts; no corpus-side sort-merge") {
    val p = plan("q94_boilerplate")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q95: pair stats partially aggregate map-side; top-25 is a " +
      "TakeOrdered, not a global sort") {
    val p = plan("q95_bpe_pairs")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q100: cross-split verify runs on the banded candidate set — " +
      "no all-pairs scan anywhere in the engine plan") {
    val p = plan("q100_fuzzy_decontaminate")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q99: IVF-PQ reads ONLY probed cell partitions — codes for the " +
      "ADC shortlist, raw cells for the exact re-rank") {
    val p = SparkEntry.queries("q99_ivfpq_topk")(spark, dir)
      .queryExecution.executedPlan.toString
    // no corpus pass at full precision, no centroid recompute
    assert(!p.contains("partial_avg"), p)
    assert(!p.contains("posexplode(embedding"), p)
    // BOTH stores scan with a bounded partition filter (≤ nprobe × NQ
    // cells): the codes layout and the raw cells layout
    val pf = raw"PartitionFilters: \[label#\d+ IN \(([-0-9,]+)\)".r
    val hits = pf.findAllMatchIn(p).toSeq
    assert(hits.size == 2, s"expected 2 pruned scans, got ${hits.size}\n$p")
    assert(hits.forall(_.group(1).split(",").length <= 10), p)
    // probes broadcast into the pruned scans — never a shuffled join
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q107: gopher rules are one exchange-free narrow map fused at the scan") {
    val p = plan("q107_gopher_rules")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q109: per-source cap is a bounded partial aggregation, not a " +
      "per-domain window sort") {
    val p = plan("q109_domain_cap")
    assert(p.contains("TopKAggregator") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), p)
    // only doc_id/text/source leave the scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string,source:string>"), p)
  }

  test("q143: suffix parse is one exchange-free narrow map fused at " +
      "the scan — provenance extraction costs a projection, not a join") {
    val p = plan("q143_registered_domain")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p) // the rule list is in-expression data
    assert(p.contains("public_suffix_parse"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("q144: per-DOMAIN cap keeps q109's bounded-buffer shape — no " +
      "per-domain window sort, parse fused below the aggregate") {
    val p = plan("q144_domain_cap")
    assert(p.contains("TopKAggregator") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), p)
    assert(p.contains("public_suffix_parse"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q147: URL dedup shuffles short normalized keys, never text — " +
      "same plan class as q20/q137") {
    val p = plan("q147_url_dedup")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("Join"), p)
    // the URL derives from doc_id alone: text never leaves the scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("q148: mojibake gate is one exchange-free narrow map fused at " +
      "the scan") {
    val p = plan("q148_mojibake_gate")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q149: opt-out gate is exchange-free — the list probes as an " +
      "IN over broadcast data, never a join") {
    val p = plan("q149_optout_gate")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p)
  }

  test("q150: the (domain, bucket) tally partially aggregates map-side " +
      "and the cumulative window is DOMAIN-partitioned over the bounded " +
      "bucket table — never a global or per-doc sort") {
    val p = plan("q150_token_budget")
    assert(p.contains("partial_sum") || p.contains("partial_count"), p)
    // the window must carry a partition key (rd): an empty-partition
    // window would pull the whole table onto one task
    assert("windowspecdefinition\\(rd#\\d+".r.findFirstIn(p).isDefined, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q153: quality-aware survivors are a map-side-combinable " +
      "cluster-keyed argmax plus anti-joins — no window, no per-cluster " +
      "sort, no cartesian") {
    val p = plan("q153_quality_survivor_corpus")
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("LeftAnti"), p)
  }

  test("q154: media survivors are a map-side-combinable cluster argmax; " +
      "candidates from the band join, no cartesian, no window") {
    val p = plan("q154_media_dedup_clusters")
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q41/q24: sign-LSH candidates come from a band-keyed equi-join, " +
      "never an all-pairs product — the plan IS the point at 100 TB") {
    Seq("q41_ann_lsh_topk", "q24_embedding_neardup").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: $p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q: $p")
      assert(p.contains("Join"), s"$q: $p") // the band bucket join
    }
  }

  test("q76: quantile brackets rank inside lang partitions over the " +
      "bounded per-doc length frame; the sketch aggregates partially " +
      "combine map-side") {
    val p = plan("q76_approx_stats")
    assert("windowspecdefinition\\(lang#\\d+".r.findFirstIn(p).isDefined, p)
    assert(p.contains("partial_approx_count_distinct") ||
      p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q146: bloom prefilter culls train grams BELOW the gram-join " +
      "exchange; values equal plain q26 (false positives never reach " +
      "the result)") {
    import org.apache.spark.sql.functions._
    val p = plan("q146_bloom_decontaminate")
    // the bloom UDF must sit on the probe side inside the scan stage —
    // culled grams never shuffle toward the exact join
    val probeFilter = "Filter .*UDF\\((?:knownnotnull\\()?g".r
    assert(probeFilter.findFirstIn(p).isDefined, p)
    val lines = p.linesIterator.toSeq
    val fi = lines.indexWhere(probeFilter.findFirstIn(_).isDefined)
    val si = lines.indexWhere(_.contains("Scan parquet"), fi)
    assert(fi >= 0 && si > fi &&
      !lines.slice(fi, si).exists(_.contains("Exchange")), p)
    val bloomed = SparkEntry.queries("q146_bloom_decontaminate")(spark, dir)
      .collect().toSet
    val plain = SparkEntry.queries("q26_decontaminate")(spark, dir)
      .collect().toSet
    assert(bloomed == plain)
    assert(bloomed.nonEmpty)
  }

  test("q110: bucket thresholds come from the distinct-score table — the " +
      "doc-level path has no per-language window") {
    val p = plan("q110_ccnet_buckets")
    // exactly one Window (over distinct (lang, avg_nll) rows), and the
    // value→bucket table broadcasts back onto the doc frame
    assert("Window \\[".r.findAllIn(p).size == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q108: rank window runs over the vocabulary aggregate, below a " +
      "map-side-combined token count") {
    val p = plan("q108_zipf_fit")
    assert(p.contains("HashAggregate"), p)
    // the window input is the (lang, tok, c) aggregate, never raw tokens:
    // the token explode feeds a partial aggregation first
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("q115: the composed pipeline caps with the bounded aggregator " +
      "and keeps every stage window-free") {
    val p = plan("q115_pipeline_corpus")
    assert(p.contains("TopKAggregator") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), p)
    // survivor selection is joins, never a cartesian/nested-loop probe
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q118: histogram is two bounded aggregates over the shared " +
      "cluster table — no explode, no window, no corpus scan") {
    val p = plan("q118_cluster_sizes")
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window ["), p)
    // reads the memoized parquet cluster table, not documents
    assert(!p.contains("documents.parquet"), p)
  }

  test("q119: head membership broadcasts back onto the occurrence " +
      "frame; the rank window sees only the vocabulary aggregate") {
    val p = plan("q119_vocab_coverage")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the window input is the (tok, c) aggregate, never raw occurrences
    assert(p.contains("partial_count") || p.contains("partial count"), p)
  }

  test("q120: datasheet joins are 1-row broadcasts; the near-dup rate " +
      "reads the memoized pair table, never an LSH re-run") {
    val p = plan("q120_corpus_datasheet")
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the pair ladder's signature aggregation (MinHashAgg) must NOT
    // appear — the rate comes from the session-shared parquet pairs
    assert(!p.contains("MinHashAgg"), p)
  }

  test("q123: no window sorts the corpus — doc-level windows are " +
      "shard-partitioned, the only unpartitioned window is the bounded " +
      "supershard base") {
    val p = plan("q123_sequence_packing")
    // an UNPARTITIONED window's spec leads with its sort column: a
    // global doc-ordered cumsum would print windowspecdefinition(doc_id#…
    // ASC. The hierarchical plan partitions every doc/shard window (spec
    // leads with the partition column), so that shape must be absent.
    assert(!p.contains("windowspecdefinition(doc_id#"), p)
    assert("windowspecdefinition\\(shard#\\d+L?, doc_id#".r
      .findFirstIn(p).isDefined, p)
    // shard totals are map-side combined before the one shard shuffle
    assert(p.contains("partial_sum"), p)
  }

  test("q137: canonical dedup shuffles 32-hex hashes, never documents — " +
      "same plan class as q20 with the normalize map fused at the scan") {
    val p = plan("q137_canonical_dedup")
    assert(p.contains("unicode_normalize"), p)
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("SortMergeJoin"), p)
    // only the two consumed columns leave the scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q138: entropy tally partially aggregates map-side; no window, " +
      "no join") {
    val p = plan("q138_char_entropy")
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q139: blocklist gate is one exchange-free narrow map fused at " +
      "the scan — no explode, no shuffle") {
    val p = plan("q139_blocklist_gate")
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Generate"), p) // no explode — row-local arrays
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
  }

  test("q140: the bounded benchmark side broadcasts; the corpus makes " +
      "one pass with no shuffle before the per-vector aggregate") {
    val p = plan("q140_embedding_decon")
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("Window ["), p)
    // exactly one aggregate pair (partial + final) over the scored rows
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
  }

  test("q142: assignment is row-local arithmetic fused at the scan — " +
      "no shuffle before the bounded per-shard aggregate, no window, " +
      "no join") {
    val p = plan("q142_rendezvous_sharding")
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window ["), p)
    assert(!p.contains("Generate"), p) // no shard explode — pure argmax
    // exactly the shard shuffle: one Exchange feeding the final agg
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), p)
  }

  test("q141: banding probes the signature memo — no LSH re-train, the " +
      "verify join ships pair counts, never feature arrays") {
    val p = plan("q141_incremental_dedup")
    // signatures come from the md5_sigs parquet memo, not a re-run of
    // the Md5MinHash aggregation
    assert(!p.contains("md5_minhash_sig"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the exact-verify intersection is count-shaped (HashAggregate over
    // pair keys), not an array-intersect projection
    assert(p.contains("HashAggregate"), p)
  }

  test("q156: weighted sampling is one scan into bounded top-k buffers — " +
      "no window sort, partial aggregation present") {
    val p = plan("q156_weighted_sample")
    assert(!p.contains("Window ["), p)
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"), p)
    // one corpus read, no self-join
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"), p)
  }

  test("q157: chunk explode is a generator, rollup partially aggregates " +
      "16-byte hashes — no shuffle before the hash rollup") {
    val p = plan("q157_chunk_dedup")
    assert(p.contains("Generate"), p)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window ["), p)
    assert("Exchange".r.findAllIn(p).size <= 2,
      s"expected only the rollup exchange(s):\n$p")
  }

  test("q50/q125: container parse is a codegen'd expression fused at the " +
      "scan — no object-serialization boundary on the multimodal path") {
    for (q <- Seq("q50_multimodal_meta", "q125_phash_neardup")) {
      val p = plan(q)
      assert(!p.contains("SerializeFromObject"), s"$q:\n$p")
      assert(!p.contains("DeserializeToObject"), s"$q:\n$p")
      assert(!p.contains("MapPartitions"), s"$q:\n$p")
      assert(p.contains("media_header_parse") || p.contains("media_phash"),
        s"$q:\n$p")
    }
    // and the generated code actually COMPILES (a Janino failure would
    // silently fall back to interpreted eval): force codegen strictness
    // on one evaluation
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val n = SparkEntry.queries("q50_multimodal_meta")(spark, dir).count()
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("q158: SCD2 history is ONE user shuffle feeding one sort and one " +
      "Window — no adjacent-version self-join, no global sort") {
    val p = plan("q158_scd2_history")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert("Window \\[".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("rangepartitioning"), p)
    assert(!p.contains("props"), p) // unused wide column pruned at the scan
  }

  test("q160: temporal-table join is union + ONE user shuffle + one " +
      "carry-forward window — no join operator, no probe-per-row plan") {
    val p = plan("q160_temporal_join")
    assert(p.contains("Union"), p)
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q161: drift PSI reduces the corpus in one pruned pass; all " +
      "pair arithmetic happens on the bounded strata frame") {
    val p = plan("q161_drift_psi")
    // scan reads only the two columns the tally needs
    assert(p.contains("ReadSchema: struct<ts:"), p)
    assert(!p.contains("props") && !p.contains("user_id") &&
      !p.contains("value"), p)
    // the day-pair self-join runs on windows×categories rows — always
    // broadcast-able, never a corpus-sized sort-merge
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("q162: k-anonymity is one partial+final aggregation over the " +
      "QI key; scan pruned to the three QI columns") {
    val p = plan("q162_k_anonymity")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("ReadSchema: struct<c_nationkey:int," +
      "c_acctbal:double,c_mktsegment:string>") ||
      p.contains("ReadSchema: struct<c_nationkey:int," +
        "c_mktsegment:string>"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q163: snapshot diff joins digests, not documents — text is " +
      "hashed at the scan and the join ships (id, source, md5) only") {
    val p = plan("q163_snapshot_diff")
    // no full text column survives past the scan's projection: every
    // occurrence of `text` is inside an md5(...) in the scan-side project
    assert(!p.contains("SerializeFromObject"), p)
    assert(p.contains("md5"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q164: gate CI is one partial+final agg to a sources-sized " +
      "frame; interval math adds no shuffle") {
    val p = plan("q164_gate_ci")
    assert("Exchange".r.findAllIn(p).size == 1, p)
    assert(p.contains("ReadSchema: struct<source:string,n_chars:bigint>"), p)
  }

  test("q159: sorted-neighborhood linkage shuffles on the BLOCK (window " +
      "is partitioned, never a single global sort) and joins nothing") {
    val p = plan("q159_entity_match")
    assert("Exchange hashpartitioning\\(blk".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)            // candidates come from lead()
    assert(!p.contains("rangepartitioning"), p) // no global sort
    assert("Window \\[".r.findAllIn(p).size == 1, p)
  }

  test("q170: blocking audit windows partition on the block; the " +
      "all-pairs denominator is never materialized") {
    val p = plan("q170_blocking_audit")
    assert("Exchange hashpartitioning\\(blk".r.findAllIn(p).size >= 1, p)
    // metric joins are 1-row broadcasts; no doc-level cartesian exists
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q167: probes, probe terms and df broadcast — the corpus is " +
      "never sort-merge-joined; rankings are query-partitioned windows") {
    val p = plan("q167_hybrid_rrf")
    // dense probes + sparse qt/df/stats sides all broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p)
    assert(!p.contains("rangepartitioning"), p) // no global sorts
    // per-query ranking windows partition on query_id
    assert("Window \\[".r.findAllIn(p).size >= 2, p)
  }

  test("q168: gate kappa is partial+final aggregation over a pruned " +
      "scan; kappa arithmetic runs on the bounded cell frame") {
    val p = plan("q168_gate_kappa")
    assert(p.contains("partial"), p)
    assert(p.contains("ReadSchema: struct<text:string,source:string," +
      "n_chars:bigint>") ||
      p.contains("ReadSchema: struct<source:string,n_chars:bigint") ||
      p.contains("text") && p.contains("n_chars"), p)
    assert(!p.contains("Window ["), p)
  }

  test("q169: chunking scans only (doc_id, text); the boundary modulus " +
      "filters windows BEFORE any exchange") {
    val p = plan("q169_cdc_chunking")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p)
    // the row-level % 64 = 0 boundary filter exists and the window
    // explode is the native expression — only boundaries reach the
    // shuffle
    assert(p.contains("= 0)"), p)
    assert(p.contains("char_window_grams") || p.contains("CharWindowGrams")
      || p.contains("charwindowgrams"), p)
  }
}
