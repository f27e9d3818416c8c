package graft

import graft.tools.PlanScan

/** Registry-wide physical-plan guard: the two shapes that do not
  * survive a 100× scale-up are (a) CartesianProduct — |A|×|B| work —
  * and (b) BroadcastNestedLoopJoin whose broadcast side GROWS with the
  * data (the driver OOMs building the broadcast long before the
  * executors get to burn the quadratic work). The repo's own idiom
  * `crossJoin(broadcast(one-row aggregate))` also plans a BNLJ but is
  * scale-safe by construction; [[PlanScan.boundedOutput]] separates
  * the two by PROOF over the plan tree (every leaf path passes a
  * grouping-free aggregate, a limit, or a constant relation) instead
  * of a per-query allowlist — so a future edit that accidentally
  * broadcasts a corpus-sized relation fails here by name, and a new
  * safe scalar-broadcast needs no spec change at all. Runs in a
  * no-AQE session so `executedPlan` is the final static tree. */
class PlanGuardSpec extends SparkSpec {

  private lazy val planner = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  // No allowlist: the two per-source pairwise-matrix queries
  // (q_js_divergence, q_sketch_overlap) once needed one — their
  // scaffold was a domain-enum ASSUMPTION — until both gained a
  // top-64-by-volume cap that makes the bound structural. A newly
  // flagged query must extend the proof or get the same treatment.

  test("registry-wide: no cartesian products, every nested-loop broadcast side provably bounded") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(planner, sfDir).queryExecution.executedPlan
        catch { case e: Throwable => fail(s"$name failed to plan: $e") }
      if (PlanScan.cartesians(plan) > 0)
        offenders += s"$name: CartesianProduct in plan"
      PlanScan.unboundedNestedLoops(plan).foreach(snippet =>
        offenders += s"$name: UNBOUNDED nested-loop broadcast side\n$snippet")
      try { Caches.drain(); planner.catalog.clearCache() }
      catch { case _: Throwable => }
    }
    assert(offenders.isEmpty,
      s"${offenders.size} scale-unsafe join shape(s):\n\n${offenders.mkString("\n\n")}")
  }

  /** Shuffle-exchange budgets for the headline queries, pinned at the
    * counts the current plans produce (BroadcastExchange excluded —
    * broadcast is the desired dim-join shape). The counts include the
    * post-aggregation sort exchanges the determinism convention
    * requires (total ORDER BY), which move already-reduced data; the
    * budget's job is to fail loudly when an edit adds a NEW exchange —
    * the classic regression being a lost broadcast hint or a
    * repartition sneaking in front of a join — so the plan gets
    * re-read instead of silently shipping a corpus-scale shuffle. */
  private val shuffleBudget = Seq(
    "q_projection" -> 1, "q_ranged_scan" -> 1, "q_topk" -> 0,
    "q_hash_sample" -> 1, "q_token_count" -> 1,
    "q_pricing_summary" -> 2, "q_join_inner" -> 2, "q_join_broadcast" -> 2,
    "q_join_star" -> 2, "q_bucketed_join" -> 2, "q_dedup_exact" -> 2,
    "q_dedup_minhash" -> 2, "q_sessionize" -> 2, "q_window_rank" -> 2,
    "q_topk_pergroup" -> 2, "q_count_distinct" -> 3, "q_tfidf" -> 3,
    "q_sim_topk" -> 3, "q_equidepth_hist" -> 6,
    // round 12: the percentile family moved onto the shared
    // Ranked.cutValues* machinery — the per-(partition, group)
    // count/weight table is collected once (bounded metadata) and the
    // crossing offsets become literals, so the offset windows and
    // per-axis metadata aggregates vanished from the static plan.
    // q_winsorize 7 → 4 (range exchange + cut agg + clip agg + sort),
    // q_rfm_segments 17 → 5 (ONE tagged range exchange for all three
    // axes + cut-array aggs + final segment agg + sort),
    // q_weighted_percentile → 4, q_percentile_disc 5 → 2.
    "q_winsorize" -> 4, "q_rfm_segments" -> 5,
    "q_weighted_percentile" -> 4,
    // q_fk_audit (round 11): one scan+aggregate per CHILD table with
    // all FK edges folded in (12 → 5)
    "q_fk_audit" -> 5,
    // round 9 (counts from PLANGUARD.md's sweep): the BFS emits one
    // post-loop sort exchange, the narrow text/variant/SQL-surface
    // queries stay at scan+sort, BPE pays one exchange per vocab
    // round, the collation/sanitize windows add their rank exchanges
    "q_dedup_hops" -> 1, "q_mixed_tokens" -> 2, "q_unicode_normalize" -> 2,
    "q_variant_extract" -> 2, "q_sql_pipe" -> 2, "q_sql_udf" -> 2,
    "q_sql_recursive" -> 2, "q_collated_group" -> 4, "q_name_sanitize" -> 4,
    "q_bpe_apply" -> 5, "q_collated_fold" -> 4,
    // q_expectations: 4 rule-family aggregates (2 conditional-sum
    // scans + PK-uniqueness partial/final + distinct-FK left join
    // reading n_checked and violations off one grouped relation)
    // unioned, plus the ORDER BY — each moves rule-report rows, never
    // a second fact scan. q_simpsons_audit: stratum agg + pooled
    // re-agg + sort; the pooled side re-aggregates 3 stratum rows.
    "q_expectations" -> 7, "q_simpsons_audit" -> 3,
    // q_sample_quantiles: the KMV draw is map-side TakeOrdered and
    // the windows run over the ≤1024-row sample; the ONE exchange is
    // the deliberate Tables.widen pass (round 16 — the one-row-group
    // fixture scans as a single task, so the per-row md5 must be
    // redistributed before it runs; a no-op repartition on any
    // properly split input). A SECOND exchange would mean the draw
    // stopped combining map-side — that is the bug this pins.
    "q_sample_quantiles" -> 1,
    // q_join_asof_merge: the custom exec's two input exchanges plus
    // the result ORDER BY — a 4th exchange would mean the pair
    // stream started shuffling again (AsofSpec pins the record
    // counts; this pins the count of exchanges)
    "q_join_asof_merge" -> 3,
    // q_sample_quantiles_grouped: the heap-aggregate exchange (≤k
    // rows per group × partition) + the ORDER BY — the fact stream
    // itself must never appear at a shuffle
    "q_sample_quantiles_grouped" -> 2,
    // round 10: the DPP/existence joins keep their dims broadcast
    // (agg + sort only); the reload profile pays groupBy +
    // distinct-count expand + sort; the Holt fold is month-agg +
    // rank window + per-flag collect folded into 3; curriculum's
    // global interleave is TakeOrdered (no exchange) after the one
    // per-source rank window; k-core's loop rounds checkpoint
    // outside the returned plan — only the final degree agg + sort
    // remain
    "q_dpp_join" -> 2, "q_join_existence" -> 2, "q_partition_reload" -> 3,
    "q_preference_pairs" -> 2, "q_curriculum" -> 1, "q_holt_trend" -> 3,
    // round 12: the peel loop iterates (checkpointed) NODE sets, and
    // the converged round's degree aggregate IS the output — only the
    // final sort remains in the returned plan
    "q_kcore" -> 1,
    // q_merge_schema_read: merged-read agg + sort; q_sprt: one daily
    // aggregate + the per-variant cumulative window + sort;
    // q_boilerplate_scrub: chunk census + anti-join + kept/total aggs
    // + sort — all over the ONE persisted chunk relation
    "q_merge_schema_read" -> 2, "q_sprt" -> 3, "q_boilerplate_scrub" -> 5,
    // round 11 (verdict task 6): EVERY remaining ≥5-exchange query
    // pinned at its current static count (PlanScan sweep of this
    // round's HEAD) so new packs can't silently add shuffles to the
    // wide tail — the counts move bounded relations (month/day/pid
    // spines, pair censuses, rank-machinery metadata), never a second
    // fact pass
    "q_mutual_info" -> 8, "q_modularity" -> 8, "q_hash_ring" -> 8,
    "q_stickiness" -> 7, "q_shortest_path" -> 7, "q_pagerank_nations" -> 7,
    "q_profile_columns" -> 6, "q_lm_score" -> 6, "q_funnel_steps" -> 6,
    "q_dbscan_grid" -> 6, "q_attribution_multitouch" -> 6, "q_abc_class" -> 6,
    "q_vocab_coverage" -> 5, "q_triangle_nations" -> 5, "q_rolling_active" -> 5,
    "q_relational_division" -> 5, "q_quantile_norm" -> 5, "q_pmi" -> 5,
    "q_percentile_disc" -> 2, "q_mann_kendall" -> 5, "q_lexical_cosine" -> 5,
    "q_knn_classify" -> 5, "q_kl_sources" -> 5, "q_doc_packing" -> 5,
    "q_concurrency" -> 5, "q_cohens_kappa" -> 5, "q_chi2_independence" -> 5,
    "q_char_entropy" -> 5, "q_basket_rules" -> 5,
    // q_scd2_merge: base change-detect window + replay window + final
    // close-out window + sort, all partitioned by user_id; the
    // touched/untouched semi/anti joins ride the same keyed exchanges
    "q_scd2_merge" -> 4,
    // both tests aggregate the fact table to the ≤84-row monthly
    // relation FIRST; everything after (pair join, tie census, lag
    // window) exchanges month-relation rows only
    "q_mann_kendall" -> 5, "q_runs_test" -> 3,
    // round-10 evaluation pack: each fact table collapses in ONE keyed
    // aggregate (+ persisted-relation exchanges and the final sort);
    // the retrieval metrics pay the heap-aggregate exchange + label
    // joins; adamic-adar's 4 includes the one fact-fact join — the
    // graph steps after it exchange nation rows only
    "q_kendall_tau" -> 3, "q_acf" -> 2, "q_anova" -> 2,
    "q_brown_forsythe" -> 3, "q_mrr" -> 2, "q_precision_at_k" -> 4,
    "q_copeland" -> 3, "q_adamic_adar" -> 4, "q_readability" -> 2,
    "q_horvitz_thompson" -> 2, "q_jackknife_ratio" -> 3,
    "q_capture_recapture" -> 3,
    // the association/survival additions share the collapsed-relation
    // shape: ordinal reads kendall's persisted census, logrank windows
    // the bounded day spine, cochran is 3 band rows, richness pays the
    // one (lang, word) count exchange
    "q_ordinal_assoc" -> 3, "q_logrank" -> 3, "q_cochran_armitage" -> 2,
    "q_lexical_richness" -> 3,
    // network trio: assortativity is three keyed aggregates; HITS
    // iterates via eager localCheckpoints during build, so the
    // RETURNED plan is just the converged join + sort; modularity's
    // exchanges all move nation rows
    "q_assortativity" -> 3, "q_hits" -> 1, "q_modularity" -> 8,
    // label propagation iterates via checkpoints like HITS (returned
    // plan = size join + sort); Hodges-Lehmann is the kendall census
    // shape (persisted month relation + pair join + median)
    "q_label_prop" -> 2, "q_hodges_lehmann" -> 3,
    // round 13: the two queries the round-12 audit missed — the live
    // DuckDB wire is ONE strided JDBC scan + sort; BLEU pays the two
    // n-gram clip joins + per-lang agg + sort
    "q_jdbc_duckdb" -> 1, "q_bleu" -> 5,
    // round-13 pack: the graph pair (backbone collapse + bounded
    // nation relations — clustering's 6 include the persisted-backbone
    // build and the degree/triangle aggregates; distances iterate via
    // checkpoints so the returned plan is the eccentricity agg + sort);
    // the stats additions all collapse the fact table first; kmeans
    // returns only the final assignment aggregates (rounds checkpoint
    // outside the plan); csv_hostile is scan + sort off the staged
    // files
    "q_clustering_coeff" -> 6, "q_nation_distances" -> 2,
    "q_kruskal_wallis" -> 3, "q_theil_index" -> 3, "q_drawdown" -> 3,
    "q_bollinger" -> 2, "q_morans_i" -> 3, "q_dedup_templates" -> 3,
    "q_neyman_alloc" -> 2, "q_kmeans_lloyd" -> 4, "q_csv_hostile" -> 1)

  test("headline queries stay within their pinned shuffle budgets") {
    val over = shuffleBudget.flatMap { case (name, budget) =>
      val plan = SparkEntry.queries(name)(planner, sfDir)
        .queryExecution.executedPlan
      val n = PlanScan.shuffleExchanges(plan)
      try { Caches.drain(); planner.catalog.clearCache() }
      catch { case _: Throwable => }
      if (n > budget) Some(s"$name: $n shuffles (budget $budget)") else None
    }
    assert(over.isEmpty, over.mkString("\n"))
  }

  test("boundedOutput: positive and negative shapes") {
    import org.apache.spark.sql.functions._
    val orders = Tables.load(planner, sfDir, "orders")
    // grouping-free aggregate → bounded
    assert(PlanScan.boundedOutput(
      orders.agg(count(lit(1))).queryExecution.executedPlan))
    // limit → bounded
    assert(PlanScan.boundedOutput(
      orders.limit(5).queryExecution.executedPlan))
    // grouped aggregate over a scan → NOT bounded (groups grow with data)
    assert(!PlanScan.boundedOutput(
      orders.groupBy(col("o_orderpriority")).count().queryExecution.executedPlan))
    // raw scan of a growing table → NOT bounded
    assert(!PlanScan.boundedOutput(orders.queryExecution.executedPlan))
    // constant enumeration dim (region: 5 rows at every SF) → bounded
    assert(PlanScan.boundedOutput(
      Tables.load(planner, sfDir, "region").queryExecution.executedPlan))
    // unique-key prefix predicate → bounded; non-key predicate → not
    assert(PlanScan.boundedOutput(
      orders.filter(col("o_orderkey") < 20).queryExecution.executedPlan))
    assert(!PlanScan.boundedOutput(
      orders.filter(col("o_totalprice") < 1000).queryExecution.executedPlan))
    // modulo selection on the key grows with the data → NOT bounded
    assert(!PlanScan.boundedOutput(
      orders.filter(col("o_orderkey") % 25 === 0).queryExecution.executedPlan))
    // join of bounded × bounded → bounded
    assert(PlanScan.boundedOutput(
      orders.limit(3).crossJoin(orders.agg(count(lit(1))))
        .queryExecution.executedPlan))
    // grouping-free collect_list emits ONE row with a corpus-sized
    // payload — one row is not a bound when the row IS the data
    assert(!PlanScan.boundedOutput(
      orders.agg(collect_list(col("o_orderkey"))).queryExecution.executedPlan))
    // ...while a grouping-free SUM genuinely bounds the payload too
    assert(PlanScan.boundedOutput(
      orders.agg(sum(col("o_totalprice"))).queryExecution.executedPlan))
  }
}
