package graft

/** The library-consumer cache contract (SparkEntry scaladoc): running
  * any single query's action leaves ZERO persisted blocks behind — the
  * scratch persists that fed the plan's self-joins are released by
  * [[Caches]]' execution listener when the action completes, with no
  * caller-side clearCache(). Targets are the heaviest persist users
  * across the query packs (Dedup band joins, BM25 stats, winsorize
  * two-pass, ABC range-pin, overlap/coverage self-joins). */
class CacheScopeSpec extends SparkSpec {

  private val targets = Seq(
    "q_dedup_minhash", "q_novelty", "q_bm25", "q_winsorize", "q_abc_class",
    "q_source_overlap", "q_vocab_coverage", "q_mutual_info",
    "q_basket_rules", "q_rfm_segments",
    // late round-8 persistScoped users
    "q_theil_sen", "q_js_divergence", "q_sketch_overlap", "q_shortest_path",
    "q_apply_changelog", "q_weighted_percentile", "q_brier",
    "q_bitmap_retention",
    // round-8 continuation persistScoped users (the checkpointing ones
    // — dbscan/bpe/markov — are excluded per the delta-assertion note)
    "q_cms_topk", "q_growth_accounting", "q_hash_ring")

  private def persistedIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("zero persisted blocks remain after a query's action completes") {
    // flush anything earlier suites left in the shared session; the
    // baseline may still hold lineage-truncation localCheckpoint RDDs
    // from prior suites (ContextCleaner-lifecycle, not CacheManager
    // persists) — the assertion is therefore on the DELTA: no new
    // persisted RDD survives a query's action. None of the targets
    // localCheckpoints, so the delta is exactly the scoped persists.
    Caches.drain()
    spark.catalog.clearCache()
    val baseline = persistedIds
    for (name <- targets) {
      SparkEntry.queries(name)(spark, sfDir).count()
      // the release listener rides the async listener bus — poll on
      // BOTH signals: a query whose scratch persist is never
      // materialized (e.g. its join is eliminated under count()) has
      // no leaked RDD to wait on, but the scope release is still
      // asynchronous
      var tries = 0
      while ((Caches.ownedCount != 0 || (persistedIds -- baseline).nonEmpty)
          && tries < 100) {
        Thread.sleep(100); tries += 1
      }
      val leaked = persistedIds -- baseline
      assert(leaked.isEmpty, s"$name leaked persisted RDDs: $leaked")
      assert(Caches.ownedCount == 0,
        s"$name left an unreleased cache scope")
      assert(Caches.pendingCount == 0,
        s"$name left pending un-owned persists")
    }
  }

  test("a scope whose tracked root canonicalizes away is still released") {
    // own() a SubqueryAlias-rooted plan (Dataset.as) — its
    // doCanonicalize collapses into the child, so no node of any
    // completed plan ever carries the raw root class. The release
    // gate must therefore key on the CANONICALIZED root class; the
    // raw-class gate would strand this scope forever. The action runs
    // the UNWRAPPED twin, the worst case for the gate.
    Caches.drain()
    spark.catalog.clearCache()
    import org.apache.spark.sql.functions.col
    val scratch = Caches.persist(spark.range(1000).toDF("id"))
    val result = scratch.groupBy((col("id") % 10).as("k")).count()
    Caches.own(result.as("wrapped").toDF())
    assert(Caches.ownedCount >= 1)
    result.count() // semantically equal, alias-free
    var tries = 0
    while (Caches.ownedCount != 0 && tries < 100) { Thread.sleep(100); tries += 1 }
    assert(Caches.ownedCount == 0,
      "alias-rooted scope was never released — canonical root-class gate broken")
  }

  test("a plan built but never run is reclaimed by drain()") {
    Caches.drain()
    spark.catalog.clearCache()
    val baseline = persistedIds
    SparkEntry.queries("q_bm25")(spark, sfDir) // build only — no action
    assert(Caches.ownedCount >= 1)
    Caches.drain()
    assert(Caches.ownedCount == 0 && (persistedIds -- baseline).isEmpty)
  }
}
