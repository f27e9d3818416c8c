package graft

/** Partition-count invariance, institutionalized: the queries built on
  * the two-pass range-repartition + broadcast-offset prefix-sum
  * machinery derive ranks from the physical partition layout
  * (monotonically_increasing_id / spark_partition_id), so THEY are the
  * ones a shuffle-width change could corrupt. Run each at two widths
  * and require identical output. (A full-inventory sweep at widths 8
  * vs 17 was run once — 201/201 dumps bit-identical; this spec guards
  * the load-bearing subset in CI.) */
object ShuffleWidthSpec {
  /** Shared with [[AqeInvarianceSpec]] — the two specs guard the same
    * layout-sensitivity invariant along different axes, so a query
    * added here is automatically covered there too. */
  val targets: Seq[String] = Seq(
    "q_abc_class", "q_percentile_disc", "q_doc_packing", "q_winsorize",
    "q_quantile_norm", "q_rfm_segments", "q_concurrency",
    // round 8: the ANN scorers rank via the TopKPairsD bounded-heap
    // aggregate — merge order varies with partitioning, so the strict
    // total order (cosine DESC, id ASC) is what keeps the output
    // layout-independent; run the whole family at two widths
    "q_sim_topk", "q_ann_lsh", "q_ann_ivf", "q_ann_pq", "q_ann_ivfpq",
    // late round 8: bitmap OR-merge and heap k-min sketch merges are
    // order-sensitive internally but must be layout-independent
    // externally; Theil-Sen's median selects by rank over pair rows
    "q_bitmap_retention", "q_sketch_overlap", "q_theil_sen",
    "q_weighted_percentile",
    // round-8 continuation: CMS add-merge, HLL max-merge, Bloom
    // OR-merge, and the hash-ring packed argmin are all internally
    // merge-order-sensitive but must be externally layout-free; DBSCAN
    // runs the checked-fixpoint CC under two widths
    "q_cms_topk", "q_hll_distinct", "q_bloom_own", "q_hash_ring",
    "q_dbscan_grid",
    // round 9: the packed min-plus BFS iterates checkpointed rounds
    // whose count may vary with layout but whose fixpoint must not;
    // BPE's per-round max(struct) winner and weighted counts must be
    // partition-order free; collated grouping must pick the same
    // binary-min representative at any width
    "q_dedup_hops", "q_bpe_apply", "q_collated_group",
    // round 10: the k-core peel iterates checkpointed rounds whose
    // shrinking edge set must reach the same fixpoint at any width;
    // the Holt fold and the preference argmax/argmin packs are
    // merge-order-sensitive internally but must be layout-free
    "q_kcore", "q_holt_trend", "q_preference_pairs",
    // boilerplate scrub reassembles text from a sorted-struct collect
    // whose merge order varies with partitioning
    "q_boilerplate_scrub",
    // scd2 merge unions anti/semi branches whose row order varies with
    // layout before the close-out window; mann-kendall's sign-pair sum
    // merges in partition order
    "q_scd2_merge", "q_mann_kendall",
    // round-10 evaluation pack: the jackknife's floor-quantized
    // replicate moments and kendall's concordance counts merge in
    // partition order; mrr rides the bounded-heap top-k whose merge
    // order varies with layout; logrank's quantized expectation sums
    // and the richness decimal sums must be layout-free too
    "q_jackknife_ratio", "q_kendall_tau", "q_mrr", "q_precision_at_k",
    "q_logrank", "q_lexical_richness",
    // the HITS fixed-point iterates integer aggregates whose partial
    // merges happen in layout order; the converged units must not
    "q_hits", "q_modularity", "q_fk_audit", "q_multimodal_decode")
}

class ShuffleWidthSpec extends SparkSpec {
  private val targets = ShuffleWidthSpec.targets

  test("prefix-sum machinery is shuffle-width invariant") {
    val wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "3")
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(wide, sfDir).collect().map(_.toSeq).toSeq
      wide.catalog.clearCache()
      assert(a == b, s"$name differs between shuffle widths 4 and 3")
    }
  }
}
