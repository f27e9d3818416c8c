package graft

/** Forced-spill invariance: at 100 TB the in-memory fast paths are a
  * best case, not the contract — window buffers overflow to disk,
  * sort-merge join streams spill, and ObjectHashAggregate (the host
  * of every custom Aggregator here: heaps, KMV/CMS/HLL sketches,
  * bitmaps, vector means) falls back to SORT-BASED aggregation, which
  * replays the same merge functions over sorted runs in a different
  * grouping order. This spec re-runs the buffer-heavy queries in a
  * session whose spill/fallback thresholds are forced to a few rows —
  * so every window frame spills, every SMJ buffer spills, and every
  * ObjectHashAggregate takes the sort-based path — and requires
  * bit-identical output. That is the executable form of the claim
  * that the custom aggregates' merge functions are order-insensitive
  * and the determinism conventions survive memory pressure. */
class SpillSpec extends SparkSpec {

  private lazy val spill = {
    val s = spark.newSession()
    // SMJ buffers beyond a few dozen rows go to disk; every
    // ObjectHashAggregate falls back to sort-based aggregation after 2
    // hash-map entries (the custom Aggregator merge path over sorted
    // runs). Window spill thresholds are NOT forced registry-wide:
    // unbounded-following frames re-create a 1MB+ spill reader per
    // OUTPUT row (UnsafeSorterSpillReader clamps its buffer to ≥1 MB),
    // which is an allocation storm no threshold tuning survives — the
    // window spill path gets its own controlled single-pass test below.
    s.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "32")
    s.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "32")
    s.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2")
    s
  }

  // window-buffer users, SMJ users, and every custom-Aggregator family
  private val targets = Seq(
    // window frames / sessionization (WindowExec buffer spill)
    "q_window_frames", "q_sessionize", "q_winsorize", "q_topk_pergroup",
    "q_interpolate", "q_activity_islands",
    // sort-merge joins (bucketed + plain fact-fact)
    "q_bucketed_join", "q_join_inner", "q_join_left",
    // ObjectHashAggregate sort-based fallback: heap, KMV, CMS, HLL,
    // bitmap, vector-mean, fixed-point centroid aggregators
    "q_topk_heap", "q_sketch_overlap", "q_cms_topk", "q_hll_distinct",
    "q_bitmap_retention", "q_vector_centroids_fp", "q_sim_topk",
    // decimal partial/final aggregation (hash agg under pressure)
    "q_pricing_summary")

  test("buffer-heavy queries are bit-identical under forced spill + sort-based fallback") {
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(spill, sfDir).collect().map(_.toSeq).toSeq
      spill.catalog.clearCache()
      assert(a == b, s"$name differs under forced spill thresholds")
    }
  }

  test("window running-sum frame spills to disk and stays exact") {
    // Controlled window-spill coverage: ~1.4k rows per partition
    // against a 32-row buffer forces ExternalAppendOnlyUnsafeRowArray
    // to spill; the unbounded-preceding→current frame reads the
    // spilled buffer in ONE pass per partition (no per-row reader
    // recreation), so this exercises the spill write/merge/read cycle
    // without the unbounded-following allocation pathology.
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ws = spark.newSession()
    ws.conf.set("spark.sql.windowExec.buffer.spill.threshold", "32")
    ws.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "32")
    def runsum(s: SparkSession): Seq[Seq[Any]] =
      s.range(10000).select(col("id"), (col("id") % 7).as("g"))
        .withColumn("rs", sum(col("id")).over(
          Window.partitionBy(col("g")).orderBy(col("id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("g")).agg(sum(col("rs")).as("t"), count(lit(1)).as("n"))
        .orderBy(col("g")).collect().map(_.toSeq).toSeq
    assert(runsum(ws) == runsum(spark),
      "window results differ between spilled and in-memory buffers")
  }

  test("the spill session actually takes the sort-based aggregate path") {
    // guard the guard: with fallbackThreshold=2 a 5-group Aggregator
    // query must still be CORRECT; and the threshold conf must be
    // honored (ObjectHashAggregate present in the plan at all — if a
    // future edit swaps the heap to a non-Object aggregate this test
    // flags that the spill coverage above silently narrowed)
    val plan = SparkEntry.queries("q_topk_heap")(spill, sfDir)
      .queryExecution.executedPlan.toString
    spill.catalog.clearCache()
    assert(plan.contains("ObjectHashAggregate"),
      s"q_topk_heap no longer plans ObjectHashAggregate:\n${plan.take(800)}")
  }
}
