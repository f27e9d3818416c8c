package graft

/** AQE-toggle invariance: adaptive execution re-plans at runtime —
  * coalescing shuffle partitions, converting sort-merge joins to
  * broadcast, splitting skewed partitions. Any of those changes the
  * physical partition layout, so the queries that derive ranks or ids
  * from the layout (monotonically_increasing_id, spark_partition_id,
  * partition-offset prefix sums) and the merge-order-sensitive
  * aggregates (bounded heaps, sketch merges) are exactly the ones an
  * AQE re-plan could corrupt. The suite runs with AQE ON (Spark's
  * default); this spec re-runs the layout-sensitive subset with AQE
  * OFF and requires identical output — proving the determinism
  * convention holds under BOTH planners, not just the one the test
  * harness happened to use. Same target list as [[ShuffleWidthSpec]]:
  * the two specs guard the same invariant along different axes. */
class AqeInvarianceSpec extends SparkSpec {

  // the SHARED list (one definition — a query added to the width spec
  // is automatically AQE-guarded) plus the two-pass rank/histogram
  // machinery not in the width list
  private val targets = ShuffleWidthSpec.targets ++
    Seq("q_equidepth_hist", "q_percentile_exact")

  test("layout-sensitive machinery is AQE-toggle invariant") {
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(noAqe, sfDir).collect().map(_.toSeq).toSeq
      noAqe.catalog.clearCache()
      assert(a == b, s"$name differs between AQE on and off")
    }
  }

  test("scan-split invariance: tiny maxPartitionBytes does not change results") {
    // At 100 TB a parquet scan arrives as thousands of splits, not the
    // 1-4 partitions the test fixtures produce. Forcing 64 KB splits
    // (plus zero open-cost so even small files split apart) makes the
    // local scan layout as fragmented as a cluster's — the
    // layout-derived machinery must not notice.
    val shredded = spark.newSession()
    shredded.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    shredded.conf.set("spark.sql.files.openCostInBytes", "0")
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(shredded, sfDir).collect().map(_.toSeq).toSeq
      shredded.catalog.clearCache()
      assert(a == b, s"$name differs under 64KB scan splits")
    }
  }

  test("skew-join auto-splitting does not change salted-path results") {
    // The salted operators do their own skew handling; AQE's skew-join
    // splitter layered on top must not perturb them. Force-enable the
    // aggressive settings (tiny thresholds so sf0.001 still triggers
    // the optimizer paths) and compare against the default session.
    val aggressive = spark.newSession()
    aggressive.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    aggressive.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
    aggressive.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    aggressive.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    Seq("q_join_salted", "q_agg_salted", "q_join_star", "q_topk_pergroup")
      .foreach { name =>
        val fn = SparkEntry.queries(name)
        val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
        spark.catalog.clearCache()
        val b = fn(aggressive, sfDir).collect().map(_.toSeq).toSeq
        aggressive.catalog.clearCache()
        assert(a == b, s"$name differs under aggressive AQE skew splitting")
      }
  }
}
