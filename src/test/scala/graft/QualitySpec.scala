package graft

import org.apache.spark.sql.functions._
import graft.queries.Quality

/** Invariants of the quality/retrieval pack beyond the row-hash
  * oracle: clip-rate bounds, cosine range, island geometry, and the
  * seasonal-index mass balance. */
class QualitySpec extends SparkSpec {

  test("winsorize clips at most the tail mass on each side") {
    val li = Tables.lineitem(spark, sfDir)
    val perFlag = li.groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Quality.winsorize(spark, sfDir).collect().foreach { r =>
      val n = perFlag(r.getString(0))
      assert(r.getLong(1) <= math.ceil(n * 0.05).toLong,
        s"${r.getString(0)}: low clips ${r.getLong(1)} exceed 5% of $n")
      assert(r.getLong(2) <= n - math.ceil(n * 0.95).toLong + 1,
        s"${r.getString(0)}: high clips ${r.getLong(2)} exceed the top tail of $n")
    }
  }

  test("lexical cosine scores are in (0, 1], self excluded, ranks contiguous") {
    val rows = Quality.lexicalCosine(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(0) != r.getLong(2))
    }
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length).toSeq)
    }
  }

  test("interval coverage: every island covers at least one day") {
    val rows = Quality.intervalCoverage(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"customer ${r.getLong(0)}: ${r.getLong(2)} days < ${r.getLong(1)} islands")
    }
  }

  test("seasonal index conserves total mass") {
    val rows = Quality.seasonalIndex(spark, sfDir).collect()
    assert(rows.length == 12)
    val total = Tables.lineitem(spark, sfDir)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").as("c"))
      .agg(sum(col("c"))).head.getLong(0)
    assert(rows.map(_.getLong(1)).sum == total)
    // indices average to exactly 1 up to float error
    assert(math.abs(rows.map(_.getDouble(2)).sum / 12.0 - 1.0) < 1e-9)
  }

  test("sample quantiles: rank-space error within the O(1/sqrt k) regime, sample exact-size, order preserved") {
    val out = Quality.sampleQuantiles(spark, sfDir).collect()
    assert(out.length == 1)
    val r = out.head
    val n = Tables.lineitem(spark, sfDir).count()
    assert(r.getLong(0) == math.min(1024L, n))
    val est = (1 to 5).map(r.getDouble)
    // estimates are a CDF read-out: monotone non-decreasing
    est.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
    // rank-space check: each estimate's TRUE CDF position must sit
    // within ±5% of its target quantile (≥3σ for k=1024 with the
    // finite-population correction; deterministic, not a flaky draw)
    val prices = Tables.lineitem(spark, sfDir)
      .select((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint").as("c"))
    val total = n.toDouble
    Seq(0.25, 0.50, 0.75, 0.90, 0.99).zip(est).foreach { case (p, e) =>
      val cents = math.round(e * 100)
      val below = prices.filter(col("c") <= cents).count().toDouble / total
      assert(math.abs(below - p) <= 0.05,
        s"p=$p: estimate $e sits at true CDF $below")
    }
  }

  test("grouped sample quantiles: per-group rank-space error within regime, heap draw ≡ window draw") {
    val out = Quality.sampleQuantilesGrouped(spark, sfDir).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "N", "R"))
    val prices = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag").as("f"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("c"))
    val groupN = prices.groupBy(col("f")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach { r =>
      val flag = r.getString(0)
      assert(r.getLong(1) == math.min(256L, groupN(flag)))
      // k=256 → rank sd ≈ sqrt(p(1-p)/256) ≤ 3.1% — allow ±10% (>3σ)
      val total = groupN(flag).toDouble
      Seq(0.25, 0.50, 0.75, 0.90, 0.99).zipWithIndex.foreach { case (p, i) =>
        val e = r.getDouble(2 + i)
        val cents = math.round(e * 100)
        val below = prices.filter(col("f") === flag && col("c") <= cents)
          .count().toDouble / total
        assert(math.abs(below - p) <= 0.10,
          s"$flag p=$p: estimate $e at true CDF $below")
      }
    }
    // the heap aggregate's draw is the SAME relation a window-based
    // k-smallest-by-(hash, cents) draw produces — partitioning cannot
    // change a pure function of the values
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "17")
    val alt = Quality.sampleQuantilesGrouped(s2, sfDir).collect().toSeq
    assert(out.toSeq == alt)
  }

  test("sample quantiles: the KMV draw is partitioning-invariant by construction") {
    // same data through 5 vs 23 input partitions — the k-smallest-hash
    // sample is a pure function of the values, so the single output
    // row must be bit-identical (TakeOrdered merges per-partition
    // top-k; no RNG, no partition-order dependence)
    val base = Quality.sampleQuantiles(spark, sfDir).collect().toSeq
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "23")
    s2.conf.set("spark.sql.files.maxPartitionBytes", "65536")
    val alt = Quality.sampleQuantiles(s2, sfDir).collect().toSeq
    assert(base == alt)
  }
}
