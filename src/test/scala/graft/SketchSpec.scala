package graft

import org.apache.spark.sql.functions._
import graft.operators.KmvSketch

/** KMV distinct-sketch invariants: exactness under k, bounded error
  * above k, and the mergeability/order-freeness that makes it a real
  * partial/final aggregate. */
class SketchSpec extends SparkSpec {

  private def hashed(n: Int) = {
    import spark.implicits._
    (1 to n).map(_.toLong).toDF("x")
      .select(expr(
        "CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT)")
        .as("h"))
  }

  test("below k the sketch is exact") {
    val kmv = udaf(new KmvSketch(64))
    val est = hashed(40).agg(kmv(col("h"))).head.getDouble(0)
    assert(est == 40.0)
  }

  test("above k the estimate lands within the 1/sqrt(k-2) error regime") {
    val kmv = udaf(new KmvSketch(64))
    val n = 5000
    val est = hashed(n).agg(kmv(col("h"))).head.getDouble(0)
    val rel = math.abs(est - n) / n
    // ~8% standard error at k=64; 4 sigma guard against flakiness
    assert(rel < 0.32, s"KMV estimate $est for $n distinct (rel err $rel)")
  }

  test("the estimate is invariant to partitioning (mergeable partial states)") {
    val kmv = udaf(new KmvSketch(64))
    val base = hashed(3000)
    val expected = base.coalesce(1).agg(kmv(col("h"))).head.getDouble(0)
    for (p <- Seq(2, 7, 16)) {
      val got = base.repartition(p).agg(kmv(col("h"))).head.getDouble(0)
      assert(got == expected, s"estimate differs at $p partitions")
    }
  }

  test("duplicates do not move the estimate") {
    val kmv = udaf(new KmvSketch(64))
    val once = hashed(500).agg(kmv(col("h"))).head.getDouble(0)
    val tripled = hashed(500).union(hashed(500)).union(hashed(500))
      .agg(kmv(col("h"))).head.getDouble(0)
    assert(once == tripled)
  }

  // ---- fixed-universe bitmap aggregate (G24) ----

  private def popcount(bits: Seq[Long]): Int = bits.map(java.lang.Long.bitCount).sum

  test("bitmap aggregate counts exactly, ignores duplicates, and is partitioning-invariant") {
    import spark.implicits._
    val bm = udaf(new graft.operators.BitmapAgg(1 << 10))
    val ids = (0 until 700).map(i => (i * 37) % 1000L) // 700 distinct with wraps
    val base = (ids ++ ids).toDF("id") // every id twice
    val expected = ids.distinct.size
    for (p <- Seq(1, 3, 16)) {
      val bits = base.repartition(p).agg(bm(col("id"))).head.getSeq[Long](0)
      assert(popcount(bits) == expected, s"cardinality differs at $p partitions")
    }
  }

  test("bitmap AND between two groups is the exact set intersection") {
    import spark.implicits._
    val bm = udaf(new graft.operators.BitmapAgg(1 << 10))
    val rows = (0L until 400L).map(("a", _)) ++ (200L until 600L).map(("b", _))
    val bits = rows.toDF("g", "id").groupBy(col("g")).agg(bm(col("id")).as("b"))
      .orderBy(col("g")).collect().map(_.getSeq[Long](1))
    val and = bits(0).zip(bits(1)).map { case (x, y) => x & y }
    assert(popcount(and) == 200) // [200, 400)
  }

  test("bitmap over an empty input yields the empty set, not a crash") {
    import spark.implicits._
    val bm = udaf(new graft.operators.BitmapAgg(1 << 10))
    val empty = Seq.empty[Long].toDF("id")
    assert(empty.groupBy(col("id")).agg(bm(col("id"))).count() == 0)
    val bits = empty.agg(bm(col("id"))).head.getSeq[Long](0)
    assert(popcount(bits) == 0)
  }

  test("an id outside the declared universe fails loudly, never aliases") {
    import spark.implicits._
    val bm = udaf(new graft.operators.BitmapAgg(64))
    val ex = intercept[Exception] {
      Seq(64L).toDF("id").agg(bm(col("id"))).head
    }
    assert(ex.getMessage != null)
  }

  // ---- count-min sketch (G29) ----

  private def cmsEstimates(df: org.apache.spark.sql.DataFrame,
      d: Int, w: Int): Map[String, Long] = {
    val cms = udaf(new graft.operators.CmsSketch(d, w))
    val counters = df.agg(cms(col("k"))).head.getSeq[Long](0)
    df.select(col("k")).distinct().collect().map(_.getString(0)).map { key =>
      key -> (0 until d).map(r =>
        counters(r * w + (operators.Sketches.hash60(s"$r|$key") % w).toInt)).min
    }.toMap
  }

  test("CMS never underestimates, and is exact when buckets are collision-free") {
    import spark.implicits._
    // 30 keys × varying multiplicities into a 4×256 sketch: far below
    // saturation, so estimates should be one-sided AND mostly tight
    val rows = (1 to 30).flatMap(i => Seq.fill(i)(s"key$i"))
    val df = rows.toDF("k")
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val est = cmsEstimates(df, 4, 256)
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: estimate ${est(k)} under true $n")
    }
    // one-sided error with this load factor (465 rows / 256 buckets,
    // min over 4 rows) should be exact for ALL keys here
    assert(truth.forall { case (k, n) => est(k) == n })
  }

  test("census-replayed counters equal the CmsSketch stream build (q_cms_topk pin)") {
    import spark.implicits._
    // q_cms_topk now replays counter(r, b) = Σ census counts of keys
    // hashing to b instead of streaming rows through the UDAF; the two
    // must agree exactly (the bucket depends on the key alone, the
    // sums are associative). Same d×w as the query.
    val d = 4; val w = 1024
    val rows = (1 to 400).map(i => (math.sqrt(i).toLong).toString)
    val cms = udaf(new graft.operators.CmsSketch(d, w))
    val streamed = rows.toDF("k").agg(cms(col("k"))).head.getSeq[Long](0)
    val census = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val replayed = new Array[Long](d * w)
    census.foreach { case (k, c) =>
      (0 until d).foreach { r =>
        replayed(r * w + (operators.Sketches.hash60(s"$r|$k") % w).toInt) += c
      }
    }
    assert(streamed == replayed.toSeq)
  }

  test("CMS counters are partitioning-invariant (mergeable partial states)") {
    import spark.implicits._
    val cms = udaf(new graft.operators.CmsSketch(4, 128))
    val df = (1 to 2000).map(i => s"key${i % 97}").toDF("k")
    val expected = df.coalesce(1).agg(cms(col("k"))).head.getSeq[Long](0)
    for (p <- Seq(2, 7, 16)) {
      val got = df.repartition(p).agg(cms(col("k"))).head.getSeq[Long](0)
      assert(got == expected, s"counters differ at $p partitions")
    }
  }

  // ---- Bloom filter (E8b) ----

  private def bloomHit(bits: Seq[Long], m: Int, k: Int, key: String): Boolean =
    (0 until k).forall { r =>
      val pos = (operators.Sketches.hash60(s"$r|$key") % m).toInt
      (bits(pos >> 6) >> (pos & 63) & 1L) == 1L
    }

  test("Bloom never misses a present key, and is partitioning-invariant") {
    import spark.implicits._
    val bloom = udaf(new graft.operators.BloomAgg(4096, 4))
    val keys = (1 to 300).map(i => s"key$i")
    val base = keys.toDF("k")
    val expected = base.coalesce(1).agg(bloom(col("k"))).head.getSeq[Long](0)
    for (p <- Seq(2, 7, 16)) {
      val got = base.repartition(p).agg(bloom(col("k"))).head.getSeq[Long](0)
      assert(got == expected, s"bits differ at $p partitions")
    }
    assert(keys.forall(bloomHit(expected, 4096, 4, _)), "a present key missed")
  }

  test("Bloom false-positive rate sits near the design point, zero misses") {
    import spark.implicits._
    val m = 4096; val k = 4; val n = 500
    val bloom = udaf(new graft.operators.BloomAgg(m, k))
    val bits = (1 to n).map(i => s"in$i").toDF("k")
      .agg(bloom(col("k"))).head.getSeq[Long](0)
    val fp = (1 to 2000).count(i => bloomHit(bits, m, k, s"out$i")) / 2000.0
    val design = math.pow(1 - math.exp(-k.toDouble * n / m), k)
    assert(fp < design * 3 + 0.01, s"fp rate $fp vs design $design")
    assert(fp > 0, "a half-loaded filter should show SOME false positives")
  }

  // ---- HyperLogLog (G27) ----

  test("HLL estimate lands in the 1.04/sqrt(m) error regime") {
    val hll = udaf(new graft.operators.HllSketch(8))
    for (n <- Seq(500, 5000, 20000)) {
      val est = hashed(n).agg(hll(col("h"))).head.getDouble(0)
      val rel = math.abs(est - n) / n
      // ~6.5% SE at m=256; 4-sigma guard
      assert(rel < 0.26, s"HLL estimate $est for $n distinct (rel err $rel)")
    }
  }

  test("HLL small-range correction kicks in and stays accurate") {
    val hll = udaf(new graft.operators.HllSketch(8))
    val est = hashed(30).agg(hll(col("h"))).head.getDouble(0)
    // linear counting at 30 distinct over 256 registers is near-exact
    assert(math.abs(est - 30) <= 2, s"small-range estimate $est for 30")
  }

  test("HLL registers are partitioning-invariant and duplicate-blind") {
    val hll = udaf(new graft.operators.HllSketch(8))
    val base = hashed(3000)
    val expected = base.coalesce(1).agg(hll(col("h"))).head.getDouble(0)
    for (p <- Seq(2, 7, 16)) {
      val got = base.repartition(p).agg(hll(col("h"))).head.getDouble(0)
      assert(got == expected, s"estimate differs at $p partitions")
    }
    val tripled = base.union(base).union(base)
      .agg(hll(col("h"))).head.getDouble(0)
    assert(tripled == expected)
  }

  test("CMS saturation inflates estimates but never below truth") {
    import spark.implicits._
    // 500 distinct keys through a deliberately tiny 2×32 sketch:
    // heavy collisions everywhere, one-sided error must still hold
    val rows = (1 to 500).map(i => s"k$i")
    val est = cmsEstimates(rows.toDF("k"), 2, 32)
    assert(rows.forall(k => est(k) >= 1L))
    assert(est.values.max > 1L, "tiny sketch should show collision inflation")
  }
}
