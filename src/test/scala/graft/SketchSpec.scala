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
}
