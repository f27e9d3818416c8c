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
}
