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
}
