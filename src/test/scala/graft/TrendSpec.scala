package graft

import org.apache.spark.sql.functions._

/** Invariants for the trend/sequence pack (oracle equivalence is the
  * driver gate; these pin the semantics the oracle can't see). */
class TrendSpec extends SparkSpec {

  test("regression closed form agrees with a float covariance recompute") {
    val rows = queries.Trend.regrSlope(spark, sfDir).collect()
    assert(rows.length == 3)
    // independent double-arithmetic recompute: covar_pop/var_pop give
    // the same slope up to float error — the exact-integer path must
    // land within relative 1e-9 of it (and be finite).
    val check = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        floor(col("l_quantity")).cast("double").as("x"),
        (col("l_extendedprice").cast("decimal(18,2)") * lit(100))
          .cast("bigint").cast("double").as("y"))
      .groupBy(col("l_returnflag"))
      .agg((covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("slope"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val want = check(r.getString(0))
      assert(math.abs(r.getDouble(2) - want) <= 1e-9 * math.abs(want),
        s"slope mismatch for ${r.getString(0)}: exact=${r.getDouble(2)} float=$want")
      assert(!r.getDouble(3).isNaN)
    }
  }

  test("ewma equals the raw value on each customer's first order") {
    val out = queries.Trend.ewmaSpend(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey")).orderBy(col("od"), col("o_orderkey"))))
      .filter(col("rn") === 1)
      .collect()
    assert(out.nonEmpty)
    // only the k=0 term exists on the first row, so the division is
    // cents·1.0/1.0 — EXACT equality is the dyadic-weights claim.
    out.foreach(r => assert(r.getDouble(4) == r.getLong(3).toDouble))
  }

  test("ewma stays within each trailing window's min/max envelope") {
    val out = queries.Trend.ewmaSpend(spark, sfDir).collect()
    val byCust = out.groupBy(_.getLong(0))
    byCust.values.foreach { rs =>
      val sorted = rs.sortBy(r => (r.getLong(2), r.getLong(1)))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val window = sorted.slice(math.max(0, i - 7), i + 1).map(_.getLong(3))
        assert(r.getDouble(4) >= window.min - 1e-9 && r.getDouble(4) <= window.max + 1e-9,
          s"ewma ${r.getDouble(4)} outside [${window.min}, ${window.max}]")
      }
    }
  }

  test("lm score is a nonnegative cross-entropy, zero only for all-unique followers") {
    val rows = queries.Trend.lmScore(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // c_xy <= c_x always (a bigram's doc set is a subset of its head
      // word's), so every ln term is <= 0 and the negated avg >= 0.
      assert(r.getLong(1) > 0)
      assert(r.getDouble(2) >= 0, s"negative nll for doc ${r.getLong(0)}")
    }
    // the corpus has repeated bigrams, so not every score can be 0
    assert(rows.exists(_.getDouble(2) > 0))
  }

  test("sequence paths have one letter per event and converted matches a recheck") {
    val out = queries.Trend.seqPattern(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getString(2).length == r.getLong(1),
        s"path length != n_events for user ${r.getLong(0)}")
      val want = "v.*c.*p".r.findFirstIn(r.getString(2)).isDefined
      assert(r.getBoolean(3) == want)
    }
    // full per-user streams are long enough that everyone converts at
    // this sf — the per-row regexp recheck above is the real guard;
    // this only pins that the flag isn't vacuously false everywhere.
    assert(out.exists(_.getBoolean(3)))
  }

  test("KM survival is a valid non-increasing curve and the risk set reconciles") {
    val rows = queries.Trend.survivalCurve(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("t_days"))
    assert(rows.nonEmpty)
    var prevS = 1.0
    var prevRisk = Long.MaxValue
    rows.foreach { r =>
      val s = r.getAs[Double]("survival")
      val n = r.getAs[Long]("n_at_risk")
      assert(s >= 0.0 && s <= prevS + 1e-12,
        s"survival must be non-increasing in [0,1]: $s after $prevS")
      assert(n <= prevRisk, "risk set can only shrink")
      // at-risk accounting: everyone at risk either dies, censors, or moves on
      assert(r.getAs[Long]("n_died") + r.getAs[Long]("n_censored") <= n)
      prevS = s; prevRisk = n
    }
    // S(t) after the first step must be strictly below 1 (someone ships)
    assert(rows.head.getAs[Double]("survival") < 1.0)
  }
}
