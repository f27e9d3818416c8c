package graft

import org.apache.spark.sql.functions._
import graft.queries.Metrics

/** Invariants of the round-7 surface/metric pack. */
class MetricsSpec extends SparkSpec {

  test("EXCEPT ALL keeps max(0, left − right) copies per key") {
    val counts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_all"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("n_all") - r.getAs[Long]("n_f")))
      .filter(_._2 > 0).toMap
    val got = Metrics.exceptAll(spark, sfDir).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("n_rows")).toMap
    assert(got == counts)
  }

  test("INTERSECT ALL keeps min(left, right) copies per key") {
    val counts = Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_o"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_f"))
      .collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        math.min(r.getAs[Long]("n_o"), r.getAs[Long]("n_f")))
      .filter(_._2 > 0).toMap
    val got = Metrics.intersectAll(spark, sfDir).collect()
      .map(r => r.getAs[Long]("o_custkey") -> r.getAs[Long]("n_rows")).toMap
    assert(got == counts)
  }

  test("cume_dist and percent_rank stay in range with standard tie semantics") {
    val rows = Metrics.cumeDist(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cd = r.getAs[Double]("cd")
      val pr = r.getAs[Double]("pr")
      assert(cd > 0.0 && cd <= 1.0)
      assert(pr >= 0.0 && pr <= 1.0)
    }
  }

  test("OHLC bars bracket open and close between low and high") {
    val rows = Metrics.ohlc(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open $o outside [$l, $h]")
      assert(l <= c && c <= h, s"close $c outside [$l, $h]")
      assert(r.getAs[Long]("n_events") > 0L)
    }
  }

  test("VWAP is the exact cents-per-quantity ratio") {
    val rows = Metrics.vwap(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("qty") > 0L)
      assert(r.getAs[Double]("vwap_cents") ==
        r.getAs[Long]("cents").toDouble / r.getAs[Long]("qty").toDouble)
    }
  }

  test("mutual information is bounded by both marginal entropies") {
    val r = Metrics.mutualInfo(spark, sfDir).head()
    spark.catalog.clearCache()
    val (mi, hx, hy) = (r.getAs[Double]("mi"), r.getAs[Double]("h_status"),
      r.getAs[Double]("h_priority"))
    assert(mi >= -1e-6, s"MI must be ≥ 0, got $mi")
    assert(mi <= math.min(hx, hy) + 1e-6, s"MI $mi exceeds min($hx, $hy)")
    assert(hx > 0.0 && hy > 0.0)
  }

  test("Cohen's kappa is a valid agreement score") {
    val r = Metrics.cohensKappa(spark, sfDir).head()
    spark.catalog.clearCache()
    val (po, pe, k) = (r.getAs[Double]("po"), r.getAs[Double]("pe"),
      r.getAs[Double]("kappa"))
    assert(po >= 0.0 && po <= 1.0)
    assert(pe > 0.0 && pe < 1.0)
    assert(k >= -1.0 && k <= 1.0)
    assert(math.abs(k - (po - pe) / (1.0 - pe)) < 1e-15)
  }

  test("string surface round-trips reversibly") {
    val rows = Metrics.stringFuncs2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[String]("padded").length == 8)
      assert(r.getAs[String]("rev").reverse.contains("Customer#"))
      assert(r.getAs[Int]("lev") >= 0)
    }
  }
}
