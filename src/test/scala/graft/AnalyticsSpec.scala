package graft

import org.apache.spark.sql.functions._
import graft.queries.Analytics

/** Semantic invariants for the analytics pack — the oracle hash-match
  * proves engine parity; these prove the operators mean what they
  * claim. */
class AnalyticsSpec extends SparkSpec {

  test("funnel stages are monotonically non-increasing") {
    val counts = Analytics.funnelSteps(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("1_view") >= counts.getOrElse("2_click", 0L))
    assert(counts.getOrElse("2_click", 0L) >= counts.getOrElse("3_purchase", 0L))
    assert(counts("1_view") > 0)
  }

  test("cohort retention: offset 0 row exists per cohort and no negative offsets") {
    val rows = Analytics.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getDate(0))
    byCohort.values.foreach { rs =>
      val offsets = rs.map(_.getInt(1))
      assert(offsets.min == 0, "every cohort starts at offset 0")
    }
  }

  test("stratified sample respects per-class rate ordering") {
    val ev = Tables.events(spark, sfDir).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Analytics.stratifiedSample(spark, sfDir)
      .groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // signup sampled at 100% — kept whole
    assert(sampled("signup") == ev("signup"))
    // sampled fraction ordering follows configured rates (50% > 10% > 1%)
    def frac(t: String) = sampled.getOrElse(t, 0L).toDouble / ev(t)
    assert(frac("purchase") > frac("view") && frac("view") > frac("error"))
  }

  test("entropy is within [0, ln(5)] and single-type users score 0") {
    val rows = Analytics.eventEntropy(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getDouble(2)
      assert(h >= 0.0 && h <= math.log(5.0) + 1e-9, s"user ${r.getLong(0)}: $h")
    }
  }

  test("repetition ratio is a valid share and max_rep <= n_sh") {
    val rows = Analytics.repetitionRatio(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, m, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(m >= 1 && m <= n)
      assert(math.abs(ratio - m.toDouble / n) < 1e-15)
    }
  }

  test("contamination fractions are in (0, 1] and benchmark docs are excluded") {
    val rows = Analytics.contamination(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) % 100 != 0, "benchmark docs must not self-report")
      val f = r.getDouble(3)
      assert(f >= 0.05 && f <= 1.0)
    }
  }

  test("robust z-scores center near zero per group") {
    val rows = Analytics.robustScale(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(robust_z, 0.5D)").as("med_z"))
      .collect()
    assert(rows.nonEmpty)
    // the scaled subset is not the full group, so the median is only
    // near zero — but a wildly off-center value means the stats joined
    // against the wrong group
    rows.foreach(r => assert(math.abs(r.getDouble(1)) < 1.0))
  }

  test("central tendency: mode is the true argmax with smallest-value tie-break") {
    val byHand = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_returnflag"), col("l_linestatus")).count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (flag, rs) =>
        flag -> rs.map(r => (r.getString(1), r.getLong(2)))
          .sortBy { case (v, n) => (-n, v) }.head._1
      }
    Analytics.centralTendency(spark, sfDir).collect().foreach { r =>
      assert(r.getString(3) == byHand(r.getString(0)))
    }
  }

  test("inline_kv emits exactly two rows per lineitem row") {
    val base = Tables.lineitem(spark, sfDir).filter(col("l_orderkey") <= 200).count()
    assert(Analytics.inlineKv(spark, sfDir).count() == base * 2)
  }

  test("csv roundtrip reproduces the source projection exactly") {
    val src = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey")).collect()
    val rt = Analytics.csvRoundtrip(spark, sfDir).collect()
    assert(rt.length == src.length)
    rt.zip(src).foreach { case (a, b) => assert(a == b) }
  }

  test("bloom prefilter result equals the plain anti-join") {
    val plain = Tables.lineitem(spark, sfDir).select(col("l_orderkey")).distinct()
      .join(Tables.orders(spark, sfDir).filter(col("o_orderkey") % 7 =!= 0)
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val bloomed = Analytics.bloomPrefilter(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("chunk dedup reports only recurring chunks with a minimal keeper") {
    val rows = Analytics.dedupChunks(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getLong(1) > 1)
      assert(r.getLong(2) >= 0 && r.getInt(3) >= 0)
    }
  }

  test("lang rebalance keeps minority languages whole and thins the majority") {
    val before = Tables.documents(spark, sfDir).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Analytics.langRebalance(spark, sfDir).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = before.values.sum / 5.0
    before.foreach { case (lang, n) =>
      if (n <= target) assert(after(lang) == n, s"$lang should be kept whole")
      else assert(after(lang) < n, s"$lang should be thinned")
    }
  }

  test("markov transition probabilities sum to 1 per prev state") {
    val rows = Analytics.markovTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val total = rs.map(_.getDouble(3)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"sum=$total")
    }
  }

  test("activity islands: longest run never exceeds the user's active-day count") {
    val activeDays = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Analytics.activityIslands(spark, sfDir).collect().foreach { r =>
      val (uid, n, longest) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(longest <= activeDays(uid) && n >= 1)
      assert(n <= activeDays(uid))
    }
  }

  test("running distinct: cum_users is monotone and ends at the total user count") {
    val rows = Analytics.runningDistinctUsers(spark, sfDir).collect()
    val cums = rows.map(_.getLong(2))
    // strictly increasing: a day only appears when it has new users
    assert(cums.zip(cums.tail).forall { case (a, b) => b > a })
    val totalUsers = Tables.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(cums.last == totalUsers)
  }

  test("anomaly z-scores exceed the threshold and derive from their window sums") {
    val rows = Analytics.anomalyZscore(spark, sfDir).collect()
    // the |z| > 1.2 cut must actually fire at this sf — an anomaly
    // query whose output is empty would be vacuously "correct"
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, sum7, ss7, z) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(math.abs(z) > 1.2)
      val mean = sum7 / 7.0
      val variance = (ss7 - sum7 * sum7 / 7.0) / 6.0
      val expected = (n - mean) / math.sqrt(variance)
      assert(math.abs(z - expected) < 1e-3, s"z=$z expected=$expected")
    }
  }

  test("lang confusion shares sum to 1 per label and counts cover the corpus") {
    val rows = Analytics.langConfusion(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-9)
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("time-weighted average lies within the user's value range") {
    val bounds = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val rows = Analytics.timeWeightedAvg(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getLong(0))
      val twa = r.getDouble(2)
      // quantization floors values at 1e-6, so allow that much slack
      assert(twa >= lo - 1e-6 && twa <= hi + 1e-6, s"user ${r.getLong(0)}: $twa !in [$lo,$hi]")
      assert(r.getLong(1) > 0)
    }
  }

  test("discrete percentiles are actual data values at the right rank order") {
    val vals = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    Analytics.percentileDisc(spark, sfDir).collect()
      .groupBy(_.getString(0)).foreach { case (flag, rs) =>
        val sorted = vals(flag)
        rs.foreach { r =>
          val v = r.getDouble(2)
          assert(sorted.contains(v), s"$flag ${r.getString(1)}: $v not in data")
        }
        val byPct = rs.map(r => r.getString(1) -> r.getDouble(2)).toMap
        if (byPct.contains("p90")) assert(byPct("p50") <= byPct("p90"))
      }
  }

  test("vector quantization bounds components to [-127, 127] with the max at ±127") {
    val rows = Analytics.vectorQuantize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (amax, qsum, q1) = (r.getDouble(1), r.getInt(2), r.getInt(3))
      assert(amax > 0)
      assert(math.abs(q1) <= 127)
      assert(math.abs(qsum) <= 127 * 64)
    }
  }

  test("listagg statuses are sorted and distinct within each group") {
    Analytics.listaggStatus(spark, sfDir).collect().foreach { r =>
      val parts = r.getString(2).split('|').toSeq
      assert(parts == parts.distinct.sorted)
    }
  }
}
