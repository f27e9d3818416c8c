package graft

import org.apache.spark.sql.functions._
import graft.queries.Pipeline

/** Behavioral assertions for the pipeline pack (CDC, merge, sampling,
  * scaling, percentiles) beyond the DuckDB hash-match: the semantic
  * invariants each operator promises. */
class PipelineSpec extends SparkSpec {

  test("change capture classifies inserts, deletes and updates correctly") {
    val diff = Pipeline.changeCapture(spark, sfDir).collect()
    assert(diff.nonEmpty)
    diff.foreach { r =>
      r.getString(1) match {
        case "I" => assert(r.isNullAt(2) && !r.isNullAt(3))
        case "D" => assert(!r.isNullAt(2) && r.isNullAt(3))
        case "U" => assert(r.getDouble(2) != r.getDouble(3))
        case other => fail(s"unexpected op $other")
      }
    }
    // keys ≡3 (mod 10) are absent from the old snapshot → inserts
    assert(diff.filter(_.getString(1) == "I").forall(_.getLong(0) % 10 == 3))
    assert(diff.filter(_.getString(1) == "D").forall(_.getLong(0) % 10 == 4))
  }

  test("merge upsert: update rows win, untouched keys keep target values") {
    val m = Pipeline.mergeUpsert(spark, sfDir)
    val rows = m.collect()
    assert(rows.nonEmpty)
    // one row per key (merge, not append)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      if (r.getLong(0) % 5 == 0) assert(r.getInt(2) == 1, s"key ${r.getLong(0)}")
      else assert(r.getInt(2) == 0, s"key ${r.getLong(0)}")
    }
  }

  test("hash sample is deterministic and split fractions are sane") {
    val a = Pipeline.hashSample(spark, sfDir).collect()
    val b = Pipeline.hashSample(spark, sfDir).collect()
    assert(a.sameElements(b), "sampling must be reproducible run-to-run")
    val splits = a.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    // 8/1/1 split of the sample — generous tolerance at sf0.001
    assert(splits.getOrElse("train", 0) > splits.getOrElse("test", 0))
  }

  test("minmax scaling lands in [0,1] with both extremes present per group") {
    val rows = Pipeline.minmaxScale(spark, sfDir)
      .filter(col("scaled").isNotNull).collect()
    assert(rows.nonEmpty)
    val byFlag = rows.groupBy(_.getString(2))
    byFlag.foreach { case (_, rs) =>
      val vals = rs.map(_.getDouble(4))
      assert(vals.forall(v => v >= 0.0 && v <= 1.0))
      assert(vals.min == 0.0 && vals.max == 1.0)
    }
  }

  test("exact percentiles are ordered and bounded by the data range") {
    val rows = Pipeline.percentileExact(spark, sfDir).collect()
    rows.foreach { r =>
      val (p25, p50, p75) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p25 <= p50 && p50 <= p75)
    }
  }

  test("levenshtein dedup emits only pairs within the distance bound") {
    val rows = Pipeline.dedupLevenshtein(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getInt(2) <= 20 && r.getLong(0) < r.getLong(1))
    }
  }

  test("tfidf: common terms weigh less than rare ones at equal tf") {
    val rows = Pipeline.tfIdf(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // idf must be monotonically decreasing in df for fixed tf
    val byTf = rows.groupBy(_.getLong(2)).filter(_._2.length >= 2)
    byTf.foreach { case (_, rs) =>
      rs.sortBy(_.getLong(3)).sliding(2).foreach {
        case Array(rare, common) =>
          if (rare.getLong(3) < common.getLong(3))
            assert(rare.getDouble(4) >= common.getDouble(4))
        case _ =>
      }
    }
  }

  test("tfidf plans a broadcast join for the df (vocabulary) side") {
    val plan = Pipeline.tfIdf(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
  }

  test("hash sample shuffles only for the final sort (map-side filter)") {
    val plan = Pipeline.hashSample(spark, sfDir).queryExecution.executedPlan.toString
    val exchanges = "(?i)exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"expected at most the sort exchange, got $exchanges:\n${plan.take(2000)}")
  }

  test("change capture plans a full outer join") {
    val plan = Pipeline.changeCapture(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), plan.take(2000))
  }

  test("interpolation fills every gap with a value inside the observed envelope") {
    val rows = queries.Windows.interpolate(spark, sfDir).collect()
    assert(rows.forall(!_.isNullAt(3)), "filled must never be NULL")
    val byType = rows.groupBy(_.getString(1))
    var sawGap = false
    byType.foreach { case (_, rs) =>
      val observed = rs.filter(_.getBoolean(2)).map(_.getDouble(3))
      val (lo, hi) = (observed.min, observed.max)
      rs.filterNot(_.getBoolean(2)).foreach { r =>
        sawGap = true
        val v = r.getDouble(3)
        assert(v >= lo && v <= hi, s"interpolated $v outside [$lo, $hi]")
      }
    }
    assert(sawGap, "fixture must contain gaps or the operator is untested")
  }

  test("fixed-point centroids: n matches label cardinality, dims complete") {
    val rows = Pipeline.vectorCentroidsFp(spark, sfDir).collect()
    val dims = rows.groupBy(_.get(0).toString).view.mapValues(_.length).toMap
    assert(dims.values.forall(_ == 64), s"every label must emit 64 dims: $dims")
  }
}
