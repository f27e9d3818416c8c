package graft

/** Invariants of the spatial family (SURVEY.md §2B J11/SP1) that the
  * DuckDB oracle cannot express directly: watershed convergence (the
  * pointer-doubling output is a fixpoint), genuineness of the detected
  * peaks, and the no-cartesian plan shape.
  */
class SpatialSpec extends SparkSpec {

  test("watershed assignment is converged: every assigned peak IS a peak") {
    val rows = queries.Joins.spatialWatershed(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val peaks = rows.filter(_.getBoolean(6))
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    // if any pointer chain were only partially compressed, some row
    // would name an interior (non-fixpoint) cell as its peak
    rows.foreach { r =>
      assert(peaks.contains((r.getInt(4), r.getInt(5))),
        s"cell (${r.getInt(0)},${r.getInt(1)}) assigned to non-peak " +
          s"(${r.getInt(4)},${r.getInt(5)})")
    }
  }

  test("every peak is a genuine local max of (smoothed, jy, jx)") {
    val rows = queries.Joins.spatialWatershed(spark, sfDir).collect()
    val sOf = rows.map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getLong(3), r.getInt(0), r.getInt(1))).toMap
    val ord = Ordering.Tuple3[Long, Int, Int]
    rows.filter(_.getBoolean(6)).foreach { r =>
      val me = sOf((r.getInt(0), r.getInt(1)))
      for (dy <- -1 to 1; dx <- -1 to 1 if dy != 0 || dx != 0)
        sOf.get((r.getInt(0) + dy, r.getInt(1) + dx)).foreach { n =>
          assert(ord.lt(n, me),
            s"peak (${r.getInt(0)},${r.getInt(1)}) dominated by neighbor")
        }
    }
  }

  test("non-peak cells climb: the parent edge ascends the total order") {
    val rows = queries.Joins.spatialWatershed(spark, sfDir).collect()
    val sOf = rows.map(r => (r.getInt(0), r.getInt(1)) ->
      (r.getLong(3), r.getInt(0), r.getInt(1))).toMap
    val ord = Ordering.Tuple3[Long, Int, Int]
    rows.filterNot(_.getBoolean(6)).foreach { r =>
      val me = sOf((r.getInt(0), r.getInt(1)))
      val pk = sOf((r.getInt(4), r.getInt(5)))
      assert(ord.lt(me, pk),
        s"cell (${r.getInt(0)},${r.getInt(1)}) assigned a peak that does " +
          "not dominate it in the (smoothed, jy, jx) order")
    }
  }

  test("IDW estimate is a convex combination: inside the value range") {
    val rows = queries.Joins.spatialIdw(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val (lo, hi) = {
      import org.apache.spark.sql.functions._
      val r = Tables.events(spark, sfDir)
        .agg(min(col("value")), max(col("value"))).head
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      val v = r.getDouble(3)
      // integer-floored weights and cents can undershoot the true
      // weighted mean by strictly less than one cent
      assert(v >= lo - 0.01 && v <= hi + 0.01,
        s"IDW estimate $v outside the event value range [$lo, $hi]")
    }
  }

  test("watershed plans only equi-joins (no cartesian/nested loop)") {
    val plan = queries.Joins.spatialWatershed(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"watershed degenerated to a non-equi join:\n${plan.take(1500)}")
  }
}
