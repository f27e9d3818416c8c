package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** RUNTIME shuffle-volume assertions: PlanGuardSpec pins how many
  * exchanges a plan has; this spec pins how much DATA actually moves
  * through them — the number that decides whether a plan survives a
  * 100× scale-up. Map-side combine, broadcast placement, and the
  * bounded-heap aggregate all claim to collapse the fact stream
  * BEFORE the wire; here the executed plan's own SQL metrics
  * (shuffleRecordsWritten per ShuffleExchange) prove it. AQE is off
  * in the measuring session so the executed tree is statically
  * traversable. */
class ShuffleVolumeSpec extends SparkSpec {

  private lazy val noAqe = {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "false")
    s
  }

  /** Total records written across every shuffle exchange of the
    * EXECUTED plan (fails loudly if the metric key ever renames). */
  private def shuffledRecords(df: DataFrame): Long = {
    df.collect()
    val exchanges = df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.nonEmpty, "expected at least one shuffle to measure")
    exchanges.map { e =>
      val m = e.metrics.getOrElse("shuffleRecordsWritten",
        fail(s"shuffleRecordsWritten metric missing; keys=${e.metrics.keys}"))
      m.value
    }.sum
  }

  private val factRows = 6005L // lineitem at sf0.001 (order of magnitude)

  test("partial aggregation collapses the fact stream before the exchange") {
    val n = shuffledRecords(SparkEntry.queries("q_pricing_summary")(noAqe, sfDir))
    // 4 flag×status groups × ≤4 map partitions + the 4-row sort
    // exchange: map-side combine means the wire carries group rows,
    // never the ~6k fact rows
    assert(n < 100, s"$n records shuffled — partial aggregation is not combining")
    noAqe.catalog.clearCache()
  }

  test("broadcast join ships zero fact rows through the shuffle") {
    val n = shuffledRecords(SparkEntry.queries("q_join_broadcast")(noAqe, sfDir))
    // the dim side broadcasts (no shuffle) and the join output is
    // aggregated before the final ORDER BY exchange
    assert(n < 100, s"$n records shuffled — the broadcast placement regressed")
    noAqe.catalog.clearCache()
  }

  test("bounded-heap top-k emits at most k rows per group per map partition") {
    val n = shuffledRecords(SparkEntry.queries("q_topk_heap")(noAqe, sfDir))
    // the heap aggregate's partial buffers carry ≤k pairs each; the
    // wire must see heap buffers + k-row outputs. Absolute cap pinned
    // to THIS fixture (factRows is the sf0.001 constant, so the
    // relative form would not scale anyway — and it is looser)
    assert(n < 1000,
      s"$n records shuffled — the heap aggregate stopped combining map-side")
    noAqe.catalog.clearCache()
  }

  test("the metric detects non-combining shapes (negative control)") {
    // distinct over an already-unique key: map-side combine removes
    // NOTHING, so the wire must see ~factRows — proving the other
    // tests' small numbers measure combining, not a metric that reads
    // zero for everything. (collect_list would NOT work as the
    // control: its partial buffers are one row-per-group carrying the
    // whole list, so record counts stay tiny even though bytes grow.)
    val df = Tables.lineitem(noAqe, sfDir)
      .select("l_orderkey", "l_linenumber").distinct()
    val n = shuffledRecords(df)
    assert(n > factRows / 2,
      s"only $n records shuffled for a non-combining aggregate — " +
        "the measurement itself is broken")
    noAqe.catalog.clearCache()
  }

  test("exact dedup shuffles hash-group rows, not document payloads") {
    val n = shuffledRecords(SparkEntry.queries("q_dedup_exact")(noAqe, sfDir))
    // one (hash → min id, count) row per distinct text + the ordered
    // output exchange — bounded by 2×distinct texts (500 docs)
    assert(n <= 1100, s"$n records shuffled — dedup is shipping raw rows")
    noAqe.catalog.clearCache()
  }

  test("grouped sample quantiles ship heap buffers, never the fact stream") {
    val n = shuffledRecords(
      SparkEntry.queries("q_sample_quantiles_grouped")(noAqe, sfDir))
    // heap exchange ≤ 3 groups × map partitions × k=256 buffered rows,
    // plus the 3-row result sort — categorically below the ~6k fact
    // rows a non-combining draw would ship
    assert(n < factRows / 2,
      s"$n records shuffled — the KMV heap draw stopped combining map-side")
    noAqe.catalog.clearCache()
  }

  test("bounded cut lookup's consuming action ships only cut metadata") {
    // Ranked.cutValuesByRank moves the fact stream through its ONE
    // range exchange at construction time (the bounded count collect
    // materializes the pinned relation), so the CONSUMING action's
    // plan — what re-executes on every downstream read — ships nothing
    // but the ≤|thresholds| matched rows and the result sort. A
    // regression toward ranking/joining every row in the final pass
    // shows up here as thousands of records immediately.
    val n = shuffledRecords(
      SparkEntry.queries("q_percentile_disc")(noAqe, sfDir))
    assert(n <= 100,
      s"$n records shuffled in the consuming action — the cut lookup is " +
        "re-shipping data rows")
    noAqe.catalog.clearCache()
  }

  test("weighted percentiles shuffle the DOMAIN distribution, not the stream") {
    // The round-15 rewrite collapses the fact table to the per-flag
    // (cents → weight) distribution in its first aggregate, so
    // everything that crosses the wire afterwards is domain-sized:
    // the partial-agg exchange plus the per-flag window exchange —
    // at most TWO passes of the distribution, never a third, and
    // never the raw occurrence stream again. (At toy SF the price
    // grid is as large as the stream itself, so the bound is counted
    // in distribution cells, not fact rows.)
    val cells = noAqe.read.parquet(s"$sfDir/lineitem.parquet")
      .selectExpr("l_returnflag",
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
      .distinct().count()
    val n = shuffledRecords(
      SparkEntry.queries("q_weighted_percentile")(noAqe, sfDir))
    assert(n >= 100, s"$n — suspiciously empty cumulative pass")
    assert(n <= 2 * cells + 100,
      s"$n records shuffled against $cells distribution cells — the " +
        "cumulative pass is re-shipping more than two domain passes")
    noAqe.catalog.clearCache()
  }
}
