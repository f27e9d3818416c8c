package graft

import org.apache.spark.sql.functions._
import graft.queries.Adaptive

/** Plan-shape proofs for the round-10 runtime-planning surfaces:
  *
  *  - S14: the staged-partitioned join plans a `dynamicpruning`
  *    subquery into the scan's partition filters (runtime pruning —
  *    the values only exist after the dim's filter evaluates);
  *  - J12: the IN-subquery-under-OR filter plans Spark's dedicated
  *    ExistenceJoin (neither a semi join nor a pushed filter can
  *    express it);
  *  - J13: with production-shaped thresholds (the defaults assume a
  *    multi-GB application-side scan; the fixture is KB), Spark
  *    injects a runtime BLOOM filter on the fact side of a
  *    shuffle join — and the injected plan returns byte-identical
  *    results to the untuned session's.
  */
class AdaptiveSpec extends SparkSpec {

  test("S14: dpp join plans a dynamicpruning partition filter and matches the unstaged result") {
    // useStats=false: at fixture scale the size estimate says the whole
    // staged table is a few KB, so the benefit heuristic would skip
    // DPP; production table stats make it fire on its own. The
    // fallback-ratio path is exactly what this flag exercises.
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    val df = Adaptive.dppJoin(s, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in the scan's partition filters:\n$plan")
    // pruning is a pure layout optimization: same rows as the plain session
    val tuned = df.collect().map(_.toSeq).toSeq
    Caches.drain(); s.catalog.clearCache()
    val plain = Adaptive.dppJoin(spark, sfDir).collect().map(_.toSeq).toSeq
    Caches.drain(); spark.catalog.clearCache()
    assert(tuned == plain)
    assert(plain.nonEmpty)
  }

  test("J12: IN-subquery under OR plans an ExistenceJoin") {
    val df = Adaptive.existenceJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ExistenceJoin"),
      s"expected the ExistenceJoin rewrite in the physical plan:\n$plan")
    assert(df.collect().nonEmpty)
    Caches.drain(); spark.catalog.clearCache()
  }

  test("J13: runtime bloom filter injects on the fact side of a shuffle join and preserves results") {
    val tuned = spark.newSession()
    // force the shuffle-join shape (bloom injection targets SMJ — a
    // broadcast join already ships the whole key set) and drop the
    // multi-GB application-side threshold to fixture scale
    tuned.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    tuned.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    tuned.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    def query(s: org.apache.spark.sql.SparkSession) = {
      val o = Tables.orders(s, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"))
      Tables.lineitem(s, sfDir)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")).as("cents"))
        .orderBy(col("l_returnflag"))
    }
    val df = query(tuned)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected an injected bloom-filter probe (might_contain) on the fact scan:\n$plan")
    val a = df.collect().map(_.toSeq).toSeq
    val b = query(spark).collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
    tuned.catalog.clearCache(); spark.catalog.clearCache()
  }
}
