package graft

import org.apache.spark.sql.functions._
import graft.queries.Serving

/** Invariants of the serving/feature-store pack that the row-hash
  * oracle can't express: the bucketed join's zero-exchange plan, PIT
  * uniqueness, merge-equals-recompute, and negative-sample
  * disjointness. */
class ServingSpec extends SparkSpec {

  test("bucketed join plans with no shuffle below the sort-merge join") {
    val out = Serving.bucketedJoin(spark, sfDir)
    // the final groupBy aggregates over 5 segments and may exchange;
    // the JOIN subtree must not. The tree prints top-down, so every
    // operator BELOW the join appears after the SortMergeJoin line —
    // assert that suffix is exchange-free and actually bucketed.
    // (String form on purpose: AQE wraps the executed plan, so typed
    // collect() does not descend into the adaptive subtree.)
    val plan = out.queryExecution.executedPlan.toString
    val idx = plan.indexOf("SortMergeJoin")
    assert(idx >= 0, s"no SortMergeJoin in:\n${plan.take(1500)}")
    val below = plan.substring(idx)
    assert(!below.contains("Exchange"),
      s"bucketed join still shuffles:\n${below.take(1500)}")
    assert(below.contains("Bucketed: true"), below.take(1500))
  }

  test("PIT lookup: exactly one state per (user, probe), never a future one") {
    val out = Serving.pitJoin(spark, sfDir).persist()
    val users = Tables.events(spark, sfDir).select(col("user_id")).distinct().count()
    assert(out.count() == users * 10, "one row per user per probe point")
    val dup = out.groupBy(col("user_id"), col("probe_idx")).count()
      .filter(col("count") > 1).count()
    assert(dup == 0L, "disjoint intervals must match at most once")
    // intervals cover [first_event, ∞) per user, so a probe reads
    // 'none' EXACTLY when it predates that user's first event —
    // assert the biconditional over every (user, probe) row
    val e = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("sec"))
    val first = e.groupBy(col("user_id")).agg(min(col("sec")).as("first_sec"))
    val violations = out.join(first, Seq("user_id"))
      .filter((col("state") === "none") =!=
        (col("probe_sec") < col("first_sec")))
      .count()
    assert(violations == 0L,
      "'none' must appear iff the probe predates the user's first event")
    // and at least one real (non-'none') state resolves somewhere
    assert(out.filter(col("state") =!= "none").count() > 0L)
    out.unpersist()
  }

  test("heap top-k aggregates without sorting or windowing the input") {
    val out = Serving.topkHeap(spark, sfDir, k = 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(1500))
    // the ONLY sort is the final tiny presentation ORDER BY; the
    // aggregate itself must be a partial/final ObjectHashAggregate
    assert(plan.contains("ObjectHashAggregate"), plan.take(1500))
    // identical to the window row_number() formulation
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("priority"))
      .orderBy(col("cents").desc, col("o_orderkey"))
    val windowed = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("priority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").as("cents"),
        col("o_orderkey"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("priority"), col("rnk").cast("int").as("rnk"),
        col("o_orderkey"), col("cents"))
      .orderBy(col("priority"), col("rnk"))
    assert(out.collect().map(_.toSeq).toSeq == windowed.collect().map(_.toSeq).toSeq)
  }

  test("PIT join stays a keyed join — the interval predicate is a residual") {
    val plan = Serving.pitJoin(spark, sfDir).queryExecution.executedPlan.toString
    // the failure mode of interval joins at scale: the equi key falls
    // out of the join condition and the INTERVAL join degrades to a
    // nested-loop cross product. (The 1-row span scalar broadcast is a
    // legitimate BroadcastNestedLoopJoin — only the iv join matters.)
    val ivJoinLines = plan.linesIterator
      .filter(l => l.contains("Join") && l.contains("iv_user")).toSeq
    assert(ivJoinLines.nonEmpty, plan.take(1500))
    assert(ivJoinLines.forall(l =>
      (l.contains("HashJoin") || l.contains("SortMergeJoin")) &&
        !l.contains("NestedLoop")),
      ivJoinLines.mkString("\n"))
  }

  test("incremental state merge is indistinguishable from recompute") {
    val merged = Serving.incrementalAgg(spark, sfDir)
    val direct = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      .select(col("l_returnflag"), col("n"), col("sum_cents"),
        col("min_cents"), col("max_cents"),
        (col("sum_cents").cast("double") / col("n").cast("double")).as("avg_cents"))
      .orderBy(col("l_returnflag"))
    assert(merged.collect().map(_.toSeq).toSeq ==
      direct.collect().map(_.toSeq).toSeq)
  }

  test("negative samples are source-disjoint, k per probe, deterministic") {
    val out = Serving.negativeSample(spark, sfDir, k = 3).persist()
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source"))
    val probes = docs.filter(col("doc_id") < 20)
      .select(col("doc_id").as("probe_id"), col("source").as("probe_src"))
    val joined = out
      .join(probes, Seq("probe_id"))
      .join(docs.withColumnRenamed("doc_id", "negative_id")
        .withColumnRenamed("source", "neg_src"), Seq("negative_id"))
    assert(joined.filter(col("probe_src") === col("neg_src")).count() == 0L,
      "a negative must come from a different source than its probe")
    val perProbe = out.groupBy(col("probe_id")).count().collect()
    assert(perProbe.nonEmpty && perProbe.forall(_.getLong(1) == 3L))
    val again = Serving.negativeSample(spark, sfDir, k = 3)
    assert(out.collect().map(_.toSeq).sameElements(again.collect().map(_.toSeq)))
    out.unpersist()
  }
}
