package graft

import org.apache.spark.sql.functions._

/** 100 TB posture evidence: pre-bucketing both sides of a recurring
  * fact-fact join on the join key removes the per-query shuffle — the
  * bucketed join plans with NO Exchange on either side. This is the
  * pattern a production deployment uses for the orders⋈lineitem style
  * joins that would otherwise shuffle terabytes per query. */
class BucketingSpec extends SparkSpec {

  test("date-partitioned layout prunes partitions at the scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.orders(spark, sfDir)
      .withColumn("order_year", year(col("o_orderdate")))
      .write.partitionBy("order_year").parquet(s"$out/orders_p")
    val q = spark.read.parquet(s"$out/orders_p")
      .filter(col("order_year") === 1997)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan.take(1200))
    // pruned scan reads only the 1997 partition's rows
    val expected = Tables.orders(spark, sfDir)
      .filter(year(col("o_orderdate")) === 1997).count()
    assert(q.count() == expected)
  }

  test("bucketed co-located join plans without a shuffle exchange") {
    // warehouse dir is a static conf — tables land in ./spark-warehouse
    // (gitignored) and are dropped in the finally block.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, sfDir).write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.lineitem(spark, sfDir)
        .withColumnRenamed("l_orderkey", "o_orderkey").write
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1500))
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n${plan.take(1500)}")
      // and it is still correct
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }

  test("a point predicate on the bucketing key prunes to one bucket") {
    val out = queries.Serving.bucketPrune(spark, sfDir)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount: 1 out of 8"),
      s"bucket pruning missing from scan:\n${plan.take(1500)}")
    val expected = Tables.orders(spark, sfDir)
      .filter(col("o_custkey") === 42L).count()
    assert(out.count() == expected)
  }
}
