package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: print shuffle-exchange counts for named queries (used to
  * pin PlanGuardSpec budgets). Run:
  * sbt "runMain graft.tools.BudgetProbe q_a q_b ..." */
object BudgetProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val plan = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      println(s"BUDGET $name ${PlanScan.shuffleExchanges(plan)}")
      try { graft.Caches.drain(); spark.catalog.clearCache() }
      catch { case _: Throwable => }
    }
    spark.stop()
  }
}
