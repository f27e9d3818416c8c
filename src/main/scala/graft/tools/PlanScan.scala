package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan sweep for the two join shapes that do
  * not survive a 100× scale-up: CartesianProduct (|A|×|B| work with
  * full materialization) and BroadcastNestedLoopJoin over an UNBOUNDED
  * build side (broadcasting a relation that grows with the data OOMs
  * the driver first, the executors second). Prints, per offending
  * query, the node lines so each occurrence can be adjudicated: a BNLJ
  * whose build side is a grouping-free aggregate or a LIMIT is the
  * scale-SAFE scalar-broadcast pattern (1..k rows by construction) and
  * gets allowlisted in PlanGuardSpec; anything else is a regression.
  *
  * Run: {{{ sbt -batch "runMain graft.tools.PlanScan /root/testdata/sf0.001" }}}
  */
object PlanScan {

  /** Node-name hits for the unsafe shapes in `plan`'s formatted
    * explain (subqueries included — formatted mode prints them). */
  def unsafeNodes(explain: String): Seq[String] =
    explain.linesIterator.filter(l =>
      l.contains("CartesianProduct") || l.contains("BroadcastNestedLoopJoin"))
      .map(_.trim).toSeq

  /** Count of shuffle exchanges (hash/range/single-partition) in a
    * plan string; BroadcastExchange intentionally excluded — broadcast
    * is the shape we WANT for dim joins. */
  def shuffleCount(explain: String): Int =
    "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
      .findAllIn(explain).size

  def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val ex = formatted(fn(spark, sfDir))
        val bad = unsafeNodes(ex)
        if (bad.nonEmpty)
          println(s"UNSAFE $name :: ${bad.mkString(" | ")}")
        else
          println(s"ok $name shuffles=${shuffleCount(ex)}")
      } catch {
        case e: Throwable => println(s"ERR $name ${e.getClass.getSimpleName}: ${e.getMessage}")
      } finally {
        try { graft.Caches.drain(); spark.catalog.clearCache() } catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}
