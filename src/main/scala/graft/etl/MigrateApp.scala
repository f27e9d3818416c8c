package graft.etl

import org.apache.spark.sql.SparkSession

/** CLI surface mirroring the reference's commands (SURVEY.md §2A A13:
  * `migbq run|check|retry|sync <config>`), Spark-native:
  *
  * {{{
  * runMain graft.etl.MigrateApp run   <srcParquet> <pkCol> <workDir> [batchSize]
  * runMain graft.etl.MigrateApp check <srcParquet> <pkCol> <workDir>
  * runMain graft.etl.MigrateApp retry <srcParquet> <pkCol> <workDir>
  * runMain graft.etl.MigrateApp sync  <srcParquet> <pkCol> <workDir> [batchSize]
  * }}}
  *
  * `workDir` holds `state/` (the checkpoint table) and `data/` (the
  * range-partitioned destination). `sync` is one poll iteration of the
  * reference's EP3 loop: re-read MAX(pk), migrate the delta if the
  * frontier moved — run it from cron/Airflow for continuity, or use
  * [[graft.streaming.EventStreams.syncAvailableNow]] for the
  * engine-checkpointed variant.
  */
object MigrateApp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: MigrateApp <run|check|retry|sync> <srcParquet> <pkCol> <workDir> [batchSize]")
    val Array(cmd, srcPath, pkCol, workDir) = args.take(4)
    val batchSize = if (args.length > 4) args(4).toLong else 5000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val source = spark.read.parquet(srcPath)
      val table = srcPath.split('/').last.stripSuffix(".parquet")
      val state = new StateStore(spark, s"$workDir/state")
      val runner = new IncrementalRunner(spark, state,
        new ParquetRangeSink(s"$workDir/data"), batchSize)
      cmd match {
        case "run" | "sync" =>
          val recs = runner.run(source, table, pkCol)
          println(s"[$cmd] migrated ${recs.size} ranges, " +
            s"${recs.map(_.rowCount).sum} rows; frontier=${state.frontier(table)}")
        case "check" =>
          val bad = runner.validate(source, table, pkCol)
          println(s"[check] ${bad.size} mismatched ranges" +
            (if (bad.isEmpty) "" else s": ${bad.map(r => s"(${r.pkLower},${r.pkUpper}]").mkString(" ")}"))
        case "retry" =>
          val fixed = runner.retry(source, table, pkCol)
          println(s"[retry] re-migrated ${fixed.size} ranges")
        case other => sys.error(s"unknown command: $other")
      }
    } finally spark.stop()
  }
}
