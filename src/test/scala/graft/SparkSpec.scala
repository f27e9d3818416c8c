package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM-wide session — sbt runs
  * suites sequentially in the forked test JVM). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = {
    // local[4,2]: 4 threads, spark.task.maxFailures=2 — task retries
    // are ON so RetrySpec can inject first-attempt failures and prove
    // recomputation determinism. Passing tests are unaffected; the
    // existing crash/resume tests inject DRIVER-side failures (thrown
    // on every invocation), so they still fail their jobs as before.
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // SpillSpec forces few-row spill thresholds; Spark's spill READER
      // allocates read-ahead buffers + a thread per reader, and
      // unbounded-following window frames re-create a reader per output
      // row — an allocation storm that OOMed even an 8g test JVM.
      // Core-level (context-init) conf, so set here. (The reader buffer
      // itself is clamped to ≥1 MB and stays default.)
      .config("spark.unsafe.sorter.spill.read.ahead.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
