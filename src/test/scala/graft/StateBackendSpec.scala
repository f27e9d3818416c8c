package graft

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.{EventRow, EventStreams}

/** Streaming state-backend invariance: the default HDFS-backed state
  * store keeps every key's state on the JVM heap — fine in tests, dead
  * at 100 TB/day key cardinalities, where the scale deployment runs
  * RocksDB (`spark.sql.streaming.stateStore.providerClass`). A state
  * backend must be a pure storage swap, but it changes the
  * serialization format, iteration order, and commit path under every
  * stateful operator — exactly the kind of swap that surfaces hidden
  * order-dependence. This spec runs the stateful streaming operators
  * (windowed aggregation, within-watermark dedup, custom
  * mapGroupsWithState counters) under BOTH providers and requires
  * identical output, so the library's streaming semantics are
  * certified on the backend a cluster deployment would actually use. */
class StateBackendSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp =
    new Timestamp(1700000000000L + minutes * 60000L)

  private val events = Seq(
    EventRow(1, ts(0), 1, "a", 1.0), EventRow(2, ts(10), 1, "a", 2.0),
    EventRow(2, ts(11), 1, "a", 2.0), // duplicate event_id for dedup
    EventRow(3, ts(61), 2, "b", 4.0), EventRow(4, ts(65), 2, "b", 8.0),
    EventRow(5, ts(130), 1, "a", 16.0), EventRow(6, ts(135), 3, "c", 32.0))

  private lazy val rocks = {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  private def collectQuery(s: SparkSession, name: String,
                           build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                           mode: OutputMode): Seq[Seq[Any]] = {
    implicit val sqlCtx = s.sqlContext
    import s.implicits._
    val stream = MemoryStream[EventRow]
    // two batches so state genuinely persists and reloads between commits
    stream.addData(events.take(4))
    val q = build(stream.toDF()).writeStream.format("memory")
      .queryName(name).outputMode(mode).start()
    try {
      q.processAllAvailable()
      stream.addData(events.drop(4))
      q.processAllAvailable()
    } finally q.stop()
    s.table(name).collect().map(_.toSeq.map {
      case t: Timestamp => t.getTime
      case x => x
    }).toSeq.sortBy(_.mkString("|"))
  }

  test("windowed aggregation state is backend-invariant (HDFS heap vs RocksDB)") {
    val a = collectQuery(spark, "sb_tumble_h",
      EventStreams.tumblingCounts, OutputMode.Complete())
    val b = collectQuery(rocks, "sb_tumble_r",
      EventStreams.tumblingCounts, OutputMode.Complete())
    assert(a.nonEmpty && a == b)
  }

  test("within-watermark dedup state is backend-invariant") {
    val a = collectQuery(spark, "sb_dedup_h", EventStreams.dedup,
      OutputMode.Append())
    val b = collectQuery(rocks, "sb_dedup_r", EventStreams.dedup,
      OutputMode.Append())
    assert(a.nonEmpty && a == b)
    // the duplicate event_id=2 must be dropped under both backends
    assert(a.size == events.size - 1)
  }

  test("mapGroupsWithState custom state is backend-invariant") {
    def build(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      import df.sparkSession.implicits._
      EventStreams.runningUserStats(df.as[EventRow]).toDF()
    }
    val a = collectQuery(spark, "sb_mgws_h", build, OutputMode.Update())
    val b = collectQuery(rocks, "sb_mgws_r", build, OutputMode.Update())
    assert(a.nonEmpty && a == b)
  }
}
