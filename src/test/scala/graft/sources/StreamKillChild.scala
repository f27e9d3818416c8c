package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Child JVM for [[ProcessKillSpec]]: runs the connector's
  * source→sink stream (RangeSource frontier read → RangeSink
  * epoch-committed streaming write) against a checkpoint, and — when
  * `haltAfter` > 0 — dies a HARD process death after that many
  * non-empty micro-batches via `Runtime.halt` (no shutdown hooks, no
  * finally blocks, no Spark teardown: the in-process equivalent of
  * `kill -9`, but deterministic about WHEN mid-stream it lands).
  * The parent asserts end-to-end exactly-once across the restart. */
object StreamKillChild {
  def main(args: Array[String]): Unit = {
    val Array(sink, ckpt, haltAfter) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-stream-kill-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val n = haltAfter.toInt
    if (n > 0) spark.streams.addListener(new StreamingQueryListener {
      private var batches = 0
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        if (e.progress.numInputRows > 0) {
          batches += 1
          // abrupt death: exit status 137 mirrors a SIGKILL'd process
          if (batches >= n) Runtime.getRuntime.halt(137)
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    val q = spark.readStream.format("graft.sources.RangeSource")
      .option("lo", "0").option("hi", "6000")
      .option("stride", "500").option("rate", "500")
      .load()
      .writeStream.format("graft.sources.RangeSource")
      .option("path", sink)
      .option("checkpointLocation", ckpt)
      .start()
    q.processAllAvailable()
    q.stop()
    spark.stop()
    sys.exit(0)
  }
}
