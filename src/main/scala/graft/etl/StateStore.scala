package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.file.{Files, Paths}

/** One migrated (or attempted) PK-range batch — the Spark-native analog
  * of the reference's per-job metadata row (jobid, range, rowcount,
  * state) kept via ORM in the source DB (migbq metadata manager [K],
  * SURVEY.md §2A A9; /root/reference was empty, so module-level cites
  * are public-knowledge recall).
  */
case class BatchRecord(
    table: String,
    pkLower: Long, // exclusive
    pkUpper: Long, // inclusive
    rowCount: Long,
    status: String, // PENDING | DONE | ERROR
    runId: Long)

/** Versioned parquet-backed checkpoint table for incremental-migration
  * state.
  *
  * State is metadata-scale — O(number of batches), never O(rows) — so
  * it is deliberately maintained on the driver and written whole, like
  * the reference's peewee tables, but stored as parquet versions so a
  * crashed writer can never corrupt it: each upsert writes a complete
  * new `v=N` directory and readers pick the highest complete version
  * (commit marker file). At 100 TB the data path scales out; this
  * state path stays tiny (a million batches ≈ a few MB).
  */
class StateStore(spark: SparkSession, dir: String) {
  import spark.implicits._

  private def versions: Seq[Long] = {
    val d = Paths.get(dir)
    if (!Files.exists(d)) Seq.empty
    else {
      // Files.list holds a directory handle until closed; this is called
      // several times per migrated batch, so leak-free iteration matters.
      val stream = Files.list(d)
      try {
        val vs = stream.iterator()
        val buf = scala.collection.mutable.ArrayBuffer[Long]()
        while (vs.hasNext) {
          val p = vs.next()
          val name = p.getFileName.toString
          if (name.startsWith("v=") && Files.exists(p.resolve("_COMMITTED")))
            buf += name.drop(2).toLong
        }
        buf.toSeq.sorted
      } finally stream.close()
    }
  }

  def currentVersion: Long = versions.lastOption.getOrElse(-1L)

  def read(): Seq[BatchRecord] = {
    val v = currentVersion
    if (v < 0) Seq.empty
    else spark.read.parquet(s"$dir/v=$v").as[BatchRecord].collect().toSeq
  }

  /** Upsert keyed on (table, pkLower, pkUpper): replaces any existing
    * record for the same range — re-running a range is idempotent in
    * the state, matching the reference's retry semantics (A11). */
  def upsert(records: Seq[BatchRecord]): Unit = {
    val keys = records.map(r => (r.table, r.pkLower, r.pkUpper)).toSet
    val merged = read().filterNot(r => keys.contains((r.table, r.pkLower, r.pkUpper))) ++ records
    val v = currentVersion + 1
    val path = s"$dir/v=$v"
    merged.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    Files.createFile(Paths.get(path, "_COMMITTED"))
  }

  /** Migration frontier: highest DONE pkUpper for a table (the
    * reference's "last migrated pk"). */
  def frontier(table: String): Long =
    read().filter(r => r.table == table && r.status == "DONE")
      .map(_.pkUpper).foldLeft(Long.MinValue)(math.max)

  def pending(table: String): Seq[BatchRecord] =
    read().filter(r => r.table == table && r.status != "DONE")
}
