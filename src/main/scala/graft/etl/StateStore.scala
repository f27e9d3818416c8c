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

  /** Committed versions retained after each upsert: enough history to
    * debug a bad run, bounded so a long migration's state dir stays
    * O(1) directories instead of O(batches). */
  private val keepVersions = 8

  /** Upsert keyed on (table, pkLower, pkUpper): replaces any existing
    * record for the same range — re-running a range is idempotent in
    * the state, matching the reference's retry semantics (A11).
    *
    * Write amplification note: each upsert rewrites the WHOLE state as
    * a new version (that is what makes a crashed writer harmless —
    * readers only ever see a complete committed version), so a
    * migration of N ranges writes O(N²) records in total. The state is
    * metadata-scale (a record per RANGE, bytes each), so even a
    * million-batch migration moves only gigabytes of state over its
    * whole lifetime — the simplicity-for-amplification trade is
    * deliberate; an append-log + periodic compaction is the upgrade
    * path if state ever outgrows that. Old versions are pruned to the
    * last [[keepVersions]] so the directory count stays bounded. */
  def upsert(records: Seq[BatchRecord]): Unit = {
    val keys = records.map(r => (r.table, r.pkLower, r.pkUpper)).toSet
    val merged = read().filterNot(r => keys.contains((r.table, r.pkLower, r.pkUpper))) ++ records
    val v = currentVersion + 1
    val path = s"$dir/v=$v"
    merged.toDS().coalesce(1).write.mode(SaveMode.Overwrite).parquet(path)
    Files.createFile(Paths.get(path, "_COMMITTED"))
    // prune AFTER the new commit marker exists: a crash mid-prune
    // leaves extra old versions (harmless), never a missing current one
    versions.dropRight(keepVersions).foreach { old =>
      val op = Paths.get(s"$dir/v=$old")
      // marker goes FIRST: readers discover versions by marker, so the
      // directory becomes invisible before any data file disappears —
      // a crash mid-delete can never leave a half-present version that
      // still looks committed
      Files.deleteIfExists(op.resolve("_COMMITTED"))
      val stream = Files.list(op)
      try {
        val it = stream.iterator()
        while (it.hasNext) Files.deleteIfExists(it.next())
      } finally stream.close()
      Files.deleteIfExists(op)
    }
  }

  /** Migration frontier: highest DONE pkUpper for a table (the
    * reference's "last migrated pk"). */
  def frontier(table: String): Long =
    read().filter(r => r.table == table && r.status == "DONE")
      .map(_.pkUpper).foldLeft(Long.MinValue)(math.max)

  def pending(table: String): Seq[BatchRecord] =
    read().filter(r => r.table == table && r.status != "DONE")
}
