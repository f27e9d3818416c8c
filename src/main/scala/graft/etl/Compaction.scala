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
  * directory so compaction parallelizes across partitions. Sizing and
  * listing go through the Hadoop FileSystem API, so any filesystem
  * Spark can read (hdfs://, s3a://, local) sizes correctly — a local
  * java.io walk would silently report 0 bytes for a remote path and
  * collapse the rewrite to one partition. */
object Compaction {

  /** Total bytes and file count of the parquet data files under `dir`
    * (recursive via the Hadoop FileSystem of the path's scheme;
    * ignores _SUCCESS/metadata/hidden files). */
  def listBytes(s: SparkSession, dir: String): (Long, Int) = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(s.sparkContext.hadoopConfiguration)
    var bytes = 0L
    var n = 0
    val it = fs.listFiles(path, true)
    while (it.hasNext) {
      val f = it.next()
      val name = f.getPath.getName
      if (name.endsWith(".parquet") && !name.startsWith(".") &&
          !name.startsWith("_")) {
        bytes += f.getLen
        n += 1
      }
    }
    (bytes, n)
  }

  /** Rewrite `inDir` into `outDir` with ceil(bytes/targetBytes)
    * output files. Returns (input file count, output file count). */
  def compact(s: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val (bytes, nIn) = listBytes(s, inDir)
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
    s.read.parquet(inDir).repartition(parts)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
    (nIn, listBytes(s, outDir)._2)
  }
}
