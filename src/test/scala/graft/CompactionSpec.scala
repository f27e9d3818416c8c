package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.Compaction

/** Small-file compaction: file counts actually shrink, content is
  * bit-preserved, and re-compacting an already-compacted directory is
  * a no-op in file-count terms. */
class CompactionSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-compact").toString

  test("compaction collapses a fragmented directory and preserves content") {
    val out = tmp()
    val src = Tables.orders(spark, sfDir)
    src.repartition(64).write.parquet(s"$out/fragmented")
    val (before, _) = Compaction.listBytes(spark, s"$out/fragmented")
    val (nIn, nOut) = Compaction.compact(spark, s"$out/fragmented",
      s"$out/compacted", targetBytes = 64L * 1024 * 1024)
    assert(nIn == 64, s"staging should fragment to 64 files, got $nIn")
    assert(nOut <= 2, s"compaction left $nOut files for ${before}B at 64MB target")
    val a = src.orderBy(col("o_orderkey")).collect().map(_.toSeq)
    val b = spark.read.parquet(s"$out/compacted")
      .orderBy(col("o_orderkey")).collect().map(_.toSeq)
    assert(a.sameElements(b), "compacted content must equal the source")
  }

  test("re-compacting a compacted directory does not grow the file count") {
    val out = tmp()
    Tables.orders(spark, sfDir).repartition(16).write.parquet(s"$out/in")
    val (_, n1) = Compaction.compact(spark, s"$out/in", s"$out/c1",
      targetBytes = 64L * 1024 * 1024)
    val (_, n2) = Compaction.compact(spark, s"$out/c1", s"$out/c2",
      targetBytes = 64L * 1024 * 1024)
    assert(n2 <= n1)
  }
}
