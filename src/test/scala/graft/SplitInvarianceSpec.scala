package graft

/** Input-split-geometry invariance — the SCAN-side twin of
  * [[ShuffleWidthSpec]]. That spec varies the exchange width; this one
  * fractures the file-scan partitioning itself
  * (`spark.sql.files.maxPartitionBytes` dropped from 128 MB to 16 KB,
  * open cost to 0), which on a cluster is what actually varies run to
  * run: file counts, row-group sizes, and executor core counts all
  * reshape the initial partitioning before any shuffle. Parquet reads
  * align to row groups, so most of the extra splits come back EMPTY —
  * deliberately adversarial for anything derived from the physical
  * layout (`spark_partition_id`, `monotonically_increasing_id`,
  * per-partition offsets, range-sampler inputs, Aggregator merge
  * order): empty and fragmented leading partitions must not shift a
  * rank, offset, or merge result. Same target list as the sibling
  * spec, so a query added there is covered here automatically. */
class SplitInvarianceSpec extends SparkSpec {
  private val targets = ShuffleWidthSpec.targets

  test("layout-sensitive queries are invariant to input split geometry") {
    val tiny = spark.newSession()
    tiny.conf.set("spark.sql.files.maxPartitionBytes", "16384")
    tiny.conf.set("spark.sql.files.openCostInBytes", "0")
    targets.foreach { name =>
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sfDir).collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      val b = fn(tiny, sfDir).collect().map(_.toSeq).toSeq
      tiny.catalog.clearCache()
      assert(a == b, s"$name differs under 16 KB input splits")
    }
  }
}
