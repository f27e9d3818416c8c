package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class ClusterSpec extends SparkSpec {

  private def pairsDf(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("doc_id_a", "doc_id_b")
  }

  test("connected components label chains and stars by their min id") {
    // components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (star on 20)
    val out = Dedup.dedupClusters(
        pairsDf((1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)), 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L) == ((1L, true)) && out(2L) == ((1L, false))
      && out(3L) == ((1L, false)) && out(4L) == ((1L, false)))
    assert(out(10L) == ((10L, true)) && out(11L) == ((10L, false)))
    assert(out(20L) == ((20L, true)) && out(21L)._1 == 20L && out(22L)._1 == 20L)
  }

  test("fixed iteration depth reaches the fixpoint on the fixture corpus") {
    val pairs = Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), 3, 0.6)
      .select(col("doc_id_a"), col("doc_id_b"))
    def labels(iters: Int) = Dedup.dedupClusters(pairs, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(4) == labels(5),
      "4 propagation iterations did not converge — deepen the unroll in the oracle too")
  }
}
