package graft

import org.apache.spark.sql.functions._
import graft.queries.Corpus
import graft.operators.Dedup

/** Invariants of the round-7 corpus-audit pack (exact values are the
  * DuckDB oracle's job; these pin the mathematical properties that
  * must hold at ANY scale). */
class CorpusSpec extends SparkSpec {

  test("minhash estimation error is bounded and the estimate is a valid p/16") {
    val rows = Corpus.minhashError(spark, sfDir).collect()
    assert(rows.nonEmpty, "LSH must propose at least one candidate on the fixture")
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val ex = r.getAs[Double]("exact_j")
      val err = r.getAs[Double]("err")
      assert(est >= 0.0 && est <= 1.0 && (est * 16).isWhole)
      assert(ex >= 0.0 && ex <= 1.0)
      assert(math.abs(err - (est - ex)) == 0.0)
    }
    spark.catalog.clearCache()
  }

  test("zipf slope is negative on natural-ish rank-frequency data") {
    val r = Corpus.zipfSlope(spark, sfDir).head()
    // the tiny fixture's vocabulary may be smaller than the top-100 cut
    val n = r.getAs[Long]("n_terms")
    assert(n >= 10L && n <= 100L, s"unexpected term count $n")
    assert(r.getAs[Double]("slope") < 0.0,
      s"rank-frequency slope must fall, got ${r.getAs[Double]("slope")}")
  }

  test("KL divergence is non-negative up to quantization slack") {
    val rows = Corpus.klSources(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // each quantized term under-counts by < 1e-9; vocab ≤ ~1e5 terms
      assert(r.getAs[Double]("kl") >= -1e-3,
        s"KL(${r.getAs[String]("source")}) = ${r.getAs[Double]("kl")} < 0")
      assert(r.getAs[Long]("n_tokens") > 0L)
    }
    spark.catalog.clearCache()
  }

  test("cluster sizes start at 2 and account for every clustered doc") {
    val hist = Corpus.clusterSizes(spark, sfDir).collect()
    spark.catalog.clearCache()
    assert(hist.forall(_.getAs[Long]("cluster_size") >= 2L),
      "a cluster needs at least one pair, so size ≥ 2")
    val docsInHist = hist.map(r =>
      r.getAs[Long]("cluster_size") * r.getAs[Long]("n_clusters")).sum
    val nodes = Dedup.ngramJaccardPairs(
        Tables.documents(spark, sfDir), 3, 0.6)
      .select(col("doc_id_a").as("d")).union(
        Dedup.ngramJaccardPairs(Tables.documents(spark, sfDir), 3, 0.6)
          .select(col("doc_id_b").as("d")))
      .distinct().count()
    spark.catalog.clearCache()
    assert(docsInHist == nodes, s"histogram covers $docsInHist of $nodes docs")
  }

  test("split leakage partitions the near-dup pair set exactly") {
    val pairs = Dedup.ngramJaccardPairs(
      Tables.documents(spark, sfDir), 3, 0.6).count()
    spark.catalog.clearCache()
    val byCell = Corpus.splitLeakage(spark, sfDir).collect()
    spark.catalog.clearCache()
    assert(byCell.map(_.getAs[Long]("n_pairs")).sum == pairs,
      "every near-dup pair lands in exactly one split cell")
    // canonical cell ordering: split_a ≤ split_b lexicographically
    byCell.foreach(r => assert(
      r.getAs[String]("split_a") <= r.getAs[String]("split_b")))
  }
}
