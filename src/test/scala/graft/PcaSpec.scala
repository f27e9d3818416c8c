package graft

import org.apache.spark.sql.functions._
import graft.queries.Featurize

/** PCA invariants the row-hash oracle can't express: the top
  * component captures at least as much variance as any coordinate
  * axis, and the whole pipeline is partitioning-invariant. */
class PcaSpec extends SparkSpec {

  test("top component variance dominates every coordinate axis") {
    val proj = Featurize.pcaProject(spark, sfDir).collect().map(_.getDouble(1))
    def variance(xs: Array[Double]): Double = {
      val m = xs.sum / xs.length
      xs.map(x => (x - m) * (x - m)).sum / xs.length
    }
    val vProj = variance(proj)
    // per-axis variances from the raw embeddings
    val rows = Tables.embeddings(spark, sfDir)
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val dims = rows.head.length
    val axisVars = (0 until dims).map { d => variance(rows.map(_(d))) }
    // the quantization + float32 projection costs a sliver; allow 1%
    assert(vProj >= axisVars.max * 0.99,
      s"pc1 variance $vProj < best axis ${axisVars.max}")
  }

  test("covariance cells and projection are partitioning-invariant") {
    val a = Featurize.pcaCov(spark, sfDir).collect().map(_.toSeq)
    val b = Featurize.pcaCov(spark, sfDir)
    // exact integers: identical under any partitioning
    val repart = Tables.embeddings(spark, sfDir).repartition(7)
    val agg = udaf(new graft.operators.CovarianceMatrix(64))
    val c = repart.agg(agg(col("embedding")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c._1"), col("c._2"), col("c._3"), col("c._4"))
      .orderBy(col("c._1"), col("c._2")).collect().map(_.toSeq)
    assert(a.sameElements(c))
  }
}
