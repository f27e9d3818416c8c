package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k buffer: the k best (value, id) pairs under the total
  * order (value DESC, id ASC), kept sorted best-first. */
case class TopKBuf(vals: Array[Long], ids: Array[Long], n: Int)

/** Per-group top-k as a PARTIAL/FINAL AGGREGATE (SURVEY.md §2B T5)
  * instead of the window row_number() plan: the window form sorts
  * every group member per partition and shuffles ALL rows to the
  * group's reducer; this Aggregator keeps a k-slot insertion buffer,
  * so the map side combines each partition down to ≤k rows per group
  * before the exchange and nothing is ever fully sorted. At 100 TB
  * that is the difference between shuffling the fact table and
  * shuffling k rows per (group × partition). Deterministic: the
  * comparator is the total order (value DESC, id ASC), so merges are
  * associative/commutative and the result is partitioning-independent
  * — which is what makes the window-based DuckDB oracle exact. */
class TopKPairs(k: Int) extends Aggregator[(Long, Long), TopKBuf, Seq[(Int, Long, Long)]] {
  require(k >= 1 && k <= 1024, s"bounded buffer only makes sense for small k, got $k")

  override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Long](k), 0)

  @inline private def better(v: Long, id: Long, v2: Long, id2: Long): Boolean =
    v > v2 || (v == v2 && id < id2)

  private def insert(b: TopKBuf, v: Long, id: Long): TopKBuf = {
    if (b.n == k && !better(v, id, b.vals(k - 1), b.ids(k - 1))) return b
    val n2 = math.min(b.n + 1, k)
    var j = n2 - 1
    while (j > 0 && better(v, id, b.vals(j - 1), b.ids(j - 1))) {
      b.vals(j) = b.vals(j - 1); b.ids(j) = b.ids(j - 1); j -= 1
    }
    b.vals(j) = v; b.ids(j) = id
    TopKBuf(b.vals, b.ids, n2)
  }

  override def reduce(b: TopKBuf, a: (Long, Long)): TopKBuf = insert(b, a._1, a._2)

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    var r = x
    var i = 0
    while (i < y.n) { r = insert(r, y.vals(i), y.ids(i)); i += 1 }
    r
  }

  override def finish(b: TopKBuf): Seq[(Int, Long, Long)] =
    (0 until b.n).map(i => (i + 1, b.vals(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Int, Long, Long)]] =
    ExpressionEncoder[Seq[(Int, Long, Long)]]()
}

/** Double-valued twin of [[TopKBuf]] for score columns that are real
  * numbers (ANN cosine similarities). */
case class TopKBufD(vals: Array[Double], ids: Array[Long], n: Int)

/** [[TopKPairs]] over (Double score, Long id) — the map-side-combining
  * replacement for `row_number() OVER (PARTITION BY probe ORDER BY
  * cosine DESC, id)` in the ANN scorers: the window form shuffles
  * every scored (probe, candidate) pair; this Aggregator combines each
  * partition down to ≤k rows per probe before the exchange. Total
  * order (score DESC, id ASC); doubles compare exactly (no NaN by
  * contract — cosine of finite nonzero vectors), so merges are
  * associative/commutative and the result is partitioning-independent,
  * identical to the window plan row for row. */
class TopKPairsD(k: Int) extends Aggregator[(Double, Long), TopKBufD, Seq[(Int, Double, Long)]] {
  require(k >= 1 && k <= 1024, s"bounded buffer only makes sense for small k, got $k")

  override def zero: TopKBufD = TopKBufD(new Array[Double](k), new Array[Long](k), 0)

  @inline private def better(v: Double, id: Long, v2: Double, id2: Long): Boolean =
    v > v2 || (v == v2 && id < id2)

  private def insert(b: TopKBufD, v: Double, id: Long): TopKBufD = {
    if (b.n == k && !better(v, id, b.vals(k - 1), b.ids(k - 1))) return b
    val n2 = math.min(b.n + 1, k)
    var j = n2 - 1
    while (j > 0 && better(v, id, b.vals(j - 1), b.ids(j - 1))) {
      b.vals(j) = b.vals(j - 1); b.ids(j) = b.ids(j - 1); j -= 1
    }
    b.vals(j) = v; b.ids(j) = id
    TopKBufD(b.vals, b.ids, n2)
  }

  override def reduce(b: TopKBufD, a: (Double, Long)): TopKBufD = insert(b, a._1, a._2)

  override def merge(x: TopKBufD, y: TopKBufD): TopKBufD = {
    var r = x
    var i = 0
    while (i < y.n) { r = insert(r, y.vals(i), y.ids(i)); i += 1 }
    r
  }

  override def finish(b: TopKBufD): Seq[(Int, Double, Long)] =
    (0 until b.n).map(i => (i + 1, b.vals(i), b.ids(i)))

  override def bufferEncoder: Encoder[TopKBufD] = Encoders.product[TopKBufD]
  override def outputEncoder: Encoder[Seq[(Int, Double, Long)]] =
    ExpressionEncoder[Seq[(Int, Double, Long)]]()
}
