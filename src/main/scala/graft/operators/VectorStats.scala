package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

case class VecBuf(sum: Array[Double], n: Long)

/** Typed custom UDAF (SURVEY.md §2B G6/D2): element-wise mean of an
  * embedding column via the public Aggregator API — mutable
  * Array[Double] buffer, associative merge, so Spark runs it as a
  * partial/final aggregate exactly like a built-in (map-side combine
  * included; the buffer is dims×8 bytes regardless of group size). */
class VectorMean(dims: Int) extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {

  override def zero: VecBuf = VecBuf(new Array[Double](dims), 0L)

  override def reduce(b: VecBuf, a: Seq[Float]): VecBuf = {
    var i = 0
    while (i < dims && i < a.length) { b.sum(i) += a(i); i += 1 }
    VecBuf(b.sum, b.n + 1)
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    var i = 0
    while (i < dims) { x.sum(i) += y.sum(i); i += 1 }
    VecBuf(x.sum, x.n + y.n)
  }

  override def finish(b: VecBuf): Seq[Double] =
    if (b.n == 0) b.sum.toSeq else b.sum.map(_ / b.n).toSeq

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
