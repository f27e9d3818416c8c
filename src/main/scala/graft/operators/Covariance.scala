package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact-integer covariance state: per-dim sums and the packed
  * upper-triangle cross sums over quantized components. */
case class CovBuf(n: Long, sx: Array[Long], sxy: Array[Long])

/** One-pass d×d covariance matrix over an embedding column
  * (SURVEY.md §2B G19) with EXACT integer arithmetic: components are
  * quantized to integer thousandths (floor(x·1000) — floor is
  * identical in every engine, unlike round's half-up/half-even split),
  * so Σx and Σx_i·x_j are order-independent int64 sums and the
  * centered numerator n·Σxy − Σx_i·Σx_j is bit-portable. The buffer is
  * d + d(d+1)/2 longs regardless of group size — partial/final with
  * map-side combine, one pass over the corpus, nothing else moves.
  * Downstream PCA ([[Pca]]) eigen-solves the d×d result driver-side
  * (metadata-scale, the same place any engine keeps its centers). */
class CovarianceMatrix(dims: Int) extends Aggregator[Seq[Float], CovBuf, Seq[(Int, Int, Long, Long)]] {
  private val cells = dims * (dims + 1) / 2
  @inline private def idx(i: Int, j: Int): Int = i * dims - i * (i - 1) / 2 + (j - i)

  override def zero: CovBuf = CovBuf(0L, new Array[Long](dims), new Array[Long](cells))

  override def reduce(b: CovBuf, a: Seq[Float]): CovBuf = {
    val q = new Array[Long](dims)
    var d = 0
    while (d < dims) {
      q(d) = if (d < a.length) math.floor(a(d).toDouble * 1000.0).toLong else 0L
      d += 1
    }
    var i = 0
    while (i < dims) {
      b.sx(i) += q(i)
      var j = i
      while (j < dims) { b.sxy(idx(i, j)) += q(i) * q(j); j += 1 }
      i += 1
    }
    CovBuf(b.n + 1, b.sx, b.sxy)
  }

  override def merge(x: CovBuf, y: CovBuf): CovBuf = {
    var i = 0
    while (i < dims) { x.sx(i) += y.sx(i); i += 1 }
    var c = 0
    while (c < cells) { x.sxy(c) += y.sxy(c); c += 1 }
    CovBuf(x.n + y.n, x.sx, x.sxy)
  }

  /** (i, j, n, n·Σxy − Σx_i·Σx_j) per upper-triangle cell, 1-based to
    * match SQL list indexing. The centered numerator is computed in
    * BigInt and checked back into int64: with thousandth-quantized
    * components the n·Σxy term grows ~n², crossing 2^63 somewhere
    * around 10⁶–10⁷ rows — past that the operator must FAIL LOUDLY
    * (the caller's fix is coarser quantization or a decimal output
    * column), never wrap silently while claiming exactness. */
  override def finish(b: CovBuf): Seq[(Int, Int, Long, Long)] = {
    val out = Seq.newBuilder[(Int, Int, Long, Long)]
    var i = 0
    while (i < dims) {
      var j = i
      while (j < dims) {
        val v = BigInt(b.n) * BigInt(b.sxy(idx(i, j))) -
          BigInt(b.sx(i)) * BigInt(b.sx(j))
        require(v.isValidLong,
          s"covariance cell ($i,$j) numerator $v exceeds int64 at n=${b.n}: " +
            "quantize coarser or widen the output to decimal")
        out += ((i + 1, j + 1, b.n, v.toLong))
        j += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[CovBuf] = Encoders.product[CovBuf]
  override def outputEncoder: Encoder[Seq[(Int, Int, Long, Long)]] =
    ExpressionEncoder[Seq[(Int, Int, Long, Long)]]()
}

/** Driver-side PCA over the exact covariance numerators: deterministic
  * power iteration (fixed start, fixed iteration count, no RNG) for
  * the top principal component. The d×d solve is metadata-scale by
  * design — the DISTRIBUTED work is the one-pass CovarianceMatrix
  * aggregate; at 100 TB the matrix is still d×d. */
object Pca {
  /** Top eigenvector of the (symmetric) matrix given as upper-triangle
    * (i, j, value) triples, by `iters` power iterations from the
    * all-ones start. Deterministic: fixed arithmetic order. */
  def topComponent(dims: Int, upper: Seq[(Int, Int, Double)], iters: Int = 50): Array[Double] = {
    val m = Array.ofDim[Double](dims, dims)
    upper.foreach { case (i, j, v) => m(i - 1)(j - 1) = v; m(j - 1)(i - 1) = v }
    var v = Array.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    var it = 0
    while (it < iters) {
      val nv = new Array[Double](dims)
      var i = 0
      while (i < dims) {
        var s = 0.0
        var j = 0
        while (j < dims) { s += m(i)(j) * v(j); j += 1 }
        nv(i) = s
        i += 1
      }
      var norm = 0.0
      var k = 0
      while (k < dims) { norm += nv(k) * nv(k); k += 1 }
      norm = math.sqrt(norm)
      if (norm == 0.0) return v
      var k2 = 0
      while (k2 < dims) { nv(k2) /= norm; k2 += 1 }
      v = nv
      it += 1
    }
    // sign convention: first non-zero component positive
    val lead = v.indexWhere(_ != 0.0)
    if (lead >= 0 && v(lead) < 0) v.map(-_) else v
  }
}
