package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

object Sketches {
  /** The engine's 60-bit md5 hash convention as plain Scala —
    * bit-identical to the SQL form
    * `conv(substring(md5(x), 1, 15), 16, 10)`, so driver-side code
    * (streaming state transitions, model checks) hashes exactly like
    * the distributed expressions. */
  // digest() resets the instance, so a per-thread MessageDigest is
  // safely reusable — getInstance per call costs more than the hash
  // itself in per-row hot paths (CmsSketch runs d of these per row).
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash60(x: String): Long = {
    val d = md5.get().digest(x.getBytes("UTF-8"))
    // first 15 hex digits = the top 60 bits of the first 8 bytes
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4 // drop the 16th hex digit, as substring(md5, 1, 15) does
  }
}

/** KMV buffer: the `k` smallest DISTINCT hash values seen so far,
  * sorted ascending. Bounded at k×8 bytes regardless of group size —
  * the mergeable-sketch shape that survives partial/final aggregation
  * at any scale. */
case class KmvBuf(hs: Array[Long])

/** K-minimum-values distinct-count sketch as a typed Aggregator — the
  * classic order-free estimator: hash every value uniformly into
  * [0, 2^60), keep the k smallest distinct hashes, and estimate
  * D ≈ (k−1)·2^60 / h_(k) from the k-th minimum. Unlike the engine's
  * HLL (`approx_count_distinct`, opaque sketch bytes), KMV is FULLY
  * DETERMINISTIC given the hash function and therefore
  * oracle-checkable in plain SQL — the DuckDB oracle recomputes the
  * same k-th minimum and the same one-division estimate bit-for-bit.
  * Groups with fewer than k distinct hashes are exact by
  * construction (the buffer IS the distinct set).
  *
  * Scale shape: reduce() and merge() both keep the sorted buffer ≤ k,
  * so map-side combine ships k longs per (group × partition) — same
  * exchange posture as any built-in sketch. Estimate error is
  * ~1/√(k−2) relative (k=64 → ~8%). */
class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, Double] {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  override def zero: KmvBuf = KmvBuf(Array.empty)

  override def reduce(b: KmvBuf, h: Long): KmvBuf = {
    val hs = b.hs
    val pos = java.util.Arrays.binarySearch(hs, h)
    if (pos >= 0) b // already present
    else {
      val ins = -pos - 1
      if (hs.length >= k && ins >= k) b // larger than current k-th min
      else {
        val n = math.min(hs.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(hs, 0, out, 0, ins)
        out(ins) = h
        System.arraycopy(hs, ins, out, ins + 1, n - ins - 1)
        KmvBuf(out)
      }
    }
  }

  override def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
    // merge two sorted distinct arrays, keep the k smallest distinct
    val a = x.hs; val b = y.hs
    val tmp = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < tmp.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val t = a(i); i += 1; t }
        else { val t = b(j); j += 1; t }
      if (n == 0 || tmp(n - 1) != v) { tmp(n) = v; n += 1 }
    }
    KmvBuf(if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n))
  }

  override def finish(b: KmvBuf): Double =
    if (b.hs.length < k) b.hs.length.toDouble
    else (k - 1).toDouble * 1152921504606846976.0 / b.hs(k - 1).toDouble

  override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** HLL register file: m int8-sized register values carried as longs
  * (Encoders keep it simple; the exchange cost is m×8 bytes either
  * way at m = 256). Empty until the first reduce. */
case class HllBuf(m: Array[Long])

/** HyperLogLog as a typed Aggregator over the engine's 60-bit md5
  * hash: bucket = top log₂(m) bits, register = max over the bucket of
  * ρ(remaining bits) (1 + leading-zero count), merge = elementwise
  * max — the canonical mergeable cardinality sketch, m registers
  * across the exchange regardless of stream size.
  *
  * Unlike the engine's built-in HLL (`approx_count_distinct`, opaque
  * serialized bytes), every register here is a DETERMINISTIC function
  * of the md5 hash convention, so a plain-SQL oracle can rebuild the
  * register file and the estimate exactly: ρ of the low 52 bits is
  * `53 − length(bin(v))` (bin() drops leading zeros in both engines)
  * and the harmonic sum Σ2^(−M_j) is rescaled by 2^maxRho (2^53 at
  * p = 8) into the exact int64 Σ2^(53−M_j) ≤ m·2^53 — no float
  * accumulation order anywhere, one terminal division against the
  * matching 2^53 constant. Small-range correction (linear
  * counting when the raw estimate < 2.5m and zero registers exist)
  * matches the standard HLL recipe. */
class HllSketch(p: Int) extends Aggregator[Long, HllBuf, Double] {
  require(p >= 4 && p <= 16, s"HLL needs 4 <= p <= 16, got $p")
  private val m = 1 << p

  override def zero: HllBuf = HllBuf(Array.empty)

  private def ensure(b: HllBuf): Array[Long] =
    if (b.m.length == m) b.m else new Array[Long](m)

  override def reduce(b: HllBuf, h: Long): HllBuf = {
    val regs = ensure(b)
    // h is the 60-bit hash60 value: top p bits pick the register,
    // the low (60 - p) bits feed rho. With p = 8 that leaves 52 bits:
    // rho = 53 - bitlength(v), and v = 0 (probability 2^-52) maps to
    // the max rho 53 — same convention the SQL oracle spells out.
    val bucket = (h >>> (60 - p)).toInt
    val v = h & ((1L << (60 - p)) - 1)
    val rho = (60 - p) + 1 - (64 - java.lang.Long.numberOfLeadingZeros(v))
    if (rho > regs(bucket)) regs(bucket) = rho
    HllBuf(regs)
  }

  override def merge(x: HllBuf, y: HllBuf): HllBuf =
    if (x.m.length == 0) y
    else if (y.m.length == 0) x
    else {
      val out = x.m.clone()
      var i = 0
      while (i < m) { if (y.m(i) > out(i)) out(i) = y.m(i); i += 1 }
      HllBuf(out)
    }

  override def finish(b: HllBuf): Double = {
    val regs = ensure(b)
    // alpha_m for m >= 128 (standard HLL constant)
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    // exact integer harmonic sum, rescaled by 2^maxRho so it fits
    // int64: sum of 2^(maxRho - M_j) <= m * 2^maxRho <= 2^61
    val maxRho = 60 - p + 1
    var sum = 0L
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1L << (maxRho - regs(i).toInt)
      if (regs(i) == 0L) zeros += 1
      i += 1
    }
    val raw = alpha * m * m * math.pow(2.0, maxRho) / sum.toDouble
    if (raw < 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
    else raw
  }

  override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** Bloom filter as a typed Aggregator: m bits in m/64 longs, k
  * membership bits per key from the engine's md5 hash convention
  * (`hash60(r + "|" + key) % m`, r = 0..k-1), merge = word-wise OR —
  * the mergeable pre-filter shape: the filter crosses the exchange
  * (m/8 bytes), never the build side's rows. One-sided by
  * construction: a present key always hits all its bits; an absent
  * key false-positives at ≈ (1 − e^(−kn/m))^k.
  *
  * Like the other graft sketches (and unlike the engine's opaque
  * `bloom_filter_agg` bytes), every bit is a deterministic function
  * of the hash convention, so a plain-SQL oracle reproduces the
  * exact bit set (as a DISTINCT position relation) and the exact
  * per-probe verdicts — false positives included. */
class BloomAgg(m: Int, k: Int) extends Aggregator[String, CmsBuf, Array[Long]] {
  require(m % 64 == 0 && m > 0, s"m must be a positive multiple of 64, got $m")
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: CmsBuf = CmsBuf(Array.empty)

  private def ensure(b: CmsBuf): Array[Long] =
    if (b.c.length == m / 64) b.c else new Array[Long](m / 64)

  override def reduce(b: CmsBuf, key: String): CmsBuf = {
    val bits = ensure(b)
    var r = 0
    while (r < k) {
      val pos = (Sketches.hash60(r.toString + "|" + key) % m).toInt
      bits(pos >> 6) |= (1L << (pos & 63))
      r += 1
    }
    CmsBuf(bits)
  }

  override def merge(x: CmsBuf, y: CmsBuf): CmsBuf =
    if (x.c.length == 0) y
    else if (y.c.length == 0) x
    else {
      val out = x.c.clone()
      var i = 0
      while (i < out.length) { out(i) |= y.c(i); i += 1 }
      CmsBuf(out)
    }

  override def finish(b: CmsBuf): Array[Long] = ensure(b)

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** Count-min buffer: d×w int64 counters, flattened row-major. Bounded
  * at d·w·8 bytes regardless of stream length — the frequency twin of
  * [[KmvBuf]]'s distinct sketch. Empty until the first reduce so the
  * zero value costs nothing to ship. */
case class CmsBuf(c: Array[Long])

/** Count-min sketch as a typed Aggregator: every key increments one
  * counter per hash row (d independent 60-bit md5 hashes, mod w); a
  * key's frequency estimate is the MINIMUM of its d counters — always
  * ≥ the true count (counters only ever add mass), with collision
  * inflation bounded by ~N/w per row and the min over d rows keeping
  * only the luckiest. merge() is elementwise addition, so the sketch
  * is exactly mergeable through partial/final aggregation — d·w longs
  * cross the exchange, never the stream.
  *
  * Like [[KmvSketch]] (and unlike the engine's opaque HLL/quantile
  * sketch bytes), the counters are FULLY DETERMINISTIC given the hash
  * convention — `hash60(r + "|" + key)` is bit-identical to the SQL
  * form `conv(substring(md5(concat(r, '|', key)), 1, 15), 16, 10)` —
  * so a plain-SQL oracle recomputes every counter and every min
  * exactly. */
class CmsSketch(d: Int, w: Int) extends Aggregator[String, CmsBuf, Array[Long]] {
  require(d >= 1 && w >= 2, s"CMS needs d >= 1, w >= 2, got d=$d w=$w")

  override def zero: CmsBuf = CmsBuf(Array.empty)

  private def ensure(b: CmsBuf): Array[Long] =
    if (b.c.length == d * w) b.c else new Array[Long](d * w)

  override def reduce(b: CmsBuf, key: String): CmsBuf = {
    val c = ensure(b)
    var r = 0
    while (r < d) {
      val bucket = (Sketches.hash60(r.toString + "|" + key) % w).toInt
      c(r * w + bucket) += 1L
      r += 1
    }
    CmsBuf(c)
  }

  override def merge(x: CmsBuf, y: CmsBuf): CmsBuf =
    if (x.c.length == 0) y
    else if (y.c.length == 0) x
    else {
      val out = x.c.clone()
      var i = 0
      while (i < out.length) { out(i) += y.c(i); i += 1 }
      CmsBuf(out)
    }

  override def finish(b: CmsBuf): Array[Long] = ensure(b)

  override def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
