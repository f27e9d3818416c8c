package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash of a string — the engine-native fast
  * fingerprint. md5 (used in oracle-checked queries for portability)
  * costs a full digest per row; FNV-1a is a few ns per byte, fully
  * inside whole-stage codegen, and good enough for content
  * fingerprinting/bucketing where cryptographic strength is not
  * needed. Custom Catalyst Expression with doGenCode (SURVEY.md §2B
  * preference order: native Expression > UDF).
  */
case class FnvHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"fnv64 requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv64"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0xcbf29ce484222325L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h ^= ($bytes[$i] & 0xffL);
         |  $h *= 0x100000001b3L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Dot product of two float arrays, accumulated left-to-right in
  * double — numerically identical to the higher-order-function
  * formulation in [[graft.operators.Similarity.dot]] (and to DuckDB's
  * list_dot_product), but codegen'd into a tight primitive loop with
  * no per-element lambda dispatch: the similarity-search hot path at
  * scale.
  */
case class DotProductF32(left: Expression, right: Expression)
    extends BinaryExpression {

  private val expected = ArrayType(FloatType)
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => DataType.equalsIgnoreNullability(e.dataType, expected)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 requires ARRAY<FLOAT> args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  // Null on dimension mismatch (below), even for non-null inputs.
  override def nullable: Boolean = true
  override def prettyName: String = "dot_f32"

  // Mismatched dimensions yield NULL rather than a silently-truncated
  // (plausible but wrong) score — mirrors the oracle analog (DuckDB's
  // list_dot_product errors) closely enough that bad embeddings surface
  // as missing scores instead of corrupt ones.
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All LSH table buckets for one embedding in a single fused kernel:
  * for each of `tables` hash tables, `bits` sign-projections against
  * constant hyperplanes → one Long bucket id per table. Replaces
  * tables×bits separate dot expressions (each a codegen unit Janino
  * must compile) with ONE expression and one pass over the vector —
  * the shape a 100 TB bucketing job wants: a narrow map stage with a
  * tight primitive loop and the plane matrix shipped once as a
  * reference object, not as per-expression literals.
  */
case class LshBucketsF32(child: Expression, planes: Array[Array[Float]],
                         bits: Int, tables: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(child.dataType, ArrayType(FloatType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires ARRAY<FLOAT>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // short embeddings → null, see eval
  override def prettyName: String = "lsh_buckets"

  private val minDims = if (planes.nonEmpty) planes(0).length else 0

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // dimension-mismatch posture (same as dot_f32/pq_codes): a short
    // embedding surfaces as a MISSING bucket vector rather than being
    // truncated into a plausible-looking wrong bucket
    if (arr.numElements() < minDims) return null
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var i = 0
      while (i < bits) {
        val p = planes(t * bits + i)
        val n = math.min(arr.numElements(), p.length)
        var acc = 0.0
        var d = 0
        while (d < n) { acc += arr.getFloat(d).toDouble * p(d); d += 1 }
        if (acc > 0) b |= (1L << i)
        i += 1
      }
      out(t) = b
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val n = ctx.freshName("n")
      s"""
         |if ($c.numElements() < $minDims) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$tables];
         |  for (int $t = 0; $t < $tables; $t++) {
         |    long $b = 0L;
         |    for (int $i = 0; $i < $bits; $i++) {
         |      float[] $p = $planesRef[$t * $bits + $i];
         |      int $n = java.lang.Math.min($c.numElements(), $p.length);
         |      double $acc = 0.0;
         |      for (int $d = 0; $d < $n; $d++) {
         |        $acc += (double) $c.getFloat($d) * (double) $p[$d];
         |      }
         |      if ($acc > 0) $b |= (1L << $i);
         |    }
         |    $out[$t] = $b;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole SimHash signature for one document in a single pass — the
  * narrow-map twin of the explode + 32-sum-state aggregate in
  * [[graft.operators.Dedup.simhash]] (bit-identical; asserted in
  * DedupSpec). Tokenizes on single spaces, md5s each non-empty token
  * occurrence, votes each of the low `bits` digest bits ±1, and packs
  * the positive votes. NULL when the document has no non-empty
  * tokens, matching the aggregate version's empty-group drop.
  *
  * Scale shape: signature generation becomes a pure map stage — no
  * token-row explosion, no shuffle until the band join. Interpreted
  * (CodegenFallback): per-row cost is the md5 calls either way, and
  * falling out of whole-stage codegen for this one projection is
  * cheaper than shuffling tokens×docs rows.
  */
case class SimHash32(child: Expression, bits: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  // the coin flips come from a 32-bit digest slice: bits in 33..64
  // would silently vote every high bit -1 (constant-zero signature
  // half) and bits > 64 would alias via shift wrap-around
  require(bits >= 1 && bits <= 32,
    s"simhash32 carries at most 32 sign bits, got $bits")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"simhash32 requires STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash32"

  // One digest instance per task (expressions deserialize per task and
  // a task is single-threaded).
  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val votes = new Array[Int](bits)
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        md.reset()
        val d = md.digest(t.getBytes("UTF-8"))
        // first 8 hex chars of the digest = first 4 bytes, big-endian —
        // exactly conv(substring(md5(tok), 1, 8), 16, 10)
        val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < bits) {
          votes(j) += ((((h32 >>> j) & 1L) * 2) - 1).toInt
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else {
      var sig = 0L
      var j = 0
      while (j < bits) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Whole MinHash signature for one document in a single pass — the
  * narrow-map twin of the shingle explode + numHashes-min-state
  * aggregate in [[graft.operators.Dedup.minhashSignatures]]
  * (bit-identical; asserted in DedupSpec). Word n-gram shingles over
  * single-space tokens (empty tokens kept, as in the SQL
  * formulation), ONE md5 per shingle occurrence, all hash functions
  * derived Carter–Wegman style: h1 = first 15 hex chars (60 bits) =
  * big-endian first 8 bytes >>> 4; h2 = hex chars 17–30 (56 bits) =
  * big-endian bytes 8–14; h_j = h1 + j·h2 (exact below 2^61 for
  * j < 32). NULL when the document has fewer than `n` tokens,
  * matching the aggregate version's drop.
  *
  * Scale shape: signature generation fuses into the scan — no
  * shingle-row explosion, no shuffle until the band join.
  */
case class MinHashSig(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes <= 32, s"h1 + j*h2 stays exact for j < 32, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"minhash_sig requires STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var b64 = 0L
      var bi = 0
      while (bi < 8) { b64 = (b64 << 8) | (d(bi) & 0xffL); bi += 1 }
      val h1 = b64 >>> 4
      var h2 = 0L
      bi = 8
      while (bi < 15) { h2 = (h2 << 8) | (d(bi) & 0xffL); bi += 1 }
      var j = 0
      while (j < numHashes) {
        val v = h1 + j.toLong * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document DISTINCT word-n-gram shingle hashes in one pass — the
  * narrow-map form of shingle → hash → distinct that the n-gram
  * Jaccard pipeline needs. Emits a sorted array of 60-bit md5-derived
  * hashes (first 15 hex chars, the same slice [[MinHashSig]] uses for
  * h1), deduplicated in-expression, so downstream needs NO distinct
  * shuffle and the per-document set size is `size(array)` — a pure
  * projection instead of a count aggregate. NULL when the document
  * has fewer than `n` tokens. Sorted output keeps the exploded row
  * order deterministic.
  */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"ngram_hashes requires STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "ngram_hashes"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var b64 = 0L
      var bi = 0
      while (bi < 8) { b64 = (b64 << 8) | (d(bi) & 0xffL); bi += 1 }
      seen.add(b64 >>> 4)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** [[NgramHashes]] and [[MinHashSig]] fused into ONE digest pass —
  * for the two-stage pipelines (LSH-propose → exact-verify) that need
  * BOTH the distinct shingle-hash set and the MinHash signature of
  * every document. Run separately they md5 each shingle occurrence
  * twice; this emits struct(hs, sig) from a single pass, so the
  * corpus is hashed exactly once per query. Field semantics are
  * bit-identical to the standalone expressions (asserted in
  * DedupSpec): hs = sorted distinct h1 (first 60 digest bits), sig_j
  * = min over occurrences of h1 + j·h2. NULL when the document has
  * fewer than `n` tokens. */
case class ShingleProfile(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numHashes <= 32, s"h1 + j*h2 stays exact for j < 32, got $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"shingle_profile requires STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_profile"

  @transient private lazy val md = java.security.MessageDigest.getInstance("MD5")

  override protected def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < n) return null
    val seen = new java.util.TreeSet[java.lang.Long]()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      var b64 = 0L
      var bi = 0
      while (bi < 8) { b64 = (b64 << 8) | (d(bi) & 0xffL); bi += 1 }
      val h1 = b64 >>> 4
      seen.add(h1)
      var h2 = 0L
      bi = 8
      while (bi < 15) { h2 = (h2 << 8) | (d(bi) & 0xffL); bi += 1 }
      var j = 0
      while (j < numHashes) {
        val v = h1 + j.toLong * h2
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    org.apache.spark.sql.catalyst.InternalRow(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `n` nearest centroids for one embedding in a single fused
  * kernel — the narrow-map assignment pass of the IVF index
  * ([[graft.operators.Similarity.ivfTopK]]). The centroid table is
  * driver-pinned by construction (nlist rows), so it ships as a
  * reference object inside the codegen'd projection, exactly like
  * [[LshBucketsF32]]'s plane matrix — turning the classic
  * crossJoin-then-argmin assignment (nlist scored row copies per
  * vector plus a corpus-wide aggregate) into a pure projection with
  * NO shuffle and no row amplification. At 100 TB this is the only
  * assignment shape that survives: the Lloyd/assignment pass touches
  * each vector exactly once, in place.
  *
  * Ranking matches the join formulation bit-for-bit: d2 = c·c − 2·x·c
  * (x·x is constant per x), dot accumulated left-to-right in double,
  * ties on equal d2 to the lowest cid (centroids are pre-sorted by
  * cid and insertion is strict-less-than). Returns the ≤n winning
  * cids ordered by (d2, cid). */
case class NearestCentroidsF32(child: Expression, cids: Array[Long],
                               cents: Array[Array[Float]], c2s: Array[Double],
                               n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(child.dataType, ArrayType(FloatType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroids requires ARRAY<FLOAT>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nearest_centroids"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = math.min(n, cids.length)
    val bestD = Array.fill(k)(Double.PositiveInfinity)
    val bestC = new Array[Long](k)
    var j = 0
    while (j < cids.length) {
      val c = cents(j)
      val m = math.min(arr.numElements(), c.length)
      var acc = 0.0
      var d = 0
      while (d < m) { acc += arr.getFloat(d).toDouble * c(d).toDouble; d += 1 }
      var d2 = c2s(j) - 2.0 * acc
      // NaN embeddings: every comparison would be false and the
      // untouched bestC zeros would silently alias a REAL cid 0 —
      // rank NaN as worst-but-finite so garbage vectors assign
      // deterministically to the lowest cid instead.
      if (java.lang.Double.isNaN(d2)) d2 = Double.MaxValue
      var slot = k
      while (slot > 0 && d2 < bestD(slot - 1)) slot -= 1
      if (slot < k) {
        var mv = k - 1
        while (mv > slot) { bestD(mv) = bestD(mv - 1); bestC(mv) = bestC(mv - 1); mv -= 1 }
        bestD(slot) = d2; bestC(slot) = cids(j)
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(bestC)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val centsRef = ctx.addReferenceObj("cents", cents, "float[][]")
    val c2sRef = ctx.addReferenceObj("c2s", c2s, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      val k = ctx.freshName("k")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val j = ctx.freshName("j")
      val cj = ctx.freshName("cj")
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val d2 = ctx.freshName("d2")
      val slot = ctx.freshName("slot")
      val mv = ctx.freshName("mv")
      s"""
         |int $k = java.lang.Math.min($n, $cidsRef.length);
         |double[] $bestD = new double[$k];
         |long[] $bestC = new long[$k];
         |java.util.Arrays.fill($bestD, Double.POSITIVE_INFINITY);
         |for (int $j = 0; $j < $cidsRef.length; $j++) {
         |  float[] $cj = $centsRef[$j];
         |  int $m = java.lang.Math.min($c.numElements(), $cj.length);
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $m; $d++) {
         |    $acc += (double) $c.getFloat($d) * (double) $cj[$d];
         |  }
         |  double $d2 = $c2sRef[$j] - 2.0 * $acc;
         |  if (Double.isNaN($d2)) $d2 = Double.MAX_VALUE;
         |  int $slot = $k;
         |  while ($slot > 0 && $d2 < $bestD[$slot - 1]) $slot--;
         |  if ($slot < $k) {
         |    for (int $mv = $k - 1; $mv > $slot; $mv--) {
         |      $bestD[$mv] = $bestD[$mv - 1]; $bestC[$mv] = $bestC[$mv - 1];
         |    }
         |    $bestD[$slot] = $d2; $bestC[$slot] = $cidsRef[$j];
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($bestC);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization ENCODE: one code per subspace — the vector's
  * nearest codebook entry in each of `nSub` contiguous dims/nSub-wide
  * subspaces. Codebooks (nSub × k × subDim floats, driver-trained)
  * ship as a reference object; encoding is a pure narrow projection
  * exactly like [[NearestCentroidsF32]]. At 100 TB this is the memory
  * story of the similarity index: nSub small codes per vector (16
  * 5-bit codes ≈ 10 bytes packed at the tuned config) where the raw
  * float32 row is 256 — a ~25× compression that keeps the whole
  * corpus index RAM-resident. Ties break to the lower code
  * (strict-less insertion over ascending codes). */
case class PqCodesF32(child: Expression, codebooks: Array[Array[Array[Float]]])
    extends UnaryExpression {

  private val nSub = codebooks.length
  private val subDim = if (nSub > 0 && codebooks(0).nonEmpty) codebooks(0)(0).length else 0

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(child.dataType, ArrayType(FloatType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_codes requires ARRAY<FLOAT>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // short embeddings -> null, see eval
  override def prettyName: String = "pq_codes"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    // dimension-mismatch posture (same as dot_f32): a short embedding
    // must surface as a MISSING code vector, not be zero-padded into
    // plausible-looking wrong codes that silently join wrong candidates
    if (arr.numElements() < nSub * subDim) return null
    val out = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      val cb = codebooks(s)
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < cb.length) {
        val cent = cb(c)
        var d2 = 0.0
        var d = 0
        while (d < subDim) {
          val idx = s * subDim + d
          val x = if (idx < arr.numElements()) arr.getFloat(idx).toDouble else 0.0
          val diff = x - cent(d).toDouble
          d2 += diff * diff
          d += 1
        }
        if (d2 < bestD) { bestD = d2; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    nullSafeCodeGen(ctx, ev, cv => {
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val d = ctx.freshName("d")
      val idx = ctx.freshName("idx")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val cent = ctx.freshName("cent")
      val x = ctx.freshName("x")
      s"""
         |if ($cv.numElements() < ${nSub * subDim}) {
         |  ${ev.isNull} = true;
         |} else {
         |int[] $out = new int[$nSub];
         |for (int $s = 0; $s < $nSub; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  for (int $c = 0; $c < $cbRef[$s].length; $c++) {
         |    float[] $cent = $cbRef[$s][$c];
         |    double $d2 = 0.0;
         |    for (int $d = 0; $d < $subDim; $d++) {
         |      int $idx = $s * $subDim + $d;
         |      double $x = $idx < $cv.numElements()
         |        ? (double) $cv.getFloat($idx) : 0.0;
         |      double $diff = $x - (double) $cent[$d];
         |      $d2 += $diff * $diff;
         |    }
         |    if ($d2 < $bestD) { $bestD = $d2; $best = $c; }
         |  }
         |  $out[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Product-quantization ASYMMETRIC score: cosine between a RAW probe
  * vector and a PQ-ENCODED corpus vector reconstructed from its codes
  * — dot(probe, decoded) and ‖decoded‖ both read straight from the
  * codebooks (per-entry c·c precomputed), so scoring touches 8 ints
  * per corpus row instead of 64 floats. Left input: the probe's raw
  * ARRAY<FLOAT>; right input: the corpus row's ARRAY<INT> codes. */
case class PqCosineF32(left: Expression, right: Expression,
                       codebooks: Array[Array[Array[Float]]],
                       c2: Array[Array[Double]])
    extends BinaryExpression {

  private val nSub = codebooks.length
  private val subDim = if (nSub > 0 && codebooks(0).nonEmpty) codebooks(0)(0).length else 0

  override def checkInputDataTypes(): TypeCheckResult =
    if (DataType.equalsIgnoreNullability(left.dataType, ArrayType(FloatType)) &&
        DataType.equalsIgnoreNullability(right.dataType, ArrayType(IntegerType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_cosine requires (ARRAY<FLOAT>, ARRAY<INT>), got " +
        s"(${left.dataType}, ${right.dataType})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_cosine"

  override protected def nullSafeEval(p: Any, cds: Any): Any = {
    val probe = p.asInstanceOf[ArrayData]
    val codes = cds.asInstanceOf[ArrayData]
    var dot = 0.0
    var dn2 = 0.0
    var pn2 = 0.0
    var i = 0
    while (i < probe.numElements()) {
      val v = probe.getFloat(i).toDouble; pn2 += v * v; i += 1
    }
    var s = 0
    while (s < nSub && s < codes.numElements()) {
      val code = codes.getInt(s)
      val cent = codebooks(s)(code)
      dn2 += c2(s)(code)
      var d = 0
      while (d < subDim) {
        val idx = s * subDim + d
        val x = if (idx < probe.numElements()) probe.getFloat(idx).toDouble else 0.0
        dot += x * cent(d).toDouble
        d += 1
      }
      s += 1
    }
    if (pn2 == 0.0 || dn2 == 0.0) 0.0 else dot / (math.sqrt(pn2) * math.sqrt(dn2))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
    val c2Ref = ctx.addReferenceObj("c2", c2, "double[][]")
    nullSafeCodeGen(ctx, ev, (pv, cv) => {
      val dot = ctx.freshName("dot")
      val dn2 = ctx.freshName("dn2")
      val pn2 = ctx.freshName("pn2")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val idx = ctx.freshName("idx")
      val code = ctx.freshName("code")
      val cent = ctx.freshName("cent")
      val v = ctx.freshName("v")
      val x = ctx.freshName("x")
      s"""
         |double $dot = 0.0, $dn2 = 0.0, $pn2 = 0.0;
         |for (int $i = 0; $i < $pv.numElements(); $i++) {
         |  double $v = (double) $pv.getFloat($i);
         |  $pn2 += $v * $v;
         |}
         |for (int $s = 0; $s < $nSub && $s < $cv.numElements(); $s++) {
         |  int $code = $cv.getInt($s);
         |  float[] $cent = $cbRef[$s][$code];
         |  $dn2 += $c2Ref[$s][$code];
         |  for (int $d = 0; $d < $subDim; $d++) {
         |    int $idx = $s * $subDim + $d;
         |    double $x = $idx < $pv.numElements()
         |      ? (double) $pv.getFloat($idx) : 0.0;
         |    $dot += $x * (double) $cent[$d];
         |  }
         |}
         |${ev.value} = ($pn2 == 0.0 || $dn2 == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($pn2) * java.lang.Math.sqrt($dn2));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Deflate-compressed size of a string — the corpus-quality signal
  * behind compression-ratio filters: templated/repetitive text
  * compresses far below natural prose, so bytes_deflated/bytes_raw
  * separates boilerplate from content with zero linguistics. The
  * DEFLATE output for a fixed level/strategy is deterministic for a
  * given input (same zlib parameters, no timestamps — unlike the gzip
  * container), so the signal is stable across runs and partitionings;
  * it is still engine-specific (DuckDB exposes no deflate), hence
  * no-oracle + spec. Interpreted (CodegenFallback): per-row cost IS
  * the deflate call. One Deflater per task, reset between rows. */
case class DeflateSize(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_size requires STRING, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  // One deflater per task (expressions deserialize per task and a
  // task is single-threaded); reset() between rows. The native zlib
  // buffer is released by end() at TASK COMPLETION via the context
  // listener — without it each task instance leaks ~hundreds of KB of
  // off-heap memory until finalization, which a long-lived executor
  // running many short tasks can accumulate past its container limit
  // while the heap looks healthy.
  @transient private lazy val deflater = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION, true)
    val tc = org.apache.spark.TaskContext.get()
    if (tc != null) tc.addTaskCompletionListener[Unit](_ => d.end())
    d
  }
  @transient private lazy val buf = new Array[Byte](8192)

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var total = 0
    while (!deflater.finished()) total += deflater.deflate(buf)
    total
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hilbert-curve clustering key (order 16: two 16-bit axes → one
  * key in [0, 2³²)) — the space-filling layout key whose consecutive
  * values are ALWAYS grid-adjacent, unlike the Z-order key (W15)
  * whose bit-interleave takes long diagonal jumps at power-of-two
  * boundaries; for range-scan locality over two correlated columns
  * the Hilbert layout dominates. The classic iterative xy2d: 16
  * rounds high-bit→low of quadrant code + rotate/reflect, pure
  * integer ops — codegen'd into a tight loop (native Expression >
  * UDF), and exactly reproducible in SQL (the oracle unrolls the same
  * rounds in a recursive CTE). KernelSpec proves the defining
  * property on the coarse 16×16 lattice: sorted by key, every
  * consecutive pair of points is grid-adjacent (one stride apart in
  * exactly one axis) — the locality guarantee Z-order lacks. */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_key requires (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"

  override protected def nullSafeEval(xIn: Any, yIn: Any): Any = {
    var x = xIn.asInstanceOf[Long]
    var y = yIn.asInstanceOf[Long]
    var d = 0L
    var s = 32768L
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve connects;
        // reflect over the FULL grid (65535 = n-1, all-ones): later
        // rounds only read bits below s, and (n-1-x) mod s =
        // s-1-(x mod s) borrow-free — s-1-x would go negative once a
        // reflection has set bits >= s
        val nx = if (rx == 1) 65535L - y else y
        val ny = if (rx == 1) 65535L - x else x
        x = nx; y = ny
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (xc, yc) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
         |long $x = $xc; long $y = $yc; long $d = 0L;
         |for (long $s = 32768L; $s > 0; $s >>= 1) {
         |  long $rx = (($x & $s) > 0) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0) {
         |    long $nx = ($rx == 1) ? 65535L - $y : $y;
         |    long $ny = ($rx == 1) ? 65535L - $x : $x;
         |    $x = $nx; $y = $ny;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression — Spark has no builtin for it, yet a multilingual
  * corpus MUST normalize before any hash-based dedup: NFC and NFD
  * spell identical glyphs with different code-point sequences, so
  * un-normalized corpora silently under-deduplicate (UnicodeSpec
  * pins that hashes do not conflate the forms). Delegates to
  * `java.text.Normalizer` (Unicode-standard tables shipped with the
  * JDK); codegen emits the direct static call, so the expression
  * stays inside whole-stage codegen. DuckDB's `nfc_normalize` is the
  * oracle twin for the NFC form. */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD")(form),
    s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got '$form'")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize requires STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  // resolved once — form is fixed per expression instance (and
  // already require-validated); interpreted eval must not pay a
  // valueOf lookup per row
  @transient private lazy val nf = java.text.Normalizer.Form.valueOf(form)

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString, nf))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  java.text.Normalizer.normalize($c.toString(),
       |    java.text.Normalizer.Form.$form));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent stripping: NFD-decompose, drop non-spacing combining marks
  * (Unicode category Mn), re-compose to NFC — 'café' → 'cafe' for any
  * composed OR decomposed input. The folding step of accent-blind
  * blocking keys (entity resolution, search); oracle twin is DuckDB's
  * `strip_accents`, and the two agree on ALL scripts because both
  * drop every Mn mark — which means non-Latin combining marks fold
  * too (Japanese dakuten: デ → テ, UnicodeSpec pins it). That is the
  * standard strip-accents semantic, but it is LOSSY outside
  * Latin-script fields — use it for blocking keys, not for canonical
  * text. */
case class StripAccentsExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"strip_accents requires STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      StripAccentsExpr.strip(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
       |  graft.functions.StripAccentsExpr.strip($c.toString()));
     """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document character census in ONE narrow pass: (total
  * code-point count, alphabet size, Shannon entropy in nats) as a
  * struct — the fused form of the q_char_entropy pipeline that used
  * to explode every character into a row (one row PER CHARACTER of
  * the corpus), shuffle the (doc, char) counts, and join totals back.
  * The census is a per-row local map, so the whole operator becomes a
  * projection: no explode, no exchange, no join — at any corpus size
  * the char pass costs one scan (guide §2.3/§2.4: aggregate before
  * you shuffle; remove the shuffle outright).
  *
  * Exactness: counts are exact integers over code points (identical
  * grouping to split(text, '') — Java regex zero-width splits never
  * cut a surrogate pair); the entropy terms (n/total)·ln(n/total) are
  * the same IEEE ops the aggregate computed, summed in ascending
  * code-point order — a deterministic order; consumers absorb the
  * float-sum reordering with their established round(4), exactly as
  * they absorbed the hash-aggregate's arbitrary order before.
  * Interpreted (CodegenFallback): per-row cost is the census loop. */
case class CharEntropyStats(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_entropy_stats requires STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("alphabet", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))
  override def prettyName: String = "char_entropy_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val str = input.asInstanceOf[UTF8String].toString
    // ASCII fast path + spill map for the long tail of code points
    val ascii = new Array[Long](128)
    var rest: java.util.TreeMap[Integer, Long] = null
    var total = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (rest == null) rest = new java.util.TreeMap[Integer, Long]()
        val prev = rest.get(cp)
        rest.put(cp, if (prev == null) 1L else prev + 1L)
      }
      total += 1L
      i += Character.charCount(cp)
    }
    var alphabet = 0L
    var sumTerms = 0.0
    def term(n: Long): Unit = {
      alphabet += 1L
      val q = n.toDouble / total
      sumTerms += q * math.log(q)
    }
    var c = 0
    while (c < 128) { if (ascii(c) > 0L) term(ascii(c)); c += 1 }
    if (rest != null) rest.values().forEach(n => term(n))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](total, alphabet, -sumTerms))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Content-defined chunking of one document in ONE narrow pass:
  * array<struct<chunk_hash string, n_words bigint>> in chunk order —
  * the fused form of the q_cdc_chunks pipeline that used to
  * posexplode every word, run two lag windows plus a running-sum
  * window over the whole corpus (shuffled by doc), and rebuild chunk
  * text through sort_array(collect_list(...)). The rolling-hash cut
  * rule and both md5 chains are document-local, so the whole chunker
  * is a projection; only the cross-document duplicate census shuffles
  * (guide §2.3/§2.4). Exact replication of the former plan: words =
  * split(text, ' ') with empties kept (split's -1 limit), per-word
  * a = first-8-hex-chars-of-md5 as long, cut when a + 31·a₁ + 961·a₂
  * ≡ 0 (mod 8) with two predecessors present, chunk_hash = md5 of the
  * space-joined words of the chunk. Array index = chunk_idx.
  * Interpreted (CodegenFallback): per-row cost is the chunk loop. */
case class CdcChunks(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks requires STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("chunk_hash", StringType, nullable = false),
    StructField("n_words", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "cdc_chunks"

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  private def md5Hex(s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    // per-word rolling value: first 8 md5 hex chars as a long
    val a = words.map(w => java.lang.Long.parseLong(md5Hex(w).substring(0, 8), 16))
    val chunks = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.catalyst.InternalRow]
    val sb = new java.lang.StringBuilder()
    var nWords = 0L
    def emit(): Unit = {
      chunks += new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](
          UTF8String.fromString(md5Hex(sb.toString)), nWords))
      sb.setLength(0)
      nWords = 0L
    }
    var i = 0
    while (i < words.length) {
      if (nWords > 0L) sb.append(' ')
      sb.append(words(i))
      nWords += 1L
      // the former windowed shape: chunk_idx_i = Σ_{j<i} cut_j (running
      // sum minus own cut), so a firing cut at i CLOSES the chunk with
      // word i as its last member and i+1 starts the next chunk
      val cut = i >= 2 && (a(i) + 31L * a(i - 1) + 961L * a(i - 2)) % 8L == 0L
      if (cut) emit()
      i += 1
    }
    if (nWords > 0L) emit()
    new org.apache.spark.sql.catalyst.util.GenericArrayData(chunks.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document term-frequency census in ONE narrow pass:
  * struct<m: map<term, tf>, nrm2: Σtf²> over the space-split non-empty
  * terms — the fused form of the explode → (doc, term) hash-aggregate
  * pipeline the sparse-retrieval operators start from. Term counts
  * are document-local, so the census is a projection: the word stream
  * never reaches an exchange, and the ℓ² norm (an exact integer) falls
  * out of the same pass instead of a second aggregate over the tf
  * relation (guide §2.3/§2.4). Interpreted (CodegenFallback): per-row
  * cost is the census loop. */
case class TermCounts(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"term_counts requires STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("m",
      MapType(StringType, LongType, valueContainsNull = false),
      nullable = false),
    StructField("nrm2", LongType, nullable = false)))
  override def prettyName: String = "term_counts"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (w.nonEmpty) counts.put(w, counts.getOrDefault(w, 0L) + 1L)
      i += 1
    }
    val n = counts.size()
    val keys = new Array[Any](n)
    val vals = new Array[Any](n)
    var nrm2 = 0L
    var j = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      nrm2 += e.getValue * e.getValue
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(keys),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(vals)),
      nrm2))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccentsExpr {
  /** Static so generated code can call it directly. */
  def strip(s: String): String = {
    val d = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    java.text.Normalizer.normalize(sb.toString, java.text.Normalizer.Form.NFC)
  }
}

/** Registration + Column-level wrappers. Registered idempotently via
  * [[graft.Tables.load]] so every query pack can use the fast paths
  * regardless of which entry point built the session. */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // Guard PER FUNCTION, not on one sentinel: a session configured
    // with GraftExtensions already has fnv64/dot_f32/jaro_winkler from
    // the extension hook — a single fnv64-existence check would then
    // skip registering the functions the hook does NOT inject
    // (deflate_size) and leave them forever unresolvable.
    def ensure(name: String, builder: Seq[Expression] => Expression): Unit =
      if (!reg.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    ensure("fnv64", exprs => FnvHash64(exprs.head))
    ensure("dot_f32", exprs => DotProductF32(exprs(0), exprs(1)))
    ensure("jaro_winkler", exprs => JaroWinklerSim(exprs(0), exprs(1)))
    ensure("deflate_size", exprs => DeflateSize(exprs.head))
    ensure("hilbert_key", exprs => HilbertKey(exprs(0), exprs(1)))
    ensure("unicode_normalize", unicodeNormalizeBuilder)
    ensure("strip_accents", exprs => StripAccentsExpr(exprs.head))
    ensure("char_entropy_stats", exprs => CharEntropyStats(exprs.head))
    ensure("cdc_chunks", exprs => CdcChunks(exprs.head))
    ensure("term_counts", exprs => TermCounts(exprs.head))
    // Optimizer rules go through the public experimental-methods hook
    // (sessions built with spark.sql.extensions get them from
    // GraftExtensions instead; both paths are idempotent).
    if (!spark.experimental.extraOptimizations.contains(LevenshteinPrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ LevenshteinPrefilter
  }

  /** The normalization form must be a foldable string literal — it
    * selects a code path, it is not data. */
  private[functions] def literalForm(e: Expression): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
      s.toString
    case other => throw new IllegalArgumentException(
      s"unicode_normalize form must be a string literal, got $other")
  }

  /** SQL builder shared by register() and GraftExtensions: 1-arg form
    * defaults to NFC (the Column wrapper's default), 2-arg form must
    * be a string literal; anything else is a clear argument error,
    * never a raw IndexOutOfBounds. */
  private[functions] def unicodeNormalizeBuilder(exprs: Seq[Expression]): Expression =
    exprs match {
      case Seq(c) => UnicodeNormalize(c, "NFC")
      case Seq(c, f) => UnicodeNormalize(c, literalForm(f))
      case _ => throw new IllegalArgumentException(
        s"unicode_normalize takes (string[, form]), got ${exprs.length} arguments")
    }

  def fnv64(c: Column): Column = call_function("fnv64", c)
  def charEntropyStats(c: Column): Column =
    call_function("char_entropy_stats", c)
  def cdcChunks(c: Column): Column = call_function("cdc_chunks", c)
  def termCounts(c: Column): Column = call_function("term_counts", c)
  def deflateSize(c: Column): Column = call_function("deflate_size", c)
  def dotF32(a: Column, b: Column): Column = call_function("dot_f32", a, b)
  def jaroWinkler(a: Column, b: Column): Column = call_function("jaro_winkler", a, b)
  def hilbertKey(x: Column, y: Column): Column = call_function("hilbert_key", x, y)
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    call_function("unicode_normalize", c, org.apache.spark.sql.functions.lit(form))
  def stripAccents(c: Column): Column = call_function("strip_accents", c)
}
