package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, pinned to the classic algorithm so the
  * score is bit-identical to DuckDB's `jaro_winkler_similarity`
  * (verified empirically, including edge cases):
  *
  *  - either input empty → 0.0 (including both empty — the oracle's
  *    convention, not the "vacuously equal → 1" one);
  *  - Jaro match horizon `max(l1,l2)/2 - 1`, transpositions counted
  *    over matched characters, `(m/l1 + m/l2 + (m-t)/m) / 3` evaluated
  *    in exactly that IEEE order;
  *  - Winkler prefix boost `j + l·0.1·(1-j)` with common prefix
  *    l ≤ 4, applied only when j > 0.7.
  *
  * Byte-wise (UTF8 bytes), matching the oracle on the ASCII fixture
  * columns it is declared over. The work array is O(l1+l2) per row —
  * fine for the bounded-length name/key columns record linkage runs
  * on; pair GENERATION is the scale problem and lives in the blocked
  * window join ([[graft.queries.Linkage]]), never all-pairs.
  */
object JaroWinkler {

  /** Static kernel shared by interpreted eval and codegen. */
  def sim(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val horizon = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - horizon)
      val hi = math.min(l2, i + horizon + 1)
      var j = lo
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && b(j) == a(i)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val m = matches.toDouble
    val jaro = (m / l1 + m / l2 + (m - t) / m) / 3.0
    if (jaro > 0.7) {
      var l = 0
      val max = math.min(4, math.min(l1, l2))
      while (l < max && a(l) == b(l)) l += 1
      jaro + l * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** `jaro_winkler(a, b)` — codegen'd via one static call into
  * [[JaroWinkler.sim]], so the surrounding comparison stays inside
  * whole-stage codegen. Null if either side is null (BinaryExpression
  * default).
  */
case class JaroWinklerSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(e => DataType.equalsIgnoreNullability(e.dataType, StringType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires STRING args, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.sim(
      a.asInstanceOf[UTF8String].getBytes,
      b.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.sim($a.getBytes(), $b.getBytes())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
