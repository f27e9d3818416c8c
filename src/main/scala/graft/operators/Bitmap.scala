package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Fixed-universe bitmap set aggregate (SURVEY.md §2B G24) — the
  * bitmap-index structure OLAP engines keep per dimension value: one
  * bit per entity id, built as a PARTIAL/FINAL aggregate whose merge
  * is word-wise OR (associative, commutative, idempotent — the
  * partitioning-independence trifecta). Unlike count(distinct) the
  * aggregate's RESULT is reusable: cardinality is a popcount away, and
  * set algebra BETWEEN groups (overlap = AND, churn = AND-NOT) needs
  * no re-scan of the raw fact table — the reason bitmap indexes back
  * every serious engagement/segment-overlap pipeline.
  *
  * Scale contract: the buffer is universe/8 bytes REGARDLESS of group
  * size (64 Ki universe → 8 KiB), so map-side combine ships one small
  * fixed array per (group × partition) — but the universe must be a
  * bounded dictionary-encoded id space, declared up front. For open
  * domains (raw 64-bit ids) this is the wrong tool — that is what the
  * KMV sketch (G23) and HLL (G3) rows are for; a production variant
  * would use compressed containers (roaring) to lift the bound.
  * Out-of-range ids fail loudly rather than silently aliasing.
  */
class BitmapAgg(universe: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(universe >= 64 && universe <= (1 << 24),
    s"bitmap universe must be a bounded id dictionary (64..2^24), got $universe")
  private val words = (universe + 63) >>> 6

  override def zero: Array[Long] = new Array[Long](words)

  override def reduce(b: Array[Long], id: Long): Array[Long] = {
    require(id >= 0 && id < universe,
      s"id $id outside declared bitmap universe [0, $universe) — " +
        "dictionary-encode the key or widen the universe")
    b((id >>> 6).toInt) |= 1L << (id & 63)
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { x(i) |= y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
