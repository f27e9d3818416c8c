package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, JoinedRow, GenericInternalRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Backward (at-or-before) as-of join as a WHOLE-OPERATOR Catalyst
  * extension — logical node + planner strategy + physical merge
  * operator, the (c) tier of the custom-operator ladder that the
  * engine's other 300+ operators never needed.
  *
  * Why this one earns a physical operator when everything else
  * composes: the composed as-of (equi-join, time filter, per-left-row
  * argmax — q_join_asof) necessarily MATERIALIZES every (left row ×
  * at-or-before right row) pair before the aggregate prunes to one,
  * and when the pick must carry payload columns the pair stream
  * crosses a shuffle too. No composition of Spark's built-ins can
  * express "the last right row at-or-before, in one pass" — exactly
  * the whole-operator-semantics case. This operator declares
  * [[ClusteredDistribution]] + per-key time ordering and lets
  * EnsureRequirements place the exchanges, then a single forward
  * merge cursor per partition emits one output row per left row:
  * per-partition work is O(|left| + |right|), pairs never exist, and
  * the only rows that ever cross the wire are the two inputs
  * (runtime-asserted in AsofSpec via shuffleRecordsWritten).
  *
  * Semantics (pandas merge_asof direction='backward', left-outer):
  * for each left row, the right row with the greatest
  * (time, tiebreak…) at-or-before the left time within the same key;
  * no match → right columns null. The tiebreak columns make the pick
  * DETERMINISTIC on time ties (bare "last wins" would be
  * partition-order roulette); rows with a NULL key or NULL time never
  * match (and a null-keyed left row still emits, null-extended).
  *
  * 100 TB posture: both sides shuffle once on the key (or zero times
  * if pre-bucketed — the distribution requirement is satisfied by
  * bucketed scans), sort within partitions, and stream; no state
  * beyond one buffered right row and one candidate match per cursor.
  * Skewed keys behave like any shuffled join (salting applies to the
  * caller's key expressions unchanged).
  */
case class AsofJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs at least one equi key, pairwise left/right")
  require(leftKeys.zip(rightKeys).forall { case (l, r) => l.dataType == r.dataType },
    "as-of join key types must match pairwise (cast explicitly)")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time columns must share one type (cast explicitly)")
  // Catalyst's NormalizeFloatingNumbers rule rewrites only BUILT-IN
  // join/aggregate/window nodes, so a float key here would hash and
  // order -0.0 apart from 0.0 — silently diverging from SQL equality.
  // Reject rather than normalize: a float equi/as-of key is a design
  // smell the caller should cast away deliberately.
  require((leftKeys ++ rightKeys :+ leftTime :+ rightTime).forall(e =>
      e.dataType != org.apache.spark.sql.types.DoubleType &&
        e.dataType != org.apache.spark.sql.types.FloatType),
    "as-of join keys/times must not be float/double (-0.0 vs 0.0 would " +
      "diverge from SQL equality) — cast to decimal/long/timestamp")
  // NOTE: the shared-lineage guard lives in Asof.backward, NOT here —
  // a node-body outputSet check would trip during canonicalization,
  // which rewrites BOTH children's exprIds to positional ids.

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsofJoin]] to [[AsofJoinExec]]; registered per session via
  * the public `spark.experimental.extraStrategies` hook
  * ([[Asof.ensureStrategy]]) or `GraftExtensions` for conf-configured
  * sessions. */
object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsofJoin =>
      AsofJoinExec(planLater(j.left), planLater(j.right),
        j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.rightTiebreak) :: Nil
    case _ => Nil
  }
}

/** The merge operator. Children arrive co-clustered on the keys and
  * sorted (key…, time[, tiebreak…]) — EnsureRequirements inserts the
  * exchanges/sorts to satisfy the declarations below — so one forward
  * pass suffices: advance the right cursor through every row
  * at-or-before the current left row, remembering the last same-key
  * row seen; because the left stream is also (key, time)-sorted the
  * cursor never rewinds. */
case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) ++
      (SortOrder(rightTime, Ascending) +:
        rightTiebreak.map(SortOrder(_, Ascending))))

  // one output row per left row, in the left child's order/partitions
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joinedRow = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)

      new Iterator[InternalRow] {
        // right cursor: the head row (COPIED — scanners reuse their
        // row buffer) plus its projected key/time
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _
        // the last same-key at-or-before row the cursor passed
        private var candidate: InternalRow = _
        private var candidateKey: UnsafeRow = _

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val raw = rIter.next()
            val k = rKeyProj(raw)
            val t = rTimeProj(raw)
            // a null key or null time can never be anyone's match
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = raw.copy(); rKey = k.copy(); rTime = t.copy()
            }
          }
        }
        advanceRight()

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          val lt = lTimeProj(l)
          val out =
            if (lk.anyNull || lt.isNullAt(0)) joinedRow(l, nullRight)
            else {
              var advancing = rRow != null
              while (advancing) {
                val kc = keyOrd.compare(rKey, lk)
                if (kc < 0 || (kc == 0 && timeOrd.compare(rTime, lt) <= 0)) {
                  if (kc == 0) { candidate = rRow; candidateKey = rKey }
                  advanceRight()
                  advancing = rRow != null
                } else advancing = false
              }
              if (candidate != null && keyOrd.compare(candidateKey, lk) == 0)
                joinedRow(l, candidate)
              else joinedRow(l, nullRight)
            }
          numOutputRows += 1
          resultProj(out)
        }
      }
    }
  }
}

/** DataFrame-level entry point. */
object Asof {

  /** Idempotently add [[AsofStrategy]] through the public
    * experimental-methods hook (mirrors how LevenshteinPrefilter
    * registers). The guard checks the PLANNER's assembled strategy
    * list, which already includes both the extension-injected copy
    * (conf path: GraftExtensions) and experimental.extraStrategies —
    * so neither path ever double-registers. */
  def ensureStrategy(s: SparkSession): Unit =
    if (!s.sessionState.planner.strategies.contains(AsofStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsofStrategy

  /** Backward as-of join (left-outer): for each left row, the right
    * row with the greatest (timeRight, tiebreak…) at-or-before
    * timeLeft within the same key; no match → null right columns.
    * Columns are named, resolved against each side — the two sides
    * must not share a lineage (as-of self-joins should alias one side
    * through a projection first). */
  def backward(left: DataFrame, right: DataFrame,
               on: Seq[(String, String)],
               time: (String, String),
               tiebreak: Seq[String] = Nil): DataFrame = {
    val s = left.sparkSession
    ensureStrategy(s)
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    // Shared-lineage sides would duplicate exprIds in output and bind
    // right-side columns to left values — fail fast instead (as-of
    // self-joins must alias one side through a fresh projection).
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides share attribute lineage — alias one side " +
        "through a fresh projection (toDF) first")
    // resolve names the way analysis would: honor spark.sql.caseSensitive
    // and refuse ambiguity instead of silently binding the first match
    val resolver = s.sessionState.analyzer.resolver
    def attr(p: LogicalPlan, n: String, side: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"as-of join: column '$n' not found on the $side side " +
            s"(${p.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          s"as-of join: column '$n' is ambiguous on the $side side " +
            s"(${many.size} matches)")
      }
    GraftSqlShim.ofRows(s, AsofJoin(lp, rp,
      on.map(k => attr(lp, k._1, "left")), on.map(k => attr(rp, k._2, "right")),
      attr(lp, time._1, "left"), attr(rp, time._2, "right"),
      tiebreak.map(attr(rp, _, "right"))))
  }
}
