package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

import scala.collection.mutable.ArrayBuffer

/** Query-scoped cache lifecycle — the library-grade replacement for the
  * old "caller must clearCache() between queries" contract.
  *
  * Operators persist() intermediates that feed two readers of ONE
  * returned plan (self-joins, sizes+pairs passes, pinned sampled range
  * bounds). Those blocks must be live while the caller's action runs —
  * the operator cannot unpersist before returning — but nothing should
  * outlive that action. The scope closes itself:
  *
  *  - [[persistScoped]] persists and records the intermediate in a
  *    thread-local pending set (plan building is driver-thread code);
  *  - [[own]] — applied to every registered query at the SparkEntry
  *    boundary — associates the pending intermediates with the
  *    returned plan and installs (once per session) a
  *    QueryExecutionListener;
  *  - when ANY action completes whose analyzed plan contains the owned
  *    plan as a subtree (count, collect, parquet write — commands wrap
  *    the query but keep it as a child), the listener unpersists that
  *    plan's intermediates. Plans never executed can be reclaimed with
  *    [[drain]] (Bench/Verify call it between queries, belt-and-
  *    braces).
  *
  * Contract shift vs the old scaladoc: a returned plan is good for ONE
  * action; after it completes the scratch caches are gone, so a second
  * action on the SAME object recomputes from scratch — rebuild the
  * query instead. (For the half-dozen operators that pin sampled range
  * bounds the rebuild also re-pins, which is exactly what the pinning
  * is for.) Reuse is not silent: released plans leave a bounded
  * tombstone ring, and an action matching a tombstone logs a loud
  * contract-breach warning. CacheScopeSpec asserts zero persisted
  * blocks remain after a query's action.
  *
  * Boundary: [[own]] is applied automatically ONLY at the SparkEntry
  * registry. Code calling graft.operators.* directly must wrap the
  * returned plan in own() (or call [[drain]] afterwards) — the
  * thread-local pending buffer holds those persists until one of the
  * two runs.
  */
object Caches {

  private val pending = new ThreadLocal[ArrayBuffer[DataFrame]] {
    override def initialValue(): ArrayBuffer[DataFrame] = ArrayBuffer.empty
  }

  /** One tracked consumer plan: the analyzed tree plus its cached
    * `semanticHash` and root class — the two cheap gates that let the
    * per-action listener scan skip `sameResult`'s full canonical tree
    * compare for the ~100% of action nodes that cannot possibly match
    * (profiled: an ungated `analyzed.exists(_.sameResult(key))` over a
    * 64-deep tombstone ring of large ANN/dedup plans burned whole
    * CPU-seconds per UNRELATED action late in a 288-query sweep). */
  private final class Tracked(val plan: LogicalPlan, val hash: Int,
                              val rootClass: Class[_]) // identity equality
  /** rootClass is the CANONICALIZED root's class: wrappers whose
    * doCanonicalize collapses into the child (SubqueryAlias et al.)
    * never appear as a raw node class in any completed plan, so gating
    * on the raw root class would make those scopes unreleasable. The
    * canonicalization is computed once here and cached on the plan;
    * semanticHash needs it anyway. Node-side raw classes stay correct
    * because foreach also visits the wrapper's child, whose raw class
    * equals its canonical class. */
  private def track(plan: LogicalPlan): Tracked =
    new Tracked(plan, plan.semanticHash(), plan.canonicalized.getClass)

  /** Owned scopes: consumer analyzed plan → the persisted intermediates
    * feeding it. Values are swept by the per-session listener. */
  private val owned =
    new java.util.concurrent.ConcurrentHashMap[Tracked, Seq[DataFrame]]()

  private val installed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Extension form: `df.persistScoped()` reads like `df.persist()` at
    * the ~40 operator sites. */
  implicit final class PersistScoped(private val df: DataFrame) extends AnyVal {
    def persistScoped(): DataFrame = Caches.persist(df)
  }

  def persist(df: DataFrame): DataFrame = {
    df.persist()
    pending.get() += df
    df
  }

  /** Close the building scope: everything persisted on this thread
    * since the last own()/drain() now belongs to `result` and is
    * released when an action over `result` completes. */
  def own(result: DataFrame): DataFrame = {
    val p = pending.get()
    if (p.nonEmpty) {
      owned.put(track(result.queryExecution.analyzed), p.toSeq)
      p.clear()
      install(result.sparkSession)
    }
    result
  }

  /** Unpersist every tracked intermediate (pending and owned) — the
    * harness-loop safety net for plans that were built but never run. */
  def drain(): Unit = {
    val p = pending.get()
    p.foreach(unpersistQuietly)
    p.clear()
    val it = owned.values().iterator()
    while (it.hasNext) { it.next().foreach(unpersistQuietly); it.remove() }
  }

  /** Visible for CacheScopeSpec. */
  private[graft] def ownedCount: Int = owned.size()
  private[graft] def pendingCount: Int = pending.get().size

  private def unpersistQuietly(df: DataFrame): Unit =
    try df.unpersist() catch { case _: Throwable => }

  private def install(spark: SparkSession): Unit =
    if (installed.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
                               durationNs: Long): Unit = release(qe)
        override def onFailure(funcName: String, qe: QueryExecution,
                               exception: Exception): Unit = release(qe)
      })
    }

  /** Tombstones of released consumer plans (bounded ring): a SECOND
    * action over an already-released plan recomputes the scratch
    * intermediates from scratch — correct but unpinned and slow — so
    * it is loudly logged as a contract breach instead of passing
    * silently. */
  private val released =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[Tracked]())
  private val ReleasedCap = 64

  /** Gated subtree search: which tracked keys appear (by `sameResult`)
    * as a node of the completed plan. The root-class gate is a HashMap
    * probe per node — free — and the semantic-hash gate runs only on a
    * class hit, so the expensive full canonical tree compare executes
    * only for genuine matches. The ungated form (`analyzed.exists(
    * _.sameResult(key))` per key) walked every action node × every
    * tracked plan; with a tombstone ring full of large ANN/dedup plans
    * late in a long sweep it burned whole CPU-seconds on the listener
    * bus for every UNRELATED action. */
  private def matches(analyzed: LogicalPlan,
                      keys: Seq[Tracked]): Set[Tracked] = {
    if (keys.isEmpty) return Set.empty
    val byClass = keys.groupBy(_.rootClass)
    val hit = scala.collection.mutable.Set.empty[Tracked]
    analyzed.foreach { node =>
      byClass.get(node.getClass).foreach { ks =>
        // computed at most once per node (and only on a class hit);
        // canonicalization is lazy-cached on the node instance. A node
        // whose canonicalization throws is skipped for ALL keys — as
        // an Option, not a sentinel value: a sentinel (e.g. 0) could
        // collide with a legitimate semanticHash and silently route
        // correctness through sameResult re-throwing. Other nodes keep
        // scanning — failure isolation is per node × per key, never
        // whole-batch.
        val h = try Some(node.semanticHash()) catch { case _: Throwable => None }
        h.foreach { hv =>
          ks.foreach { k =>
            if (!hit.contains(k) && k.hash == hv &&
                (try node.sameResult(k.plan) catch { case _: Throwable => false }))
              hit += k
          }
        }
      }
    }
    hit.toSet
  }

  /** Release every owned scope whose consumer plan is a subtree of the
    * completed execution (sameResult is canonicalized, so cosmetic
    * differences — command wrappers, reordered projections — don't
    * mask the match). */
  private def release(qe: QueryExecution): Unit = {
    if (owned.isEmpty && released.isEmpty) return
    import scala.jdk.CollectionConverters._
    val ownedKeys = owned.keySet().asScala.toSeq
    val tombs = released.synchronized { released.asScala.toSeq }
    // No blanket catch here: matches() isolates failures per node and
    // per key (a single pathological plan must not suppress release of
    // every unrelated scope), and the plain tree traversal around those
    // guarded calls cannot throw.
    val hits = matches(qe.analyzed, ownedKeys ++ tombs)
    var matched = false
    hits.foreach { k =>
      val v = owned.remove(k)
      if (v != null) {
        v.foreach(unpersistQuietly)
        released.synchronized {
          released.add(k)
          while (released.size() > ReleasedCap) released.remove(0)
        }
        matched = true
      }
    }
    if (!matched && hits.nonEmpty)
      log.warn("graft.Caches: action over an ALREADY-RELEASED query plan — " +
        "the scratch caches were freed after its first action, so this run " +
        "recomputed them unpinned (slow, and pin-dependent operators should " +
        "be REBUILT, not re-run). One returned plan is good for one action.")
  }

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)
}
