package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Lineitem's per-returnflag k-minimum-values draw (k = 1024), staged
  * ONCE per process and fixture dir — the cross-query sharing layer
  * for the sampled-quantile family (q_sample_quantiles,
  * q_sample_quantiles_grouped). Both queries run the IDENTICAL per-row
  * md5 draw over lineitem (h = first 60 md5 bits of
  * "okey|linenumber|cents") and then keep k smallest (h, cents) pairs
  * — globally (k = 1024) or per flag (k = 256). The draw is the cost
  * (one string-concat + md5 + base-16 parse per fact row); before this
  * stage each query paid its own full scan + hash pass.
  *
  * One distributed pass serves both EXACTLY, because KMV is mergeable
  * under the total order (h ASC, cents ASC):
  *  - the GLOBAL k smallest of all rows is contained in the union of
  *    the per-flag k smallest (any row in the global top-k is also in
  *    its own flag's top-k), so merging the per-flag arrays and taking
  *    the first k is the identical sample the old
  *    orderBy(h, cents).limit(k) produced;
  *  - a flag's top-256 is the first 256 entries of its top-1024 (same
  *    total order, [[graft.operators.TopKPairs]] keeps the buffer
  *    sorted best-first), identical to the old TopKPairs(256) draw.
  *
  * Scale posture: the staged artifact is a DERIVED bounded relation —
  * ≤ k rows × the return-flag enum (3 in TPC-H; a loud require fires
  * at 16) — never a fact projection, so it collects to the driver like
  * the series memo, not to parquet. The one distributed heap aggregate
  * map-side-combines to ≤ k rows per (flag × partition).
  *
  * Memo contract (same as the series memo / ShingleStage): keyed by
  * fixture dir for the PROCESS LIFETIME with no invalidation — data
  * rewritten under the same path mid-process would serve stale
  * samples; fixtures never do that. The distributed collect runs
  * OUTSIDE the map lock (putIfAbsent publishes the winner), so
  * concurrent first callers may both compute (deterministic — no RNG,
  * no partition-order dependence) but never deadlock or block the bin.
  */
object KmvStage {

  val K = 1024

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, IndexedSeq[(Long, Long)]]]()

  /** Per-flag k-smallest (h, cents) pairs, each array in (h ASC,
    * cents ASC) order. */
  def samples(s: SparkSession, dir: String)
      : Map[String, IndexedSeq[(Long, Long)]] = {
    val cached = memo.get(dir)
    if (cached != null) return cached
    val heap = udaf(new graft.operators.TopKPairs(K))
    // widen: the md5 draw dominates and a one-row-group parquet scans
    // as a single task (no-op whenever the scan already parallelizes)
    val collected = Tables.widen(Tables.lineitem(s, dir))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"))
      // integer-only hash key: a float column through CAST-AS-STRING
      // would be a cross-engine formatting trap (25.0 vs 25)
      .select(col("l_returnflag"), col("cents"),
        expr("CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), " +
          "'|', CAST(l_linenumber AS STRING), '|', " +
          "CAST(cents AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("h"))
      // value = -h, id = cents: TopKPairs' (value DESC, id ASC) order
      // IS (h ASC, cents ASC) — the exact tiebreak both draws use
      .groupBy(col("l_returnflag"))
      .agg(heap(-col("h"), col("cents")).as("s"))
      .collect()
    require(collected.length <= 16,
      s"${collected.length} return flags — the flag-enum bound drifted; " +
        "revert to per-query draws")
    val built = collected.map { r =>
      val flag = r.getString(0)
      val pairs = r.getSeq[org.apache.spark.sql.Row](1)
        .map(e => (-e.getLong(1), e.getLong(2))).toIndexedSeq
      flag -> pairs
    }.toMap
    val prev = memo.putIfAbsent(dir, built)
    if (prev != null) prev else built
  }

  /** The merged global k-smallest sample (cents only), in (h ASC,
    * cents ASC) draw order. */
  def globalSample(s: SparkSession, dir: String, k: Int): IndexedSeq[Long] =
    samples(s, dir).values.flatten.toIndexedSeq.sorted.take(k).map(_._2)
}
