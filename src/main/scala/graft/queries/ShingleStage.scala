package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** The documents table's shingle artifacts, staged ONCE per process
  * and fixture dir — the cross-query sharing layer for the dedup-audit
  * family (near-dup pairs, clusters, star contraction, canonical pick,
  * hop depth, family sizes, threshold sweep, LSH recall/error audits,
  * similarity measures, split leakage, source overlap, containment):
  * FOURTEEN registered queries all start from the same corpus md5
  * pass, and each used to redo it from scratch.
  *
  * Two staged relations:
  *  - [[profiles]] — `Dedup.shingleProfiles(documents, 3, 16)`:
  *    per-doc (hs = distinct 60-bit shingle hashes, sig = 16-perm
  *    MinHash), ONE fused digest pass over the corpus.
  *  - [[overlap3]] — the candidate-pair overlap counts
  *    (doc_id_a, doc_id_b, n_a, n_b, inter), derived from the staged
  *    profiles' hs sets (ShingleProfile.hs is bit-identical to
  *    NgramHashes — DedupSpec asserts it), so the md5 pass is not
  *    repeated even once.
  *
  * Unlike [[TradeGraph]]'s collected metadata, these relations are
  * DATA-SCALE (they grow with the corpus), so they stage to parquet,
  * not driver memory: the first consumer computes and writes, the rest
  * re-read the staged files. That is exactly what a 100 TB curation
  * pipeline does — materialize the signature and candidate-pair tables
  * once, then run every audit over them. The staging path is keyed by
  * fixture dir AND process (pid), so concurrent sweeps (Verify + Bench
  * in one session) never clobber each other's stage; recomputation
  * across processes is deterministic (md5 hashes), so every process
  * stages identical values.
  */
object ShingleStage {

  private val profMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private val ovMemo =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def stageBase(dir: String): String = {
    val pid = java.lang.ProcessHandle.current().pid()
    // key by the FULL canonical path (hashed), not just the basename:
    // the memo above is keyed by the full dir string, so two fixture
    // dirs sharing a basename must not share a stage path (the second
    // stage would overwrite the first while its memo still points there)
    val full = new java.io.File(dir).getCanonicalPath
    val tag = java.security.MessageDigest.getInstance("MD5")
      .digest(full.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"/tmp/graft_shingle_stage_${new java.io.File(dir).getName}_${tag}_$pid"
  }

  /** Staged per-doc shingle profiles (doc_id, hs, sig) for n = 3,
    * 16 permutations — the one parameterization every registered
    * consumer uses. */
  def profiles(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(profMemo.computeIfAbsent(dir, d => {
      val path = s"${stageBase(d)}/profiles3x16.parquet"
      Dedup.shingleProfiles(
          Tables.documents(s, d).select(col("doc_id"), col("text")), 3, 16)
        .write.mode("overwrite").parquet(path)
      path // memo records only after a successful write (stageOnce rule)
    }))

  /** Staged shingle-overlap pair relation for n = 3, derived from
    * [[profiles]] — same rows as
    * `Dedup.shingleOverlapCounts(documents, 3)`. */
  def overlap3(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ovMemo.computeIfAbsent(dir, d => {
      val path = s"${stageBase(d)}/overlap3.parquet"
      val sh = profiles(s, d)
        .select(col("doc_id"), size(col("hs")).as("n_sh"),
          explode(col("hs")).as("shash"))
      sh.select(col("shash"), col("doc_id").as("doc_id_a"), col("n_sh").as("n_a"))
        .join(sh.select(col("shash"), col("doc_id").as("doc_id_b"),
          col("n_sh").as("n_b")), Seq("shash"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .groupBy(col("doc_id_a"), col("doc_id_b"), col("n_a"), col("n_b"))
        .agg(count(lit(1)).as("inter"))
        .write.mode("overwrite").parquet(path)
      path
    }))
}
