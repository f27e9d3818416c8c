package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Similarity, TextAnalysis}
import graft.Caches.PersistScoped

/** LLM-pipeline operator queries (SURVEY.md §2B L1-L5): the dedup
  * family (exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding
  * cosine), similarity search, text analysis, and multimodal binary
  * metadata. Implementations live in graft.operators; this pack wires
  * them to the fixture tables and provides the DuckDB oracle.
  *
  * md5 is used as the portable hash so even the sketch-based dedup
  * operators are exactly oracle-checkable (same lowercase hex on both
  * engines); raw double similarity scores are emitted unrounded
  * because both engines compute them with identical left-to-right
  * IEEE operations (verified bit-identical).
  */
object Llm {

  private[queries] val shingleCte =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
      |       FROM w WHERE len(w) >= 3)""".stripMargin

  /** The exact-Jaccard strong-pair CTE chain (requires a preceding
    * `sh(doc_id, shingle)` CTE, i.e. [[shingleCte]]): sizes,
    * shared-shingle intersections, and `pairs(da, db)` above the
    * threshold. ONE definition — the dedup-family oracles all build
    * on it, so the pair semantics cannot drift per query. */
  private[queries] def strongPairsCte(threshold: Double = 0.6): String =
    s"""sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |pairs AS (SELECT da, db FROM inter
      |          JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
      |          WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= $threshold)""".stripMargin

  /** The fixed-depth min-label-propagation unroll the CC oracles
    * share (requires a preceding `pairs(da, db)` CTE; ends with
    * `l<rounds>(node, label)`). Propagation is idempotent past the
    * fixpoint, so any convergence depth ≤ rounds yields the identical
    * labeling — ClusterSpec asserts the fixture converges well
    * inside 8. ONE definition: if the fixture's graph ever needs a
    * deeper unroll, every CC oracle moves together. */
  /** The symmetrized-edges + self-loops scaffold BOTH iterative-graph
    * oracles build on (requires a preceding `pairs(da, db)` CTE; the
    * self-loop is what folds "keep your own state" into each round's
    * min()). ONE definition: a drift between the CC and BFS oracles'
    * edge semantics would make them silently disagree. */
  private[queries] val edgeScaffoldCte: String =
    """nodes AS (SELECT DISTINCT u AS node FROM
      |          (SELECT da AS u FROM pairs UNION ALL SELECT db FROM pairs)),
      |ep AS (SELECT da AS u, db AS v FROM pairs
      |       UNION ALL SELECT db AS u, da AS v FROM pairs
      |       UNION ALL SELECT node AS u, node AS v FROM nodes)""".stripMargin

  private[queries] def ccUnroll(rounds: Int = 8): String = {
    val iters = (1 to rounds).map { k =>
      s"""l$k AS (SELECT e.u AS node, min(l.label) AS label
         |  FROM ep e JOIN l${k - 1} l ON e.v = l.node GROUP BY e.u)""".stripMargin
    }.mkString(",\n")
    s"""$edgeScaffoldCte,
      |l0 AS (SELECT node, node AS label FROM nodes),
      |$iters""".stripMargin
  }

  /** The packed BFS unroll [[bfsHopsSql]] uses (same `pairs` contract
    * and 8-round convergence argument as [[ccUnroll]]; state is
    * label·1024 + hops, self-loops relax +0, edges +1 — see
    * Dedup.bfsHops for the lexicographic-min-as-packed-min proof). */
  private[queries] def bfsUnroll(rounds: Int = 8): String = {
    val iters = (1 to rounds).map { k =>
      s"""h$k AS (SELECT e.u AS node,
         |  min(h.pack + CASE WHEN e.u = e.v THEN 0 ELSE 1 END) AS pack
         |  FROM ep e JOIN h${k - 1} h ON e.v = h.node GROUP BY e.u)""".stripMargin
    }.mkString(",\n")
    s"""$edgeScaffoldCte,
      |h0 AS (SELECT node, node * 1024 AS pack FROM nodes),
      |$iters""".stripMargin
  }

  /** L2t — duplicate-family chain depth: BFS hop distance from each
    * cluster's canonical (min-id) root over the strong near-dup pair
    * graph. Hops ≥ 2 expose transitive chains (A≈B≈C with A̸≈C) —
    * the audit that catches threshold-too-low chaining BEFORE a
    * family collapses to one survivor. Engine: Dedup.bfsHops'
    * packed min-plus propagation to a checked Σ-fixpoint; oracle:
    * the same relax unrolled 8 rounds (identical past the fixpoint —
    * the fixture converges well inside 8, ClusterSpec). */
  def dedupHops(s: SparkSession, dir: String): DataFrame =
    Dedup.bfsHops(
        Dedup.jaccardFromOverlap(ShingleStage.overlap3(s, dir), 0.6)
          .select(col("doc_id_a"), col("doc_id_b")))
      .orderBy(col("doc_id"))

  val dedupHopsSql: String =
    s"""$shingleCte,
      |${strongPairsCte()},
      |${bfsUnroll()}
      |SELECT node AS doc_id, CAST(pack // 1024 AS BIGINT) AS cluster_id,
      |  CAST(pack % 1024 AS BIGINT) AS hops
      |FROM h8 ORDER BY doc_id""".stripMargin

  /** L1 — exact dedup keyed on content hash, deterministic keeper. */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(s, dir), col("text"), col("doc_id"))
      .orderBy(col("keep_id"))

  val dedupExactSql: String =
    """SELECT md5(text) AS content_hash, CAST(min(doc_id) AS BIGINT) AS keep_id,
      |  CAST(count(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  /** L43 — template-family detection: documents that share a
    * STRUCTURAL skeleton (lowercase, digit runs → '#', letter runs →
    * 'w') are one boilerplate template instantiated with different
    * fillers — the near-dup family exact dedup (L1, raw-text hash)
    * and shingle dedup (L2, content overlap) both miss when the
    * fillers dominate. The curation action is per FAMILY: keep the
    * canonical member, down-weight or drop the rest. Shape: one
    * narrow projection computes the skeleton per row, then a single
    * keyed aggregate — exactly the L1 hash-groupBy plan, at any
    * scale; no pairing ever happens. Families of one are filtered
    * (those docs are template-unique). */
  def dedupTemplates(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        md5(regexp_replace(regexp_replace(lower(col("text")),
          "[0-9]+", "#"), "[a-z]+", "w")).as("template_hash"))
      .groupBy(col("template_hash"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        min(col("doc_id")).as("keep_id"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("template_hash"))

  val dedupTemplatesSql: String =
    """SELECT md5(regexp_replace(regexp_replace(lower(text),
      |    '[0-9]+', '#', 'g'), '[a-z]+', 'w', 'g')) AS template_hash,
      |  CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
      |  CAST(min(doc_id) AS BIGINT) AS keep_id
      |FROM documents
      |GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY template_hash""".stripMargin

  /** L2a — MinHash-LSH candidate pairs (16 hash fns derived from one
    * md5 per shingle via h1 + j·h2; 4 bands × 4 rows). Signatures read
    * raw shingle occurrences: min() is duplicate-insensitive, so the
    * distinct-shingle shuffle is skipped entirely. */
  def dedupMinhash(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidates(
        Dedup.minhashSignaturesNarrow(Tables.documents(s, dir), 3, 16), 4)
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val dedupMinhashSql: String =
    s"""$shingleCte,
      |hh AS (SELECT doc_id,
      |         CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
      |         CAST(concat('0x', substring(md5(shingle), 17, 14)) AS BIGINT) AS h2
      |       FROM sh),
      |hs AS (SELECT doc_id, j, min(h1 + j * h2) AS mh
      |       FROM hh, (SELECT unnest(range(0, 16)) AS j) GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, j // 4 AS band,
      |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS band_sig
      |          FROM hs GROUP BY doc_id, j // 4)
      |SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b
      |FROM bands a JOIN bands b
      |  ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** L2l — incremental near-dup: the arriving batch (every 5th doc id,
    * the deterministic fixture split) banded against the EXISTING
    * corpus only — the production dedup shape where each batch checks
    * the accumulated index instead of re-pairing the whole corpus.
    * Signatures are computed once; the two sides filter one persisted
    * banded table. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatesBetween(
        Dedup.minhashSignaturesNarrow(Tables.documents(s, dir), 3, 16),
        col("doc_id") % 5 === 0, 4)
      .orderBy(col("new_id"), col("old_id"))

  val dedupIncrementalSql: String =
    s"""$shingleCte,
      |hh AS (SELECT doc_id,
      |         CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
      |         CAST(concat('0x', substring(md5(shingle), 17, 14)) AS BIGINT) AS h2
      |       FROM sh),
      |hs AS (SELECT doc_id, j, min(h1 + j * h2) AS mh
      |       FROM hh, (SELECT unnest(range(0, 16)) AS j) GROUP BY doc_id, j),
      |bands AS (SELECT doc_id, j // 4 AS band,
      |            string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS band_sig
      |          FROM hs GROUP BY doc_id, j // 4)
      |SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
      |FROM bands a JOIN bands b
      |  ON a.band = b.band AND a.band_sig = b.band_sig
      |  AND a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
      |ORDER BY new_id, old_id""".stripMargin

  /** L2m — dedup threshold sweep: candidate-pair counts and mean
    * similarity at each Jaccard cutoff, from ONE pass over the exact
    * pair stream — the tuning curve that picks a production dedup
    * threshold (how many pairs a 0.4 vs 0.6 cutoff would merge). The
    * pair stream is the collision-driven ngram join (never
    * all-pairs); the sweep itself is four conditional sums in a
    * single aggregate. Mean similarity is Σj/n with Σj an exact sum
    * of bit-portable per-pair doubles, round(6)-absorbed because the
    * reduce order is partition-dependent. */
  def dedupSweep(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.jaccardFromOverlap(ShingleStage.overlap3(s, dir), 0.2)
    val cuts = Seq(0.2, 0.4, 0.6, 0.8)
    pairs.agg(
        sum((col("jaccard") >= cuts.head).cast("long")).as(s"n_ge_20"),
        cuts.tail.flatMap(c => Seq(
          sum((col("jaccard") >= c).cast("long"))
            .as(s"n_ge_${(c * 100).toInt}"))) :+
          round(sum(col("jaccard")) / count(lit(1)), 6).as("mean_jaccard"): _*)
  }

  val dedupSweepSql: String =
    s"""$shingleCte,
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2),
      |p AS (SELECT CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
      |      FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
      |      WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= 0.2)
      |SELECT
      |  CAST(sum(CASE WHEN jaccard >= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_20,
      |  CAST(sum(CASE WHEN jaccard >= 0.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_40,
      |  CAST(sum(CASE WHEN jaccard >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_60,
      |  CAST(sum(CASE WHEN jaccard >= 0.8 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_80,
      |  round(sum(jaccard) / count(*), 6) AS mean_jaccard
      |FROM p""".stripMargin

  /** L2b — SimHash near-dup candidates (32-bit signature, pigeonhole
    * byte bands, Hamming ≤ 3). Signatures come from the narrow-map
    * custom expression (one pass per document, no token shuffle); the
    * aggregate formulation stays available as Dedup.simhash and is
    * asserted bit-identical in DedupSpec. */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidates(Dedup.simhashNarrow(Tables.documents(s, dir), 32), 3)
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val dedupSimhashSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |th AS (SELECT doc_id,
      |         CAST(concat('0x', substring(md5(tok), 1, 8)) AS BIGINT) AS h32
      |       FROM toks WHERE tok <> ''),
      |tj AS (SELECT doc_id, j, ((h32 >> CAST(j AS INT)) & 1) * 2 - 1 AS sgn
      |       FROM th, (SELECT unnest(range(0, 32)) AS j)),
      |votes AS (SELECT doc_id, j, sum(sgn) AS vote FROM tj GROUP BY doc_id, j),
      |sig AS (SELECT doc_id,
      |          CAST(sum(CASE WHEN vote > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
      |        FROM votes GROUP BY doc_id),
      |banded AS (SELECT doc_id, simhash, b, (simhash >> CAST(b * 8 AS INT)) & 255 AS band_val
      |           FROM sig, (SELECT unnest(range(0, 4)) AS b))
      |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
      |FROM banded a JOIN banded b
      |  ON a.b = b.b AND a.band_val = b.band_val AND a.doc_id < b.doc_id
      |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
      |  AND (a.b <= 0 OR ((a.simhash >> 0) & 255) != ((b.simhash >> 0) & 255))
      |  AND (a.b <= 1 OR ((a.simhash >> 8) & 255) != ((b.simhash >> 8) & 255))
      |  AND (a.b <= 2 OR ((a.simhash >> 16) & 255) != ((b.simhash >> 16) & 255))
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** L2c — exact n-gram Jaccard similarity over colliding pairs. */
  def dedupNgram(s: SparkSession, dir: String): DataFrame =
    Dedup.jaccardFromOverlap(ShingleStage.overlap3(s, dir), 0.2)
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val dedupNgramSql: String =
    s"""$shingleCte,
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT da AS doc_id_a, db AS doc_id_b,
      |  CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
      |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= 0.2
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** L2d — embedding-cosine near-dup pairs, blocked by label. */
  def dedupEmbCos(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingCosinePairs(Tables.embeddings(s, dir), col("label"), 0.4)
      .orderBy(col("vec_id_a"), col("vec_id_b"))

  val dedupEmbCosSql: String =
    """WITH v AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |               CAST(embedding AS DOUBLE[]))) AS nrm
      |           FROM embeddings)
      |SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
      |  list_dot_product(a.e, b.e) / (a.nrm * b.nrm) AS cosine
      |FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_dot_product(a.e, b.e) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY vec_id_a, vec_id_b""".stripMargin

  /** L2e — duplicate clusters: connected components over strong
    * (jaccard ≥ 0.6) near-dup pairs, min-id representative, keep flag.
    * The engine runs min-propagation to a run-time-checked fixpoint
    * (Dedup.dedupClusters); the oracle unrolls 8 rounds — propagation
    * is idempotent past the fixpoint, so any convergence depth ≤ 8
    * yields the identical labeling, and ClusterSpec asserts the
    * fixture converges well inside that. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupClusters(
        Dedup.jaccardFromOverlap(ShingleStage.overlap3(s, dir), 0.6)
          .select(col("doc_id_a"), col("doc_id_b")))
      .orderBy(col("doc_id"))

  /** L2q — the same clustering through the contraction algorithm
    * (alternating large-star/small-star, Dedup.dedupClustersStar):
    * O(log²) rounds on ANY graph shape vs label propagation's
    * O(diameter) — the escalation path for pathological near-dup
    * chains. Identical labeling (min-id per component), so it shares
    * q_dedup_clusters' oracle verbatim. */
  def dedupClustersStar(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupClustersStar(
        Dedup.jaccardFromOverlap(ShingleStage.overlap3(s, dir), 0.6)
          .select(col("doc_id_a"), col("doc_id_b")))
      .orderBy(col("doc_id"))

  val dedupClustersSql: String =
    // Mirrors the engine exactly: self-loops fold "keep your own
    // label" into the per-round min(), so each round is one
    // join+group-by over the static edge relation.
    s"""$shingleCte,
      |${strongPairsCte()},
      |${ccUnroll()}
      |SELECT node AS doc_id, label AS cluster_id, node = label AS keep
      |FROM l8 ORDER BY doc_id""".stripMargin

  /** L6 — the end-to-end curation composition a training-data pipeline
    * runs: quality gates (length, lexical diversity) + exact-dup drop
    * (keep the smallest doc_id per identical text), emitting the
    * surviving documents with their quality signals. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("text")).orderBy(col("doc_id"))
    docs
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1) // exact-dup drop, deterministic survivor
      .withColumn("wrds", split(col("text"), " "))
      .withColumn("n_words", size(col("wrds")))
      .withColumn("uniq_ratio",
        size(array_distinct(col("wrds"))).cast("double") / size(col("wrds")))
      .filter(col("n_words") >= 10 && col("uniq_ratio") > 0.3)
      .select(col("doc_id"), col("lang"), col("n_words"), col("uniq_ratio"))
      .orderBy(col("doc_id"))
  }

  val curationPipelineSql: String =
    """SELECT doc_id, lang, n_words, uniq_ratio FROM (
      |  SELECT doc_id, lang,
      |    CAST(len(w) AS INT) AS n_words,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio
      |  FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS w
      |        FROM documents d
      |        WHERE NOT EXISTS (SELECT 1 FROM documents d2
      |          WHERE d2.text = d.text AND d2.doc_id < d.doc_id)))
      |WHERE n_words >= 10 AND uniq_ratio > 0.3
      |ORDER BY doc_id""".stripMargin

  /** L4e — PII-style scrubbing: mask digit runs and long tokens via
    * regexp_replace (identical basic-regex semantics on both engines). */
  def textScrub(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        regexp_replace(col("text"), "[0-9]+", "#NUM").as("scrubbed"),
        regexp_replace(col("text"), "[a-z]{9,}", "#LONG").as("shortened"))
      .orderBy(col("doc_id"))

  val textScrubSql: String =
    """SELECT doc_id,
      |  regexp_replace(text, '[0-9]+', '#NUM', 'g') AS scrubbed,
      |  regexp_replace(text, '[a-z]{9,}', '#LONG', 'g') AS shortened
      |FROM documents ORDER BY doc_id""".stripMargin

  /** L4f — token normalization: drop stopwords, keep order, re-join. */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .select(
        col("doc_id"),
        expr("array_join(filter(w, x -> x NOT IN ('the','a','of','to','and','in') AND x <> ''), ' ')")
          .as("no_stop"),
        expr("size(filter(w, x -> x IN ('the','a','of','to','and','in')))")
          .as("n_removed"))
      .orderBy(col("doc_id"))

  val textNormalizeSql: String =
    """SELECT doc_id,
      |  array_to_string(list_filter(w, x -> x NOT IN ('the','a','of','to','and','in') AND x <> ''), ' ') AS no_stop,
      |  CAST(len(list_filter(w, x -> x IN ('the','a','of','to','and','in'))) AS INT) AS n_removed
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** L4g — bigram frequency (n-gram language-model counts). */
  def bigramFreq(s: SparkSession, dir: String): DataFrame =
    Dedup.shingles(Tables.documents(s, dir).select(col("doc_id"), col("text")), 2)
      .groupBy(col("shingle").as("bigram"))
      .agg(count(lit(1)).as("doc_freq"))
      .filter(col("doc_freq") > 10)
      .orderBy(col("bigram"))

  val bigramFreqSql: String =
    """SELECT shingle AS bigram, CAST(count(*) AS BIGINT) AS doc_freq
      |FROM (SELECT DISTINCT doc_id,
      |        unnest(list_transform(range(1, len(w)),
      |          i -> concat_ws(' ', w[i], w[i+1]))) AS shingle
      |      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |      WHERE len(w) >= 2)
      |GROUP BY shingle HAVING count(*) > 10
      |ORDER BY bigram""".stripMargin

  /** L3 — brute-force cosine top-5 for a bounded probe set. */
  def simTopK(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb, 5)
      .orderBy(col("probe_id"), col("rnk"))
  }

  val simTopKSql: String =
    """WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |               CAST(embedding AS DOUBLE[]))) AS nrm
      |           FROM embeddings),
      |scored AS (SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id,
      |             list_dot_product(p.e, c.e) / (p.nrm * c.nrm) AS cosine
      |           FROM n p JOIN n c ON p.vec_id < 20 AND p.vec_id <> c.vec_id)
      |SELECT probe_id, CAST(rnk AS INT) AS rnk, neighbor_id, cosine FROM (
      |  SELECT *, row_number() OVER (PARTITION BY probe_id
      |    ORDER BY cosine DESC, neighbor_id) AS rnk
      |  FROM scored WHERE NOT isnan(cosine))
      |WHERE rnk <= 5 ORDER BY probe_id, rnk""".stripMargin

  /** L4a — quality scoring. */
  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val textQualitySql: String =
    """SELECT doc_id,
      |  CAST(len(w) AS INT) AS n_words,
      |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(w) AS avg_word_len,
      |  CAST(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'to', 'and', 'in'))) AS DOUBLE)
      |    / len(w) AS stop_ratio,
      |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS uniq_ratio
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** L4b — heuristic language ID. */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val textLangIdSql: String =
    """SELECT doc_id,
      |  CAST(len(list_filter(w, x -> x IN ('the', 'and', 'of'))) AS INT) AS s_en,
      |  CAST(len(list_filter(w, x -> x IN ('der', 'die', 'und'))) AS INT) AS s_de,
      |  CAST(len(list_filter(w, x -> x IN ('el', 'los', 'que'))) AS INT) AS s_es,
      |  CAST(len(list_filter(w, x -> x IN ('le', 'les', 'et'))) AS INT) AS s_fr,
      |  CASE
      |    WHEN len(list_filter(w, x -> x IN ('the', 'and', 'of'))) >=
      |      greatest(len(list_filter(w, x -> x IN ('der', 'die', 'und'))),
      |               len(list_filter(w, x -> x IN ('el', 'los', 'que'))),
      |               len(list_filter(w, x -> x IN ('le', 'les', 'et')))) THEN 'en'
      |    WHEN len(list_filter(w, x -> x IN ('der', 'die', 'und'))) >=
      |      greatest(len(list_filter(w, x -> x IN ('el', 'los', 'que'))),
      |               len(list_filter(w, x -> x IN ('le', 'les', 'et')))) THEN 'de'
      |    WHEN len(list_filter(w, x -> x IN ('el', 'los', 'que'))) >=
      |      len(list_filter(w, x -> x IN ('le', 'les', 'et'))) THEN 'es'
      |    ELSE 'fr' END AS pred_lang
      |FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      |ORDER BY doc_id""".stripMargin

  /** L4c — token counting (whitespace, regex, chars/4 estimate). */
  def tokenCount(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenCounts(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val tokenCountSql: String =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS INT) AS n_re_tokens,
      |  CAST(ceil(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens
      |FROM documents ORDER BY doc_id""".stripMargin

  /** L4d — document fingerprinting (portable md5 + 60-bit prefix). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(Tables.documents(s, dir)).orderBy(col("doc_id"))

  val fingerprintSql: String =
    """SELECT doc_id, md5(text) AS fp_md5,
      |  CAST(concat('0x', substring(md5(text), 1, 15)) AS BIGINT) AS fp60,
      |  CAST(length(text) AS BIGINT) AS n_chars_actual
      |FROM documents ORDER BY doc_id""".stripMargin

  /** L5 — multimodal binary-column plumbing: the text bytes stand in
    * for an opaque media payload (no image/audio libs in this
    * environment); the engine-side schema/UDF pipeline for real decode
    * is in graft.operators.Multimodal (ScalaTest-exercised). */
  def multimodalMeta(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("payload", col("text").cast("binary"))
      .select(
        col("doc_id"),
        expr("octet_length(payload)").cast("int").as("n_bytes"),
        substring(base64(col("payload")), 1, 32).as("b64_prefix"),
        md5(col("text")).as("payload_md5"))
      .orderBy(col("doc_id"))

  val multimodalMetaSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |  substring(base64(encode(text)), 1, 32) AS b64_prefix,
      |  md5(text) AS payload_md5
      |FROM documents ORDER BY doc_id""".stripMargin

  /** BM25 retrieval scoring — the lexical ranker every RAG/eval
    * pipeline runs next to the vector index. Inputs are exact
    * integers (tf, dl, df, N, Σdl); the score is one fixed IEEE chain
    * per (doc, term) — idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)),
    * k1=1.2, b=0.75 — written identically on both engines, so raw
    * doubles hash-match. PER-TERM rows are emitted (the per-cell
    * convention): the query-level sum is the consumer's tiny exact
    * reduce, not an order-dependent float total here. Scale shape:
    * the probe term set is bounded (it is a QUERY), so per-doc tf for
    * each probe term and the doc length are all NARROW array
    * expressions over one corpus scan — no token explode, no
    * (doc, term) shuffle; the only aggregates are the one-row corpus
    * stats and the per-term df, both broadcast back. (A standing
    * inverted index for unbounded query load is the q_tfidf /
    * q_lexical_cosine shape; scoring one query against the corpus is
    * exactly this scan.) */
  def bm25(s: SparkSession, dir: String): DataFrame = {
    val terms = Seq("join", "hash", "vector")
    val perDoc = Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id") +: split(col("text"), " ").as("w") +: Nil: _*)
      .select(col("doc_id") +:
        size(filter(col("w"), x => x =!= "")).cast("bigint").as("dl") +:
        terms.map(t =>
          size(filter(col("w"), x => x === t)).cast("bigint").as(s"tf_$t")): _*)
      .persistScoped() // stats + df + the scored rows all read this one pass
    // n counts docs with >= 1 non-empty token, exactly like the
    // oracle's dl CTE (a token-free doc contributes no dl row there).
    val stats = perDoc.filter(col("dl") > 0)
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("sumdl"))
    val tf = perDoc.select(col("doc_id"), col("dl"),
        explode(map(terms.flatMap(t => Seq(lit(t), col(s"tf_$t"))): _*))
          .as(Seq("term", "tf")))
      .filter(col("tf") > 0)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val D = (c: Column) => c.cast("double")
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("dl"),
        (log((D(col("n")) - D(col("df")) + lit(0.5)) / (D(col("df")) + lit(0.5))
            + lit(1.0)) *
          (D(col("tf")) * lit(2.2)) /
          (D(col("tf")) + lit(1.2) * (lit(0.25) + lit(0.75) *
            (D(col("dl")) / (D(col("sumdl")) / D(col("n"))))))).as("bm25"))
      .orderBy(col("term"), col("doc_id"))
  }

  val bm25Sql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |              FROM documents),
      |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |       WHERE term IN ('join', 'hash', 'vector') GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
      |SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
      |  CAST(dl.dl AS BIGINT) AS dl,
      |  ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
      |       (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |    (CAST(tf.tf AS DOUBLE) * 2.2) /
      |    (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |      (CAST(dl.dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
      |    AS bm25
      |FROM tf JOIN dl ON tf.doc_id = dl.doc_id
      |JOIN df ON tf.term = df.term, stats
      |ORDER BY tf.term, tf.doc_id""".stripMargin

  /** L16 — vocabulary coverage curve: how many distinct terms (taken
    * most-frequent-first) cover 50/90/99% of the corpus token mass —
    * the metric a tokenizer/vocab designer reads before fixing a vocab
    * size. The cumulative-from-the-top rank uses the same scale-safe
    * two-pass prefix sum as q_abc_class (the vocabulary grows with the
    * corpus — no single-partition window); coverage thresholds are
    * INTEGER comparisons (before·100 < pct·total), so membership is
    * bit-portable. */
  def vocabCoverage(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = Tables.widen(Tables.documents(s, dir))
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .persistScoped()
    val parts = cnt
      .repartitionByRange(Tables.shuffleWidth(s), col("cnt").desc, col("term"))
      .withColumn("pid", spark_partition_id())
      .persistScoped()
    val offsets = parts.groupBy(col("pid")).agg(sum(col("cnt")).as("c"))
      .withColumn("off", sum(col("c")).over(Window.orderBy(col("pid"))) - col("c"))
      .select(col("pid"), col("off"))
    val total = parts.agg(sum(col("cnt")).as("total"))
    val localW = Window.partitionBy(col("pid"))
      .orderBy(col("cnt").desc, col("term"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = parts
      .withColumn("cum_local", sum(col("cnt")).over(localW))
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("before", col("off") + col("cum_local") - col("cnt"))
      .crossJoin(broadcast(total))
    val pcts = Seq(50, 90, 99)
    cum.agg(count(lit(1)).as("n_vocab"),
        max(col("total")).as("total_tokens") +:
        pcts.map(p =>
          sum((col("before") * 100 < lit(p) * col("total")).cast("long"))
            .as(s"n_terms_p$p")): _*)
      .select(col("n_vocab") +: col("total_tokens") +:
        pcts.map(p => col(s"n_terms_p$p")): _*)
  }

  val vocabCoverageSql: String =
    """WITH t AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
      |c AS (SELECT term, count(*) AS cnt FROM t WHERE term <> '' GROUP BY term),
      |cum AS (SELECT cnt,
      |          CAST(sum(cnt) OVER (ORDER BY cnt DESC, term
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt
      |            AS BIGINT) AS before,
      |          CAST(sum(cnt) OVER () AS BIGINT) AS total
      |        FROM c)
      |SELECT count(*) AS n_vocab, max(total) AS total_tokens,
      |  CAST(sum(CASE WHEN before * 100 < 50 * total THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_terms_p50,
      |  CAST(sum(CASE WHEN before * 100 < 90 * total THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_terms_p90,
      |  CAST(sum(CASE WHEN before * 100 < 99 * total THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_terms_p99
      |FROM cum""".stripMargin

  /** L17 — term burstiness (Fano factor over present-doc term counts):
    * variance-to-mean of tf across the documents CONTAINING the term —
    * spammy/boilerplate terms are over-dispersed (fano ≫ 1), content
    * words near-Poisson. All moments are exact integer sums; the Fano
    * factor (df·Σtf² − (Σtf)²)/(df·Σtf) is one int-to-double division
    * chain. Bounded to terms with df ≥ 50 so the estimate is stable. */
  def termBurstiness(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("stf"),
        sum(col("tf") * col("tf")).as("stf2"))
      .filter(col("df") >= 50)
      .select(col("term"), col("df"), col("stf"),
        ((col("df") * col("stf2") - col("stf") * col("stf")).cast("double") /
          (col("df") * col("stf")).cast("double")).as("fano"))
      .orderBy(col("term"))

  val termBurstinessSql: String =
    """WITH tf AS (SELECT doc_id, term, count(*) AS tf FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE term <> '' GROUP BY doc_id, term),
      |m AS (SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS stf,
      |        CAST(sum(tf * tf) AS BIGINT) AS stf2
      |      FROM tf GROUP BY term)
      |SELECT term, df, stf,
      |  CAST(df * stf2 - stf * stf AS DOUBLE) / CAST(df * stf AS DOUBLE) AS fano
      |FROM m WHERE df >= 50 ORDER BY term""".stripMargin

  /** L32 — span-corruption pair generation: the T5/masked-LM data-prep
    * transform that turns each document into a (corrupted input,
    * recovery target) training pair — every word masks independently
    * on an md5 coin keyed by (doc_id, 1-based position), so the SAME
    * pair regenerates on any rerun, any partitioning, any engine (the
    * determinism that makes training-data provenance auditable).
    * Pure narrow array-lambda work over one scan: one flags vector,
    * zip_with for the corrupted text, filter for the target span
    * list; no shuffle until the output sort. */
  def maskSpans(s: SparkSession, dir: String, pct: Int = 15): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), expr("filter(split(text, ' '), w -> w <> '')").as("ws"))
      // index lambda, NOT sequence(1, size(ws)): sequence runs
      // DESCENDING for an empty word array (start > stop defaults the
      // step to -1 — the same pitfall Dedup.minhashCandidates guards),
      // which would emit phantom mask flags for zero-word documents;
      // transform over ws itself is vacuously empty-safe
      .withColumn("flags", expr(
        "transform(ws, (w, i) -> " +
          "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '|', " +
          s"CAST(i + 1 AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < $pct)"))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        expr("size(filter(flags, f -> f))").as("n_masked"),
        expr("array_join(zip_with(ws, flags, (w, f) -> " +
          "CASE WHEN f THEN '_MASK_' ELSE w END), ' ')").as("input_text"),
        expr("array_join(filter(zip_with(ws, flags, (w, f) -> " +
          "CASE WHEN f THEN w END), x -> x IS NOT NULL), ' ')").as("target_text"))
      .orderBy(col("doc_id"))

  val maskSpansSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
      |  FROM documents),
      |e AS (SELECT doc_id, unnest(ws) AS w,
      |        generate_subscripts(ws, 1) AS i FROM t),
      |f AS (SELECT doc_id, w, i,
      |        CAST(concat('0x', substring(md5(concat(CAST(doc_id AS VARCHAR),
      |          '|', CAST(i AS VARCHAR))), 1, 8)) AS BIGINT) % 100 < 15 AS m
      |      FROM e)
      |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
      |  CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS INT) AS n_masked,
      |  string_agg(CASE WHEN m THEN '_MASK_' ELSE w END, ' ' ORDER BY i)
      |    AS input_text,
      |  coalesce(string_agg(CASE WHEN m THEN w END, ' ' ORDER BY i), '')
      |    AS target_text
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mask_spans" -> ((s: SparkSession, d: String) => maskSpans(s, d)),
    "q_vocab_coverage" -> (vocabCoverage _),
    "q_dedup_incremental" -> (dedupIncremental _),
    "q_dedup_sweep" -> (dedupSweep _),
    "q_term_burstiness" -> (termBurstiness _),
    "q_bm25" -> (bm25 _),
    "q_dedup_exact" -> (dedupExact _),
    "q_dedup_templates" -> (dedupTemplates _),
    "q_dedup_minhash" -> (dedupMinhash _),
    "q_dedup_simhash" -> (dedupSimhash _),
    "q_dedup_ngram" -> (dedupNgram _),
    "q_dedup_embcos" -> (dedupEmbCos _),
    "q_dedup_clusters" -> (dedupClusters _),
    "q_dedup_clusters_star" -> (dedupClustersStar _),
    "q_dedup_hops" -> (dedupHops _),
    "q_curation_pipeline" -> (curationPipeline _),
    "q_text_scrub" -> (textScrub _),
    "q_text_normalize" -> (textNormalize _),
    "q_bigram_freq" -> (bigramFreq _),
    "q_sim_topk" -> (simTopK _),
    "q_text_quality" -> (textQuality _),
    "q_text_langid" -> (textLangId _),
    "q_token_count" -> (tokenCount _),
    "q_fingerprint" -> (fingerprint _),
    "q_multimodal_meta" -> (multimodalMeta _),
  )

  val oracle: Map[String, String] = Map(
    "q_mask_spans" -> maskSpansSql,
    "q_vocab_coverage" -> vocabCoverageSql,
    "q_dedup_incremental" -> dedupIncrementalSql,
    "q_dedup_sweep" -> dedupSweepSql,
    "q_term_burstiness" -> termBurstinessSql,
    "q_bm25" -> bm25Sql,
    "q_dedup_exact" -> dedupExactSql,
    "q_dedup_templates" -> dedupTemplatesSql,
    "q_dedup_minhash" -> dedupMinhashSql,
    "q_dedup_simhash" -> dedupSimhashSql,
    "q_dedup_ngram" -> dedupNgramSql,
    "q_dedup_embcos" -> dedupEmbCosSql,
    "q_dedup_clusters" -> dedupClustersSql,
    "q_dedup_clusters_star" -> dedupClustersSql,
    "q_dedup_hops" -> dedupHopsSql,
    "q_curation_pipeline" -> curationPipelineSql,
    "q_text_scrub" -> textScrubSql,
    "q_text_normalize" -> textNormalizeSql,
    "q_bigram_freq" -> bigramFreqSql,
    "q_sim_topk" -> simTopKSql,
    "q_text_quality" -> textQualitySql,
    "q_text_langid" -> textLangIdSql,
    "q_token_count" -> tokenCountSql,
    "q_fingerprint" -> fingerprintSql,
    "q_multimodal_meta" -> multimodalMetaSql,
  )
}
