package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions
import graft.Caches.PersistScoped

/** Record-linkage and evaluation operators (round 5 extensions beyond
  * SURVEY.md §2B): sorted-neighborhood blocking, Jaro-Winkler scoring
  * (custom codegen'd expression), grouped ROC-AUC, Gini concentration,
  * period-over-period trend, lagged cross-correlation, and
  * reciprocal-rank fusion of lexical + vector retrieval. All
  * oracle-checked; numeric outputs follow the repo's exact-arithmetic
  * conventions (decimal/integer power sums, one final cast to double
  * per output — ARCHITECTURE.md "Cross-engine determinism").
  */
object Linkage {

  private val D = (c: Column) => c.cast("decimal(38,0)")

  /** Sorted-neighborhood near-dup detection — the record-linkage
    * blocking strategy that never materializes all pairs: sort each
    * block (lang, first text byte), compare every doc only to its
    * immediate 2 predecessors via lag windows, verify with an exact
    * edit distance on a fixed 48-char prefix. Pair generation is
    * LINEAR in corpus size (≤2 candidates per row) and the window is
    * keyed by block — no global sort, no quadratic join. Production
    * SNM runs several passes with different sort keys; each pass is
    * this same plan. Integer distance threshold → no float boundary
    * flips between engines. */
  def sortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    // block key as a real column (not an inline expr) so all four lags
    // share ONE window spec → one WindowExec, one shuffle; the
    // neighbor pairs then explode out of the same pass (plan-audited:
    // a two-branch union re-scans and re-sorts everything twice).
    val docs = Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), col("text"),
        substring(col("text"), 1, 48).as("pfx"),
        substring(col("text"), 1, 1).as("blk"))
    val w = Window.partitionBy(col("lang"), col("blk"))
      .orderBy(col("text"), col("doc_id"))
    docs
      .withColumn("prev_id1", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_pfx1", lag(col("pfx"), 1).over(w))
      .withColumn("prev_id2", lag(col("doc_id"), 2).over(w))
      .withColumn("prev_pfx2", lag(col("pfx"), 2).over(w))
      .select(col("lang"), col("doc_id"), col("pfx"),
        explode(array(
          struct(col("prev_id1").as("cid"), col("prev_pfx1").as("cpfx")),
          struct(col("prev_id2").as("cid"), col("prev_pfx2").as("cpfx"))))
          .as("cand"))
      .filter(col("cand.cid").isNotNull)
      .select(col("lang"), col("doc_id"), col("cand.cid").as("cand_id"),
        levenshtein(col("pfx"), col("cand.cpfx")).as("dist"))
      .filter(col("dist") <= 12)
      .orderBy(col("lang"), col("doc_id"), col("cand_id"))
  }

  val sortedNeighborhoodSql: String =
    """WITH d AS (SELECT doc_id, lang, text, substring(text, 1, 48) AS pfx
      |           FROM documents),
      |wp AS (SELECT lang, doc_id, pfx,
      |         lag(doc_id, 1) OVER w AS prev_id1, lag(pfx, 1) OVER w AS prev_pfx1,
      |         lag(doc_id, 2) OVER w AS prev_id2, lag(pfx, 2) OVER w AS prev_pfx2
      |       FROM d
      |       WINDOW w AS (PARTITION BY lang, substring(text, 1, 1)
      |                    ORDER BY text, doc_id)),
      |c AS (SELECT lang, doc_id, prev_id1 AS cand_id,
      |        levenshtein(pfx, prev_pfx1) AS dist FROM wp WHERE prev_id1 IS NOT NULL
      |      UNION ALL
      |      SELECT lang, doc_id, prev_id2,
      |        levenshtein(pfx, prev_pfx2) FROM wp WHERE prev_id2 IS NOT NULL)
      |SELECT lang, doc_id, cand_id, CAST(dist AS INT) AS dist
      |FROM c WHERE dist <= 12
      |ORDER BY lang, doc_id, cand_id""".stripMargin

  /** Jaro-Winkler scoring over blocked candidate pairs — the fuzzy
    * match scorer of classic record linkage, as a custom codegen'd
    * Catalyst expression ([[graft.functions.JaroWinklerSim]]) pinned
    * bit-for-bit to the oracle's `jaro_winkler_similarity`. Candidate
    * pairs come from the same linear sorted-neighborhood shape as
    * [[sortedNeighborhood]] (each part vs its predecessor within its
    * brand block) — the expression is the per-pair kernel; blocking
    * keeps the pair count linear at 100 TB. */
  def jaroWinklerPairs(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_name"), col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_name"))
      .withColumn("prev_key", lag(col("p_partkey"), 1).over(w))
      .withColumn("prev_name", lag(col("p_name"), 1).over(w))
      .filter(col("prev_key").isNotNull)
      .select(col("p_brand"), col("p_partkey"), col("prev_key"),
        GraftFunctions.jaroWinkler(col("p_name"), col("prev_name")).as("jw"))
      .orderBy(col("p_brand"), col("p_partkey"), col("prev_key"))
  }

  val jaroWinklerPairsSql: String =
    """WITH wp AS (SELECT p_brand, p_partkey, p_name,
      |         lag(p_partkey, 1) OVER w AS prev_key,
      |         lag(p_name, 1) OVER w AS prev_name
      |       FROM part
      |       WINDOW w AS (PARTITION BY p_brand ORDER BY p_name, p_partkey))
      |SELECT p_brand, p_partkey, prev_key,
      |  jaro_winkler_similarity(p_name, prev_name) AS jw
      |FROM wp WHERE prev_key IS NOT NULL
      |ORDER BY p_brand, p_partkey, prev_key""".stripMargin

  /** Grouped ROC-AUC via the tie-corrected Mann-Whitney statistic —
    * the ranking-quality metric every model-eval pipeline computes.
    * Scores are quantized to bounded bins (models emit bounded-
    * precision scores), so the per-group relation after the first
    * aggregate has at most #bins rows: the cumulative window runs
    * over a BOUNDED aggregate, not the fact table — the scale-safe
    * alternative to ranking 10¹¹ raw rows. Tie handling is exact:
    * with min-rank r and bin size n, twice the tied average rank is
    * the integer 2·cum − n + 1, so every sum is exact decimal/HUGEINT
    * arithmetic and the single division to double is the only
    * rounding step on either engine. */
  def aucGrouped(s: SparkSession, dir: String): DataFrame = {
    val byBin = Tables.lineitem(s, dir)
      .select(col("l_linestatus").as("grp"),
        (col("l_returnflag") === "R").cast("int").as("pos"),
        floor(col("l_extendedprice") / 1000).cast("long").as("bin"))
      .groupBy(col("grp"), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("np"))
    val w = Window.partitionBy(col("grp")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBin
      .withColumn("cumn", sum(col("n")).over(w))
      .groupBy(col("grp"))
      .agg(
        sum(D(col("np")) * (lit(2) * D(col("cumn")) - D(col("n")) + lit(1)))
          .as("two_sp"),
        sum(col("np")).as("npos"), sum(col("n")).as("ntot"))
      .filter(col("npos") > 0 && col("npos") < col("ntot"))
      .select(col("grp"), col("npos").cast("long").as("npos"),
        col("ntot").cast("long").as("ntot"),
        ((D(col("two_sp")) - D(col("npos")) * (D(col("npos")) + lit(1)))
          .cast("double") /
          (lit(2) * D(col("npos")) * (D(col("ntot")) - D(col("npos"))))
            .cast("double")).as("auc"))
      .orderBy(col("grp"))
  }

  val aucGroupedSql: String =
    """WITH base AS (SELECT l_linestatus AS grp,
      |         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos,
      |         CAST(floor(l_extendedprice / 1000) AS BIGINT) AS bin
      |       FROM lineitem),
      |bybin AS (SELECT grp, bin, count(*) AS n, sum(pos) AS np
      |          FROM base GROUP BY grp, bin),
      |cum AS (SELECT grp, n, np,
      |          sum(n) OVER (PARTITION BY grp ORDER BY bin
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumn
      |        FROM bybin),
      |agg AS (SELECT grp, sum(np * (2 * cumn - n + 1)) AS two_sp,
      |          sum(np) AS npos, sum(n) AS ntot FROM cum GROUP BY grp)
      |SELECT grp, CAST(npos AS BIGINT) AS npos, CAST(ntot AS BIGINT) AS ntot,
      |  CAST(two_sp - npos * (npos + 1) AS DOUBLE) /
      |    CAST(2 * npos * (ntot - npos) AS DOUBLE) AS auc
      |FROM agg WHERE npos > 0 AND npos < ntot
      |ORDER BY grp""".stripMargin

  /** Per-nation Gini concentration of customer balances — the
    * inequality/concentration audit (revenue concentration, data-
    * source dominance). Sorted-rank formula G = (2·Σi·xᵢ − (n+1)·Σxᵢ)
    * / (n·Σxᵢ) over cents (exact integers); permuting tied values
    * cannot change Σi·xᵢ, so row_number's arbitrary-looking tie order
    * is value-deterministic. The rank window is keyed by nation; the
    * exact per-key sort is the same family as q_percentile_disc, with
    * the same documented scale path (range-partitioned two-pass
    * ranks) when one key outgrows a task. */
  def giniBalance(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .filter(col("c_acctbal") >= 0)
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(12,2)") * 100)
          .cast("decimal(38,0)").as("cents"),
        col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cents"), col("c_custkey"))
    base
      .withColumn("i", row_number().over(w).cast("decimal(38,0)"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"),
        sum(col("i") * col("cents")).as("six"))
      .filter(col("sx") > 0)
      .select(col("c_nationkey"), col("n"),
        ((lit(2) * D(col("six")) - (D(col("n")) + lit(1)) * D(col("sx")))
          .cast("double") /
          (D(col("n")) * D(col("sx"))).cast("double")).as("gini"))
      .orderBy(col("c_nationkey"))
  }

  /** W62 — Theil T inequality index: per nation, the entropy-based
    * concentration of positive account balances — Gini's (W17)
    * decomposable companion (Theil is the inequality measure that
    * splits exactly into within-group + between-group parts, which
    * Gini cannot). T = Σᵢ (xᵢ/S)·ln(n·xᵢ/S) with S the group sum. No
    * sort is needed (unlike Gini's rank construction): one keyed
    * aggregate builds the bounded (nation, n, S) table, which
    * broadcasts back onto the rows; each row's transcendental term is
    * quantized to integer nano-units (floor(term·1e9)) before the
    * sum, so the aggregate is ORDER-FREE exact integer addition — the
    * same engine-portability convention as the KL/entropy family
    * (double summation order would otherwise differ per partitioning).
    * One fact scan at any scale. */
  def theilIndex(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 0)
      .select(col("c_nationkey"),
        (col("c_acctbal").cast("decimal(12,2)") * 100)
          .cast("bigint").as("cents"))
      .persistScoped() // group-total build + term pass both read it
    val grp = base.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sx"))
    base.join(broadcast(grp), Seq("c_nationkey"))
      .select(col("c_nationkey"), col("n"), col("sx"),
        floor(
          (col("cents").cast("double") / col("sx").cast("double")) *
            log(col("n").cast("double") * col("cents").cast("double") /
              col("sx").cast("double")) * lit(1e9)).cast("long").as("tq"))
      .groupBy(col("c_nationkey"), col("n"), col("sx"))
      .agg(sum(col("tq")).as("tqs"))
      .select(col("c_nationkey"), col("n").cast("long").as("n"),
        (col("sx").cast("double") / 100).as("total_balance"),
        (col("tqs").cast("double") / lit(1e9)).as("theil"))
      .orderBy(col("c_nationkey"))
  }

  val theilIndexSql: String =
    """WITH base AS (SELECT c_nationkey,
      |    CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
      |  FROM customer WHERE c_acctbal > 0),
      |g AS (SELECT c_nationkey, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sx
      |      FROM base GROUP BY c_nationkey),
      |t AS (SELECT base.c_nationkey, g.n, g.sx,
      |        CAST(floor((CAST(cents AS DOUBLE) / CAST(sx AS DOUBLE)) *
      |          ln(CAST(n AS DOUBLE) * CAST(cents AS DOUBLE)
      |             / CAST(sx AS DOUBLE)) * 1e9) AS BIGINT) AS tq
      |      FROM base JOIN g USING (c_nationkey))
      |SELECT c_nationkey, CAST(n AS BIGINT) AS n,
      |  CAST(sx AS DOUBLE) / 100 AS total_balance,
      |  CAST(CAST(sum(tq) AS BIGINT) AS DOUBLE) / 1e9 AS theil
      |FROM t GROUP BY c_nationkey, n, sx ORDER BY c_nationkey""".stripMargin

  val giniBalanceSql: String =
    """WITH base AS (SELECT c_nationkey,
      |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
      |         c_custkey
      |       FROM customer WHERE c_acctbal >= 0),
      |r AS (SELECT c_nationkey, cents,
      |        row_number() OVER (PARTITION BY c_nationkey
      |          ORDER BY cents, c_custkey) AS i
      |      FROM base),
      |agg AS (SELECT c_nationkey, count(*) AS n, sum(cents) AS sx,
      |          sum(i * cents) AS six FROM r GROUP BY c_nationkey)
      |SELECT c_nationkey, CAST(n AS BIGINT) AS n,
      |  CAST(2 * six - (n + 1) * sx AS DOUBLE) /
      |    CAST(n * sx AS DOUBLE) AS gini
      |FROM agg WHERE sx > 0
      |ORDER BY c_nationkey""".stripMargin

  /** Period-over-period trend — monthly revenue with month-over-month
    * and year-over-year deltas. The lag window is global BUT its
    * input is the monthly aggregate: #distinct-months rows (a few
    * hundred for decades of data), a deliberately bounded relation —
    * the aggregate-then-window shape that keeps "global" windows
    * driver-sized at any fact-table scale. Revenue stays in exact
    * cents; the pct-change division is the one float op. */
  def periodOverPeriod(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(38,0)")).as("cents"),
        count(lit(1)).as("n_orders"))
    val w = Window.orderBy(col("yr"), col("mo"))
    monthly
      .withColumn("prev_mom", lag(col("cents"), 1).over(w))
      .withColumn("prev_yoy", lag(col("cents"), 12).over(w))
      .select(col("yr"), col("mo"), col("cents").cast("long").as("rev_cents"),
        col("n_orders"),
        ((D(col("cents")) - D(col("prev_mom"))).cast("double") /
          D(col("prev_mom")).cast("double")).as("mom_pct"),
        ((D(col("cents")) - D(col("prev_yoy"))).cast("double") /
          D(col("prev_yoy")).cast("double")).as("yoy_pct"))
      .orderBy(col("yr"), col("mo"))
  }

  val periodOverPeriodSql: String =
    """WITH m AS (SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |           AS cents,
      |         count(*) AS n_orders
      |       FROM orders GROUP BY 1, 2),
      |l AS (SELECT yr, mo, cents, n_orders,
      |        lag(cents, 1) OVER (ORDER BY yr, mo) AS prev_mom,
      |        lag(cents, 12) OVER (ORDER BY yr, mo) AS prev_yoy
      |      FROM m)
      |SELECT CAST(yr AS BIGINT) AS yr, CAST(mo AS BIGINT) AS mo,
      |  CAST(cents AS BIGINT) AS rev_cents, CAST(n_orders AS BIGINT) AS n_orders,
      |  CAST(cents - prev_mom AS DOUBLE) / CAST(prev_mom AS DOUBLE) AS mom_pct,
      |  CAST(cents - prev_yoy AS DOUBLE) / CAST(prev_yoy AS DOUBLE) AS yoy_pct
      |FROM l ORDER BY yr, mo""".stripMargin

  /** Lagged cross-correlation between two daily series (order count
    * vs revenue, lags 0..6) — the lead/lag detector between KPI
    * streams. Both series are per-day aggregates, so the lag join and
    * the per-lag Pearson run over #days rows — post-aggregate tiny at
    * any scale. All power sums exact (decimal/HUGEINT); each output
    * is numerator/denominator with one cast to double each, the
    * q_rank_corr convention. */
  def crossCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .select(expr("unix_timestamp(o_orderdate) div 86400").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("decimal(38,0)").as("cents"))
      .groupBy(col("d"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("x"), sum(col("cents")).as("y"))
    val lags = s.range(0, 7).select(col("id").as("lagd"))
    val a = daily.select(col("d").as("ad"), col("x").as("xa"))
    val b = daily.select(col("d").as("bd"), col("y").as("yb"))
    a.crossJoin(broadcast(lags))
      .join(b, col("bd") === col("ad") + col("lagd"))
      .groupBy(col("lagd"))
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sx"), sum(col("yb")).as("sy"),
        sum(col("xa") * col("yb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("yb") * col("yb")).as("syy"))
      .select(col("lagd"), col("n"),
        ((D(col("n")) * D(col("sxy")) - D(col("sx")) * D(col("sy"))).cast("double") /
          (sqrt((D(col("n")) * D(col("sxx")) - D(col("sx")) * D(col("sx"))).cast("double")) *
            sqrt((D(col("n")) * D(col("syy")) - D(col("sy")) * D(col("sy"))).cast("double"))))
          .as("xcorr"))
      .orderBy(col("lagd"))
  }

  val crossCorrSql: String =
    """WITH daily AS (SELECT CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400 AS d,
      |         count(*) AS x,
      |         sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS y
      |       FROM orders GROUP BY 1),
      |p AS (SELECT l.lagd, a.x AS xa, b.y AS yb
      |      FROM range(0, 7) l(lagd)
      |      CROSS JOIN daily a
      |      JOIN daily b ON b.d = a.d + l.lagd),
      |agg AS (SELECT lagd, count(*) AS n, sum(xa) AS sx, sum(yb) AS sy,
      |          sum(xa * yb) AS sxy, sum(xa * xa) AS sxx, sum(yb * yb) AS syy
      |        FROM p GROUP BY lagd)
      |SELECT CAST(lagd AS BIGINT) AS lagd, CAST(n AS BIGINT) AS n,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS xcorr
      |FROM agg ORDER BY lagd""".stripMargin

  /** Reciprocal-rank fusion of lexical (BM25) and vector (cosine)
    * retrieval — the hybrid-search merge every RAG stack runs. The
    * candidate set is docs∩vectors for one query; both rankings are
    * computed over that same bounded candidate relation (top-k
    * retrieval output, not the corpus), so the rank windows are
    * driver-sized. BM25 per-term scores land in FIXED columns and sum
    * in fixed textual order (no order-dependent float reduce); ranks
    * are integers; RRF = 1/(60+r₁) + 1/(60+r₂) is a two-term IEEE
    * chain written identically on both engines. */
  def rrfFusion(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.widen(Tables.documents(s, dir))
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    // ONE corpus pass: per-doc length and the three query-term tfs come
    // out of the same aggregate, and corpus stats (n, avgdl, per-term
    // df) out of one tiny aggregate over its cached result. The earlier
    // long-form tf/dl/df/stats chain re-executed the corpus explode
    // four times because each relation re-ran the unpersisted lineage.
    // Per-term score arithmetic is the identical IEEE chain as before
    // (one sc term per (doc, term), summed join+hash+vector), so ranks
    // and the oracle hash are unchanged.
    val perDoc = toks.groupBy(col("doc_id")).agg(
        count(lit(1)).as("dl"),
        sum(when(col("term") === "join", 1L)).as("tf_join"),
        sum(when(col("term") === "hash", 1L)).as("tf_hash"),
        sum(when(col("term") === "vector", 1L)).as("tf_vector"))
      .persistScoped()
    val stats = perDoc.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sumdl"),
      count(col("tf_join")).as("df_join"),
      count(col("tf_hash")).as("df_hash"),
      count(col("tf_vector")).as("df_vector"))
    val Dd = (c: Column) => c.cast("double")
    def sc(tf: Column, df: Column): Column =
      when(tf.isNull, lit(0.0)).otherwise(
        log((Dd(col("n")) - Dd(df) + lit(0.5)) / (Dd(df) + lit(0.5))
            + lit(1.0)) *
          (Dd(tf) * lit(2.2)) /
          (Dd(tf) + lit(1.2) * (lit(0.25) + lit(0.75) *
            (Dd(col("dl")) / (Dd(col("sumdl")) / Dd(col("n")))))))
    val lex = perDoc
      .filter(col("tf_join").isNotNull || col("tf_hash").isNotNull ||
        col("tf_vector").isNotNull)
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        (sc(col("tf_join"), col("df_join")) + sc(col("tf_hash"), col("df_hash")) +
          sc(col("tf_vector"), col("df_vector"))).as("bm25"))
    val emb = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"))
    val probe = broadcast(emb.filter(col("vec_id") === 0)
      .select(col("embedding").as("pe")))
    val vec = emb.crossJoin(probe)
      .select(col("vec_id").as("doc_id"),
        (GraftFunctions.dotF32(col("embedding"), col("pe")) /
          (sqrt(GraftFunctions.dotF32(col("embedding"), col("embedding"))) *
            sqrt(GraftFunctions.dotF32(col("pe"), col("pe"))))).as("cosine"))
    val cand = lex.join(vec, Seq("doc_id"))
    val rLex = rank().over(Window.orderBy(col("bm25").desc, col("doc_id")))
    val rVec = rank().over(Window.orderBy(col("cosine").desc, col("doc_id")))
    cand
      .withColumn("r_lex", rLex.cast("long"))
      .withColumn("r_vec", rVec.cast("long"))
      .select(col("doc_id"), col("r_lex"), col("r_vec"),
        (lit(1.0) / (lit(60.0) + col("r_lex").cast("double")) +
          lit(1.0) / (lit(60.0) + col("r_vec").cast("double"))).as("rrf"))
      .filter(col("r_lex") <= 50 || col("r_vec") <= 50)
      .orderBy(col("doc_id"))
  }

  val rrfFusionSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |              FROM documents),
      |t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
      |dl AS (SELECT doc_id, count(*) AS dl FROM t GROUP BY doc_id),
      |stats AS (SELECT CAST(count(*) AS BIGINT) AS n,
      |            CAST(sum(dl) AS BIGINT) AS sumdl FROM dl),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM t
      |       WHERE term IN ('join', 'hash', 'vector') GROUP BY doc_id, term),
      |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      |cell AS (SELECT tf.doc_id, tf.term,
      |    ln((CAST(n AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
      |         (CAST(df AS DOUBLE) + 0.5) + 1.0) *
      |      (CAST(tf.tf AS DOUBLE) * 2.2) /
      |      (CAST(tf.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(dl.dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE)))))
      |      AS sc
      |    FROM tf JOIN dl ON tf.doc_id = dl.doc_id
      |    JOIN df ON tf.term = df.term, stats),
      |lex AS (SELECT doc_id,
      |          coalesce(sum(CASE WHEN term = 'join' THEN sc END), 0.0) +
      |          coalesce(sum(CASE WHEN term = 'hash' THEN sc END), 0.0) +
      |          coalesce(sum(CASE WHEN term = 'vector' THEN sc END), 0.0) AS bm25
      |        FROM cell GROUP BY doc_id),
      |v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
      |        sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |          CAST(embedding AS DOUBLE[]))) AS nrm
      |      FROM embeddings),
      |vec AS (SELECT c.vec_id AS doc_id,
      |          list_dot_product(c.e, p.e) / (c.nrm * p.nrm) AS cosine
      |        FROM v c, (SELECT * FROM v WHERE vec_id = 0) p),
      |cand AS (SELECT lex.doc_id, bm25, cosine
      |         FROM lex JOIN vec ON lex.doc_id = vec.doc_id),
      |ranked AS (SELECT doc_id,
      |             rank() OVER (ORDER BY bm25 DESC, doc_id) AS r_lex,
      |             rank() OVER (ORDER BY cosine DESC, doc_id) AS r_vec
      |           FROM cand)
      |SELECT doc_id, CAST(r_lex AS BIGINT) AS r_lex, CAST(r_vec AS BIGINT) AS r_vec,
      |  1.0 / (60.0 + CAST(r_lex AS DOUBLE)) +
      |    1.0 / (60.0 + CAST(r_vec AS DOUBLE)) AS rrf
      |FROM ranked WHERE r_lex <= 50 OR r_vec <= 50
      |ORDER BY doc_id""".stripMargin

  /** W24 — calibration (reliability) table, the eval companion to
    * [[aucGrouped]] and the lift curve: rows bucket by predicted
    * score, and each bucket reports mean predicted probability vs the
    * empirical positive rate plus the calibration gap. Score proxy:
    * quantity/50 (the same proxy-label discipline as q_auc);
    * everything is exact integers until one division chain per output
    * (mean_pred = Σqty/(50n), empirical from the positive count). One
    * partial/final aggregate over the fact table — bins are bounded,
    * windows never see row volume. */
  def calibration(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(floor(col("l_quantity") / 5).cast("long").as("bin"),
        col("l_quantity").cast("bigint").as("qty"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"), sum(col("pos")).as("np"))
      .select(col("bin"), col("n"), col("np"),
        (col("sq").cast("double") / (col("n") * 50).cast("double")).as("mean_pred"),
        (col("np").cast("double") / col("n").cast("double")).as("empirical"),
        abs(col("sq").cast("double") / (col("n") * 50).cast("double") -
          col("np").cast("double") / col("n").cast("double")).as("gap"))
      .orderBy(col("bin"))

  val calibrationSql: String =
    """WITH b AS (SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bin,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      |  FROM lineitem)
      |SELECT bin, count(*) AS n, CAST(sum(pos) AS BIGINT) AS np,
      |  CAST(sum(qty) AS DOUBLE) / CAST(count(*) * 50 AS DOUBLE) AS mean_pred,
      |  CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS empirical,
      |  abs(CAST(sum(qty) AS DOUBLE) / CAST(count(*) * 50 AS DOUBLE) -
      |      CAST(sum(pos) AS DOUBLE) / CAST(count(*) AS DOUBLE)) AS gap
      |FROM b GROUP BY bin ORDER BY bin""".stripMargin

  /** L23 — end-to-end entity resolution: sorted-neighborhood BLOCKING
    * (lag-1/lag-2 candidates inside (lang, first-char) blocks — linear
    * candidate count), Jaro-Winkler SCORING on 48-char prefixes (the
    * codegen'd expression, bit-pinned to the oracle's
    * jaro_winkler_similarity), a 0.85 MATCH threshold, connected-
    * components CLUSTERING to the checked fixpoint, and the CANONICAL
    * entity table (min-id entity, member count) — the full
    * record-linkage pipeline as ONE query, every stage scale-safe
    * (blocked window, no all-pairs, one exchange per CC round).
    * Lag-pairs are unique by construction (the later row in sort
    * order emits), so no distinct shuffle anywhere before the CC. */
  def erPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), col("lang"), col("text"),
        substring(col("text"), 1, 48).as("pfx"),
        substring(col("text"), 1, 1).as("blk"))
    val w = Window.partitionBy(col("lang"), col("blk"))
      .orderBy(col("text"), col("doc_id"))
    val pairs = docs
      .withColumn("prev_id1", lag(col("doc_id"), 1).over(w))
      .withColumn("prev_pfx1", lag(col("pfx"), 1).over(w))
      .withColumn("prev_id2", lag(col("doc_id"), 2).over(w))
      .withColumn("prev_pfx2", lag(col("pfx"), 2).over(w))
      .select(col("doc_id"), col("pfx"), explode(array(
        struct(col("prev_id1").as("cid"), col("prev_pfx1").as("cpfx")),
        struct(col("prev_id2").as("cid"), col("prev_pfx2").as("cpfx")))).as("c"))
      .filter(col("c.cid").isNotNull)
      .filter(GraftFunctions.jaroWinkler(col("pfx"), col("c.cpfx")) >= 0.85)
      .select(least(col("doc_id"), col("c.cid")).as("doc_id_a"),
        greatest(col("doc_id"), col("c.cid")).as("doc_id_b"))
    graft.operators.Dedup.dedupClusters(pairs)
      .groupBy(col("cluster_id").as("entity_id"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("entity_id"))
  }

  val erPipelineSql: String = {
    s"""WITH d AS (SELECT doc_id, lang, text, substring(text, 1, 48) AS pfx
      |           FROM documents),
      |wp AS (SELECT doc_id, pfx,
      |         lag(doc_id, 1) OVER w AS prev_id1, lag(pfx, 1) OVER w AS prev_pfx1,
      |         lag(doc_id, 2) OVER w AS prev_id2, lag(pfx, 2) OVER w AS prev_pfx2
      |       FROM d
      |       WINDOW w AS (PARTITION BY lang, substring(text, 1, 1)
      |                    ORDER BY text, doc_id)),
      |c AS (SELECT doc_id, prev_id1 AS cand_id, pfx, prev_pfx1 AS cpfx
      |      FROM wp WHERE prev_id1 IS NOT NULL
      |      UNION ALL
      |      SELECT doc_id, prev_id2, pfx, prev_pfx2
      |      FROM wp WHERE prev_id2 IS NOT NULL),
      |pairs AS (SELECT least(doc_id, cand_id) AS da,
      |            greatest(doc_id, cand_id) AS db
      |          FROM c WHERE jaro_winkler_similarity(pfx, cpfx) >= 0.85),
      |${Llm.ccUnroll()}
      |SELECT label AS entity_id, count(*) AS n_members
      |FROM l8 GROUP BY label ORDER BY entity_id""".stripMargin
  }

  /** W39 — Brier score + Murphy decomposition: the scalar companion
    * of W24's reliability TABLE. Same forecast construction (p =
    * qty/50, outcome = returned): the raw Brier sum is EXACT integer
    * arithmetic (Σ(qty − 50·pos)² / 2500N — p is a /50 rational, so
    * no float accumulates); reliability Σn_k(p̄_k−ō_k)²/N and
    * resolution Σn_k(ō_k−ō)²/N come from per-bin contributions
    * computed as fixed IEEE chains over exact integer aggregates,
    * 1e-6-quantized and integer-summed (order-free across the bounded
    * bin relation); uncertainty = ō(1−ō). The decomposition identity
    * rel − res + unc reconstructs the BINNED Brier (bin-averaged
    * forecast), reported alongside the raw score. */
  def brier(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(s, dir)
      .select(floor(col("l_quantity") / 5).cast("long").as("bin"),
        col("l_quantity").cast("bigint").as("qty"),
        (col("l_returnflag") === "R").cast("long").as("pos"))
      .persistScoped() // totals + per-bin passes
    val tot = base.agg(count(lit(1)).as("n_all"), sum(col("pos")).as("np_all"),
      sum((col("qty") - col("pos") * 50) * (col("qty") - col("pos") * 50))
        .as("sq_err"))
    val bins = base.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("qty")).as("sq"),
        sum(col("pos")).as("np"))
    val contrib = bins.crossJoin(broadcast(tot))
      .select(
        expr("CAST(floor((CAST(sq - 50 * np AS DOUBLE) * " +
          "CAST(sq - 50 * np AS DOUBLE) / n / 2500) * 1e6) AS BIGINT)")
          .as("rel_q"),
        expr("CAST(floor(n * (CAST(np AS DOUBLE) / n - " +
          "CAST(np_all AS DOUBLE) / n_all) * (CAST(np AS DOUBLE) / n - " +
          "CAST(np_all AS DOUBLE) / n_all) * 1e6) AS BIGINT)").as("res_q"))
      .agg(sum(col("rel_q")).as("rel_q"), sum(col("res_q")).as("res_q"))
    contrib.crossJoin(broadcast(tot))
      .select(col("n_all").as("n"),
        (col("sq_err").cast("double") / (col("n_all") * 2500)).as("brier_raw"),
        (col("rel_q").cast("double") / 1e6 / col("n_all")).as("reliability"),
        (col("res_q").cast("double") / 1e6 / col("n_all")).as("resolution"),
        ((col("np_all").cast("double") / col("n_all"))
          * (lit(1.0) - col("np_all").cast("double") / col("n_all")))
          .as("uncertainty"))
      .withColumn("brier_binned",
        col("reliability") - col("resolution") + col("uncertainty"))
  }

  val brierSql: String =
    """WITH b AS (SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bin,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS pos
      |  FROM lineitem),
      |t AS (SELECT count(*) AS n_all, CAST(sum(pos) AS BIGINT) AS np_all,
      |        CAST(sum((qty - pos * 50) * (qty - pos * 50)) AS BIGINT)
      |          AS sq_err
      |      FROM b),
      |k AS (SELECT bin, count(*) AS n, CAST(sum(qty) AS BIGINT) AS sq,
      |        CAST(sum(pos) AS BIGINT) AS np
      |      FROM b GROUP BY bin),
      |c AS (SELECT
      |        CAST(floor((CAST(sq - 50 * np AS DOUBLE) *
      |          CAST(sq - 50 * np AS DOUBLE) / n / 2500) * 1e6) AS BIGINT)
      |          AS rel_q,
      |        CAST(floor(n * (CAST(np AS DOUBLE) / n -
      |          CAST(np_all AS DOUBLE) / n_all) * (CAST(np AS DOUBLE) / n -
      |          CAST(np_all AS DOUBLE) / n_all) * 1e6) AS BIGINT) AS res_q
      |      FROM k CROSS JOIN t),
      |s AS (SELECT CAST(sum(rel_q) AS BIGINT) AS rel_q,
      |        CAST(sum(res_q) AS BIGINT) AS res_q FROM c),
      |f AS (SELECT n_all AS n,
      |        CAST(sq_err AS DOUBLE) / (n_all * 2500) AS brier_raw,
      |        CAST(rel_q AS DOUBLE) / 1e6 / n_all AS reliability,
      |        CAST(res_q AS DOUBLE) / 1e6 / n_all AS resolution,
      |        (CAST(np_all AS DOUBLE) / n_all)
      |          * (1.0 - CAST(np_all AS DOUBLE) / n_all) AS uncertainty
      |      FROM s CROSS JOIN t)
      |SELECT n, brier_raw, reliability, resolution, uncertainty,
      |  reliability - resolution + uncertainty AS brier_binned
      |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_brier" -> (brier _),
    "q_er_pipeline" -> (erPipeline _),
    "q_calibration" -> (calibration _),
    "q_sorted_neighborhood" -> (sortedNeighborhood _),
    "q_jaro_winkler" -> (jaroWinklerPairs _),
    "q_auc" -> (aucGrouped _),
    "q_gini" -> (giniBalance _),
    "q_theil_index" -> (theilIndex _),
    "q_period_over_period" -> (periodOverPeriod _),
    "q_crosscorr" -> (crossCorr _),
    "q_rrf_fusion" -> (rrfFusion _))

  val oracle: Map[String, String] = Map(
    "q_brier" -> brierSql,
    "q_er_pipeline" -> erPipelineSql,
    "q_calibration" -> calibrationSql,
    "q_sorted_neighborhood" -> sortedNeighborhoodSql,
    "q_jaro_winkler" -> jaroWinklerPairsSql,
    "q_auc" -> aucGroupedSql,
    "q_gini" -> giniBalanceSql,
    "q_theil_index" -> theilIndexSql,
    "q_period_over_period" -> periodOverPeriodSql,
    "q_crosscorr" -> crossCorrSql,
    "q_rrf_fusion" -> rrfFusionSql)
}
