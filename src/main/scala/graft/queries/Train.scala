package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Caches.PersistScoped

/** Round-10 training-data & sequence pack: preference-pair
  * construction and curriculum interleave ordering (the two dataset-
  * assembly steps between curation and the trainer), Holt double-
  * exponential smoothing in exact dyadic integer arithmetic (the
  * trend member of the EWMA/STL family), and k-core graph pruning
  * (the density filter the near-dup / co-occurrence graph family
  * lacked). Conventions per ARCHITECTURE.md "Cross-engine
  * determinism".
  */
object Train {

  /** Shared monthly-revenue series (l_returnflag, mon, y=cents): the
    * ONE definition the smoothing/trend/randomness trio (holtTrend,
    * mannKendall, runsTest) all fold over — three inlined copies
    * would have to track any cents-convention change in lockstep with
    * three SQL oracles. */
  private def monthlyRevenue(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"),
        date_trunc("month", col("l_shipdate")).as("mon"))
      .agg(sum((col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("y"))

  /** Shared per-doc quality score (lexical diversity = distinct words
    * / words): the SAME uniq_ratio emitted by L4's quality profile,
    * recomputed here as a single narrow projection. Both engines
    * compute the one double division on identical integers. */
  private def scoredDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("w", split(col("text"), " "))
      .filter(size(col("w")) > 0)
      .select(col("doc_id"), col("lang"), col("source"),
        (size(array_distinct(col("w"))).cast("double") / size(col("w")))
          .as("score"))

  private val scoredDocsCte: String =
    """sdoc AS (SELECT doc_id, lang, source,
      |    CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS score
      |  FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w
      |        FROM documents)
      |  WHERE len(w) > 0)""".stripMargin

  /** L26 — preference-pair construction: within each (lang, source)
    * prompt group, the highest-scoring document becomes `chosen` and
    * the lowest `rejected` — the RLHF/DPO pair-assembly step that
    * turns pointwise quality scores into contrastive training rows.
    * Both argmax and argmin ride ONE aggregate over packed structs
    * (no window, no second scan); score ties break to the SMALLER
    * doc_id on the chosen side and the LARGER on the rejected side
    * (the -doc_id packing), so a constant-score group still yields a
    * well-defined, distinct pair. Groups of one cannot form a pair
    * and drop out. */
  def preferencePairs(s: SparkSession, dir: String): DataFrame =
    scoredDocs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_group"),
        max(struct(col("score"), (-col("doc_id")).as("nid"))).as("best"),
        min(struct(col("score"), (-col("doc_id")).as("nid"))).as("worst"))
      .filter(col("n_group") >= 2)
      .select(col("lang"), col("source"), col("n_group"),
        (-col("best.nid")).cast("bigint").as("chosen_id"),
        (-col("worst.nid")).cast("bigint").as("rejected_id"),
        (col("best.score") - col("worst.score")).as("margin"))
      .orderBy(col("lang"), col("source"))

  val preferencePairsSql: String =
    s"""WITH $scoredDocsCte,
      |b AS (SELECT lang, source, doc_id AS chosen_id, score AS bs,
      |        row_number() OVER (PARTITION BY lang, source
      |          ORDER BY score DESC, doc_id) AS rn
      |      FROM sdoc),
      |w2 AS (SELECT lang, source, doc_id AS rejected_id, score AS ws,
      |        row_number() OVER (PARTITION BY lang, source
      |          ORDER BY score ASC, doc_id DESC) AS rn
      |      FROM sdoc),
      |g AS (SELECT lang, source, count(*) AS n_group FROM sdoc
      |      GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT g.lang, g.source, g.n_group, b.chosen_id, w2.rejected_id,
      |  b.bs - w2.ws AS margin
      |FROM g JOIN b ON b.lang = g.lang AND b.source = g.source AND b.rn = 1
      |JOIN w2 ON w2.lang = g.lang AND w2.source = g.source AND w2.rn = 1
      |ORDER BY g.lang, g.source""".stripMargin

  /** L34 — curriculum interleave ordering: documents ranked
    * easiest-first (score DESC) WITHIN each source, then emitted in
    * source-interleaved global order (all the rank-1 docs across
    * sources, then the rank-2s, …) — the anti-clumping read order a
    * trainer wants so no single source monopolizes a training window.
    * Scale shape: the per-source rank is a partitioned window; the
    * global interleave position is derived on the TOP-40 prefix only
    * (TakeOrdered — map-side top-k under the total order
    * (src_rank, source); the global row_number then runs over a ≤40
    * row bounded relation, never the corpus). */
  def curriculum(s: SparkSession, dir: String): DataFrame = {
    val perSrc = scoredDocs(s, dir).withColumn("src_rank",
      row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id"))))
    val top = perSrc
      .orderBy(col("src_rank"), col("source"), col("doc_id")).limit(40)
    top.withColumn("pos",
        row_number().over(Window.orderBy(col("src_rank"), col("source"))))
      .select(col("pos"), col("doc_id"), col("source"), col("src_rank"),
        col("score"))
      .orderBy(col("pos"))
  }

  val curriculumSql: String =
    s"""WITH $scoredDocsCte,
      |r AS (SELECT doc_id, source, score,
      |        row_number() OVER (PARTITION BY source
      |          ORDER BY score DESC, doc_id) AS src_rank
      |      FROM sdoc),
      |t AS (SELECT * FROM r ORDER BY src_rank, source, doc_id LIMIT 40)
      |SELECT CAST(row_number() OVER (ORDER BY src_rank, source) AS INT)
      |    AS pos,
      |  doc_id, source, CAST(src_rank AS INT) AS src_rank, score
      |FROM t ORDER BY pos""".stripMargin

  /** TS15 — Holt double-exponential smoothing (level + trend), the
    * trend-aware member of the smoothing family (EWMA = level only;
    * STL = seasonal decomposition): per return flag over the first 12
    * monthly revenue points, `L_t = (y_t + L_{t-1} + B_{t-1})/2`,
    * `B_t = (L_t - L_{t-1} + B_{t-1})/2` (α = β = ½). Arithmetic is
    * EXACT dyadic integers: values are pre-scaled by 2²² so every
    * intermediate is an integer and every halving divides an even
    * number exactly (denominators grow as 2^(2t-2) ≤ 2²² for t ≤ 12)
    * — floor vs truncate division can never disagree across engines,
    * and the fold is sequential-by-definition yet partitioning-free.
    * Spark runs the recurrence as a codegen'd higher-order `aggregate`
    * over each group's 12-element sorted array (the per-group state is
    * 3 fields, never a shuffle concern); the oracle runs the same
    * recurrence as a recursive CTE. Scaled magnitudes stay < 2⁶³ for
    * monthly group revenue up to ~2×10¹² cents (≈ sf 100); the output
    * emits the exact scaled integers (the claim) plus one double
    * projection for readability. Groups with fewer than 12 months
    * have no 12-step fold and drop out. */
  def holtTrend(s: SparkSession, dir: String): DataFrame = {
    val m = monthlyRevenue(s, dir)
    val series = m
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("mon"))))
      .filter(col("rn") <= 12)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("k"),
        expr("transform(array_sort(collect_list(struct(rn, y))), e -> e.y)")
          .as("ys"))
      .filter(col("k") === 12)
    series.select(col("l_returnflag"),
        expr("""aggregate(ys,
          named_struct('L', CAST(0 AS BIGINT), 'B', CAST(0 AS BIGINT), 't', 0),
          (acc, y) -> IF(acc.t = 0,
            named_struct('L', y * 4194304L, 'B', CAST(0 AS BIGINT), 't', 1),
            named_struct(
              'L', (y * 4194304L + acc.L + acc.B) div 2,
              'B', (((y * 4194304L + acc.L + acc.B) div 2) - acc.L + acc.B)
                     div 2,
              't', acc.t + 1)))""").as("st"))
      .select(col("l_returnflag"),
        col("st.L").as("level_units"), col("st.B").as("trend_units"),
        (col("st.L") + col("st.B")).as("forecast_units"))
      .withColumn("forecast_next",
        col("forecast_units").cast("double") / 4194304d / 100d)
      .orderBy(col("l_returnflag"))
  }

  val holtTrendSql: String =
    """WITH RECURSIVE m AS (SELECT l_returnflag,
      |    date_trunc('month', l_shipdate) AS mon,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, y,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY mon) AS rn
      |      FROM m),
      |s AS (SELECT * FROM r WHERE rn <= 12),
      |g AS (SELECT l_returnflag FROM s GROUP BY 1 HAVING count(*) = 12),
      |h AS (
      |  SELECT s.l_returnflag, 1 AS t,
      |    CAST(s.y * 4194304 AS BIGINT) AS L, CAST(0 AS BIGINT) AS B
      |  FROM s JOIN g USING (l_returnflag) WHERE s.rn = 1
      |  UNION ALL
      |  SELECT h.l_returnflag, h.t + 1,
      |    CAST((s.y * 4194304 + h.L + h.B) // 2 AS BIGINT),
      |    CAST(((s.y * 4194304 + h.L + h.B) // 2 - h.L + h.B) // 2 AS BIGINT)
      |  FROM h JOIN s ON s.l_returnflag = h.l_returnflag AND s.rn = h.t + 1
      |  WHERE h.t < 12)
      |SELECT l_returnflag, L AS level_units, B AS trend_units,
      |  L + B AS forecast_units,
      |  CAST(L + B AS DOUBLE) / 4194304 / 100 AS forecast_next
      |FROM h WHERE t = 12 ORDER BY l_returnflag""".stripMargin

  /** W45 — k-core pruning (bounded peel to a checked fixpoint): the
    * density filter over the BUILDING-segment customer co-purchase
    * graph (edge = two customers sharing ≥3 distinct parts — the
    * co-occurrence pair stream is per-part collision-bounded, the
    * same linear bound as the basket/LSH families, never an all-pairs
    * matrix). Each peel round removes nodes of degree < k and their
    * edges; because the edge set only ever SHRINKS along a subset
    * chain, an unchanged alive-node COUNT proves set equality — the
    * count fingerprint alone is an exact fixpoint check here (unlike
    * star contraction's swap-vulnerable fingerprint). The EDGE
    * relation is checkpointed ONCE and never rewritten: each round
    * recomputes within-alive degrees by probing the fixed edge set
    * with two left-semi joins against the previous round's alive set,
    * which stays a DISTRIBUTED relation end to end — the alive set is
    * the co-purchase graph's node set and grows with |customers|, so
    * a driver-side collect here would be the one driver-OOM scale
    * killer in the loop (the round-14 VERDICT flag). No join strategy
    * is forced: the alive side is lazily localCheckpoint'ed and
    * materialized by the convergence count (one action per round), so
    * AQE sees its TRUE size and picks broadcast while it is small and
    * shuffle once it is not — exactly the runtime re-plan a
    * 1000-executor peel needs. The converged round's degree column IS
    * the output (no final degree pass). `maxRounds` is a loud backstop
    * (require), never a silent cap. Output: each 2-core member with
    * its within-core degree — the subgraph where every member has ≥2
    * co-purchase partners who themselves survive. */
  def kcore(s: SparkSession, dir: String, minShared: Int = 3, k: Int = 2,
            maxRounds: Int = 40): DataFrame = {
    val cp = Tables.orders(s, dir)
      .join(Tables.customer(s, dir)
          .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct() // single reader now (the per-part set census) — no persist
    // pair stream via per-part customer sets (ONE part-keyed exchange,
    // then a local pair explode whose (u, v) census partial-aggregates
    // map-side) instead of the two-exchange self-join — identical
    // distinct-pair counts (cp is distinct, so per-part lists are
    // duplicate-free); per-part fan-out matches the join's exactly
    // SKEW GUARD: the pair explode materializes the full C(|cs|, 2)
    // array per part before generating rows — linear-bounded on
    // TPC-H-shaped data (~30 customers/part at any SF), but a single
    // hot part key at 100 TB would turn one task into an O(n²)
    // allocation. Fail LOUDLY at 1024 (≈0.5M pair structs, well inside
    // one task's memory; ~34× the observed fan-out) rather than let a
    // skewed key OOM an executor — past the cap the right shape is a
    // lazy pair generator or salting the hot keys (guide §2.5), not a
    // bigger array. The CASE keeps the guard inside the evaluated
    // expression so the optimizer cannot prune it.
    val pairs = cp
      .groupBy(col("p")).agg(sort_array(collect_set(col("c"))).as("cs"))
      .select(explode(expr(
        "CASE WHEN size(cs) > 1024 THEN " +
          "raise_error(concat('kcore: per-part customer set of ', " +
          "CAST(size(cs) AS STRING), " +
          "' exceeds the 1024 pair-census cap (hot key at scale) - " +
          "salt the key or switch to a lazy pair generator')) " +
          "ELSE flatten(transform(cs, a -> " +
          "transform(filter(cs, b -> b > a), " +
          "b -> named_struct('u', a, 'v', b)))) END")).as("e"))
      .groupBy(col("e.u").as("u"), col("e.v").as("v"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .select(col("u"), col("v"))
    // ONE pass emits both edge directions (the Dedup.dedupClusters
    // lesson): a union of the pair stream with its own swap executes
    // the self-join + aggregate pipeline TWICE unless exchange reuse
    // happens to fire; the narrow explode guarantees a single pass.
    val edges = pairs
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    // alive_{i+1} = {u : deg(u) within alive_i >= k} ⊆ alive_i (a node
    // outside alive_i has no surviving edge, so its degree is 0); the
    // subset chain makes equal counts a fixpoint proof. Each round is
    // ONE action: the convergence count materializes the lazily
    // checkpointed alive relation (the CC-loop lesson, b5378d4 shape),
    // truncating lineage so round r never replays rounds 1..r-1. The
    // driver only ever holds the COUNT — never the node set.
    def degrees(survivors: DataFrame): DataFrame = survivors
      .groupBy(col("u")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= k)
    def restrict(al: DataFrame): DataFrame = {
      val nodes = al.select(col("u").as("node"))
      edges
        .join(nodes.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(nodes.select(col("node").as("v")), Seq("v"), "left_semi")
    }
    var alive = degrees(edges) // round 1: all nodes alive
      .localCheckpoint(false) // materialized by the count below
    var n = alive.count()
    var converged = false
    var round = 1
    while (!converged && round < maxRounds) {
      // TWO peels per materialization (lineage batching): the inner
      // peel stays pure lineage; only the outer one is checkpointed
      // and counted, halving the per-round job barriers. The subset
      // chain alive ⊇ inner ⊇ next makes |next| = |alive| prove all
      // three sets equal — a fixpoint across BOTH peels — so the
      // convergence test is unchanged in strength.
      round += 2
      val next = degrees(restrict(degrees(restrict(alive))))
        .localCheckpoint(false)
      val n2 = next.count()
      // = count ⇒ = set (subset chain); and the empty set is its own
      // fixpoint (peeling nothing yields nothing), so 0 stops at once
      converged = n2 == n || n2 == 0
      alive = next
      n = n2
    }
    require(converged,
      s"k-core peel did not converge in $maxRounds rounds — raise maxRounds")
    // at the fixpoint, d was measured against an alive set equal to
    // the core itself — it IS the within-core degree
    alive.select(col("u").as("c_custkey"), col("d").as("core_degree"))
      .orderBy(col("c_custkey"))
  }

  /** The oracle unrolls 8 peel rounds — idempotent once converged, so
    * any depth ≥ the data's true round count (1 at sf0.01, 5 at
    * sf0.1) yields the fixpoint. The REGISTERED query passes
    * maxRounds = 8 so the Spark side's require() fires exactly when
    * the data outruns this unroll — the loud guard; a deeper default
    * would let Spark converge at round 9+ and hand the harness an
    * opaque hash mismatch instead. */
  val kcoreSql: String = {
    // each round references the previous round THREE times (degree agg
    // + two endpoint joins); DuckDB inlines CTEs by default, so an
    // un-materialized unroll expands 3^8 copies of the base scan and
    // exhausts file handles — MATERIALIZED pins each round to one scan
    val rounds = (1 to 8).map { i =>
      s"""a$i AS MATERIALIZED (SELECT u FROM e${i - 1} GROUP BY u
         |        HAVING count(*) >= 2),
         |e$i AS MATERIALIZED (SELECT e.u, e.v FROM e${i - 1} e
         |        JOIN a$i x ON e.u = x.u JOIN a$i y ON e.v = y.u)""".stripMargin
    }.mkString(",\n")
    s"""WITH cp AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM orders o
      |  JOIN customer cu ON cu.c_custkey = o.o_custkey
      |    AND cu.c_mktsegment = 'BUILDING'
      |  JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |pr AS MATERIALIZED (SELECT a.c AS u, b.c AS v FROM cp a
      |       JOIN cp b ON a.p = b.p AND a.c < b.c
      |       GROUP BY 1, 2 HAVING count(*) >= 3),
      |e0 AS MATERIALIZED (SELECT u, v FROM pr UNION ALL SELECT v, u FROM pr),
      |$rounds
      |SELECT u AS c_custkey, CAST(count(*) AS BIGINT) AS core_degree
      |FROM e8 GROUP BY u ORDER BY c_custkey""".stripMargin
  }

  /** W46 — sequential probability ratio test (SPRT) trajectory: the
    * always-valid sequential companion to the fixed-horizon A/B
    * readouts (W19/W22) — after each day, the cumulative
    * log-likelihood ratio of H1: p=0.4 vs H0: p=0.3 over engagement
    * trials (success = purchase|click), with Wald boundaries
    * ±ln(19) (α = β = 0.05). The day is the atomic step: one keyed
    * aggregate collapses the event stream to (variant, day)
    * trial/success counts — the only pass over raw rows — and the
    * cumulative window runs on the ~30-row-per-variant daily relation
    * (the bounded-relation exception). LLR = s·ln(p1/p0) +
    * (n−s)·ln((1−p1)/(1−p0)) on exact integer counts. The ln factors
    * are FIXED DECIMAL LITERALS (ln(4/3) = 0.287682072, ln(6/7) =
    * −0.154150680, ln(19) = 2.944438979, each to 9 places) rather
    * than engine-evaluated `ln()` calls: the two engines' libm ln
    * disagree in the last ulp, and an s·ln(·) product that lands on a
    * 0.5e-6 rounding boundary then flips the 6th decimal (observed on
    * the fixture at day 1). With literal constants both engines run
    * the identical IEEE multiply-add chain, so the rounded LLR and
    * the decision column are bit-stable. */
  def sprt(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir).select(
      pmod(col("user_id"), lit(2)).cast("int").as("variant"),
      to_date(col("ts")).as("day"),
      when(col("event_type").isin("purchase", "click"), 1L).otherwise(0L)
        .as("succ"))
    val daily = e.groupBy(col("variant"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("succ")).as("s"))
    val w = Window.partitionBy(col("variant")).orderBy(col("day"))
    val thr = lit(2.944438979)
    daily
      .withColumn("n_cum", sum(col("n")).over(w))
      .withColumn("s_cum", sum(col("s")).over(w))
      .select(col("variant"), col("day"), col("n_cum"), col("s_cum"),
        round(col("s_cum") * lit(0.287682072) -
          (col("n_cum") - col("s_cum")) * lit(0.154150680), 6).as("llr"))
      .withColumn("decision",
        when(col("llr") >= thr, "accept_h1")
          .when(col("llr") <= -thr, "accept_h0")
          .otherwise("continue"))
      .orderBy(col("variant"), col("day"))
  }

  val sprtSql: String =
    """WITH e AS (SELECT CAST(user_id % 2 AS INT) AS variant,
      |    CAST(ts AS DATE) AS day,
      |    CASE WHEN event_type IN ('purchase', 'click') THEN 1 ELSE 0 END
      |      AS succ
      |  FROM events),
      |daily AS (SELECT variant, day, count(*) AS n,
      |            CAST(sum(succ) AS BIGINT) AS s
      |          FROM e GROUP BY 1, 2),
      |cum AS (SELECT variant, day,
      |          CAST(sum(n) OVER (PARTITION BY variant ORDER BY day)
      |            AS BIGINT) AS n_cum,
      |          CAST(sum(s) OVER (PARTITION BY variant ORDER BY day)
      |            AS BIGINT) AS s_cum
      |        FROM daily),
      |-- literals CAST AS DOUBLE: DuckDB parses bare decimal literals
      |-- as DECIMAL and would run exact decimal arithmetic where Spark
      |-- runs the IEEE double chain — the cast keeps both engines on
      |-- the identical multiply-add sequence
      |l AS (SELECT variant, day, n_cum, s_cum,
      |        round(s_cum * CAST(0.287682072 AS DOUBLE) -
      |          (n_cum - s_cum) * CAST(0.154150680 AS DOUBLE), 6) AS llr
      |      FROM cum)
      |SELECT variant, day, n_cum, s_cum, llr,
      |  CASE WHEN llr >= 2.944438979 THEN 'accept_h1'
      |       WHEN llr <= -2.944438979 THEN 'accept_h0'
      |       ELSE 'continue' END AS decision
      |FROM l ORDER BY variant, day""".stripMargin

  /** L35 — boilerplate-chunk scrubbing: the REWRITE form of chunk
    * dedup — a 10-word chunk occurring in ≥3 DISTINCT documents is
    * boilerplate (headers, templates, navigation text; the CCNet/C4
    * preprocessing step), and every document is re-assembled from its
    * surviving chunks in position order. Where L1b only REPORTS
    * duplicated chunks, this emits the per-document scrub ledger:
    * total/kept/dropped chunk counts plus the md5 of the cleaned
    * text (portable across engines; a fully-scrubbed document keeps
    * the empty-string md5 rather than a NULL). One exploded chunk
    * pass is shared (persistScoped) by the boilerplate census, the
    * anti-join, and the per-doc totals. */
  def boilerplateScrub(s: SparkSession, dir: String): DataFrame = {
    val ch = graft.Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST((size(w) - 1) / 10 AS INT)), " +
          "c -> concat_ws(' ', slice(w, c * 10 + 1, 10)))"))
        .as(Seq("chunk_idx", "chunk")))
      .withColumn("h", md5(col("chunk")))
      .persistScoped()
    val bp = ch.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 3).select(col("h"))
    val kept = ch.join(bp, Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        md5(array_join(expr(
          "transform(array_sort(collect_list(struct(chunk_idx, chunk))), " +
            "e -> e.chunk)"), " ")).as("clean_md5"))
    val tot = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    tot.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
        coalesce(col("clean_md5"), md5(lit(""))).as("clean_md5"))
      .orderBy(col("doc_id"))
  }

  val boilerplateScrubSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |chx AS (SELECT doc_id, CAST(c AS INT) AS chunk_idx,
      |         array_to_string(list_slice(w, c * 10 + 1, c * 10 + 10), ' ')
      |           AS chunk
      |       FROM w, unnest(range(0, CAST((len(w) - 1) // 10 AS INT) + 1))
      |         AS t(c)),
      |hx AS (SELECT doc_id, chunk_idx, chunk, md5(chunk) AS h FROM chx),
      |bp AS (SELECT h FROM hx GROUP BY h HAVING count(DISTINCT doc_id) >= 3),
      |kept AS (SELECT doc_id, count(*) AS n_kept,
      |           md5(string_agg(chunk, ' ' ORDER BY chunk_idx)) AS clean_md5
      |         FROM hx WHERE h NOT IN (SELECT h FROM bp)
      |         GROUP BY doc_id),
      |tot AS (SELECT doc_id, count(*) AS n_chunks FROM hx GROUP BY doc_id)
      |SELECT t.doc_id, t.n_chunks,
      |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(t.n_chunks - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped,
      |  coalesce(k.clean_md5, md5('')) AS clean_md5
      |FROM tot t LEFT JOIN kept k USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin

  /** W48 — Mann-Kendall trend test: the SIGNIFICANCE companion to
    * Theil-Sen (TS slope says how steep; MK says whether a monotonic
    * trend exists at all), per return flag over the monthly revenue
    * series. S = Σ_{i<j} sign(y_j − y_i) over the ≤84-month bounded
    * relation (the pair join is flag-keyed with a month inequality —
    * an equi join with residual, ~3.5k pairs per group, never a fact
    * cartesian); the tie-corrected variance numerator
    * n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) stays an exact integer, and the
    * only float step is z = (S∓1)/√(var/18) — division and sqrt are
    * IEEE-correctly-rounded on both engines (no libm risk), rounded
    * to 6. The trend verdict compares the ROUNDED z against 1.96. */
  def mannKendall(s: SparkSession, dir: String): DataFrame = {
    val m = monthlyRevenue(s, dir)
      .persistScoped() // pair self-join + tie census + n
    val pairs = m.select(col("l_returnflag"), col("mon").as("ma"), col("y").as("ya"))
      .join(m.select(col("l_returnflag"), col("mon").as("mb"), col("y").as("yb")),
        Seq("l_returnflag"))
      .filter(col("ma") < col("mb"))
    val sstat = pairs.groupBy(col("l_returnflag"))
      .agg(sum(signum(col("yb") - col("ya")).cast("bigint")).as("s_stat"))
    val base = m.groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val ties = m.groupBy(col("l_returnflag"), col("y")).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .groupBy(col("l_returnflag"))
      .agg(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)).as("tie_adj"))
    base.join(sstat, Seq("l_returnflag"), "left")
      .join(ties, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n"),
        coalesce(col("s_stat"), lit(0L)).as("s_stat"),
        (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
          coalesce(col("tie_adj"), lit(0L))).as("var_num"))
      .withColumn("z",
        when(col("var_num") === 0, lit(0.0))
          .when(col("s_stat") > 0, round((col("s_stat") - 1).cast("double") /
            sqrt(col("var_num").cast("double") / 18d), 6))
          .when(col("s_stat") < 0, round((col("s_stat") + 1).cast("double") /
            sqrt(col("var_num").cast("double") / 18d), 6))
          .otherwise(lit(0.0)))
      .withColumn("trend",
        when(col("z") >= 1.96, "increasing")
          .when(col("z") <= -1.96, "decreasing")
          .otherwise("no_trend"))
      .orderBy(col("l_returnflag"))
  }

  val mannKendallSql: String =
    """WITH m AS (SELECT l_returnflag, date_trunc('month', l_shipdate) AS mon,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |p AS (SELECT a.l_returnflag, CAST(sum(sign(b.y - a.y)) AS BIGINT)
      |          AS s_stat
      |      FROM m a JOIN m b
      |        ON a.l_returnflag = b.l_returnflag AND a.mon < b.mon
      |      GROUP BY 1),
      |nn AS (SELECT l_returnflag, count(*) AS n FROM m GROUP BY 1),
      |tt AS (SELECT l_returnflag,
      |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_adj
      |       FROM (SELECT l_returnflag, y, count(*) AS t FROM m GROUP BY 1, 2)
      |       WHERE t > 1 GROUP BY 1),
      |v AS (SELECT nn.l_returnflag, nn.n,
      |        CAST(coalesce(p.s_stat, 0) AS BIGINT) AS s_stat,
      |        CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5)
      |          - coalesce(tt.tie_adj, 0) AS BIGINT) AS var_num
      |      FROM nn LEFT JOIN p USING (l_returnflag)
      |      LEFT JOIN tt USING (l_returnflag)),
      |zz AS (SELECT l_returnflag, n, s_stat, var_num,
      |         CASE WHEN var_num = 0 THEN 0.0
      |              WHEN s_stat > 0 THEN
      |                round((s_stat - 1) / sqrt(var_num / 18.0), 6)
      |              WHEN s_stat < 0 THEN
      |                round((s_stat + 1) / sqrt(var_num / 18.0), 6)
      |              ELSE 0.0 END AS z
      |       FROM v)
      |SELECT l_returnflag, n, s_stat, var_num, CAST(z AS DOUBLE) AS z,
      |  CASE WHEN z >= 1.96 THEN 'increasing'
      |       WHEN z <= -1.96 THEN 'decreasing'
      |       ELSE 'no_trend' END AS trend
      |FROM zz ORDER BY l_returnflag""".stripMargin

  /** W49 — Wald-Wolfowitz runs test: the RANDOMNESS audit next to
    * W48's trend test — a monthly revenue series that wanders above
    * and below its median in long streaks is serially dependent even
    * when no monotonic trend exists. Per flag: months classify
    * above/below the exact interpolated median (median-equal months
    * drop, the classic convention; both engines interpolate the same
    * integers to the same double), the run count R is 1 + the number
    * of sign flips (one lag window over the ≤84-month bounded
    * relation), and z = (R − E[R])/√Var with E = 2·n1·n2/n + 1 and
    * Var = 2n1n2(2n1n2−n)/(n²(n−1)) — plain arithmetic + sqrt, both
    * IEEE-exact cross-engine, rounded to 6. Degenerate one-sided
    * groups (n1 = 0 or n2 = 0, Var = 0) read z = 0. */
  def runsTest(s: SparkSession, dir: String): DataFrame = {
    val m = monthlyRevenue(s, dir)
      .persistScoped() // median pass + classified sequence pass
    val med = m.groupBy(col("l_returnflag"))
      .agg(expr("percentile(y, 0.5D)").as("med"))
    val cls = m.join(med, Seq("l_returnflag"))
      .filter(col("y") =!= col("med"))
      .select(col("l_returnflag"), col("mon"),
        (col("y") > col("med")).cast("int").as("up"))
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("mon"))
    cls
      .withColumn("flip",
        when(lag(col("up"), 1).over(w).isNull, 1)
          .when(lag(col("up"), 1).over(w) =!= col("up"), 1).otherwise(0))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("flip")).as("runs"),
        sum(col("up")).cast("bigint").as("n1"),
        sum(lit(1) - col("up")).cast("bigint").as("n2"))
      .withColumn("z", {
        val n = col("n1") + col("n2")
        val e = lit(2.0) * col("n1") * col("n2") / n + 1.0
        val v = (lit(2.0) * col("n1") * col("n2") *
          (lit(2.0) * col("n1") * col("n2") - n)) /
          (n.cast("double") * n * (n - 1))
        when(col("n1") === 0 || col("n2") === 0, lit(0.0))
          .otherwise(round((col("runs") - e) / sqrt(v), 6))
      })
      .select(col("l_returnflag"), col("runs"), col("n1"), col("n2"), col("z"))
      .orderBy(col("l_returnflag"))
  }

  val runsTestSql: String =
    """WITH m AS (SELECT l_returnflag, date_trunc('month', l_shipdate) AS mon,
      |    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS y
      |  FROM lineitem GROUP BY 1, 2),
      |md AS (SELECT l_returnflag, quantile_cont(y, 0.5) AS med
      |       FROM m GROUP BY 1),
      |c AS (SELECT m.l_returnflag, m.mon,
      |        CAST(m.y > md.med AS INT) AS up
      |      FROM m JOIN md USING (l_returnflag) WHERE m.y <> md.med),
      |f AS (SELECT l_returnflag, up,
      |        CASE WHEN lag(up) OVER (PARTITION BY l_returnflag
      |               ORDER BY mon) IS NULL THEN 1
      |             WHEN lag(up) OVER (PARTITION BY l_returnflag
      |               ORDER BY mon) <> up THEN 1 ELSE 0 END AS flip
      |      FROM c),
      |g AS (SELECT l_returnflag, CAST(sum(flip) AS BIGINT) AS runs,
      |        CAST(sum(up) AS BIGINT) AS n1,
      |        CAST(sum(1 - up) AS BIGINT) AS n2
      |      FROM f GROUP BY 1)
      |SELECT l_returnflag, runs, n1, n2,
      |  CASE WHEN n1 = 0 OR n2 = 0 THEN 0.0
      |       ELSE round((runs - (2.0 * n1 * n2 / (n1 + n2) + 1.0)) /
      |         sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))) /
      |           (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1))), 6)
      |  END AS z
      |FROM g ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_preference_pairs" -> (preferencePairs _),
    "q_curriculum" -> (curriculum _),
    "q_holt_trend" -> (holtTrend _),
    // maxRounds = 9, NOT the function default: the DuckDB oracle
    // unrolls exactly 8 peel rounds, and observing a fixpoint of true
    // depth d costs d+1 Spark rounds (the last round must see the
    // count unchanged) — 9 lets depth-8 data pass while anything
    // deeper fails the require() LOUDLY instead of handing the
    // harness an opaque hash mismatch against a short-unrolled
    // oracle. Fixture depths: 1 round at sf0.01, 5 at sf0.1.
    "q_kcore" -> ((s: SparkSession, d: String) => kcore(s, d, maxRounds = 9)),
    "q_sprt" -> (sprt _),
    "q_boilerplate_scrub" -> (boilerplateScrub _),
    "q_mann_kendall" -> (mannKendall _),
    "q_runs_test" -> (runsTest _),
  )

  val oracle: Map[String, String] = Map(
    "q_preference_pairs" -> preferencePairsSql,
    "q_curriculum" -> curriculumSql,
    "q_holt_trend" -> holtTrendSql,
    "q_kcore" -> kcoreSql,
    "q_sprt" -> sprtSql,
    "q_boilerplate_scrub" -> boilerplateScrubSql,
    "q_mann_kendall" -> mannKendallSql,
    "q_runs_test" -> runsTestSql,
  )
}
