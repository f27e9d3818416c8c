package graft.queries

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.Caches.PersistScoped

/** Behavioral / dataset-quality analytics pack (round 3): cohort
  * retention, funnel progression, stratified sampling, central
  * tendency (median + deterministic mode), sorted list aggregation,
  * Shannon entropy, intra-document repetition, benchmark
  * contamination, robust (median/MAD) scaling, and struct-array
  * inlining. Every query has a DuckDB oracle; cross-engine
  * determinism follows SURVEY.md §7.5 (canonical ORDER BY over a
  * unique key, exact integer ratios emitted as single IEEE divisions,
  * floating aggregates rounded).
  *
  * Timestamp comparisons use SECOND granularity (unix epoch seconds):
  * events.ts is nanos on disk and micros in Spark, so any finer
  * comparison could order two events differently across engines
  * (SURVEY.md §7.4.2).
  */
object Analytics {

  /** Cohort retention: users bucketed by the month of their first
    * event; per (cohort, month-offset) distinct-user counts — the
    * classic retention triangle. Two shuffles at any scale (first-touch
    * aggregate, then the retention aggregate); the first-touch table is
    * one row per user, joined back on the grain it was computed from. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), to_date(date_trunc("month", col("ts"))).as("m"))
    val firsts = ev.groupBy(col("user_id")).agg(min(col("m")).as("cohort"))
    ev.join(firsts, Seq("user_id"))
      .groupBy(col("cohort"),
        months_between(col("m"), col("cohort")).cast("int").as("offset_m"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort"), col("offset_m"))
  }

  val cohortRetentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(date_trunc('month', ts) AS DATE) AS m FROM events),
      |f AS (SELECT user_id, min(m) AS cohort FROM ev GROUP BY user_id)
      |SELECT f.cohort AS cohort, CAST(datediff('month', f.cohort, ev.m) AS INT) AS offset_m,
      |  count(DISTINCT ev.user_id) AS users
      |FROM ev JOIN f ON ev.user_id = f.user_id
      |GROUP BY 1, 2 ORDER BY cohort, offset_m""".stripMargin

  /** Ordered funnel: first 'view', then first 'click' strictly after
    * it, then first 'purchase' strictly after that — per-stage
    * surviving-user counts. Strict ordering is evaluated on epoch
    * SECONDS so both engines agree despite different sub-second
    * timestamp precision. Each stage is one filtered aggregate joined
    * to the previous stage's (user → frontier) table. */
  def funnelSteps(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("sec"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("sec")).as("t1"))
    val c = ev.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("sec") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("sec") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("sec")).as("t3"))
    v.select(lit("1_view").as("stage"), col("user_id"))
      .union(c.select(lit("2_click").as("stage"), col("user_id")))
      .union(p.select(lit("3_purchase").as("stage"), col("user_id")))
      .groupBy(col("stage")).agg(count(lit(1)).as("users"))
      .orderBy(col("stage"))
  }

  val funnelStepsSql: String =
    """WITH ev AS (SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |v AS (SELECT user_id, min(sec) AS t1 FROM ev WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.sec) AS t2 FROM ev e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.sec > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.sec) AS t3 FROM ev e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.sec > c.t2 GROUP BY e.user_id)
      |SELECT stage, count(*) AS users FROM (
      |  SELECT '1_view' AS stage, user_id FROM v
      |  UNION ALL SELECT '2_click', user_id FROM c
      |  UNION ALL SELECT '3_purchase', user_id FROM p)
      |GROUP BY stage ORDER BY stage""".stripMargin

  /** Stratified deterministic sampling: per-stratum rates keyed on
    * md5(pk) — rare classes kept whole, abundant classes thinned, all
    * reproducible across runs/engines/cluster sizes (same property as
    * q_hash_sample, extended to per-class rates). Pure map-side
    * filter: no shuffle at any scale except the output sort. */
  def stratifiedSample(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .withColumn("rate",
        when(col("event_type") === "signup", 100)
          .when(col("event_type") === "purchase", 50)
          .when(col("event_type") === "view", 10)
          .when(col("event_type") === "click", 5)
          .otherwise(1))
      .filter(col("h") < col("rate"))
      .select(col("event_id"), col("event_type"), col("h").cast("int").as("h"))
      .orderBy(col("event_id"))

  val stratifiedSampleSql: String =
    """SELECT event_id, event_type, CAST(h AS INT) AS h
      |FROM (SELECT event_id, event_type,
      |        CAST(concat('0x', substring(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS h,
      |        CASE event_type WHEN 'signup' THEN 100 WHEN 'purchase' THEN 50
      |             WHEN 'view' THEN 10 WHEN 'click' THEN 5 ELSE 1 END AS rate
      |      FROM events)
      |WHERE h < rate ORDER BY event_id""".stripMargin

  /** Central tendency per group: exact interpolated median (sort-based
    * percentile) plus a DETERMINISTIC mode — most frequent value, ties
    * broken to the smallest — built from a count aggregate + ranked
    * window rather than the builtin mode() whose tie-break is
    * unspecified on both engines. */
  def centralTendency(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    val med = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_quantity, 0.5D)"), 4).as("median_qty"),
        round(expr("percentile(l_extendedprice, 0.5D)"), 4).as("median_price"))
    val cnts = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_linestatus"))
    val mode = cnts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_linestatus").as("mode_status"),
        col("n").as("mode_n"))
    med.join(mode, Seq("l_returnflag")).orderBy(col("l_returnflag"))
  }

  val centralTendencySql: String =
    """WITH med AS (SELECT l_returnflag,
      |        round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
      |        round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
      |      FROM lineitem GROUP BY l_returnflag),
      |c AS (SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem GROUP BY 1, 2),
      |m AS (SELECT l_returnflag, l_linestatus AS mode_status, n AS mode_n,
      |        row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_linestatus) AS rn
      |      FROM c)
      |SELECT med.l_returnflag, median_qty, median_price, mode_status, mode_n
      |FROM med JOIN m ON med.l_returnflag = m.l_returnflag WHERE rn = 1
      |ORDER BY med.l_returnflag""".stripMargin

  /** Sorted list aggregation (LISTAGG/string_agg parity): per (month,
    * priority), the '|'-joined sorted set of order statuses. The sort
    * inside the aggregate is what makes collect_set deterministic —
    * collection order is partitioning-dependent on both engines. */
  def listaggStatus(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        col("o_orderpriority"))
      .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), "|").as("statuses"),
        count(lit(1)).as("n"))
      .orderBy(col("ym"), col("o_orderpriority"))

  val listaggStatusSql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS ym, o_orderpriority,
      |  array_to_string(list_sort(list_distinct(list(o_orderstatus))), '|') AS statuses,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY ym, o_orderpriority""".stripMargin

  /** Shannon entropy of each user's event-type mix — a behavioral
    * diversity score (0 = single-type user). Probabilities are exact
    * integer ratios evaluated as identical IEEE divisions; ln is
    * natural log on both engines (DuckDB's log() is log10 — trap
    * noted in SURVEY §7.5); the summed-terms order wobble is absorbed
    * by round(4). */
  def eventEntropy(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type")).agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(col("user_id"))
    c.withColumn("total", sum(col("n")).over(tot))
      .groupBy(col("user_id"), col("total"))
      .agg(round(-sum((col("n").cast("double") / col("total")) *
        log(col("n").cast("double") / col("total"))), 4).as("entropy"))
      .select(col("user_id"), col("total").as("n_events"), col("entropy"))
      .orderBy(col("user_id"))
  }

  val eventEntropySql: String =
    """WITH c AS (SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
      |t AS (SELECT user_id, CAST(sum(n) AS BIGINT) AS total FROM c GROUP BY user_id)
      |SELECT c.user_id, t.total AS n_events,
      |  round(-sum((CAST(c.n AS DOUBLE) / t.total) * ln(CAST(c.n AS DOUBLE) / t.total)), 4) AS entropy
      |FROM c JOIN t ON c.user_id = t.user_id
      |GROUP BY c.user_id, t.total ORDER BY c.user_id""".stripMargin

  /** Intra-document repetition: the most frequent trigram's share of
    * all trigram occurrences — the standard boilerplate/spam signal in
    * LLM data curation (high ratio = template/repeated text). Narrow
    * shingling + two aggregates; the ratio is one exact int/int IEEE
    * division. */
  def repetitionRatio(s: SparkSession, dir: String): DataFrame =
    Dedup.shingleOccurrences(Tables.documents(s, dir), 3)
      .groupBy(col("doc_id"), col("shingle")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_sh"), max(col("c")).as("max_rep"))
      .select(col("doc_id"), col("n_sh"), col("max_rep"),
        (col("max_rep").cast("double") / col("n_sh")).as("rep_ratio"))
      .orderBy(col("doc_id"))

  val repetitionRatioSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |          i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
      |        FROM w WHERE len(w) >= 3),
      |c AS (SELECT doc_id, shingle, count(*) AS c FROM occ GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_sh, CAST(max(c) AS BIGINT) AS max_rep,
      |  CAST(max(c) AS DOUBLE) / CAST(sum(c) AS BIGINT) AS rep_ratio
      |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Benchmark-contamination scan: fraction of each corpus document's
    * distinct trigrams that appear in a "benchmark" shingle set (here:
    * every 100th doc stands in for the eval set). The benchmark side
    * is broadcast — it is tiny relative to the corpus by construction,
    * so the scan stays a narrow map + one aggregate at any corpus
    * size. Reported above a 5% overlap floor. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    // Per-document distinct shingle-hash sets come from ONE narrow
    // expression (NgramHashes): no distinct shuffle, and the set size
    // is a projection — the only shuffles left are the hit aggregate
    // and the output sort. Hash-for-text equivalence is w.h.p., the
    // same trade the ngram-Jaccard pipeline documents. Persisted:
    // both the benchmark side and the corpus side read it.
    val docs = Tables.documents(s, dir)
    docs.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_ngram_hashes",
      exprs => graft.functions.NgramHashes(exprs.head, 3),
      "scala_udf")
    val withSets = Tables.widen(docs)
      .select(col("doc_id"), call_function("graft_ngram_hashes", col("text")).as("hs"))
      .filter(col("hs").isNotNull)
      .select(col("doc_id"), col("hs"), size(col("hs")).as("n_sh"))
      .persistScoped()
    val benchSh = withSets.filter(col("doc_id") % 100 === 0)
      .select(explode(col("hs")).as("shash")).distinct()
    val hits = withSets.filter(col("doc_id") % 100 =!= 0)
      .select(col("doc_id"), col("n_sh"), explode(col("hs")).as("shash"))
      .join(broadcast(benchSh), Seq("shash"))
      .groupBy(col("doc_id"), col("n_sh")).agg(count(lit(1)).as("n_hit"))
    hits
      .select(col("doc_id"), col("n_sh").cast("bigint").as("n_sh"), col("n_hit"),
        (col("n_hit").cast("double") / col("n_sh")).as("contam_frac"))
      .filter(col("contam_frac") >= 0.05)
      .orderBy(col("doc_id"))
  }

  val contaminationSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |         i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
      |       FROM w WHERE len(w) >= 3),
      |b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 100 = 0),
      |c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 100 <> 0),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM c GROUP BY doc_id),
      |h AS (SELECT c.doc_id, count(*) AS n_hit FROM c JOIN b ON c.shingle = b.shingle
      |      GROUP BY c.doc_id)
      |SELECT sz.doc_id, CAST(sz.n_sh AS BIGINT) AS n_sh, CAST(h.n_hit AS BIGINT) AS n_hit,
      |  CAST(h.n_hit AS DOUBLE) / sz.n_sh AS contam_frac
      |FROM sz JOIN h ON sz.doc_id = h.doc_id
      |WHERE CAST(h.n_hit AS DOUBLE) / sz.n_sh >= 0.05
      |ORDER BY sz.doc_id""".stripMargin

  /** Robust (median/MAD) standardization — the outlier-resistant twin
    * of z-scoring (C4 min-max scaling): per-group median and median
    * absolute deviation, then (x − med) / MAD per row. The two
    * statistics tables are one row per group and broadcast back. */
  def robustScale(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val med = o.groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, 0.5D)").as("med"))
    val mad = o.join(broadcast(med), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"), col("med"))
      .agg(expr("percentile(abs(o_totalprice - med), 0.5D)").as("mad"))
    o.filter(col("o_orderkey") <= 2000)
      .join(broadcast(mad), Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        round((col("o_totalprice") - col("med")) / col("mad"), 6).as("robust_z"))
      .orderBy(col("o_orderkey"))
  }

  val robustScaleSql: String =
    """WITH med AS (SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
      |             FROM orders GROUP BY o_orderpriority),
      |mad AS (SELECT o.o_orderpriority, m.med,
      |          quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
      |        FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority
      |        GROUP BY o.o_orderpriority, m.med)
      |SELECT o.o_orderkey, o.o_orderpriority,
      |  round((o.o_totalprice - m.med) / m.mad, 6) AS robust_z
      |FROM orders o JOIN mad m ON o.o_orderpriority = m.o_orderpriority
      |WHERE o.o_orderkey <= 2000 ORDER BY o.o_orderkey""".stripMargin

  /** Struct-array inlining (D3 generator surface beyond explode):
    * measures packed as an array of (k, v) structs, inlined back to
    * rows — the generator form of UNPIVOT. */
  def inlineKv(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir).filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        inline(array(
          struct(lit("price").as("k"), col("l_extendedprice").cast("double").as("v")),
          struct(lit("qty").as("k"), col("l_quantity").cast("double").as("v")))))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("k"))

  val inlineKvSql: String =
    """SELECT l_orderkey, l_linenumber, k, v FROM (
      |  SELECT l_orderkey, l_linenumber, 'price' AS k, CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem WHERE l_orderkey <= 200
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'qty', CAST(l_quantity AS DOUBLE)
      |  FROM lineitem WHERE l_orderkey <= 200)
      |ORDER BY l_orderkey, l_linenumber, k""".stripMargin

  /** CSV interchange fidelity (S-format parity next to NDJSON):
    * `to_csv` → `from_csv` must reproduce the source rows exactly —
    * doubles survive because Spark prints round-trip-exact
    * representations. The oracle is simply the source projection. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val schema = "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING"
    Tables.orders(s, dir)
      .select(to_csv(struct(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))).as("line"))
      .select(from_csv(col("line"), lit(schema), Map.empty[String, String].asJava).as("r"))
      .select(col("r.o_orderkey").as("o_orderkey"), col("r.o_custkey").as("o_custkey"),
        col("r.o_totalprice").as("o_totalprice"), col("r.o_orderpriority").as("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  val csvRoundtripSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Bloom-pre-filtered validation anti-join (the 100 TB form of the
    * reference's count-compare/retry scan, E2/A6): build a Bloom
    * filter over the destination keys, split the source into
    * definitely-missing (bloom says absent — no false negatives, so
    * no join needed) and possibly-present (exact anti-join resolves
    * the false positives). Result is EXACTLY the plain anti-join —
    * the filter only re-routes work — so the oracle is a NOT IN. The
    * destination simulates lost ranges (every 7th order missing). */
  def bloomPrefilter(s: SparkSession, dir: String): DataFrame = {
    // Catalyst-native build AND probe: BloomFilterAggregate builds the
    // sketch as a distributed aggregate consumed through a scalar
    // subquery, and BloomFilterMightContain (the expression pair behind
    // Spark's own runtime row-filter injection) probes it codegen'd —
    // no ScalaUDF and no driver-side sketch build anywhere in the plan.
    // Both expressions are internal-registry-only, so they are surfaced
    // under graft_ temp names.
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_bloom_agg",
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs.head, exprs(1)),
      "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_might_contain",
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs.head, exprs(1)),
      "scala_udf")
    val dst = Tables.orders(s, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(col("o_orderkey")).persistScoped()
    dst.createOrReplaceTempView("graft_bloom_dst")
    val might = expr(
      "graft_might_contain(" +
        "(SELECT graft_bloom_agg(xxhash64(o_orderkey), 200000L) FROM graft_bloom_dst), " +
        "xxhash64(l_orderkey))")
    // Evaluate the sketch probe ONCE per source row and persist: the
    // definite/possible branches then split a cached boolean instead
    // of each re-running the distinct AND re-building the bloom
    // aggregate (a scalar subquery is re-evaluated per plan
    // occurrence, so two `might` filters meant two sketch builds).
    val src = Tables.lineitem(s, dir).select(col("l_orderkey")).distinct()
      .withColumn("maybe", might).persistScoped()
    val definite = src.filter(!col("maybe")).drop("maybe")
    val confirmed = src.filter(col("maybe")).drop("maybe")
      .join(dst, col("l_orderkey") === col("o_orderkey"), "left_anti")
    definite.union(confirmed).orderBy(col("l_orderkey"))
  }

  val bloomPrefilterSql: String =
    """SELECT DISTINCT l_orderkey FROM lineitem
      |WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders WHERE o_orderkey % 7 <> 0)
      |ORDER BY l_orderkey""".stripMargin

  /** Chunk-level exact dedup (the tractable SQL analog of exact
    * substring deduplication in training-data curation): texts split
    * into non-overlapping 10-word chunks; chunks recurring across the
    * corpus are reported with copy counts and the deterministic
    * keeper (smallest (doc, position)). Narrow chunking + one
    * aggregate keyed on the chunk hash — linear at any corpus size.
    * (The oracle packs (doc, idx) into doc·10⁶+idx for its min —
    * equivalent to the struct min while a doc has < 10⁶ chunks.) */
  def dedupChunks(s: SparkSession, dir: String): DataFrame =
    graft.Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, CAST((size(w) - 1) / 10 AS INT)), " +
        "c -> concat_ws(' ', slice(w, c * 10 + 1, 10)))")).as(Seq("chunk_idx", "chunk")))
      .groupBy(md5(col("chunk")).as("chunk_hash"))
      .agg(count(lit(1)).as("n_copies"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("k"))
      .filter(col("n_copies") > 1)
      .select(col("chunk_hash"), col("n_copies"),
        col("k.doc_id").as("keep_doc"), col("k.chunk_idx").as("keep_idx"))
      .orderBy(col("chunk_hash"))

  val dedupChunksSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |ch AS (SELECT doc_id, CAST(c AS INT) AS chunk_idx,
      |         array_to_string(list_slice(w, c * 10 + 1, c * 10 + 10), ' ') AS chunk
      |       FROM w, unnest(range(0, CAST((len(w) - 1) // 10 AS INT) + 1)) AS t(c))
      |SELECT md5(chunk) AS chunk_hash, count(*) AS n_copies,
      |  CAST(min(doc_id * 1000000 + chunk_idx) // 1000000 AS BIGINT) AS keep_doc,
      |  CAST(min(doc_id * 1000000 + chunk_idx) % 1000000 AS INT) AS keep_idx
      |FROM ch GROUP BY md5(chunk) HAVING count(*) > 1
      |ORDER BY chunk_hash""".stripMargin

  /** L1c — content-defined chunk dedup via a ROLLING HASH: chunk
    * boundaries fall where the 3-word polynomial hash ≡ 0 (mod 8), so
    * an insertion early in a document SHIFTS boundaries only until the
    * next hash-synchronized cut instead of re-flowing every fixed
    * window (the classic Rabin-Karp/CDC property fixed-size chunking
    * lacks — cf. q_dedup_chunks). Word atoms are 32-bit md5 slices;
    * the window hash h = a_i + 31·a_{i−1} + 31²·a_{i−2} is exact
    * int64, bit-portable. The chunk id is a running boundary count
    * over the PER-DOCUMENT window (fan-out = document length, the
    * q_proration bound); chunk content hashes aggregate corpus-wide
    * exactly like the fixed-size variant. */
  def cdcChunks(s: SparkSession, dir: String): DataFrame = {
    // Fused chunker expression (CdcChunks): the rolling-hash cuts and
    // chunk hashes are DOCUMENT-LOCAL, so the former per-word
    // posexplode + two lag windows + running-sum window + sort_array
    // (collect_list) rebuild — all shuffling the whole word stream by
    // doc — collapse into one narrow projection (guide §2.3/§2.4);
    // only the cross-document duplicate census below still exchanges.
    // Chunk boundaries, per-chunk word counts, and both md5 chains are
    // replicated exactly; array position = the former chunk_idx.
    graft.Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        posexplode(graft.functions.GraftFunctions.cdcChunks(col("text")))
          .as(Seq("chunk_idx", "c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.n_words").as("n_words"), col("c.chunk_hash").as("chunk_hash"))
      .groupBy(col("chunk_hash"))
      .agg(count(lit(1)).as("n_copies"), sum(col("n_words")).as("n_words_total"),
        min(struct(col("doc_id"), col("chunk_idx"))).as("k"))
      .filter(col("n_copies") > 1)
      .select(col("chunk_hash"), col("n_copies"), col("n_words_total"),
        col("k.doc_id").as("keep_doc"), col("k.chunk_idx").as("keep_idx"))
      .orderBy(col("chunk_hash"))
  }

  val cdcChunksSql: String =
    """WITH ww AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |w AS (SELECT doc_id, CAST(i - 1 AS INT) AS i, ws[i] AS w,
      |    CAST(concat('0x', substring(md5(ws[i]), 1, 8)) AS BIGINT) AS a
      |  FROM ww, unnest(range(1, len(ws) + 1)) AS t(i)),
      |b AS (SELECT doc_id, i, w,
      |        CASE WHEN lag(a, 2) OVER dw IS NOT NULL AND
      |          (a + 31 * lag(a, 1) OVER dw + 961 * lag(a, 2) OVER dw) % 8 = 0
      |          THEN 1 ELSE 0 END AS cut
      |      FROM w WINDOW dw AS (PARTITION BY doc_id ORDER BY i)),
      |c AS (SELECT doc_id, i, w,
      |        sum(cut) OVER (PARTITION BY doc_id ORDER BY i
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cut
      |          AS chunk_idx
      |      FROM b),
      |ch AS (SELECT doc_id, chunk_idx, count(*) AS n_words,
      |         md5(string_agg(w, ' ' ORDER BY i)) AS chunk_hash
      |       FROM c GROUP BY 1, 2)
      |SELECT chunk_hash, count(*) AS n_copies,
      |  CAST(sum(n_words) AS BIGINT) AS n_words_total,
      |  CAST(min(doc_id * 1000000 + chunk_idx) // 1000000 AS BIGINT) AS keep_doc,
      |  CAST(min(doc_id * 1000000 + chunk_idx) % 1000000 AS BIGINT) AS keep_idx
      |FROM ch GROUP BY chunk_hash HAVING count(*) > 1
      |ORDER BY chunk_hash""".stripMargin

  /** B16 — rolling 7-day active users (the WAU primitive): for each
    * day, distinct users active in the trailing week. NOT a range
    * join: each (user, day) activity row fans out to the ≤7 days it
    * keeps the user active for (a bounded explode — the
    * interval-to-delta move of q_concurrency applied to distincts),
    * then two keyed aggregates. Cost is 7×|user-days|, linear at any
    * scale; a range join would re-scan the activity table per day. */
  def rollingActive(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val mx = ud.agg(max(col("day")).as("mx"))
    ud.select(col("user_id"), explode(sequence(lit(0), lit(6))).as("i"), col("day"))
      .select(col("user_id"), expr("date_add(day, i)").as("d"))
      .distinct()
      .crossJoin(broadcast(mx))
      .filter(col("d") <= col("mx"))
      .groupBy(col("d").as("day"))
      .agg(count(lit(1)).as("wau"))
      .orderBy(col("day"))
  }

  val rollingActiveSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |mx AS (SELECT max(day) AS mx FROM ud),
      |sp AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS d
      |       FROM ud, unnest(range(0, 7)) AS t(i))
      |SELECT d AS day, count(*) AS wau
      |FROM sp, mx WHERE d <= mx
      |GROUP BY d ORDER BY day""".stripMargin

  /** Language-distribution rebalancing — the two-phase adaptive
    * sampler of corpus curation: per-language document counts set a
    * keep-rate min(1, (total/5)/count) (5 = number of languages, so
    * the target is a uniform mix), then a deterministic md5 coin per
    * document applies it. Phase 1 is one tiny aggregate (broadcast
    * back); phase 2 a pure map filter. */
  def langRebalance(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
      .withColumn("n_total", sum(col("n_lang")).over(Window.partitionBy()))
      .select(col("lang"),
        least(lit(1.0), (col("n_total").cast("double") / 5.0) / col("n_lang"))
          .as("keep_rate"))
    docs
      .join(broadcast(counts), Seq("lang"))
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .filter(col("h").cast("double") < col("keep_rate") * 4294967296.0)
      .select(col("doc_id"), col("lang"), round(col("keep_rate"), 6).as("keep_rate"))
      .orderBy(col("doc_id"))
  }

  val langRebalanceSql: String =
    """WITH c AS (SELECT lang, count(*) AS n_lang FROM documents GROUP BY lang),
      |r AS (SELECT lang,
      |        least(1.0, (CAST((SELECT count(*) FROM documents) AS DOUBLE) / 5.0) / n_lang)
      |          AS keep_rate
      |      FROM c)
      |SELECT d.doc_id, d.lang, round(r.keep_rate, 6) AS keep_rate
      |FROM documents d JOIN r ON d.lang = r.lang
      |WHERE CAST(CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS DOUBLE)
      |      < r.keep_rate * 4294967296.0
      |ORDER BY d.doc_id""".stripMargin

  /** regexp_extract_all surface (F1 beyond single-match extract): all
    * matches of a capture group per document, with occurrence order
    * preserved identically on both engines. */
  def regexpExtractAll(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("regexp_extract_all(text, '(s[a-z]+)', 1)").as("m"))
      .select(col("doc_id"), size(col("m")).as("n_matches"),
        array_join(slice(col("m"), 1, 3), ",").as("first3"))
      .orderBy(col("doc_id"))

  val regexpExtractAllSql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '(s[a-z]+)', 1)) AS INT) AS n_matches,
      |  coalesce(array_to_string(list_slice(regexp_extract_all(text, '(s[a-z]+)', 1), 1, 3), ','), '') AS first3
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Gaps-and-islands: consecutive-day activity runs per user. The
    * island key is epoch_day − row_number — pure integer arithmetic,
    * so the grouping is bit-portable. One distinct + one window + two
    * aggregates at any scale. */
  def activityIslands(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("dt")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("dt"))
    d.withColumn("rn", row_number().over(w))
      .withColumn("grp",
        datediff(col("dt"), lit("1970-01-01").cast("date")) - col("rn"))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("longest_run"))
      .orderBy(col("user_id"))
  }

  val activityIslandsSql: String =
    """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS dt FROM events),
      |g AS (SELECT user_id,
      |        datediff('day', DATE '1970-01-01', dt)
      |          - row_number() OVER (PARTITION BY user_id ORDER BY dt) AS grp
      |      FROM d),
      |i AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
      |SELECT user_id, count(*) AS n_islands, CAST(max(len) AS BIGINT) AS longest_run
      |FROM i GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Cumulative distinct users by day — the growth-curve query. New
    * users = first-seen-day counts; the running total is an integer
    * window sum. At scale: one first-touch aggregate (per user), one
    * daily count, one tiny ordered window. */
  def runningDistinctUsers(s: SparkSession, dir: String): DataFrame = {
    val firsts = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
    val daily = firsts.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    daily.withColumn("cum_users",
        sum(col("new_users")).over(Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("day"))
  }

  val runningDistinctUsersSql: String =
    """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id),
      |d AS (SELECT day, count(*) AS new_users FROM f GROUP BY day)
      |SELECT day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS cum_users
      |FROM d ORDER BY day""".stripMargin

  /** First-order Markov transition matrix over each user's event
    * sequence (ordered by epoch second, then event_id for cross-engine
    * tie stability): per (prev → next) counts and row-conditional
    * probabilities as exact int/int IEEE divisions. */
  def markovTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("sec"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = pairs.groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    counts
      .withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .select(col("prev_type"), col("next_type"), col("n"),
        (col("n").cast("double") / col("row_total")).as("p"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val markovTransitionsSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
      |p AS (SELECT event_type AS next_type,
      |        lag(event_type) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_type
      |      FROM e),
      |c AS (SELECT prev_type, next_type, count(*) AS n FROM p
      |      WHERE prev_type IS NOT NULL GROUP BY prev_type, next_type)
      |SELECT prev_type, next_type, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY prev_type) AS p
      |FROM c ORDER BY prev_type, next_type""".stripMargin

  /** Rolling z-score anomaly detection over daily event counts: a
    * 7-day ROWS window carries only exact integer sums (n, Σn, Σn²),
    * and mean/std/z are derived from them in one fixed chain of IEEE
    * ops — the deterministic form of moving-aggregate anomaly
    * flagging (float stddev over a frame would be summation-order
    * dependent). Full windows only; zero-variance windows excluded
    * before the division. */
  def anomalyZscore(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, 0)
    daily
      .withColumn("cnt7", count(lit(1)).over(w))
      .withColumn("sum7", sum(col("n")).over(w))
      .withColumn("ss7", sum(col("n") * col("n")).over(w))
      .filter(col("cnt7") === 7 &&
        col("cnt7") * col("ss7") > col("sum7") * col("sum7"))
      .withColumn("z",
        (col("n") * col("cnt7") - col("sum7")).cast("double") /
          (col("cnt7").cast("double") *
            sqrt((col("cnt7") * col("ss7") - col("sum7") * col("sum7")).cast("double") /
              (col("cnt7") * (col("cnt7") - 1)))))
      .filter(abs(col("z")) > 1.2)
      .select(col("day"), col("event_type"), col("n"), col("sum7"), col("ss7"),
        round(col("z"), 4).as("z"))
      .orderBy(col("day"), col("event_type"))
  }

  val anomalyZscoreSql: String =
    """WITH d AS (SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      |           FROM events GROUP BY 1, 2),
      |w AS (SELECT day, event_type, n,
      |        count(*) OVER win AS cnt7,
      |        CAST(sum(n) OVER win AS BIGINT) AS sum7,
      |        CAST(sum(n * n) OVER win AS BIGINT) AS ss7
      |      FROM d
      |      WINDOW win AS (PARTITION BY event_type ORDER BY day
      |                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |z AS (SELECT day, event_type, n, sum7, ss7,
      |        CAST(n * cnt7 - sum7 AS DOUBLE) /
      |          (CAST(cnt7 AS DOUBLE) *
      |           sqrt(CAST(cnt7 * ss7 - sum7 * sum7 AS DOUBLE) / (cnt7 * (cnt7 - 1)))) AS z
      |      FROM w WHERE cnt7 = 7 AND cnt7 * ss7 > sum7 * sum7)
      |SELECT day, event_type, n, sum7, ss7, round(z, 4) AS z
      |FROM z WHERE abs(z) > 1.2
      |ORDER BY day, event_type""".stripMargin

  /** Language-ID confusion matrix — the eval-style query for the
    * heuristic classifier in TextAnalysis.langId: labeled lang vs
    * predicted lang counts plus per-label recall shares (exact int
    * ratios). The prediction is the marker-count argmax with the
    * fixed en>de>es>fr tie order, expressed identically in both
    * engines. */
  def langConfusion(s: SparkSession, dir: String): DataFrame = {
    val pred = graft.operators.TextAnalysis.langId(Tables.documents(s, dir))
      .select(col("doc_id"), col("pred_lang"))
    val rows = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      .join(pred, Seq("doc_id"))
      .groupBy(col("lang"), col("pred_lang")).agg(count(lit(1)).as("n"))
    rows
      .withColumn("label_total",
        sum(col("n")).over(Window.partitionBy(col("lang"))))
      .select(col("lang"), col("pred_lang"), col("n"),
        (col("n").cast("double") / col("label_total")).as("share"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  val langConfusionSql: String =
    """WITH s AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
      |m AS (SELECT doc_id, lang,
      |        len(list_filter(w, x -> x IN ('the','and','of'))) AS s_en,
      |        len(list_filter(w, x -> x IN ('der','die','und'))) AS s_de,
      |        len(list_filter(w, x -> x IN ('el','los','que'))) AS s_es,
      |        len(list_filter(w, x -> x IN ('le','les','et'))) AS s_fr
      |      FROM s),
      |p AS (SELECT lang,
      |        CASE WHEN s_en >= greatest(s_de, s_es, s_fr) THEN 'en'
      |             WHEN s_de >= greatest(s_es, s_fr) THEN 'de'
      |             WHEN s_es >= s_fr THEN 'es'
      |             ELSE 'fr' END AS pred_lang
      |      FROM m),
      |c AS (SELECT lang, pred_lang, count(*) AS n FROM p GROUP BY 1, 2)
      |SELECT lang, pred_lang, n,
      |  CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY lang) AS share
      |FROM c ORDER BY lang, pred_lang""".stripMargin

  /** Time-weighted average of each user's event value — the correct
    * mean for irregularly-sampled signals (each reading weighted by
    * how long it was current). Values are quantized to exact integer
    * micro-units BEFORE weighting (floor(v·10⁶), deterministic on
    * identical doubles), weights are integer seconds from lead(), and
    * both sums run in DECIMAL(38,0) — so the only floating-point ops
    * are the final divisions, identical on both engines. */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"), col("event_id"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"),
        floor(col("value") * 1e6).cast("decimal(38,0)").as("vmu"))
      .withColumn("wt", (lead(col("sec"), 1).over(w) - col("sec")).cast("decimal(38,0)"))
      .filter(col("wt").isNotNull && col("wt") > 0)
      .groupBy(col("user_id"))
      .agg(sum(col("vmu") * col("wt")).as("swv"), sum(col("wt")).as("sw"))
      .select(col("user_id"), col("sw").cast("bigint").as("held_seconds"),
        (col("swv").cast("double") / col("sw").cast("double") / 1000000.0)
          .as("twa"))
      .orderBy(col("user_id"))
  }

  val timeWeightedAvgSql: String =
    """WITH e AS (SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
      |             CAST(floor(value * 1000000) AS DECIMAL(38,0)) AS vmu
      |           FROM events),
      |p AS (SELECT user_id, vmu,
      |        CAST(lead(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) - sec
      |             AS DECIMAL(38,0)) AS wt
      |      FROM e),
      |a AS (SELECT user_id, sum(vmu * wt) AS swv, sum(wt) AS sw
      |      FROM p WHERE wt IS NOT NULL AND wt > 0 GROUP BY user_id)
      |SELECT user_id, CAST(sw AS BIGINT) AS held_seconds,
      |  CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 1000000.0 AS twa
      |FROM a ORDER BY user_id""".stripMargin

  /** Discrete (no-interpolation) percentiles — the value actually
    * present in the data at rank ceil(p·n), selected explicitly via
    * row_number so both engines share the definition by construction
    * (built-in quantile_disc tie/rounding semantics differ across
    * engines). Groups too small to separate the ranks emit one row
    * labeled by the lower percentile. */
  def percentileDisc(s: SparkSession, dir: String): DataFrame = {
    // Order statistics only → one min/when aggregate over the staged
    // cumulative price census ([[graft.queries.PriceStage.census]]):
    // the value at rank ceil(n·q) IS the smallest price whose
    // cumulative count cwc reaches that rank. The former machinery
    // (range exchange + partition-count collect + rank-row filter)
    // collapses to a map-side-combining aggregate over ≤|price grid|
    // rows. The rank-collapse rule is preserved: when both percentile
    // ranks land on the same row (groups too small to separate them),
    // ONE row labeled by the lower percentile is emitted.
    val cuts = graft.queries.PriceStage.census(s, dir)
      .groupBy(col("l_returnflag"), col("nt"))
      .agg(
        min(when(col("cwc") >= ceil(col("nt") * 0.5).cast("bigint"),
          col("l_extendedprice"))).as("v50"),
        min(when(col("cwc") >= ceil(col("nt") * 0.9).cast("bigint"),
          col("l_extendedprice"))).as("v90"))
    cuts.select(col("l_returnflag"),
        explode(when(
          ceil(col("nt") * 0.5).cast("bigint") ===
            ceil(col("nt") * 0.9).cast("bigint"),
          array(struct(lit("p50").as("pct"), col("v50").as("value"))))
          .otherwise(array(
            struct(lit("p50").as("pct"), col("v50").as("value")),
            struct(lit("p90").as("pct"), col("v90").as("value"))))).as("x"))
      .select(col("l_returnflag"), col("x.pct").as("pct"),
        col("x.value").as("value"))
      .orderBy(col("l_returnflag"), col("pct"))
  }

  val percentileDiscSql: String =
    """WITH s AS (SELECT l_returnflag, l_extendedprice,
      |             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn
      |           FROM lineitem),
      |n AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1),
      |r AS (SELECT l_returnflag, CAST(ceil(n * 0.5) AS BIGINT) AS r50,
      |        CAST(ceil(n * 0.9) AS BIGINT) AS r90 FROM n)
      |SELECT s.l_returnflag, CASE WHEN rn = r50 THEN 'p50' ELSE 'p90' END AS pct,
      |  l_extendedprice AS value
      |FROM s JOIN r ON s.l_returnflag = r.l_returnflag
      |WHERE rn = r50 OR rn = r90
      |ORDER BY s.l_returnflag, pct""".stripMargin

  /** Int8 scalar quantization of embeddings — the compression step a
    * vector store applies before indexing (4× smaller than float32).
    * Per-vector absolute max sets the scale; each component maps to
    * floor(x·127/amax + 0.5), written identically in both engines
    * (builtin round() half-way semantics differ across engines;
    * floor(v + 0.5) does not). Narrow map over the corpus; emits the
    * quantized checksum + first component per vector. */
  def vectorQuantize(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .withColumn("amax",
        expr("array_max(transform(embedding, x -> abs(CAST(x AS DOUBLE))))"))
      .filter(col("amax") > 0)
      .select(col("vec_id"), round(col("amax"), 6).as("amax_r"),
        expr("aggregate(transform(embedding, " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D / amax + 0.5D) AS INT)), " +
          "0, (a, x) -> a + x)").as("qsum"),
        expr("CAST(floor(CAST(element_at(embedding, 1) AS DOUBLE) * 127.0D / amax + 0.5D) AS INT)")
          .as("q1"))
      .orderBy(col("vec_id"))

  val vectorQuantizeSql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |a AS (SELECT vec_id, emb,
      |        list_max(list_transform(emb, x -> abs(x))) AS amax FROM e)
      |SELECT vec_id, round(amax, 6) AS amax_r,
      |  CAST(list_sum(list_transform(emb,
      |    x -> CAST(floor(x * 127.0 / amax + 0.5) AS INT))) AS INT) AS qsum,
      |  CAST(floor(emb[1] * 127.0 / amax + 0.5) AS INT) AS q1
      |FROM a WHERE amax > 0
      |ORDER BY vec_id""".stripMargin

  /** 2-D histogram (heatmap binning): joint distribution of order
    * value × order month as fixed-width floor-division buckets — the
    * density-grid shape behind dashboard heatmaps and drift checks.
    * One partial/final aggregate; integer bucket math is bit-portable. */
  def histogram2d(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(expr("floor(o_totalprice / 100000.0D)").cast("int").as("price_b"),
        month(col("o_orderdate")).as("month_b"))
      .groupBy(col("price_b"), col("month_b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("price_b"), col("month_b"))

  val histogram2dSql: String =
    """SELECT CAST(floor(o_totalprice / 100000.0) AS INT) AS price_b,
      |  CAST(month(o_orderdate) AS INT) AS month_b,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY price_b, month_b""".stripMargin

  /** Fulfillment lag: days between order and each line's ship date,
    * aggregated per priority — the join+aggregate composite an ops
    * dashboard runs. Day differences are exact integers; the mean is
    * emitted with the engine-portable half-up integer rounding from
    * Conv ((2u + n) div 2n at scale 2). */
  def fulfillmentLag(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderpriority"),
      to_date(col("o_orderdate")).as("od"))
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"), datediff(col("sd"), col("od")).as("lag_days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("lag_days")).as("sum_days"),
        min(col("lag_days")).as("min_days"),
        max(col("lag_days")).as("max_days"))
      .select(col("o_orderpriority"), col("n"), col("sum_days"),
        col("min_days"), col("max_days"),
        // exact half-up mean at 2 decimals: (2·100·sum + n) div (2n) / 100
        expr("CAST((2 * sum_days * 100 + n) div (2 * n) AS DOUBLE) / 100.0")
          .as("avg_days"))
      .orderBy(col("o_orderpriority"))
  }

  val fulfillmentLagSql: String =
    """SELECT o_orderpriority, count(*) AS n,
      |  CAST(sum(lag_days) AS BIGINT) AS sum_days,
      |  CAST(min(lag_days) AS INT) AS min_days,
      |  CAST(max(lag_days) AS INT) AS max_days,
      |  CAST((2 * CAST(sum(lag_days) AS BIGINT) * 100 + count(*)) // (2 * count(*)) AS DOUBLE) / 100.0
      |    AS avg_days
      |FROM (SELECT o.o_orderpriority,
      |        datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS lag_days
      |      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Fixed-size per-stratum sample: exactly k rows per class, chosen
    * as the k smallest md5 ranks — the deterministic, engine-portable
    * replacement for reservoir sampling (same sample on every run,
    * engine, and cluster size; rate-based q_stratified_sample can't
    * promise an exact count). One window per class at any scale. */
  def fixedSizeSample(s: SparkSession, dir: String, k: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hh"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        md5(col("event_id").cast("string")).as("hh"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("event_id"), col("event_type"), col("rn"))
      .orderBy(col("event_type"), col("rn"))
  }

  val fixedSizeSampleSql: String =
    """SELECT event_id, event_type, CAST(rn AS INT) AS rn
      |FROM (SELECT event_id, event_type,
      |        row_number() OVER (PARTITION BY event_type
      |          ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rn
      |      FROM events)
      |WHERE rn <= 100 ORDER BY event_type, rn""".stripMargin

  /** The set-similarity measure family — Jaccard, Dice, overlap
    * coefficient, and directional containment from one intersection
    * pass — computed ONLY on MinHash-LSH candidate pairs (the same
    * collision-driven proposer as q_dedup_verified). Containment is
    * the signal that catches SUB-document duplication (a doc wholly
    * inside a larger one scores low Jaccard but containment ≈ 1).
    * All measures are single IEEE divisions over exact integers;
    * pairs bounded by overlap ≥ 0.5. The candidate stage means no
    * raw shingle-occurrence self-join ever happens: a hot shingle
    * shared by d documents costs d signature rows, never d² join
    * rows — the shape that survives 100 TB. Signature and shingle
    * set come from ONE fused digest pass (Dedup.shingleProfiles) —
    * the corpus is md5'd once, not once per stage. */
  def similarityMeasures(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prof = ShingleStage.profiles(s, dir)
      .persistScoped() // staged once per process; cached per query for its 3 readers
    val cands = Dedup.minhashCandidates(prof.select(col("doc_id"), col("sig")), 4)
    val sets = prof.select(col("doc_id"), col("hs"))
    cands
      .join(sets.select(col("doc_id").as("doc_id_a"), col("hs").as("ha")), Seq("doc_id_a"))
      .join(sets.select(col("doc_id").as("doc_id_b"), col("hs").as("hb")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        size(array_intersect(col("ha"), col("hb"))).as("i"),
        size(col("ha")).as("n_a"), size(col("hb")).as("n_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        (col("i").cast("double") / (col("n_a") + col("n_b") - col("i"))).as("jaccard"),
        (lit(2.0) * col("i") / (col("n_a") + col("n_b"))).as("dice"),
        (col("i").cast("double") / least(col("n_a"), col("n_b"))).as("overlap"),
        (col("i").cast("double") / col("n_a")).as("containment_a"))
      .filter(col("overlap") >= 0.5)
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** Oracle: the minhash band-candidate CTE chain (shared with
    * q_dedup_verified) composed with the exact shingle-set measures. */
  val similarityMeasuresSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |          i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
      |        FROM w WHERE len(w) >= 3),
      |hh AS (SELECT doc_id,
      |         CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
      |         CAST(concat('0x', substring(md5(shingle), 17, 14)) AS BIGINT) AS h2
      |       FROM occ),
      |mh AS (SELECT doc_id, j, min(h1 + j * h2) AS mh
      |       FROM hh, (SELECT unnest(range(0, 16)) AS j) GROUP BY doc_id, j),
      |sig AS (SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
      |        FROM mh GROUP BY doc_id),
      |bands AS (SELECT doc_id, b,
      |            array_to_string(list_slice(string_split(sig, ','), b * 4 + 1, b * 4 + 4), ',') AS band_sig
      |          FROM sig, (SELECT unnest(range(0, 4)) AS b)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b
      |           ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM occ),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.da, c.db, count(*) AS i
      |          FROM cand c JOIN sh a ON a.doc_id = c.da
      |          JOIN sh b ON b.doc_id = c.db AND b.shingle = a.shingle
      |          GROUP BY c.da, c.db)
      |SELECT inter.da AS doc_id_a, inter.db AS doc_id_b,
      |  CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard,
      |  2.0 * i / (sa.n_sh + sb.n_sh) AS dice,
      |  CAST(i AS DOUBLE) / least(sa.n_sh, sb.n_sh) AS overlap,
      |  CAST(i AS DOUBLE) / sa.n_sh AS containment_a
      |FROM inter JOIN sz sa ON inter.da = sa.doc_id
      |JOIN sz sb ON inter.db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= 0.5
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** The canonical two-stage near-dup pipeline at scale: MinHash-LSH
    * proposes candidate pairs (collision-driven, never all-pairs),
    * then EXACT n-gram Jaccard verifies only those candidates — the
    * verify step is an array_intersect over the two per-document hash
    * sets carried into the join, touching |candidates| pairs instead
    * of re-joining the corpus. This is the production shape: sketch
    * for recall, exact check for precision. Signature and shingle set
    * come from ONE fused digest pass (Dedup.shingleProfiles). */
  def dedupVerified(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val prof = ShingleStage.profiles(s, dir)
      .persistScoped() // staged once per process; cached per query for its 3 readers
    val cands = Dedup.minhashCandidates(prof.select(col("doc_id"), col("sig")), 4)
    val sets = prof.select(col("doc_id"), col("hs"))
    cands
      .join(sets.select(col("doc_id").as("doc_id_a"), col("hs").as("ha")), Seq("doc_id_a"))
      .join(sets.select(col("doc_id").as("doc_id_b"), col("hs").as("hb")), Seq("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        size(array_intersect(col("ha"), col("hb"))).as("i"),
        size(col("ha")).as("n_a"), size(col("hb")).as("n_b"))
      .withColumn("jaccard",
        col("i").cast("double") / (col("n_a") + col("n_b") - col("i")))
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_id_a"), col("doc_id_b"), col("jaccard"))
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  /** Oracle: the minhash band-candidate CTEs composed with the exact
    * shingle-set Jaccard CTEs — the same two proven pipelines the
    * standalone q_dedup_minhash / q_dedup_ngram oracles use. */
  val dedupVerifiedSql: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |occ AS (SELECT doc_id, unnest(list_transform(range(1, len(w) - 1),
      |          i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS shingle
      |        FROM w WHERE len(w) >= 3),
      |hh AS (SELECT doc_id,
      |         CAST(concat('0x', substring(md5(shingle), 1, 15)) AS BIGINT) AS h1,
      |         CAST(concat('0x', substring(md5(shingle), 17, 14)) AS BIGINT) AS h2
      |       FROM occ),
      |mh AS (SELECT doc_id, j, min(h1 + j * h2) AS mh
      |       FROM hh, (SELECT unnest(range(0, 16)) AS j) GROUP BY doc_id, j),
      |sig AS (SELECT doc_id, string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS sig
      |        FROM mh GROUP BY doc_id),
      |bands AS (SELECT doc_id, b,
      |            array_to_string(list_slice(string_split(sig, ','), b * 4 + 1, b * 4 + 4), ',') AS band_sig
      |          FROM sig, (SELECT unnest(range(0, 4)) AS b)),
      |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
      |         FROM bands a JOIN bands b
      |           ON a.b = b.b AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM occ),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT c.da, c.db, count(*) AS i
      |          FROM cand c JOIN sh a ON a.doc_id = c.da
      |          JOIN sh b ON b.doc_id = c.db AND b.shingle = a.shingle
      |          GROUP BY c.da, c.db)
      |SELECT inter.da AS doc_id_a, inter.db AS doc_id_b,
      |  CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
      |FROM inter JOIN sz sa ON inter.da = sa.doc_id
      |JOIN sz sb ON inter.db = sb.doc_id
      |WHERE CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) >= 0.3
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cohort_retention" -> (cohortRetention _),
    "q_funnel_steps" -> (funnelSteps _),
    "q_stratified_sample" -> (stratifiedSample _),
    "q_central_tendency" -> (centralTendency _),
    "q_listagg" -> (listaggStatus _),
    "q_event_entropy" -> (eventEntropy _),
    "q_repetition" -> (repetitionRatio _),
    "q_contamination" -> (contamination _),
    "q_robust_scale" -> (robustScale _),
    "q_inline_kv" -> (inlineKv _),
    "q_csv_roundtrip" -> (csvRoundtrip _),
    "q_bloom_prefilter" -> (bloomPrefilter _),
    "q_dedup_chunks" -> (dedupChunks _),
    "q_cdc_chunks" -> (cdcChunks _),
    "q_rolling_active" -> (rollingActive _),
    "q_lang_rebalance" -> (langRebalance _),
    "q_regexp_extract_all" -> (regexpExtractAll _),
    "q_activity_islands" -> (activityIslands _),
    "q_running_distinct" -> (runningDistinctUsers _),
    "q_markov_transitions" -> (markovTransitions _),
    "q_anomaly_zscore" -> (anomalyZscore _),
    "q_lang_confusion" -> (langConfusion _),
    "q_time_weighted_avg" -> (timeWeightedAvg _),
    "q_percentile_disc" -> (percentileDisc _),
    "q_vector_quantize" -> (vectorQuantize _),
    "q_histogram2d" -> (histogram2d _),
    "q_fulfillment_lag" -> (fulfillmentLag _),
    "q_fixed_size_sample" -> ((s, d) => fixedSizeSample(s, d)),
    "q_similarity_measures" -> (similarityMeasures _),
    "q_dedup_verified" -> (dedupVerified _),
  )

  val oracle: Map[String, String] = Map(
    "q_cohort_retention" -> cohortRetentionSql,
    "q_funnel_steps" -> funnelStepsSql,
    "q_stratified_sample" -> stratifiedSampleSql,
    "q_central_tendency" -> centralTendencySql,
    "q_listagg" -> listaggStatusSql,
    "q_event_entropy" -> eventEntropySql,
    "q_repetition" -> repetitionRatioSql,
    "q_contamination" -> contaminationSql,
    "q_robust_scale" -> robustScaleSql,
    "q_inline_kv" -> inlineKvSql,
    "q_csv_roundtrip" -> csvRoundtripSql,
    "q_bloom_prefilter" -> bloomPrefilterSql,
    "q_dedup_chunks" -> dedupChunksSql,
    "q_cdc_chunks" -> cdcChunksSql,
    "q_rolling_active" -> rollingActiveSql,
    "q_lang_rebalance" -> langRebalanceSql,
    "q_regexp_extract_all" -> regexpExtractAllSql,
    "q_activity_islands" -> activityIslandsSql,
    "q_running_distinct" -> runningDistinctUsersSql,
    "q_markov_transitions" -> markovTransitionsSql,
    "q_anomaly_zscore" -> anomalyZscoreSql,
    "q_lang_confusion" -> langConfusionSql,
    "q_time_weighted_avg" -> timeWeightedAvgSql,
    "q_percentile_disc" -> percentileDiscSql,
    "q_vector_quantize" -> vectorQuantizeSql,
    "q_histogram2d" -> histogram2dSql,
    "q_fulfillment_lag" -> fulfillmentLagSql,
    "q_fixed_size_sample" -> fixedSizeSampleSql,
    "q_similarity_measures" -> similarityMeasuresSql,
    "q_dedup_verified" -> dedupVerifiedSql,
  )
}
