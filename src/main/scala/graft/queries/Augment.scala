package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Caches.PersistScoped
import graft.operators.{Dedup, Similarity}

/** Round-8 extension pack: asymmetric containment near-dup pairs,
  * kNN label classification over the embedding corpus, and the
  * nested-document JSON export (the repeated-record sink shape of the
  * reference's warehouse target). Conventions per ARCHITECTURE.md
  * "Cross-engine determinism".
  */
object Augment {

  /** L2u — directional shingle containment: pairs where ≥80% of one
    * document's 3-gram shingles appear in the other — the
    * doc-inside-doc duplication (quoted copies, boilerplate-wrapped
    * mirrors) that symmetric Jaccard under-scores as the host
    * document grows. See [[Dedup.shingleContainmentPairs]]. */
  def containmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentFromOverlap(ShingleStage.overlap3(s, dir), 0.8)
      .orderBy(col("doc_id_a"), col("doc_id_b"))

  val containmentPairsSql: String =
    s"""${Llm.shingleCte},
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      |inter AS (SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS i
      |          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |          GROUP BY 1, 2)
      |SELECT da AS doc_id_a, db AS doc_id_b,
      |  CAST(i AS DOUBLE) / sa.n_sh AS c_a,
      |  CAST(i AS DOUBLE) / sb.n_sh AS c_b,
      |  CAST(i AS DOUBLE) / (sa.n_sh + sb.n_sh - i) AS jaccard
      |FROM inter JOIN sz sa ON da = sa.doc_id JOIN sz sb ON db = sb.doc_id
      |WHERE greatest(CAST(i AS DOUBLE) / sa.n_sh, CAST(i AS DOUBLE) / sb.n_sh)
      |        >= 0.8
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** L27 — kNN label classification: the first 20 vectors play
    * "unlabeled probes" (a FIXED-SIZE held-out prefix — the probe set
    * is broadcast, so it must not grow with the corpus; the original
    * every-25th-vector holdout was 4% of the data and would have
    * broadcast a corpus-sized relation at 100 TB — caught by
    * PlanGuardSpec's boundedness proof); each probe's label is
    * predicted by majority vote over its 5 nearest labeled neighbors
    * by cosine (ties → more votes first, then smaller label — fully
    * deterministic). The scoring reuses the broadcast-probe
    * brute-force scan with the bounded-heap top-k
    * ([[Similarity.bruteForceTopK]]), so the exchange carries ≤5 rows
    * per (probe × partition); the vote is one 5-rows-per-probe
    * aggregate with a max(struct) argmax. Emitting the held-out true
    * label alongside makes the query its own accuracy readout — the
    * label-propagation / weak-supervision primitive of a training-data
    * pipeline. */
  def knnClassify(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val probes = emb.filter(col("vec_id") < 20)
    val labeled = emb.filter(col("vec_id") >= 20)
    val top = Similarity.bruteForceTopK(probes, labeled, 5)
    // both lookup joins broadcast the SMALL side (probes and the
    // k·|probes|-row top table): attaching labels must never shuffle
    // the corpus-scale labeled projection
    val voted = broadcast(top
      .join(broadcast(probes.select(col("vec_id").as("probe_id"),
        col("label").as("true_label"))), Seq("probe_id")))
      .join(labeled.select(col("vec_id").as("neighbor_id"),
        col("label").as("nbr_label")), Seq("neighbor_id"))
      .groupBy(col("probe_id"), col("true_label"), col("nbr_label"))
      .agg(count(lit(1)).as("votes"))
    voted.groupBy(col("probe_id"), col("true_label"))
      .agg(max(struct(col("votes"), (-col("nbr_label")).as("neg"))).as("m"))
      .select(col("probe_id"), col("true_label"),
        (-col("m.neg")).cast("int").as("pred_label"),
        col("m.votes").as("votes"))
      .orderBy(col("probe_id"))
  }

  val knnClassifySql: String =
    """WITH n AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e,
      |             sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
      |               CAST(embedding AS DOUBLE[]))) AS nrm
      |           FROM embeddings),
      |scored AS (SELECT p.vec_id AS probe_id, p.label AS true_label,
      |             c.label AS nbr_label,
      |             list_dot_product(p.e, c.e) / (p.nrm * c.nrm) AS cosine,
      |             c.vec_id AS neighbor_id
      |           FROM n p JOIN n c
      |             ON p.vec_id < 20 AND c.vec_id >= 20),
      |top AS (SELECT * FROM (
      |          SELECT *, row_number() OVER (PARTITION BY probe_id
      |            ORDER BY cosine DESC, neighbor_id) AS rnk
      |          FROM scored) WHERE rnk <= 5),
      |v AS (SELECT probe_id, true_label, nbr_label, count(*) AS votes
      |      FROM top GROUP BY 1, 2, 3),
      |pick AS (SELECT *, row_number() OVER (PARTITION BY probe_id
      |           ORDER BY votes DESC, nbr_label) AS rn FROM v)
      |SELECT probe_id, true_label, CAST(nbr_label AS INT) AS pred_label,
      |  votes
      |FROM pick WHERE rn = 1 ORDER BY probe_id""".stripMargin

  /** S13 — nested-document export: each customer's orders folded into
    * one JSON document with a repeated `orders` record sorted by order
    * key — the denormalized nested/repeated sink shape of the
    * reference's warehouse target (a load-ready row per entity, no
    * join at read time). The document string is assembled with
    * explicit concatenation so both engines produce identical bytes;
    * per-customer arrays sort inside the aggregate (array_sort over a
    * (key, fragment) struct), so output is partitioning-independent.
    * One shuffle (the per-customer fold); the customer join
    * broadcasts nothing — the group key IS the customer key. */
  def nestedExport(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).select(col("o_custkey"), col("o_orderkey"),
      concat(lit("{\"o\":"), col("o_orderkey"),
        lit(",\"d\":\""), date_format(col("o_orderdate"), "yyyy-MM-dd"),
        lit("\",\"c\":"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"),
        lit("}")).as("j"))
    o.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        array_sort(collect_list(struct(col("o_orderkey"), col("j")))).as("frags"))
      .select(col("o_custkey"), col("n_orders"),
        concat(lit("{\"custkey\":"), col("o_custkey"),
          lit(",\"orders\":["),
          array_join(transform(col("frags"), f => f.getField("j")), ","),
          lit("]}")).as("doc"))
      .orderBy(col("o_custkey"))
  }

  val nestedExportSql: String =
    """WITH o AS (SELECT o_custkey, o_orderkey,
      |    concat('{"o":', CAST(o_orderkey AS VARCHAR),
      |      ',"d":"', CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
      |      '","c":', CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |        AS BIGINT) AS VARCHAR), '}') AS j
      |  FROM orders)
      |SELECT o_custkey, count(*) AS n_orders,
      |  concat('{"custkey":', CAST(o_custkey AS VARCHAR), ',"orders":[',
      |    string_agg(j, ',' ORDER BY o_orderkey), ']}') AS doc
      |FROM o GROUP BY o_custkey
      |ORDER BY o_custkey""".stripMargin

  /** B17 — DAU/MAU stickiness: for each day, distinct users active
    * that day over distinct users active in the trailing 28 days —
    * the engagement-intensity ratio next to [[Analytics.rollingActive]]'s
    * WAU. Same scale shape: the rolling distinct is a BOUNDED 28-day
    * fan-out explode (28×|user-days|, linear; never a range join that
    * re-scans activity per day), the daily distinct one keyed
    * aggregate, and the ratio a single exact-int division. */
  def stickiness(s: SparkSession, dir: String): DataFrame = {
    val ud = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val mx = ud.agg(max(col("day")).as("mx"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val mau = ud
      .select(col("user_id"), explode(sequence(lit(0), lit(27))).as("i"), col("day"))
      .select(col("user_id"), expr("date_add(day, i)").as("day"))
      .distinct()
      .crossJoin(broadcast(mx))
      .filter(col("day") <= col("mx"))
      .groupBy(col("day")).agg(count(lit(1)).as("mau"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau"), col("mau"),
        (col("dau").cast("double") / col("mau")).as("stickiness"))
      .orderBy(col("day"))
  }

  val stickinessSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |mx AS (SELECT max(day) AS mx FROM ud),
      |dau AS (SELECT day, count(*) AS dau FROM ud GROUP BY day),
      |sp AS (SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
      |       FROM ud, unnest(range(0, 28)) AS t(i)),
      |mau AS (SELECT day, count(*) AS mau FROM sp, mx WHERE day <= mx
      |        GROUP BY day)
      |SELECT dau.day, dau, mau, CAST(dau AS DOUBLE) / mau AS stickiness
      |FROM dau JOIN mau ON dau.day = mau.day
      |ORDER BY dau.day""".stripMargin

  /** B23 — funnel step latency: per user, first signup to first
    * subsequent purchase; the output is the conversion-latency
    * quantile profile (exact interpolated p25/p50/p75 over epoch-
    * microsecond deltas — exact integers) plus the converted-user
    * count. Two keyed aggregates over the event stream (min per step,
    * conditional min for the ordered second step) — the time-to-
    * convert companion of [[Analytics.funnelSteps]]' reach counts. */
  def funnelLatency(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
    val steps = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "signup", col("us"))).as("t0"))
    val conv = e.join(steps, Seq("user_id"))
      .filter(col("event_type") === "purchase" && col("us") >= col("t0"))
      .groupBy(col("user_id"), col("t0")).agg(min(col("us")).as("t1"))
      // integer DIV to match the oracle's `//` (Column./ is double division)
      .select(expr("CAST((t1 - t0) DIV 1000000 AS DOUBLE)").as("lag_s"))
    conv.agg(count(lit(1)).as("n_converted"),
      expr("percentile(lag_s, 0.25D)").as("p25_s"),
      expr("percentile(lag_s, 0.5D)").as("p50_s"),
      expr("percentile(lag_s, 0.75D)").as("p75_s"))
  }

  val funnelLatencySql: String =
    """WITH e AS (SELECT user_id, event_type,
      |    epoch_us(ts) AS us FROM events),
      |s0 AS (SELECT user_id,
      |         min(CASE WHEN event_type = 'signup' THEN us END) AS t0
      |       FROM e GROUP BY user_id),
      |conv AS (SELECT CAST((min(us) - t0) // 1000000 AS DOUBLE) AS lag_s
      |         FROM e JOIN s0 USING (user_id)
      |         WHERE event_type = 'purchase' AND us >= t0
      |         GROUP BY e.user_id, t0)
      |SELECT count(*) AS n_converted,
      |  quantile_cont(lag_s, 0.25) AS p25_s,
      |  quantile_cont(lag_s, 0.5) AS p50_s,
      |  quantile_cont(lag_s, 0.75) AS p75_s
      |FROM conv""".stripMargin

  /** B21 — most common opening event paths: each user's first three
    * events (ordered by ts, event_id — a total order, so the path is
    * deterministic under any partitioning) concatenated into a path
    * string, counted across users, top 15 under a total order. The
    * path build is one per-user window + one per-user aggregate whose
    * sorted-struct collect is bounded at 3 elements — Markov
    * transitions (B6) give the 1-step view; this is the short-horizon
    * multi-step view an onboarding funnel designer reads. */
  def commonPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val first3 = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    first3.groupBy(col("user_id"))
      .agg(count(lit(1)).as("k"),
        array_join(expr("transform(array_sort(collect_list(struct(rn, event_type)))," +
          " e -> e.event_type)"), ">").as("path"))
      .filter(col("k") === 3)
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(15)
  }

  val commonPathsSql: String =
    """WITH r AS (SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (SELECT user_id, count(*) AS k,
      |        string_agg(event_type, '>' ORDER BY rn) AS path
      |      FROM r WHERE rn <= 3 GROUP BY user_id)
      |SELECT path, count(*) AS n_users FROM p WHERE k = 3
      |GROUP BY path ORDER BY n_users DESC, path LIMIT 15""".stripMargin

  /** G24 — bitmap-index distinct + day-over-day set algebra: daily
    * active users, returning users (yesterday ∩ today), and churned
    * users (yesterday ∖ today) computed from ONE pass over the fact
    * table via the [[graft.operators.BitmapAgg]] fixed-universe bitmap
    * aggregate — the map side combines each partition to an 8 KiB
    * bitmap per day, cardinality is a popcount, and the overlap/churn
    * are word-wise AND / AND-NOT between two days' bitmaps with NO
    * second scan or self-join of raw events (the reason engines keep
    * bitmap indexes). The day-to-day join is calendar-keyed
    * (day = prev_day + 1), so a silent day gap yields no row rather
    * than a wrong neighbor. Oracle: the classic two-scan
    * distinct + self-join formulation — same numbers, twice the reads. */
  def bitmapRetention(s: SparkSession, dir: String): DataFrame = {
    val bm = udaf(new graft.operators.BitmapAgg(1 << 16))
    val daily = Tables.events(s, dir)
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .groupBy(col("day")).agg(bm(col("user_id")).as("bits"))
      .persistScoped() // read as both today and yesterday
    val prev = daily.select(date_add(col("day"), 1).as("day"),
      col("bits").as("prev_bits"))
    daily.join(prev, Seq("day"), "left")
      .select(col("day"),
        expr("aggregate(transform(bits, w -> bit_count(w)), 0, (a, b) -> a + b)")
          .cast("bigint").as("dau"),
        coalesce(
          expr("aggregate(zip_with(bits, prev_bits, (x, y) -> bit_count(x & y)), " +
            "0, (a, b) -> a + b)").cast("bigint"),
          lit(0L)).as("returning"),
        coalesce(
          expr("aggregate(zip_with(prev_bits, bits, (x, y) -> bit_count(x & ~y)), " +
            "0, (a, b) -> a + b)").cast("bigint"),
          lit(0L)).as("churned"))
      .orderBy(col("day"))
  }

  val bitmapRetentionSql: String =
    """WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      |d AS (SELECT day, count(*) AS dau FROM du GROUP BY day),
      |r AS (SELECT a.day, count(*) AS returning
      |      FROM du a JOIN du b
      |        ON b.day = a.day - 1 AND b.user_id = a.user_id
      |      GROUP BY a.day),
      |c AS (SELECT b.day + 1 AS day, count(*) AS churned
      |      FROM du b
      |      WHERE NOT EXISTS (SELECT 1 FROM du a
      |        WHERE a.day = b.day + 1 AND a.user_id = b.user_id)
      |      GROUP BY b.day + 1)
      |SELECT d.day, d.dau,
      |  CAST(coalesce(r.returning, 0) AS BIGINT) AS returning,
      |  CAST(coalesce(c.churned, 0) AS BIGINT) AS churned
      |FROM d LEFT JOIN r USING (day) LEFT JOIN c USING (day)
      |ORDER BY day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bitmap_retention" -> (bitmapRetention _),
    "q_common_paths" -> (commonPaths _),
    "q_containment" -> (containmentPairs _),
    "q_knn_classify" -> (knnClassify _),
    "q_nested_export" -> (nestedExport _),
    "q_stickiness" -> (stickiness _),
    "q_funnel_latency" -> (funnelLatency _),
  )

  val oracle: Map[String, String] = Map(
    "q_bitmap_retention" -> bitmapRetentionSql,
    "q_common_paths" -> commonPathsSql,
    "q_containment" -> containmentPairsSql,
    "q_knn_classify" -> knnClassifySql,
    "q_nested_export" -> nestedExportSql,
    "q_stickiness" -> stickinessSql,
    "q_funnel_latency" -> funnelLatencySql,
  )
}
