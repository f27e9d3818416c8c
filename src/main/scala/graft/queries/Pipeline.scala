package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Caches.PersistScoped

/** Data-pipeline operators beyond the round-1 inventory: change-data
  * capture (snapshot diff), batch merge/upsert, deterministic
  * hash-based sampling and train/val/test splits, per-group feature
  * scaling, the bitwise function surface, edit-distance near-dup,
  * TF-IDF term weighting, exact fixed-point vector centroids, and
  * exact interpolated percentiles.
  *
  * These mirror what a large-scale training-data / ETL pipeline runs
  * around the core migration loop: detecting drift between snapshots
  * (the reference's validation, strengthened to row level), applying
  * incremental updates, carving reproducible samples, and normalizing
  * features — each expressed as a declarative plan Catalyst can push
  * down and partial-aggregate, never a driver-side loop.
  */
object Pipeline {

  /** CDC — snapshot diff: FULL OUTER join two snapshots on the PK and
    * classify each key as Insert / Delete / Update (unchanged rows are
    * dropped). This is the row-level upgrade of the reference's
    * count-compare validation (A6): at 100 TB both sides shuffle once
    * on the join key and unchanged rows never leave the join.
    * Snapshots are derived deterministically from the fixture: the
    * "old" snapshot is missing keys ≡3 (mod 10) and has a stale price
    * on keys ≡0 (mod 7); the "new" one is missing keys ≡4 (mod 10). */
  /** The simulated YESTERDAY snapshot shared by C1 (capture) and C2b
    * (apply): every 10th key missing (those become inserts), every 7th
    * price perturbed (those become updates). One definition — the
    * capture∘apply = identity oracle depends on both operators seeing
    * the SAME simulation. */
  private def oldSnapshot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).filter(expr("o_orderkey % 10 != 3"))
      .select(col("o_orderkey").as("key"),
        expr("CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0D ELSE o_totalprice END")
          .as("old_price"))

  /** Unsorted I/U/D core shared by C1 (capture, sorted for the
    * oracle) and C2b (apply, which needs no sort). */
  private def changelog(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val old = oldSnapshot(s, dir)
    val nw = o.filter(expr("o_orderkey % 10 != 4"))
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("new_price"))
    old.join(nw, Seq("key"), "full_outer")
      .withColumn("op",
        when(col("old_price").isNull, "I")
          .when(col("new_price").isNull, "D")
          .when(col("old_price") =!= col("new_price"), "U"))
      .filter(col("op").isNotNull)
      .select(col("key"), col("op"), col("old_price"), col("new_price"))
  }

  def changeCapture(s: SparkSession, dir: String): DataFrame =
    changelog(s, dir).orderBy(col("key"))

  val changeCaptureSql: String =
    """WITH old AS (SELECT o_orderkey AS key,
      |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 50.0 ELSE o_totalprice END AS old_price
      |  FROM orders WHERE o_orderkey % 10 != 3),
      |nw AS (SELECT o_orderkey AS key, o_totalprice AS new_price
      |  FROM orders WHERE o_orderkey % 10 != 4)
      |SELECT coalesce(old.key, nw.key) AS key,
      |  CASE WHEN old.key IS NULL THEN 'I'
      |       WHEN nw.key IS NULL THEN 'D'
      |       WHEN old_price <> new_price THEN 'U' END AS op,
      |  old_price, new_price
      |FROM old FULL OUTER JOIN nw ON old.key = nw.key
      |WHERE old.key IS NULL OR nw.key IS NULL OR old_price <> new_price
      |ORDER BY key""".stripMargin

  /** Merge/upsert (SCD type 1): apply an update batch over a target by
    * key, newest wins — union + row_number, the shuffle-once batch
    * formulation of MERGE INTO (Delta/Iceberg would express the same
    * plan). The update batch bumps every key ≡0 (mod 5). */
  def mergeUpsert(s: SparkSession, dir: String): DataFrame = {
    val target = Tables.orders(s, dir)
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"),
        lit(0).as("src"))
    val upd = Tables.orders(s, dir)
      .filter(expr("o_orderkey % 5 = 0"))
      .select(col("o_orderkey").as("key"),
        (col("o_totalprice") + lit(10.0)).as("price"), lit(1).as("src"))
    val w = Window.partitionBy(col("key")).orderBy(col("src").desc)
    target.unionByName(upd)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("key") < 3000)
      .select(col("key"), col("price"), col("src").as("from_update"))
      .orderBy(col("key"))
  }

  val mergeUpsertSql: String =
    """SELECT key, price, from_update FROM (
      |  SELECT key, price, src AS from_update,
      |    row_number() OVER (PARTITION BY key ORDER BY src DESC) AS rn
      |  FROM (
      |    SELECT o_orderkey AS key, o_totalprice AS price, 0 AS src FROM orders
      |    UNION ALL
      |    SELECT o_orderkey AS key, o_totalprice + 10.0 AS price, 1 AS src
      |    FROM orders WHERE o_orderkey % 5 = 0))
      |WHERE rn = 1 AND key < 3000
      |ORDER BY key""".stripMargin

  /** Deterministic hash sampling + split assignment: a 10% sample and
    * a train/val/test split keyed on md5 of the PK — reproducible
    * across runs, engines and cluster sizes (unlike rand()-based
    * TABLESAMPLE), and embarrassingly parallel: a pure map-side filter
    * with no shuffle at any scale. */
  def hashSample(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
      .filter(col("h") < 10)
      .select(col("o_orderkey"), col("h").cast("int").as("h"),
        when(col("h") < 8, "train").when(col("h") < 9, "val").otherwise("test")
          .as("split"))
      .orderBy(col("o_orderkey"))

  val hashSampleSql: String =
    """SELECT o_orderkey, CAST(h AS INT) AS h,
      |  CASE WHEN h < 8 THEN 'train' WHEN h < 9 THEN 'val' ELSE 'test' END AS split
      |FROM (SELECT o_orderkey,
      |        CAST(concat('0x', substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS h
      |      FROM orders)
      |WHERE h < 10 ORDER BY o_orderkey""".stripMargin

  /** Per-group min-max feature scaling via an unordered window — the
    * normalization step before model training. (x−min)/(max−min) is
    * two exactly-rounded IEEE ops on exact inputs, so the raw double
    * is oracle-safe; degenerate constant groups scale to NULL via
    * nullif rather than dividing by zero. */
  def minmaxScale(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_returnflag"))
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 2000)
      .withColumn("mn", min(col("l_extendedprice")).over(w))
      .withColumn("mx", max(col("l_extendedprice")).over(w))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_extendedprice"),
        ((col("l_extendedprice") - col("mn")) /
          nullif(col("mx") - col("mn"), lit(0.0))).as("scaled"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic fixture —
      // order by every output column so any remaining ties are identical rows.
      .orderBy(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_returnflag"))
  }

  val minmaxScaleSql: String =
    """SELECT l_orderkey, l_linenumber, l_returnflag, l_extendedprice,
      |  (l_extendedprice - min(l_extendedprice) OVER w) /
      |    nullif(max(l_extendedprice) OVER w - min(l_extendedprice) OVER w, 0) AS scaled
      |FROM lineitem WHERE l_orderkey < 2000
      |WINDOW w AS (PARTITION BY l_returnflag)
      |ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_returnflag""".stripMargin

  /** F7 — bitwise function surface: and/or/xor, shifts, popcount.
    * Exact integer ops, trivially portable. (DuckDB's ^ is POWER, so
    * the oracle spells xor(); Spark's ^ is XOR.) */
  def bitwiseFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 5000)
      .select(
        col("o_orderkey"),
        expr("o_orderkey & 255").as("and255"),
        expr("o_orderkey | 15").as("or15"),
        expr("o_orderkey ^ o_custkey").as("xor_cust"),
        expr("shiftleft(o_orderkey & 255, 2)").as("shl2"),
        expr("shiftright(o_orderkey, 3)").as("shr3"),
        expr("CAST(bit_count(o_orderkey) AS INT)").as("pop"))
      .orderBy(col("o_orderkey"))

  val bitwiseFuncsSql: String =
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS and255,
      |  o_orderkey | 15 AS or15,
      |  xor(o_orderkey, o_custkey) AS xor_cust,
      |  (o_orderkey & 255) << 2 AS shl2,
      |  o_orderkey >> 3 AS shr3,
      |  CAST(bit_count(o_orderkey) AS INT) AS pop
      |FROM orders WHERE o_orderkey < 5000 ORDER BY o_orderkey""".stripMargin

  /** L2f — edit-distance near-dup: levenshtein over candidate pairs
    * blocked on (lang, length bucket). Blocking is the scale lever —
    * the quadratic pair space exists only inside a block, and a true
    * near-dup pair lands in the same or adjacent bucket (adjacent
    * buckets are omitted here; candidate recall is the documented
    * tradeoff, exactly as in MinHash banding). */
  def dedupLevenshtein(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir)
      .filter(col("n_chars").between(30, 150))
      .select(col("doc_id"), col("text"), col("lang"),
        expr("floor(n_chars / 10.0D)").as("lb"))
    val a = base.select(col("lang"), col("lb"), col("doc_id").as("doc_id_a"),
      col("text").as("text_a"))
    val b = base.select(col("lang"), col("lb"), col("doc_id").as("doc_id_b"),
      col("text").as("text_b"))
    a.join(b, Seq("lang", "lb"))
      .filter(col("doc_id_a") < col("doc_id_b"))
      .select(col("doc_id_a"), col("doc_id_b"),
        levenshtein(col("text_a"), col("text_b")).as("dist"))
      .filter(col("dist") <= 20)
      .orderBy(col("doc_id_a"), col("doc_id_b"))
  }

  val dedupLevenshteinSql: String =
    """WITH base AS (SELECT doc_id, text, lang,
      |    CAST(floor(n_chars / 10.0) AS BIGINT) AS lb
      |  FROM documents WHERE n_chars BETWEEN 30 AND 150)
      |SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
      |  CAST(levenshtein(a.text, b.text) AS INT) AS dist
      |FROM base a JOIN base b
      |  ON a.lang = b.lang AND a.lb = b.lb AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.text, b.text) <= 20
      |ORDER BY doc_id_a, doc_id_b""".stripMargin

  /** L4h — TF-IDF term weighting: tf from a (doc, term) aggregate, df
    * from a term aggregate, N as a broadcast scalar; idf = ln(N/df) is
    * a single libm op on a double from exact integer division — checked
    * bit-identical across engines on the fixture vocabulary. Classic
    * map-side-combining shape: both aggregates partial-combine before
    * their shuffles, and the df table (vocabulary-sized) broadcasts. */
  def tfIdf(s: SparkSession, dir: String): DataFrame =
    tfIdfCore(s, dir).orderBy(col("doc_id"), col("term"))

  /** The un-sorted tf-idf pipeline. [[tfIdf]] adds the output contract's
    * total order; [[topTerms]] consumes THIS — its per-doc rank window
    * re-shuffles by doc_id anyway, so a global range sort in between
    * would be a sampling job plus a sort whose order is immediately
    * discarded. */
  private def tfIdfCore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val toks = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
    // tf is read twice (df's broadcast + the main join); persist so the
    // corpus-wide explode+aggregate runs once, not once per reader.
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .persistScoped()
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(n))
      .filter(col("df") >= 5 && col("doc_id") < 50)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        (col("tf") * log(col("n_docs").cast("double") / col("df"))).as("tfidf"))
  }

  val tfIdfSql: String =
    """WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |    FROM documents),
      |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |    FROM toks WHERE term <> '' GROUP BY doc_id, term),
      |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
      |SELECT doc_id, tf.term, tf, df,
      |  tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf
      |FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
      |WHERE df >= 5 AND doc_id < 50
      |ORDER BY doc_id, tf.term""".stripMargin

  /** G6-oracle — exact per-label centroids in fixed point: each
    * element is quantized with floor(x·10⁶) BEFORE the sum, so the
    * aggregation is exact integer arithmetic — order-independent,
    * partial-aggregable, and bit-identical on any engine. This is the
    * oracle-checkable twin of the VectorMean Aggregator (whose raw
    * double mean is summation-order-dependent); at 100 TB the same
    * trick makes centroid computation reproducible across reruns. */
  def vectorCentroidsFp(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("label"), posexplode(col("embedding")))
      .select(col("label"), col("pos").cast("int").as("dim"),
        expr("CAST(floor(CAST(col AS DOUBLE) * 1000000.0D) AS BIGINT)").as("fp"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("fp")).as("sum_fp"), count(lit(1)).as("n"))
      .orderBy(col("label"), col("dim"))

  val vectorCentroidsFpSql: String =
    """SELECT label, CAST(j AS INT) AS dim,
      |  CAST(sum(CAST(floor(CAST(embedding[CAST(j AS INT) + 1] AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_fp,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM embeddings, (SELECT unnest(range(0, 64)) AS j) js
      |GROUP BY label, j ORDER BY label, dim""".stripMargin

  /** G9 — exact interpolated percentiles (quantile_cont semantics):
    * index p·(n−1) into the sorted values, linear interpolation. The
    * sort-based exact form the approx sketch (q_percentile_approx)
    * replaces at scale; inputs are small integers so the interpolation
    * arithmetic is exact on both engines. */
  def percentileExact(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25D)").as("p25"),
        expr("percentile(l_quantity, 0.5D)").as("p50"),
        expr("percentile(l_quantity, 0.75D)").as("p75"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val percentileExactSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.25) AS p25,
      |  quantile_cont(l_quantity, 0.5) AS p50,
      |  quantile_cont(l_quantity, 0.75) AS p75,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Skew-resistant aggregation: salt the hot key space into 8
    * sub-keys, partial-aggregate per (key, salt), then combine — the
    * classic two-level rewrite for keys too hot for one reducer. The
    * result is identical to the direct groupBy (the oracle computes it
    * directly), which is the point: salting is a physical rewrite, not
    * a semantic one. At 100 TB AQE's skew handling covers joins; this
    * pattern covers aggregations whose partials are small (sum/count). */
  def aggSalted(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("salt", expr("pmod(xxhash64(l_orderkey, l_linenumber), 8)"))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(sum(Conv.dec2(col("l_quantity"))).as("psum"), count(lit(1)).as("pn"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("psum")).cast("double").as("sum_qty"),
        sum(col("pn")).as("n"))
      .orderBy(col("l_returnflag"))

  val aggSaltedSql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** W3-ext — RANGE frame (value-based, not row-based): a trailing
    * 3-day running total per customer, expressed over epoch seconds so
    * both engines frame identically. RANGE frames are the window shape
    * row frames can't express when rows per day vary. */
  def windowRangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"))
      .rangeBetween(-3L * 86400L, 0L)
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 50)
      .withColumn("od", unix_timestamp(col("o_orderdate")))
      .withColumn("trail3d",
        sum(Conv.dec2(col("o_totalprice"))).over(w))
      .select(col("o_custkey"), col("o_orderkey"), col("od"),
        col("trail3d").cast("double").as("trail3d"))
      .orderBy(col("o_custkey"), col("od"), col("o_orderkey"))
  }

  val windowRangeFrameSql: String =
    """SELECT o_custkey, o_orderkey, od,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
      |    (PARTITION BY o_custkey ORDER BY od
      |     RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trail3d
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        CAST(floor(epoch(o_orderdate)) AS BIGINT) AS od FROM orders)
      |WHERE o_custkey < 50
      |ORDER BY o_custkey, od, o_orderkey""".stripMargin

  /** G10 — Spearman rank correlation, exactly: rank() ties get equal
    * ranks, so each row's (rank_q, rank_p) pair is a pure function of
    * its VALUES (row_number would pair identical rows arbitrarily and
    * break determinism); all power sums are exact integer aggregates,
    * and the final Pearson-over-ranks formula is a fixed sequence of
    * casts and IEEE ops — bit-identical on both engines. */
  def rankCorr(s: SparkSession, dir: String): DataFrame = {
    val wq = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    val wp = Window.partitionBy(col("l_returnflag")).orderBy(col("l_extendedprice"))
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        // rank() is IntegerType: widen to exact decimal BEFORE any
        // product or sum. sum(rq·rp) approaches n³/3 — past int64 at
        // ~3M rows per group (sf1) — and Spark's non-ANSI long sum
        // wraps silently while DuckDB promotes to HUGEINT; decimal
        // sums keep both engines exact up to n ≈ 1e9 rows per group
        // (all intermediates stay < 10³⁸).
        rank().over(wq).cast("decimal(38,0)").as("rq"),
        rank().over(wp).cast("decimal(38,0)").as("rp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("rq")).as("sq"), sum(col("rp")).as("sp"),
        sum(col("rq") * col("rp")).as("sqp"),
        sum(col("rq") * col("rq")).as("sqq"),
        sum(col("rp") * col("rp")).as("spp"))
      .select(col("l_returnflag"), col("n"), {
        // the combination also runs in exact DECIMAL; both engines
        // then cast the same exact integer to double once.
        val d = (c: Column) => c.cast("decimal(38,0)")
        ((d(col("n")) * d(col("sqp")) - d(col("sq")) * d(col("sp"))).cast("double") /
          (sqrt((d(col("n")) * d(col("sqq")) - d(col("sq")) * d(col("sq"))).cast("double")) *
            sqrt((d(col("n")) * d(col("spp")) - d(col("sp")) * d(col("sp"))).cast("double"))))
          .as("spearman")
      })
      .orderBy(col("l_returnflag"))
  }

  val rankCorrSql: String =
    """SELECT l_returnflag, CAST(n AS BIGINT) AS n,
      |  CAST(n * sqp - sq * sp AS DOUBLE) /
      |    (sqrt(CAST(n * sqq - sq * sq AS DOUBLE)) *
      |     sqrt(CAST(n * spp - sp * sp AS DOUBLE))) AS spearman
      |FROM (
      |  SELECT l_returnflag, count(*) AS n,
      |    sum(rq) AS sq, sum(rp) AS sp, sum(rq * rp) AS sqp,
      |    sum(rq * rq) AS sqq, sum(rp * rp) AS spp
      |  FROM (SELECT l_returnflag,
      |          rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rq,
      |          rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rp
      |        FROM lineitem)
      |  GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin

  /** T3 — equi-depth histogram (distribution profiling): exact ntile
    * deciles over a fully-deterministic order, then per-decile
    * bounds/counts — the sampling-free way to see a value
    * distribution, and the shape a range-partitioner's boundaries
    * come from. Scale-safe form: NO global-window sort. The table is
    * range-partitioned on the sort key so each task sorts only its
    * slice; the global rank is broadcast per-partition offset +
    * partition-local row_number, and the ntile bucket is derived from
    * the rank with the standard first-(n mod k)-buckets-get-one-extra
    * formula in pure integer arithmetic (both engines compute the
    * identical expression, so no reliance on builtin ntile parity).
    * The only single-partition exchange touches #partitions rows
    * (the offset frame), never data rows. */
  def equiDepthHist(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir).select(col("o_totalprice"), col("o_orderkey"))
    // Partition-local ranks WITHOUT a second full-data shuffle: after
    // the range repartition + in-partition sort, monotonically
    // _increasing_id()'s documented layout (partition index in the
    // upper bits, a 0-based in-partition counter in the lower 33)
    // yields both pid and the local sort position as a narrow,
    // codegen'd projection — so the data moves exactly once (the range
    // exchange). persist() pins ids and bounds for the two readers.
    val parts = base
      .repartitionByRange(Tables.shuffleWidth(s), col("o_totalprice"), col("o_orderkey"))
      .sortWithinPartitions(col("o_totalprice"), col("o_orderkey"))
      .withColumn("mid", monotonically_increasing_id())
      .withColumn("pid", shiftright(col("mid"), 33).cast("int"))
      .persistScoped()
    val counts = parts.groupBy(col("pid"))
      .agg(count(lit(1)).as("c"), min(col("mid")).as("m0"))
    // n rides the SAME bounded offsets relation (Σ of the per-partition
    // counts — exact integer regrouping), so the decile pass builds ONE
    // broadcast instead of offsets + a separate total-count job.
    val offsets = counts
      .withColumn("off", sum(col("c")).over(Window.orderBy(col("pid"))) - col("c"))
      .withColumn("n", sum(col("c")).over(Window.partitionBy()))
      .select(col("pid"), col("off"), col("m0"), col("n"))
    parts
      .join(broadcast(offsets), Seq("pid"))
      .withColumn("rn", col("off") + (col("mid") - col("m0")) + 1)
      .withColumn("q", expr("n DIV 10"))
      .withColumn("r", col("n") % 10)
      .withColumn("decile", expr(
        "CAST(CASE WHEN rn <= r * (q + 1) THEN (rn + q) DIV (q + 1) " +
          "ELSE r + (rn - r * (q + 1) + q - 1) DIV q END AS INT)"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("lo"),
        max(col("o_totalprice")).as("hi"))
      .orderBy(col("decile"))
  }

  /** Oracle: row_number + the same integer ntile formula (q = n DIV
    * 10, r = n mod 10; first r buckets take q+1 rows). */
  val equiDepthHistSql: String =
    """WITH t AS (SELECT o_totalprice,
      |             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rn
      |           FROM orders),
      |c AS (SELECT count(*) // 10 AS q, count(*) % 10 AS r FROM orders),
      |d AS (SELECT o_totalprice,
      |        CASE WHEN rn <= r * (q + 1) THEN (rn + q) // (q + 1)
      |             ELSE r + (rn - r * (q + 1) + q - 1) // q END AS decile
      |      FROM t, c)
      |SELECT CAST(decile AS INT) AS decile, CAST(count(*) AS BIGINT) AS n,
      |  min(o_totalprice) AS lo, max(o_totalprice) AS hi
      |FROM d GROUP BY decile ORDER BY decile""".stripMargin

  /** L4i — top-3 TF-IDF terms per document: the tfidf pipeline composed
    * with a per-group rank — the keyword-extraction shape. Ties broken
    * by term so the cut is deterministic. */
  def topTerms(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tfIdfCore(s, dir)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("doc_id"), col("rnk").cast("int").as("rnk"),
        col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  val topTermsSql: String = {
    // reuse the tfidf oracle as a subquery and rank inside it
    val inner = tfIdfSql.replace("ORDER BY doc_id, tf.term", "")
    s"""SELECT doc_id, CAST(rnk AS INT) AS rnk, term, tf, df FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term) AS rnk
      |  FROM ($inner))
      |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin
  }

  /** E7 — column profiling (data-quality audit): per-column row/null/
    * distinct counts in one pass over a projection with derived NULLs
    * (try_cast failures), the summary an ingest pipeline runs before
    * accepting a batch. One aggregate row per column via union. */
  def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(s, dir)
      .select(col("o_orderstatus"),
        expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").as("prio_num"),
        expr("try_cast(o_orderstatus AS INT)").as("never_parses"))
    def prof(c: String) = base.agg(
      lit(c).as("column_name"),
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(col(c))).as("n_null"),
      countDistinct(col(c)).as("n_distinct"))
    prof("o_orderstatus").unionByName(prof("prio_num")).unionByName(prof("never_parses"))
      .orderBy(col("column_name"))
  }

  val profileColumnsSql: String =
    """WITH base AS (SELECT o_orderstatus,
      |    TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
      |    TRY_CAST(o_orderstatus AS INT) AS never_parses
      |  FROM orders)
      |SELECT * FROM (
      |  SELECT 'o_orderstatus' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
      |    CAST(count(*) - count(o_orderstatus) AS BIGINT) AS n_null,
      |    CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct FROM base
      |  UNION ALL
      |  SELECT 'prio_num', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(prio_num) AS BIGINT),
      |    CAST(count(DISTINCT prio_num) AS BIGINT) FROM base
      |  UNION ALL
      |  SELECT 'never_parses', CAST(count(*) AS BIGINT),
      |    CAST(count(*) - count(never_parses) AS BIGINT),
      |    CAST(count(DISTINCT never_parses) AS BIGINT) FROM base)
      |ORDER BY column_name""".stripMargin

  /** C2b — CDC changelog APPLY, the inverse of C1's capture: replay
    * an I/U/D changelog onto the old snapshot — survivors are the old
    * rows left-ANTI-joined against the D∪U keys, upserts are the I∪U
    * rows' new values, one union, no per-row branching. The ORACLE is
    * the post-condition, not a re-implementation: applying the
    * changelog C1 derived between snapshots must reconstruct the new
    * snapshot EXACTLY (capture∘apply = identity) — a stronger check
    * than mirroring the apply logic in SQL. Scale shape: one anti
    * join + one union, both keyed; the changelog side is small by
    * construction (only changed keys), so at 100 TB the anti join
    * broadcasts the delta. */
  def applyChangelog(s: SparkSession, dir: String): DataFrame = {
    val old = oldSnapshot(s, dir)
      .select(col("key"), col("old_price").as("price"))
    val log = changelog(s, dir).persistScoped() // anti + upsert sides
    val survivors = old.join(
      log.filter(col("op").isin("D", "U")).select(col("key")),
      Seq("key"), "left_anti")
    val upserts = log.filter(col("op").isin("I", "U"))
      .select(col("key"), col("new_price").as("price"))
    survivors.union(upserts).orderBy(col("key"))
  }

  val applyChangelogSql: String =
    """SELECT o_orderkey AS key, o_totalprice AS price
      |FROM orders WHERE o_orderkey % 10 != 4 ORDER BY key""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_apply_changelog" -> (applyChangelog _),
    "q_change_capture" -> (changeCapture _),
    "q_merge_upsert" -> (mergeUpsert _),
    "q_hash_sample" -> (hashSample _),
    "q_minmax_scale" -> (minmaxScale _),
    "q_bitwise_funcs" -> (bitwiseFuncs _),
    "q_dedup_levenshtein" -> (dedupLevenshtein _),
    "q_tfidf" -> (tfIdf _),
    "q_vector_centroids_fp" -> (vectorCentroidsFp _),
    "q_percentile_exact" -> (percentileExact _),
    "q_agg_salted" -> (aggSalted _),
    "q_window_range_frame" -> (windowRangeFrame _),
    "q_rank_corr" -> (rankCorr _),
    "q_equidepth_hist" -> (equiDepthHist _),
    "q_top_terms" -> (topTerms _),
    "q_profile_columns" -> (profileColumns _),
  )

  val oracle: Map[String, String] = Map(
    "q_apply_changelog" -> applyChangelogSql,
    "q_change_capture" -> changeCaptureSql,
    "q_merge_upsert" -> mergeUpsertSql,
    "q_hash_sample" -> hashSampleSql,
    "q_minmax_scale" -> minmaxScaleSql,
    "q_bitwise_funcs" -> bitwiseFuncsSql,
    "q_dedup_levenshtein" -> dedupLevenshteinSql,
    "q_tfidf" -> tfIdfSql,
    "q_vector_centroids_fp" -> vectorCentroidsFpSql,
    "q_percentile_exact" -> percentileExactSql,
    "q_agg_salted" -> aggSaltedSql,
    "q_window_range_frame" -> windowRangeFrameSql,
    "q_rank_corr" -> rankCorrSql,
    "q_equidepth_hist" -> equiDepthHistSql,
    "q_top_terms" -> topTermsSql,
    "q_profile_columns" -> profileColumnsSql,
  )
}
