package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Caches.PersistScoped

/** Round-7 surface-completion and evaluation-metric operators: bag
  * semantics for set ops (EXCEPT/INTERSECT ALL), the distribution
  * window functions, OHLC bars, exact-cent VWAP, information-theoretic
  * dependence (mutual information), inter-rater agreement (Cohen's
  * kappa), and a second string-function parity row. All
  * oracle-checked; conventions per ARCHITECTURE.md "Cross-engine
  * determinism" (order-dependent ln-sums quantized to integers before
  * aggregation; one float division chain per output, identical
  * textual form on both engines).
  */
object Metrics {

  /** U3 — EXCEPT ALL (bag difference): each customer key keeps
    * max(0, n_left − n_right) copies — the multiset semantics that
    * reconciliation pipelines need (plain EXCEPT collapses
    * multiplicity and hides partial losses). Spark's exceptAll plans
    * a count-compare aggregate, not a join explosion; the output is
    * re-aggregated per key so the result relation is deterministic. */
  def exceptAll(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.orders(s, dir).select(col("o_custkey"))
    val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    all.exceptAll(f)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("o_custkey"))
  }

  val exceptAllSql: String =
    """SELECT o_custkey, count(*) AS n_rows FROM (
      |  SELECT o_custkey FROM orders
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** U3b — INTERSECT ALL (bag intersection): min(n_left, n_right)
    * copies per key, the other half of multiset reconciliation. */
  def intersectAll(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    val f = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
      .select(col("o_custkey"))
    o.intersectAll(f)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("o_custkey"))
  }

  val intersectAllSql: String =
    """SELECT o_custkey, count(*) AS n_rows FROM (
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** W28 — distribution window functions: cume_dist and percent_rank
    * per status group — SQL-standard tie semantics on both engines
    * (peers included for cume_dist, (rank−1)/(n−1) for percent_rank),
    * both pure int/int IEEE divisions so the raw doubles are
    * oracle-safe. Output bounded to a key slice AFTER the window (the
    * distribution needs the whole group). */
  def cumeDist(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("o_orderkey") < 400)
      .select(col("o_orderkey"), col("o_orderstatus"), col("cd"), col("pr"))
      .orderBy(col("o_orderkey"))
  }

  val cumeDistSql: String =
    """SELECT o_orderkey, o_orderstatus, cd, pr FROM (
      |  SELECT o_orderkey, o_orderstatus,
      |    cume_dist() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice, o_orderkey) AS cd,
      |    percent_rank() OVER (PARTITION BY o_orderstatus
      |      ORDER BY o_totalprice, o_orderkey) AS pr
      |  FROM orders)
      |WHERE o_orderkey < 400 ORDER BY o_orderkey""".stripMargin

  /** TS10 — OHLC bars: per-day open/high/low/close of the event value
    * stream — the time-series downsampling primitive. Open and close
    * are argmin/argmax by (second, event_id) folded into ONE
    * partial/final min(struct)/max(struct) aggregate — no window, no
    * per-day sort; the tie-break prefix (sec, event_id) is unique so
    * the value field never decides the comparison. */
  /** TS17 — maximum drawdown: per year, the deepest peak-to-trough
    * fall of the cumulative-revenue curve — the risk statistic that
    * says "how far underwater did this series get", which no
    * point-in-time aggregate can see. Shape: the corpus collapses to
    * one row per ORDER DATE first (the date domain is bounded — a few
    * thousand rows regardless of corpus size), so the running-sum and
    * running-peak windows move calendar-bounded data only; everything
    * through the drawdown is exact integer cents, with one exact
    * cents→dollars division at the end. Trough ties break to the
    * earliest date via one min(struct). */
  def drawdown(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("yr"), col("o_orderdate").as("d"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("rev"))
    val w = Window.partitionBy(col("yr")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum", sum(col("rev")).over(w))
      .withColumn("peak", max(sum(col("rev")).over(w)).over(w))
      .select(col("yr"), col("d"), (col("peak") - col("cum")).as("dd"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_days"),
        min(struct((-col("dd")).as("neg"), col("d"))).as("m"))
      .select(col("yr").cast("long").as("yr"), col("n_days"),
        ((-col("m.neg")).cast("double") / 100).as("max_drawdown"),
        col("m.d").as("trough_date"))
      .orderBy(col("yr"))
  }

  val drawdownSql: String =
    """WITH daily AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
      |    o_orderdate AS d,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS rev
      |  FROM orders GROUP BY 1, 2),
      |c AS (SELECT yr, d,
      |        sum(rev) OVER (PARTITION BY yr ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |      FROM daily),
      |p AS (SELECT yr, d, max(cum) OVER (PARTITION BY yr ORDER BY d
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS dd
      |      FROM c),
      |r AS (SELECT yr, d, dd,
      |        row_number() OVER (PARTITION BY yr ORDER BY dd DESC, d) AS rn,
      |        count(*) OVER (PARTITION BY yr) AS n_days
      |      FROM p)
      |SELECT yr, CAST(n_days AS BIGINT) AS n_days,
      |  CAST(dd AS DOUBLE) / 100 AS max_drawdown, d AS trough_date
      |FROM r WHERE rn = 1 ORDER BY yr""".stripMargin

  /** TS18 — Bollinger-band breakout audit: monthly revenue against a
    * trailing-12-month mean ± 2σ band — the volatility-normalized
    * "was this month abnormal" screen. The band test never computes a
    * square root: |x − s/n| > 2σ is evaluated as
    * (n·x − s)² > 4·(n·Σx² − s²), which is EXACT integer (decimal)
    * arithmetic end to end — no libm, no epsilon, identical on every
    * engine. The corpus collapses to one row per month first (bounded
    * calendar domain), so the rolling window moves months, not rows;
    * only full 12-month windows are emitted. */
  def bollinger(s: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")).as("rev"))
      .select(col("m"), col("rev").cast("decimal(38,0)").as("rev"))
    val w = Window.orderBy(col("m")).rowsBetween(-11, 0)
    monthly
      .withColumn("n", count(lit(1)).over(w).cast("decimal(38,0)"))
      .withColumn("ss", sum(col("rev")).over(w))
      .withColumn("sq", sum(col("rev") * col("rev")).over(w))
      .filter(col("n") === 12)
      .select(col("m"),
        (col("rev").cast("double") / 100).as("revenue"),
        ((col("ss").cast("double") / 12) / 100).as("ma12"),
        when((col("n") * col("rev") - col("ss")) *
               (col("n") * col("rev") - col("ss")) >
               lit(4) * (col("n") * col("sq") - col("ss") * col("ss")),
            when(col("n") * col("rev") > col("ss"), "up").otherwise("down"))
          .otherwise("in").as("band"))
      .orderBy(col("m"))
  }

  val bollingerSql: String =
    """WITH monthly AS (SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS HUGEINT) AS rev
      |  FROM orders GROUP BY 1),
      |r AS (SELECT m, rev,
      |        count(*) OVER win AS n,
      |        sum(rev) OVER win AS ss,
      |        sum(rev * rev) OVER win AS sq
      |      FROM monthly
      |      WINDOW win AS (ORDER BY m ROWS BETWEEN 11 PRECEDING AND CURRENT ROW))
      |SELECT m, CAST(rev AS DOUBLE) / 100 AS revenue,
      |  (CAST(ss AS DOUBLE) / 12) / 100 AS ma12,
      |  CASE WHEN (n * rev - ss) * (n * rev - ss) > 4 * (n * sq - ss * ss)
      |       THEN CASE WHEN n * rev > ss THEN 'up' ELSE 'down' END
      |       ELSE 'in' END AS band
      |FROM r WHERE n = 12 ORDER BY m""".stripMargin

  def ohlc(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(to_date(col("ts")).as("d"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"), col("value"))
    e.groupBy(col("d"))
      .agg(min(struct(col("sec"), col("event_id"), col("value"))).as("o"),
        max(struct(col("sec"), col("event_id"), col("value"))).as("c"),
        max(col("value")).as("high"), min(col("value")).as("low"),
        count(lit(1)).as("n_events"))
      .select(col("d"), col("o.value").as("open"), col("high"), col("low"),
        col("c.value").as("close"), col("n_events"))
      .orderBy(col("d"))
  }

  val ohlcSql: String =
    """WITH e AS (SELECT CAST(ts AS DATE) AS d,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id, value
      |           FROM events),
      |r AS (SELECT d, value,
      |        row_number() OVER (PARTITION BY d ORDER BY sec, event_id) AS ra,
      |        row_number() OVER (PARTITION BY d ORDER BY sec DESC, event_id DESC)
      |          AS rd
      |      FROM e)
      |SELECT d, max(CASE WHEN ra = 1 THEN value END) AS open,
      |  max(value) AS high, min(value) AS low,
      |  max(CASE WHEN rd = 1 THEN value END) AS close,
      |  count(*) AS n_events
      |FROM r GROUP BY d ORDER BY d""".stripMargin

  /** TS11 — monthly VWAP (volume-weighted average price): exact-cent
    * revenue over exact quantity per ship month, one division at the
    * end — the weighted-mean shape that naive avg(price) gets wrong.
    * One partial/final aggregate over the fact table. */
  def vwap(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(date_trunc("month", col("l_shipdate").cast("date")).cast("date")
          .as("m"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("bigint").as("cents"),
        col("l_quantity").cast("bigint").as("qty"))
      .groupBy(col("m"))
      .agg(sum(col("cents")).as("cents"), sum(col("qty")).as("qty"))
      .select(col("m"), col("qty"), col("cents"),
        (col("cents").cast("double") / col("qty").cast("double")).as("vwap_cents"))
      .orderBy(col("m"))

  val vwapSql: String =
    """SELECT CAST(date_trunc('month', CAST(l_shipdate AS DATE)) AS DATE) AS m,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS cents,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS DOUBLE) / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
      |    AS vwap_cents
      |FROM lineitem GROUP BY 1 ORDER BY m""".stripMargin

  /** G22 — mutual information between two categorical columns (status
    * × priority) plus both marginal entropies — the dependence audit
    * behind feature selection and leakage detection (MI ≈ 0 means the
    * columns are independent; MI ≈ H means one determines the other).
    * Every cell contribution is computed from exact counts and
    * quantized to 1e-9 fixed point before the sum, so the ln-sums are
    * order-free; the contingency table is one hash aggregate and the
    * margins are re-aggregates of it (cells ≪ rows). */
  def mutualInfo(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("x"), col("o_orderpriority").as("y"))
      .agg(count(lit(1)).as("n_xy")).persistScoped() // margins + the joined pass
    val mx = cells.groupBy(col("x")).agg(sum(col("n_xy")).as("n_x"))
    val my = cells.groupBy(col("y")).agg(sum(col("n_xy")).as("n_y"))
    val tot = cells.agg(sum(col("n_xy")).as("n"))
    val mi = cells.join(broadcast(mx), Seq("x")).join(broadcast(my), Seq("y"))
      .crossJoin(broadcast(tot))
      .select(expr("CAST(floor((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)) / " +
        "(CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) * 1e9) AS BIGINT)").as("cq"))
      .agg(sum(col("cq")).as("mi_q"))
    def entropy(m: DataFrame, cnt: String): DataFrame = m
      .crossJoin(broadcast(tot))
      .select(expr(s"CAST(floor(-(CAST($cnt AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        s"ln(CAST($cnt AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT)").as("hq"))
      .agg(sum(col("hq")).as("h_q"))
    mi.crossJoin(entropy(mx, "n_x").withColumnRenamed("h_q", "hx_q"))
      .crossJoin(entropy(my, "n_y").withColumnRenamed("h_q", "hy_q"))
      .crossJoin(broadcast(tot))
      .select(col("n").as("n_orders"),
        (col("mi_q").cast("double") / 1e9).as("mi"),
        (col("hx_q").cast("double") / 1e9).as("h_status"),
        (col("hy_q").cast("double") / 1e9).as("h_priority"))
  }

  val mutualInfoSql: String =
    """WITH cells AS (SELECT o_orderstatus AS x, o_orderpriority AS y,
      |                 count(*) AS n_xy FROM orders GROUP BY 1, 2),
      |mx AS (SELECT x, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY x),
      |my AS (SELECT y, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY y),
      |tot AS (SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells),
      |mi AS (SELECT CAST(sum(CAST(floor((CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
      |         * ln((CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)) /
      |         (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE))) * 1e9) AS BIGINT))
      |         AS BIGINT) AS mi_q
      |       FROM cells JOIN mx ON cells.x = mx.x JOIN my ON cells.y = my.y
      |       CROSS JOIN tot),
      |hx AS (SELECT CAST(sum(CAST(floor(-(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE))
      |         * ln(CAST(n_x AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT))
      |         AS BIGINT) AS hx_q FROM mx CROSS JOIN tot),
      |hy AS (SELECT CAST(sum(CAST(floor(-(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
      |         * ln(CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE)) * 1e9) AS BIGINT))
      |         AS BIGINT) AS hy_q FROM my CROSS JOIN tot)
      |SELECT n AS n_orders, CAST(mi_q AS DOUBLE) / 1e9 AS mi,
      |  CAST(hx_q AS DOUBLE) / 1e9 AS h_status,
      |  CAST(hy_q AS DOUBLE) / 1e9 AS h_priority
      |FROM mi CROSS JOIN hx CROSS JOIN hy CROSS JOIN tot""".stripMargin

  /** W27 — Cohen's kappa: agreement beyond chance between the order
    * status and a rule-derived classifier over the priority string —
    * the inter-rater/model-agreement readout (po − pe)/(1 − pe). The
    * confusion matrix, its diagonal, and the chance term Σ row_k·col_k
    * are all exact int64; kappa is one fixed-order float chain. */
  def cohensKappa(s: SparkSession, dir: String): DataFrame = {
    val rated = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("a"),
        when(col("o_orderpriority").startsWith("1") ||
            col("o_orderpriority").startsWith("2"), "O")
          .when(col("o_orderpriority").startsWith("3"), "P")
          .otherwise("F").as("b"))
    val cells = rated.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab")).persistScoped() // margins + diagonal
    val ra = cells.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    val rb = cells.groupBy(col("b")).agg(sum(col("n_ab")).as("n_b"))
    val agree = cells.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("n_ab")), lit(0L)).as("n_agree"))
    val chance = ra.join(rb, ra("a") === rb("b"))
      .agg(coalesce(sum(col("n_a") * col("n_b")), lit(0L)).as("pe_num"))
    val tot = cells.agg(sum(col("n_ab")).as("n"))
    agree.crossJoin(chance).crossJoin(broadcast(tot))
      .select(col("n").as("n_orders"), col("n_agree"),
        expr("CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)").as("po"),
        expr("CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))")
          .as("pe"))
      .withColumn("kappa", (col("po") - col("pe")) / (lit(1.0) - col("pe")))
  }

  val cohensKappaSql: String =
    """WITH rated AS (SELECT o_orderstatus AS a,
      |    CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
      |           THEN 'O'
      |         WHEN o_orderpriority LIKE '3%' THEN 'P'
      |         ELSE 'F' END AS b
      |  FROM orders),
      |cells AS (SELECT a, b, count(*) AS n_ab FROM rated GROUP BY a, b),
      |ra AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a FROM cells GROUP BY a),
      |rb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b FROM cells GROUP BY b),
      |ag AS (SELECT CAST(coalesce(sum(n_ab), 0) AS BIGINT) AS n_agree
      |       FROM cells WHERE a = b),
      |ch AS (SELECT CAST(coalesce(sum(n_a * n_b), 0) AS BIGINT) AS pe_num
      |       FROM ra JOIN rb ON ra.a = rb.b),
      |tot AS (SELECT CAST(sum(n_ab) AS BIGINT) AS n FROM cells)
      |SELECT n AS n_orders, n_agree,
      |  CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
      |  CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) AS pe,
      |  (CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE)
      |    - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |  / (1.0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
      |    AS kappa
      |FROM ag CROSS JOIN ch CROSS JOIN tot""".stripMargin

  /** F1c — string-function surface, second row: split_part, lpad/rpad,
    * translate, reverse, and the built-in Levenshtein — the remaining
    * string builtins a migration exercises (F1 covered
    * concat/substring/case/trim/regexp). All deterministic string
    * ops; the key filter pushes to the scan. */
  def stringFuncs2(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 200)
      .select(col("c_custkey"),
        split_part(col("c_name"), lit("#"), lit(2)).as("part2"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        translate(col("c_name"), "#0", "-x").as("translated"),
        reverse(col("c_name")).as("rev"),
        levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("lev"))
      .orderBy(col("c_custkey"))

  val stringFuncs2Sql: String =
    """SELECT c_custkey,
      |  split_part(c_name, '#', 2) AS part2,
      |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
      |  translate(c_name, '#0', '-x') AS translated,
      |  reverse(c_name) AS rev,
      |  CAST(levenshtein(c_mktsegment, 'MACHINERY') AS INT) AS lev
      |FROM customer WHERE c_custkey < 200 ORDER BY c_custkey""".stripMargin

  /** U4 — schema-evolving union (UNION ALL BY NAME): two sources with
    * different column sets merged by NAME with missing columns
    * NULL-filled — the multi-batch ingest shape when a source adds a
    * column mid-stream (positional UNION would silently misalign).
    * Spark's `unionByName(allowMissingColumns = true)` ↔ DuckDB's
    * `UNION ALL BY NAME`. */
  def unionByNameQ(s: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(s, dir).filter(col("o_orderkey") < 300)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .withColumn("src", lit("a"))
    val b = Tables.orders(s, dir)
      .filter(col("o_orderkey") >= 300 && col("o_orderkey") < 600)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("src", lit("b"))
    a.unionByName(b, allowMissingColumns = true)
      .orderBy(col("src"), col("o_orderkey"))
  }

  val unionByNameSql: String =
    """SELECT * FROM (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, 'a' AS src
      |  FROM orders WHERE o_orderkey < 300
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderpriority, 'b' AS src
      |  FROM orders WHERE o_orderkey >= 300 AND o_orderkey < 600)
      |ORDER BY src, o_orderkey""".stripMargin

  /** W30 — semi-additive aggregate: month-end "balance" per user
    * (LAST value in the month by event time) summed across users —
    * the balance/inventory measure that is additive across ACCOUNTS
    * but not across TIME, which naive sum-everything rollups get
    * wrong. The last-per-(user, month) is ONE max(struct) argmax
    * aggregate (no window); balances are floor-quantized to exact
    * cents before the cross-user sum so the month totals are
    * order-free integers. */
  def semiAdditive(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
        date_trunc("month", col("ts")).cast("date").as("m"),
        unix_timestamp(col("ts")).as("sec"), col("event_id"), col("value"))
    e.groupBy(col("user_id"), col("m"))
      .agg(max(struct(col("sec"), col("event_id"), col("value"))).as("lastv"))
      .select(col("m"),
        expr("CAST(floor(lastv.value * 100) AS BIGINT)").as("bal_cents"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_users"), sum(col("bal_cents")).as("total_cents"))
      .orderBy(col("m"))
  }

  val semiAdditiveSql: String =
    """WITH e AS (SELECT user_id,
      |    CAST(date_trunc('month', ts) AS DATE) AS m,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id, value
      |  FROM events),
      |r AS (SELECT user_id, m, value,
      |        row_number() OVER (PARTITION BY user_id, m
      |          ORDER BY sec DESC, event_id DESC) AS rn
      |      FROM e),
      |b AS (SELECT m, CAST(floor(value * 100) AS BIGINT) AS bal_cents
      |      FROM r WHERE rn = 1)
      |SELECT m, count(*) AS n_users,
      |  CAST(sum(bal_cents) AS BIGINT) AS total_cents
      |FROM b GROUP BY m ORDER BY m""".stripMargin

  /** W31 — per-class precision/recall/F1 from the same rated
    * confusion table as [[cohensKappa]]: tp on the diagonal, fp from
    * the predicted margin, fn from the actual margin — all exact
    * int64; the three scores are one fixed-order float chain per
    * class (F1 written as 2·tp/(2·tp + fp + fn), division-last). */
  def confusionMetrics(s: SparkSession, dir: String): DataFrame = {
    val rated = Tables.orders(s, dir)
      .select(col("o_orderstatus").as("a"),
        when(col("o_orderpriority").startsWith("1") ||
            col("o_orderpriority").startsWith("2"), "O")
          .when(col("o_orderpriority").startsWith("3"), "P")
          .otherwise("F").as("b"))
    val cells = rated.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n")).persistScoped() // three margins read it
    val tp = cells.filter(col("a") === col("b"))
      .select(col("a").as("cls"), col("n").as("tp"))
    val actual = cells.groupBy(col("a").as("cls")).agg(sum(col("n")).as("n_actual"))
    val pred = cells.groupBy(col("b").as("cls")).agg(sum(col("n")).as("n_pred"))
    actual.join(pred, Seq("cls"), "full_outer")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"))
      .select(col("cls"), col("tp"), col("n_actual"), col("n_pred"),
        expr("CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE)").as("precision"),
        expr("CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE)").as("recall"),
        expr("CAST(2 * tp AS DOUBLE) / CAST(n_pred + n_actual AS DOUBLE)")
          .as("f1"))
      .orderBy(col("cls"))
  }

  val confusionMetricsSql: String =
    """WITH rated AS (SELECT o_orderstatus AS a,
      |    CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
      |           THEN 'O'
      |         WHEN o_orderpriority LIKE '3%' THEN 'P'
      |         ELSE 'F' END AS b
      |  FROM orders),
      |cells AS (SELECT a, b, count(*) AS n FROM rated GROUP BY a, b),
      |tp AS (SELECT a AS cls, CAST(n AS BIGINT) AS tp FROM cells WHERE a = b),
      |act AS (SELECT a AS cls, CAST(sum(n) AS BIGINT) AS n_actual
      |        FROM cells GROUP BY a),
      |prd AS (SELECT b AS cls, CAST(sum(n) AS BIGINT) AS n_pred
      |        FROM cells GROUP BY b),
      |j AS (SELECT coalesce(act.cls, prd.cls) AS cls,
      |        coalesce(tp.tp, 0) AS tp,
      |        coalesce(n_actual, 0) AS n_actual,
      |        coalesce(n_pred, 0) AS n_pred
      |      FROM act FULL OUTER JOIN prd ON act.cls = prd.cls
      |      LEFT JOIN tp ON coalesce(act.cls, prd.cls) = tp.cls)
      |SELECT cls, CAST(tp AS BIGINT) AS tp, n_actual, n_pred,
      |  CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) AS precision,
      |  CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE) AS recall,
      |  CAST(2 * tp AS DOUBLE) / CAST(n_pred + n_actual AS DOUBLE) AS f1
      |FROM j ORDER BY cls""".stripMargin

  /** B18 — time-decayed engagement score: Σ value·2^(−age_days) per
    * user — the recency-weighted primitive behind engagement ranking
    * and churn features, computed EXACTLY: the weight is a dyadic
    * 1/2^age (one exact division by a shifted integer, never libm
    * pow), values floor-quantize to cents, and every term is an exact
    * multiple of 2^−62 whose running sum stays far inside the 2^53
    * significand — the double aggregate is integer arithmetic in
    * disguise, order-free and bit-portable. One aggregate, one
    * broadcast of the corpus max date. */
  def decayScore(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"), col("value"))
    val mx = e.agg(max(col("d")).as("mxd"))
    e.crossJoin(broadcast(mx))
      .select(col("user_id"),
        least(datediff(col("mxd"), col("d")), lit(30)).cast("int").as("age"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("cents"))
      .select(col("user_id"),
        (col("cents").cast("double") /
          expr("CAST(shiftleft(1L, age) AS DOUBLE)")).as("term"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("term")).as("decay_score"))
      .orderBy(col("user_id"))
  }

  val decayScoreSql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
      |mx AS (SELECT max(d) AS mxd FROM e),
      |t AS (SELECT user_id,
      |        CAST(floor(value * 100) AS BIGINT) AS cents,
      |        least(datediff('day', d, mxd), 30) AS age
      |      FROM e CROSS JOIN mx)
      |SELECT user_id, count(*) AS n_events,
      |  sum(CAST(cents AS DOUBLE) / CAST(1::BIGINT << age AS DOUBLE))
      |    AS decay_score
      |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin

  /** B19 — session conversion rate: sessionize each user's events
    * (30-minute gap, the q_sessionize construction), flag sessions
    * containing a purchase, and report daily session counts with the
    * conversion share — the product-analytics readout funnels and
    * retention both build on. One keyed window pass builds sessions;
    * the flag is a max() inside the same per-session aggregate; exact
    * integer counts, one division per day. */
  def sessionConversion(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("es"), col("event_id"))
    base
      .withColumn("prev_es", lag(col("es"), 1).over(wOrd))
      .withColumn("new_session",
        when(col("prev_es").isNull || col("es") - col("prev_es") > 1800L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("es")).as("start_es"),
        max((col("event_type") === "purchase").cast("long")).as("converted"))
      .select(date_add(lit("1970-01-01").cast("date"),
        (col("start_es") / 86400L).cast("int")).as("d"), col("converted"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("converted")).as("n_converted"))
      .select(col("d"), col("n_sessions"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_sessions").cast("double"))
          .as("conversion_rate"))
      .orderBy(col("d"))
  }

  val sessionConversionSql: String =
    """WITH e AS (SELECT user_id, event_id, event_type,
      |             CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
      |m AS (SELECT user_id, event_id, event_type, es,
      |        CASE WHEN lag(es) OVER w IS NULL
      |               OR es - lag(es) OVER w > 1800 THEN 1 ELSE 0 END AS ns
      |      FROM e
      |      WINDOW w AS (PARTITION BY user_id ORDER BY es, event_id)),
      |sid AS (SELECT user_id, event_type, es,
      |          sum(ns) OVER (PARTITION BY user_id ORDER BY es, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |        FROM m),
      |sess AS (SELECT user_id, session_id, min(es) AS start_es,
      |           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |             AS converted
      |         FROM sid GROUP BY user_id, session_id)
      |SELECT DATE '1970-01-01' + CAST(start_es // 86400 AS INT) AS d,
      |  count(*) AS n_sessions,
      |  CAST(sum(converted) AS BIGINT) AS n_converted,
      |  CAST(sum(converted) AS DOUBLE) / count(*) AS conversion_rate
      |FROM sess GROUP BY 1 ORDER BY d""".stripMargin

  /** TS13 — rolling 7-day correlation between two event streams
    * (daily purchase vs error counts) — the co-movement monitor that
    * flags when incidents start tracking revenue. Every rolling
    * quantity (Σx, Σy, Σxy, Σx², Σy², n) is an EXACT INTEGER sum over
    * a ROWS window on the bounded day spine, so the Pearson numerator
    * and the two variance terms are exact int64 and the correlation
    * is one fixed-order float chain (two sqrts, one division) —
    * bit-portable with zero rounding. Windows only ever see the
    * aggregated day relation, never the fact table. */
  def rollingCorr(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum((col("event_type") === "purchase").cast("long")).as("x"),
        sum((col("event_type") === "error").cast("long")).as("y"))
    val w = Window.orderBy(col("d")).rowsBetween(-6, 0) // bounded day spine
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("syy", sum(col("y") * col("y")).over(w))
      .filter(col("n") === 7)
      .filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0 &&
        col("n") * col("syy") - col("sy") * col("sy") =!= 0)
      .select(col("d"), col("x"), col("y"),
        expr("CAST(n * sxy - sx * sy AS DOUBLE) / " +
          "(sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * " +
          "sqrt(CAST(n * syy - sy * sy AS DOUBLE)))").as("corr7"))
      .orderBy(col("d"))
  }

  val rollingCorrSql: String =
    """WITH daily AS (SELECT CAST(ts AS DATE) AS d,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS x,
      |    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS y
      |  FROM events GROUP BY 1),
      |r AS (SELECT d, x, y,
      |        CAST(count(*) OVER w AS BIGINT) AS n,
      |        CAST(sum(x) OVER w AS BIGINT) AS sx,
      |        CAST(sum(y) OVER w AS BIGINT) AS sy,
      |        CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
      |        CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
      |        CAST(sum(y * y) OVER w AS BIGINT) AS syy
      |      FROM daily
      |      WINDOW w AS (ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
      |SELECT d, x, y,
      |  CAST(n * sxy - sx * sy AS DOUBLE) /
      |    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
      |     sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr7
      |FROM r WHERE n = 7
      |  AND n * sxx - sx * sx <> 0 AND n * syy - sy * sy <> 0
      |ORDER BY d""".stripMargin

  /** F2c — weekday activity profile: order counts and exact cents by
    * day of week, with the weekday derived as (epoch_days + 4) mod 7
    * in PURE INTEGER arithmetic (1970-01-01 was a Thursday) — the
    * engine-neutral formula, because built-in dayofweek() numbering
    * differs across engines (Sunday = 1 on Spark, 0 on DuckDB). */
  def weekdayProfile(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).as("days"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"))
      .select(pmod(col("days") + 4, lit(7)).cast("int").as("dow"), col("cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("cents"))
      .orderBy(col("dow"))

  val weekdayProfileSql: String =
    """SELECT CAST((datediff('day', DATE '1970-01-01',
      |    CAST(o_orderdate AS DATE)) + 4) % 7 AS INT) AS dow,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders GROUP BY 1 ORDER BY dow""".stripMargin

  /** E14 — join fan-out profile: the distribution of lineitems per
    * order — the statistic that sizes every orders⋈lineitem plan
    * (expected output rows, skew risk, broadcast viability) and that
    * an optimizer's ndv estimates approximate; two keyed aggregates. */
  def fanoutProfile(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_items"))
      .groupBy(col("n_items").cast("int").as("items_per_order"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("items_per_order"))

  val fanoutProfileSql: String =
    """WITH f AS (SELECT l_orderkey, count(*) AS n_items
      |           FROM lineitem GROUP BY l_orderkey)
      |SELECT CAST(n_items AS INT) AS items_per_order,
      |  count(*) AS n_orders
      |FROM f GROUP BY 1 ORDER BY items_per_order""".stripMargin

  /** F8 — higher-order array-function surface: filter / exists /
    * forall / aggregate / array_distinct / array_sort over each
    * document's word array — the lambda-function family (F4 covered
    * transform/aggregate on numeric arrays; this is the predicate
    * side on strings). All codegen-friendly builtins, one narrow
    * projection, exact integer/boolean outputs (booleans emitted as
    * int for hash portability); array_sort on ASCII tokens is byte
    * order in both engines. */
  def hofFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.widen(Tables.documents(s, dir))
      .select(col("doc_id"),
        filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
      .select(col("doc_id"),
        size(col("ws")).as("n_words"),
        size(filter(col("ws"), w => length(w) > 4)).as("n_long"),
        exists(col("ws"), w => w === "spark").cast("int").as("has_spark"),
        forall(col("ws"), w => length(w) <= 6).cast("int").as("all_short"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        element_at(array_sort(col("ws")), 1).as("first_sorted"),
        aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w))
          .as("sum_word_chars"))
      .orderBy(col("doc_id"))

  val hofFuncsSql: String =
    """WITH t AS (SELECT doc_id,
      |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(ws) AS INT) AS n_words,
      |  CAST(len(list_filter(ws, w -> length(w) > 4)) AS INT) AS n_long,
      |  CAST(CASE WHEN len(list_filter(ws, w -> w = 'spark')) > 0
      |    THEN 1 ELSE 0 END AS INT) AS has_spark,
      |  CAST(CASE WHEN len(list_filter(ws, w -> length(w) > 6)) = 0
      |    THEN 1 ELSE 0 END AS INT) AS all_short,
      |  CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
      |  list_sort(ws)[1] AS first_sorted,
      |  CAST(coalesce(list_sum(list_transform(ws, w -> length(w))), 0)
      |    AS BIGINT) AS sum_word_chars
      |FROM t ORDER BY doc_id""".stripMargin

  /** G26 — argmax aggregate surface: max_by/min_by (SQL:2023
    * ARG_MAX/ARG_MIN), count_if, bool_and/bool_or per market segment
    * — the "attribute of the extreme row" idiom that otherwise costs
    * a window + filter. The ordering value is acctbal cents × 10⁷ +
    * custkey — unique by construction, so the argmax is total-order
    * deterministic in both engines (bare max_by on a tied key is
    * pick-any, the classic silent nondeterminism). One partial/final
    * aggregate, no window. */
  def argmaxFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .withColumn("v",
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint") * 10000000L
          + col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        expr("max_by(c_name, v)").as("richest"),
        expr("min_by(c_name, v)").as("poorest"),
        expr("count_if(c_acctbal < 0)").as("n_negative"),
        expr("CAST(bool_or(c_acctbal > 9000) AS INT)").as("has_rich"),
        expr("CAST(bool_and(c_acctbal > -1000) AS INT)").as("all_above_floor"))
      .orderBy(col("c_mktsegment"))

  val argmaxFuncsSql: String =
    """WITH t AS (SELECT *,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 10000000
      |      + c_custkey AS v
      |  FROM customer)
      |SELECT c_mktsegment,
      |  arg_max(c_name, v) AS richest,
      |  arg_min(c_name, v) AS poorest,
      |  CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_negative,
      |  CAST(bool_or(c_acctbal > 9000) AS INT) AS has_rich,
      |  CAST(bool_and(c_acctbal > -1000) AS INT) AS all_above_floor
      |FROM t GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** B22 — growth accounting: the new/retained/resurrected/churned
    * decomposition of daily active users — the growth-team ledger that
    * explains EVERY DAU change (dau = new + retained + resurrected;
    * Δdau = new + resurrected − churned, an identity the output makes
    * checkable row by row) where B1's cohort triangle only shows decay
    * and B16's rolling window only shows level. Presence collapses to
    * one distinct (user, day) relation — the only fact-table pass —
    * then per-user day-gaps come from one keyed lag window:
    * new = first day, retained = gap 1, resurrected = gap > 1,
    * churned on d = present d−1 but not d (the lead-gap mirror).
    * Exact integer counts throughout; days without activity simply
    * don't appear (the fixture month is fully populated). */
  def growthAccounting(s: SparkSession, dir: String): DataFrame = {
    // day identity is the full DATE (to_date convention of the other
    // DAU queries) — a day-of-month key would collapse months
    val pres = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .persistScoped() // arrival-classification leg + churn leg
    val w = Window.partitionBy(col("user_id")).orderBy(col("d"))
    val arrivals = pres
      .withColumn("prev", lag(col("d"), 1).over(w))
      .select(col("d"),
        when(col("prev").isNull, "new")
          .when(col("d") === date_add(col("prev"), 1), "retained")
          .otherwise("resurrected").as("kind"))
      .groupBy(col("d"))
      .agg(count(lit(1)).as("dau"),
        sum(when(col("kind") === "new", 1L).otherwise(0L)).as("new_users"),
        sum(when(col("kind") === "retained", 1L).otherwise(0L)).as("retained"),
        sum(when(col("kind") === "resurrected", 1L).otherwise(0L))
          .as("resurrected"))
    val churn = pres
      .withColumn("nxt", lead(col("d"), 1).over(w))
      .filter(col("nxt").isNull || col("nxt") =!= date_add(col("d"), 1))
      .select(date_add(col("d"), 1).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("churned"))
    arrivals.join(churn, Seq("d"), "left")
      .select(col("d").as("day"), col("dau"), col("new_users"),
        col("retained"), col("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"))
      .orderBy(col("day"))
  }

  val growthAccountingSql: String =
    """WITH pres AS (SELECT DISTINCT user_id,
      |    CAST(ts AS DATE) AS d FROM events),
      |a AS (SELECT d,
      |        CASE WHEN prev IS NULL THEN 'new'
      |             WHEN d = prev + 1 THEN 'retained'
      |             ELSE 'resurrected' END AS kind
      |      FROM (SELECT d, lag(d) OVER (PARTITION BY user_id ORDER BY d)
      |              AS prev FROM pres)),
      |arr AS (SELECT d, count(*) AS dau,
      |        CAST(sum(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |          AS new_users,
      |        CAST(sum(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END)
      |          AS BIGINT) AS retained,
      |        CAST(sum(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END)
      |          AS BIGINT) AS resurrected
      |      FROM a GROUP BY d),
      |ch AS (SELECT d + 1 AS d, count(*) AS churned
      |      FROM (SELECT d, lead(d) OVER (PARTITION BY user_id ORDER BY d)
      |              AS nxt FROM pres)
      |      WHERE nxt IS NULL OR nxt <> d + 1 GROUP BY d + 1)
      |SELECT arr.d AS day, arr.dau, arr.new_users, arr.retained,
      |  arr.resurrected,
      |  CAST(coalesce(ch.churned, 0) AS BIGINT) AS churned
      |FROM arr LEFT JOIN ch ON arr.d = ch.d
      |ORDER BY day""".stripMargin

  /** W43 — price-volume revenue bridge: the FP&A waterfall that
    * explains a period-over-period revenue change as price effect
    * ((p₁−p₀)·q₁) plus volume effect ((q₁−q₀)·p₀) per product bucket
    * — the two terms sum to Δrev exactly by construction (the output
    * carries Δrev so the identity is checkable per row). 1996 vs 1997
    * ship-years over l_partkey mod 20 buckets; revenues and
    * quantities aggregate as exact integer cents/units (one
    * conditional-sum pass over the fact table, no join of two period
    * scans), and each effect is one fixed IEEE chain off the exact
    * integers, written identically in both engines. */
  def priceVolumeBridge(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .select((col("l_partkey") % 20).as("bucket"),
        (year(col("l_shipdate")) === 1997).as("is1"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
          .as("cents"),
        col("l_quantity").cast("bigint").as("qty"))
      .groupBy(col("bucket"))
      .agg(sum(when(!col("is1"), col("cents")).otherwise(0L)).as("r0"),
        sum(when(col("is1"), col("cents")).otherwise(0L)).as("r1"),
        sum(when(!col("is1"), col("qty")).otherwise(0L)).as("q0"),
        sum(when(col("is1"), col("qty")).otherwise(0L)).as("q1"))
      .filter(col("q0") > 0 && col("q1") > 0)
    li.select(col("bucket"), col("r0"), col("r1"), col("q0"), col("q1"),
      (col("r1") - col("r0")).as("delta_rev"),
      round((col("r1").cast("double") / col("q1")
        - col("r0").cast("double") / col("q0")) * col("q1"), 2)
        .as("price_effect"),
      round((col("q1") - col("q0")).cast("double")
        * (col("r0").cast("double") / col("q0")), 2).as("volume_effect"))
      .orderBy(col("bucket"))
  }

  val priceVolumeBridgeSql: String =
    """WITH g AS (SELECT l_partkey % 20 AS bucket,
      |    CAST(sum(CASE WHEN datepart('year', l_shipdate) = 1996
      |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS r0,
      |    CAST(sum(CASE WHEN datepart('year', l_shipdate) = 1997
      |      THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      |      ELSE 0 END) AS BIGINT) AS r1,
      |    CAST(sum(CASE WHEN datepart('year', l_shipdate) = 1996
      |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q0,
      |    CAST(sum(CASE WHEN datepart('year', l_shipdate) = 1997
      |      THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS q1
      |  FROM lineitem WHERE datepart('year', l_shipdate) IN (1996, 1997)
      |  GROUP BY 1)
      |SELECT bucket, r0, r1, q0, q1, r1 - r0 AS delta_rev,
      |  round((CAST(r1 AS DOUBLE) / q1 - CAST(r0 AS DOUBLE) / q0) * q1, 2)
      |    AS price_effect,
      |  round(CAST(q1 - q0 AS DOUBLE) * (CAST(r0 AS DOUBLE) / q0), 2)
      |    AS volume_effect
      |FROM g WHERE q0 > 0 AND q1 > 0
      |ORDER BY bucket""".stripMargin

  /** B25 — inter-purchase gap profile: the distribution of days
    * between a customer's consecutive orders — the purchase-cadence
    * readout behind churn models and replenishment campaigns (B14's
    * RFM recency is the LAST gap; this is the distribution of ALL
    * gaps). Gaps come from one lag window per customer (ordered by
    * date with the order key as the deterministic tie-break — two
    * same-day orders gap 0 days in a pinned order on both engines),
    * then land in the standard cadence buckets. Counts and day sums
    * are exact integers; share and mean are one division each.
    * Scale shape: one window partitioned by the customer key (fully
    * parallel), one small aggregate — no global sort. */
  def purchaseGaps(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("o_orderdate"), col("prev")).as("gap_days"))
    val bucket = when(col("gap_days") <= 7, "a_week")
      .when(col("gap_days") <= 30, "b_month")
      .when(col("gap_days") <= 90, "c_quarter")
      .when(col("gap_days") <= 365, "d_year")
      .otherwise("e_longer")
    val counts = gaps.select(bucket.as("gap_bucket"),
        col("gap_days").cast("bigint").as("gap_days"))
      .groupBy(col("gap_bucket"))
      .agg(count(lit(1)).as("n"), sum(col("gap_days")).as("sum_days"))
    counts
      .crossJoin(broadcast(counts.agg(sum(col("n")).as("total"))))
      .select(col("gap_bucket"), col("n"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("share"),
        expr("sum_days DIV n").as("mean_gap_days"))
      .orderBy(col("gap_bucket"))
  }

  val purchaseGapsSql: String =
    """WITH g AS (SELECT date_diff('day', lag(o_orderdate) OVER
      |      (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |      o_orderdate) AS gap_days
      |    FROM orders),
      |b AS (SELECT CASE WHEN gap_days <= 7 THEN 'a_week'
      |        WHEN gap_days <= 30 THEN 'b_month'
      |        WHEN gap_days <= 90 THEN 'c_quarter'
      |        WHEN gap_days <= 365 THEN 'd_year'
      |        ELSE 'e_longer' END AS gap_bucket,
      |        CAST(gap_days AS BIGINT) AS gap_days
      |      FROM g WHERE gap_days IS NOT NULL),
      |c AS (SELECT gap_bucket, count(*) AS n,
      |        CAST(sum(gap_days) AS BIGINT) AS sum_days
      |      FROM b GROUP BY 1)
      |SELECT gap_bucket, n,
      |  round(CAST(n AS DOUBLE)
      |    / CAST((SELECT sum(n) FROM c) AS DOUBLE), 6) AS share,
      |  CAST(sum_days // n AS BIGINT) AS mean_gap_days
      |FROM c ORDER BY gap_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_purchase_gaps" -> (purchaseGaps _),
    "q_growth_accounting" -> (growthAccounting _),
    "q_price_volume_bridge" -> (priceVolumeBridge _),
    "q_argmax_funcs" -> (argmaxFuncs _),
    "q_hof_funcs" -> (hofFuncs _),
    "q_weekday_profile" -> (weekdayProfile _),
    "q_fanout_profile" -> (fanoutProfile _),
    "q_rolling_corr" -> (rollingCorr _),
    "q_session_conversion" -> (sessionConversion _),
    "q_decay_score" -> (decayScore _),
    "q_semi_additive" -> (semiAdditive _),
    "q_confusion_metrics" -> (confusionMetrics _),
    "q_union_by_name" -> (unionByNameQ _),
    "q_except_all" -> (exceptAll _),
    "q_intersect_all" -> (intersectAll _),
    "q_cume_dist" -> (cumeDist _),
    "q_ohlc" -> (ohlc _),
    "q_vwap" -> (vwap _),
    "q_drawdown" -> (drawdown _),
    "q_bollinger" -> (bollinger _),
    "q_mutual_info" -> (mutualInfo _),
    "q_cohens_kappa" -> (cohensKappa _),
    "q_string_funcs2" -> (stringFuncs2 _),
  )

  val oracle: Map[String, String] = Map(
    "q_purchase_gaps" -> purchaseGapsSql,
    "q_growth_accounting" -> growthAccountingSql,
    "q_price_volume_bridge" -> priceVolumeBridgeSql,
    "q_argmax_funcs" -> argmaxFuncsSql,
    "q_hof_funcs" -> hofFuncsSql,
    "q_weekday_profile" -> weekdayProfileSql,
    "q_fanout_profile" -> fanoutProfileSql,
    "q_rolling_corr" -> rollingCorrSql,
    "q_session_conversion" -> sessionConversionSql,
    "q_decay_score" -> decayScoreSql,
    "q_semi_additive" -> semiAdditiveSql,
    "q_confusion_metrics" -> confusionMetricsSql,
    "q_drawdown" -> drawdownSql,
    "q_bollinger" -> bollingerSql,
    "q_union_by_name" -> unionByNameSql,
    "q_except_all" -> exceptAllSql,
    "q_intersect_all" -> intersectAllSql,
    "q_cume_dist" -> cumeDistSql,
    "q_ohlc" -> ohlcSql,
    "q_vwap" -> vwapSql,
    "q_mutual_info" -> mutualInfoSql,
    "q_cohens_kappa" -> cohensKappaSql,
    "q_string_funcs2" -> stringFuncs2Sql,
  )
}
