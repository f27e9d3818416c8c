package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational operator inventory: scans, projection/filter, aggregation,
  * grouping sets, sort/limit, set ops, scalar functions, UDF surface
  * (SURVEY.md §2B rows S1-S2, P1-P2, G1-G5, T1, U1-U2, F1-F6, D1, D3).
  *
  * Conventions (SURVEY.md §7.5): every query ends in ORDER BY over a
  * provably-unique key set, floating aggregates are round()ed on both
  * sides, no NULLs escape into output columns, computed numerics are
  * cast explicitly so Spark and DuckDB output types agree (DuckDB
  * sum(int) is HUGEINT; Spark's is LONG — hence CAST AS BIGINT in the
  * oracle SQL).
  *
  * Scale posture: all aggregates here are hash aggregates with
  * map-side partial aggregation (Spark plans HashAggregate(partial) →
  * shuffle on grouping keys → HashAggregate(final)); filters/projections
  * are pushed into the parquet scan by Catalyst (verified via
  * .explain "PushedFilters"). Nothing below collects to the driver.
  */
object Relational {
  import Conv._

  /** G1 flagship — TPC-H Q1-shaped pricing summary on lineitem.
    * scan → pushed filter → partial/final hash agg → sort. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec2(col("l_extendedprice")) *
          (expr("CAST(1.00 AS DECIMAL(3,2))") - dec2(col("l_discount")))), 2)
          .cast("double").as("sum_disc_price"),
        moneyAvg("l_quantity").as("avg_qty"),
        moneyAvg("l_discount", 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |    (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT) + count(*)) // (2 * count(*)) AS DOUBLE) / 100.0 AS avg_qty,
      |  CAST((2 * CAST(sum(CAST(l_discount AS DECIMAL(18,2))) * 10000 AS BIGINT) + count(*)) // (2 * count(*)) AS DOUBLE) / 10000.0 AS avg_disc,
      |  CAST(count(*) AS BIGINT) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** S2 — PK-ranged scan, the reference's core read pattern (A1/A3):
    * `WHERE pk > lo AND pk <= hi`. Catalyst pushes the range predicate
    * into the parquet scan (PushedFilters: GreaterThan, LessThanOrEqual)
    * exactly as the reference pushes it into generated RDBMS SQL. */
  def rangedScan(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") > 1000 && col("l_orderkey") <= 1200)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val rangedScanSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem WHERE l_orderkey > 1000 AND l_orderkey <= 1200
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** P1 — expression projection + aliasing. */
  def projection(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        round(col("p_retailprice") * 1.1, 2).as("price_up"),
        (col("p_size") + lit(5)).cast("int").as("size_adj"))
      .orderBy(col("p_partkey"))

  val projectionSql: String =
    """SELECT p_partkey, upper(p_name) AS name_u,
      |  concat_ws('/', p_brand, p_type) AS brand_type,
      |  round(p_retailprice * 1.1, 2) AS price_up,
      |  CAST(p_size + 5 AS INT) AS size_adj
      |FROM part ORDER BY p_partkey""".stripMargin

  /** P2 — compound predicates: AND/OR, IN, BETWEEN, LIKE, IS NOT NULL. */
  def filterComplex(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(
        col("o_orderstatus").isin("F", "P") &&
        col("o_totalprice").between(100000.0, 300000.0) &&
        (col("o_orderpriority").like("3-%") || col("o_orderpriority").like("1-%")) &&
        col("o_custkey").isNotNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))

  val filterComplexSql: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      |FROM orders
      |WHERE o_orderstatus IN ('F','P')
      |  AND o_totalprice BETWEEN 100000.0 AND 300000.0
      |  AND (o_orderpriority LIKE '3-%' OR o_orderpriority LIKE '1-%')
      |  AND o_custkey IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  /** G2 — exact distinct count (plans as two-phase aggregate with
    * partial distinct; no driver-side work). */
  def countDistinctQ(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderstatus"))
      .agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderstatus"))

  val countDistinctSql: String =
    """SELECT o_orderstatus,
      |  CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
      |  CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** G4a — ROLLUP + grouping_id; keys coalesced to sentinels so output
    * carries no NULLs (null sort order differs across engines). */
  def rollupQ(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("lstatus"),
        col("gid"), col("sum_qty"), col("n"))
      .orderBy(col("gid"), col("rflag"), col("lstatus"))

  val rollupSql: String =
    """SELECT coalesce(l_returnflag, 'ALL') AS rflag,
      |  coalesce(l_linestatus, 'ALL') AS lstatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY gid, rflag, lstatus""".stripMargin

  /** G4b — CUBE over part attributes. */
  def cubeQ(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .cube(col("p_brand"), col("p_type"))
      .agg(
        grouping_id().cast("int").as("gid"),
        count(lit(1)).as("n"),
        moneyAvg("p_retailprice").as("avg_price"))
      .select(
        coalesce(col("p_brand"), lit("ALL")).as("brand"),
        coalesce(col("p_type"), lit("ALL")).as("ptype"),
        col("gid"), col("n"), col("avg_price"))
      .orderBy(col("gid"), col("brand"), col("ptype"))

  val cubeSql: String =
    """SELECT coalesce(p_brand, 'ALL') AS brand,
      |  coalesce(p_type, 'ALL') AS ptype,
      |  CAST(GROUPING(p_brand, p_type) AS INT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST((2 * CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) * 100 AS BIGINT) + count(*)) // (2 * count(*)) AS DOUBLE) / 100.0 AS avg_price
      |FROM part
      |GROUP BY CUBE(p_brand, p_type)
      |ORDER BY gid, brand, ptype""".stripMargin

  /** G5 — partial/final aggregation invariance under explicit
    * repartitioning: same oracle as a plain aggregate; the repartition
    * forces an extra shuffle and the partial aggregates must still
    * combine associatively. Sums are rounded only at the end. */
  def aggRepartition(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .repartition(8, col("l_partkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val aggRepartitionSql: String =
    """SELECT l_returnflag,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** T1 — global top-k: Spark plans TakeOrderedAndProject (no full
    * sort materialization; each partition keeps k rows, driver merges k·p). */
  def topK(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val topKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** U1a — UNION ALL of two heterogeneous projections with a tag. */
  def unionAll(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir).filter(col("c_nationkey") < 5)
      .select(col("c_custkey").as("key"), col("c_acctbal").as("acctbal"), lit("cust").as("side"))
    val p = Tables.supplier(s, dir).filter(col("s_nationkey") < 5)
      .select(col("s_suppkey").as("key"), col("s_acctbal").as("acctbal"), lit("supp").as("side"))
    c.unionByName(p).orderBy(col("side"), col("key"))
  }

  val unionAllSql: String =
    """SELECT * FROM (
      |  SELECT c_custkey AS key, c_acctbal AS acctbal, 'cust' AS side
      |  FROM customer WHERE c_nationkey < 5
      |  UNION ALL
      |  SELECT s_suppkey AS key, s_acctbal AS acctbal, 'supp' AS side
      |  FROM supplier WHERE s_nationkey < 5)
      |ORDER BY side, key""".stripMargin

  /** U1b — UNION DISTINCT. */
  def unionDistinct(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
    f.union(p).distinct().orderBy(col("custkey"))
  }

  val unionDistinctSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |UNION
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY custkey""".stripMargin

  /** U2a — INTERSECT (distinct semantics on both engines). */
  def intersectQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val p = o.filter(col("o_orderstatus") === "P").select(col("o_custkey").as("custkey"))
    f.intersect(p).orderBy(col("custkey"))
  }

  val intersectSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |INTERSECT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      |ORDER BY custkey""".stripMargin

  /** U2b — EXCEPT (distinct semantics on both engines). */
  def exceptQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    val x = o.filter(col("o_orderstatus") === "O").select(col("o_custkey").as("custkey"))
    f.except(x).orderBy(col("custkey"))
  }

  val exceptSql: String =
    """SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      |EXCEPT
      |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      |ORDER BY custkey""".stripMargin

  /** F1 — string functions. */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 500)
      .select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("name_pfx"),
        length(col("c_name")).as("name_len"),
        regexp_extract(col("c_name"), "#(\\d+)", 1).cast("bigint").as("name_num"),
        substring_index(col("c_name"), "#", 1).as("name_word"),
        trim(lower(col("c_mktsegment"))).as("seg_lc"),
        concat_ws("-", col("c_mktsegment"), col("c_custkey").cast("string")).as("seg_key"))
      .orderBy(col("c_custkey"))

  val stringFuncsSql: String =
    """SELECT c_custkey,
      |  upper(substring(c_name, 1, 8)) AS name_pfx,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  CAST(regexp_extract(c_name, '#(\d+)', 1) AS BIGINT) AS name_num,
      |  split_part(c_name, '#', 1) AS name_word,
      |  trim(lower(c_mktsegment)) AS seg_lc,
      |  concat_ws('-', c_mktsegment, CAST(c_custkey AS VARCHAR)) AS seg_key
      |FROM customer WHERE c_custkey < 500 ORDER BY c_custkey""".stripMargin

  /** F2 — date/time functions (timestamps emitted as DATE or epoch
    * seconds — never raw sub-second timestamps; SURVEY.md §7.4.2). */
  def dateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        datediff(to_date(lit("2000-01-01")), col("o_orderdate").cast("date")).as("days_to_y2k"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  val dateFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS y,
      |  CAST(month(o_orderdate) AS INT) AS m,
      |  CAST(day(o_orderdate) AS INT) AS d,
      |  CAST(quarter(o_orderdate) AS INT) AS q,
      |  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT) AS days_to_y2k,
      |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  /** F2b — calendar arithmetic: add_months (month-end clamped on both
    * engines), last_day, day-of-week/year (DuckDB's dayofweek is
    * 0-based Sunday, Spark's 1-based — aligned with +1), ISO week. */
  def dateArith(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 1000)
      .select(
        col("o_orderkey"),
        add_months(col("o_orderdate").cast("date"), 3).as("plus3m"),
        last_day(col("o_orderdate").cast("date")).as("month_end"),
        dayofweek(col("o_orderdate")).as("dow"),
        dayofyear(col("o_orderdate")).as("doy"),
        weekofyear(col("o_orderdate")).as("iso_week"))
      .orderBy(col("o_orderkey"))

  val dateArithSql: String =
    """SELECT o_orderkey,
      |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
      |  last_day(CAST(o_orderdate AS DATE)) AS month_end,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(dayofyear(o_orderdate) AS INT) AS doy,
      |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week
      |FROM orders WHERE o_orderkey < 1000 ORDER BY o_orderkey""".stripMargin

  /** F3 — math functions (ln spelled explicitly: DuckDB log() is log10). */
  def mathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_orderkey") < 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_discount") * 100).as("disc_pct_ceil"),
        abs(col("l_quantity") - 25.0).as("qty_dev"),
        round(pow(col("l_quantity"), 2.0), 2).as("qty_sq"),
        round(sqrt(col("l_extendedprice")), 3).as("price_sqrt"),
        round(log(col("l_extendedprice") + 1.0), 4).as("price_ln"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val mathFuncsSql: String =
    """SELECT l_orderkey, l_linenumber,
      |  round(l_extendedprice, 1) AS price_r1,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
      |  abs(l_quantity - 25.0) AS qty_dev,
      |  round(pow(l_quantity, 2.0), 2) AS qty_sq,
      |  round(sqrt(l_extendedprice), 3) AS price_sqrt,
      |  round(ln(l_extendedprice + 1.0), 4) AS price_ln
      |FROM lineitem WHERE l_orderkey < 500 ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** F5 — JSON extraction from events.props (Spark get_json_object; the
    * oracle uses a regexp so the DuckDB json extension is not required). */
  def jsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("prop_k"))
      .orderBy(col("event_id"))

  val jsonFuncsSql: String =
    """SELECT event_id, event_type,
      |  CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS BIGINT) AS prop_k
      |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin

  /** F6 — conditionals: CASE WHEN / coalesce / nullif. */
  def conditionalFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        when(col("o_totalprice") > 300000.0, "high")
          .when(col("o_totalprice") > 150000.0, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status_or_open"))
      .groupBy(col("bucket"), col("status_or_open"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"), col("status_or_open"))

  val conditionalFuncsSql: String =
    """SELECT CASE WHEN o_totalprice > 300000.0 THEN 'high'
      |            WHEN o_totalprice > 150000.0 THEN 'mid'
      |            ELSE 'low' END AS bucket,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS status_or_open,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY bucket, status_or_open""".stripMargin

  /** D1 — scalar Scala UDF (semantics also expressible in SQL for the
    * oracle). Kept OFF the hot path elsewhere: UDFs block codegen and
    * pushdown, so built-ins are preferred engine-wide. */
  def scalarUdf(s: SparkSession, dir: String): DataFrame = {
    // Locale.ROOT: default-locale toUpperCase is the classic Turkish-i
    // hazard (i → İ under tr-TR), and the oracle's upper() is
    // locale-free — LocaleSpec runs this query under tr-TR to pin it.
    val normName = udf((x: String) =>
      if (x == null) null else x.trim.toUpperCase(java.util.Locale.ROOT).reverse)
    Tables.customer(s, dir)
      .filter(col("c_custkey") < 300)
      .select(col("c_custkey"), normName(col("c_name")).as("name_norm"))
      .orderBy(col("c_custkey"))
  }

  val scalarUdfSql: String =
    """SELECT c_custkey, reverse(upper(trim(c_name))) AS name_norm
      |FROM customer WHERE c_custkey < 300 ORDER BY c_custkey""".stripMargin

  /** D3 — generator / UDTF surface: explode over split tokens, feeding a
    * term-frequency aggregate (doubles as L4 text analysis). */
  def termFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("freq"))
      .filter(col("freq") > 20)
      .orderBy(col("word"))

  val termFreqSql: String =
    """SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
      |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
      |WHERE word <> ''
      |GROUP BY word HAVING count(*) > 20
      |ORDER BY word""".stripMargin

  /** Pivot: status columns per order priority (wide-table reshaping;
    * Spark plans it as a single hash aggregate with conditional
    * aggregates — the oracle mirrors that formulation directly). */
  def pivotQ(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("o_orderpriority"), col("F").as("n_f"), col("O").as("n_o"),
        col("P").as("n_p"))
      .orderBy(col("o_orderpriority"))

  val pivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
      |  CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
      |  CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Unpivot/melt: wide columns back to (key, metric, value) rows. */
  def unpivotQ(s: SparkSession, dir: String): DataFrame =
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_acctbal"),
        col("s_nationkey").cast("double").as("s_nation_d"))
      .unpivot(Array(col("s_suppkey")),
        Array(col("s_acctbal"), col("s_nation_d")), "metric", "value")
      .orderBy(col("s_suppkey"), col("metric"))

  val unpivotSql: String =
    """SELECT s_suppkey, metric, value FROM (
      |  SELECT s_suppkey, 's_acctbal' AS metric, s_acctbal AS value FROM supplier
      |  UNION ALL
      |  SELECT s_suppkey, 's_nation_d' AS metric, CAST(s_nationkey AS DOUBLE) AS value
      |  FROM supplier)
      |ORDER BY s_suppkey, metric""".stripMargin

  /** Correlated/scalar subqueries: an uncorrelated scalar threshold
    * (exact max arithmetic — deterministic across engines) plus a
    * correlated EXISTS; Catalyst decorrelates both into joins. */
  def scalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    o.createOrReplaceTempView("orders_v")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT o_orderkey, o_totalprice
        |FROM orders_v
        |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders_v)
        |  AND EXISTS (SELECT 1 FROM lineitem_v WHERE l_orderkey = o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)
  }

  val scalarSubquerySql: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > (SELECT max(o_totalprice) * 0.9 FROM orders)
      |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  /** Correlated scalar subquery (per-row aggregate lookup): Catalyst's
    * RewriteCorrelatedScalarSubquery decorrelates it into one left
    * outer aggregate join — no per-row re-execution at any scale. */
  def correlatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT o_orderkey, o_totalprice,
        |  CAST(coalesce((SELECT count(*) FROM lineitem_v l
        |                 WHERE l.l_orderkey = o.o_orderkey), 0) AS BIGINT) AS n_items
        |FROM orders_v o WHERE o_orderkey < 2000
        |ORDER BY o_orderkey""".stripMargin)
  }

  val correlatedSubquerySql: String =
    """SELECT o_orderkey, o_totalprice,
      |  CAST(coalesce((SELECT count(*) FROM lineitem l
      |                 WHERE l.l_orderkey = o.o_orderkey), 0) AS BIGINT) AS n_items
      |FROM orders o WHERE o_orderkey < 2000
      |ORDER BY o_orderkey""".stripMargin

  /** G4c — explicit GROUPING SETS (beyond rollup/cube): chosen subsets. */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS prio,
        |  CAST(grouping_id(o_orderstatus, o_orderpriority) AS INT) AS gid,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders_v
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY gid, status, prio""".stripMargin)
  }

  val groupingSetsSql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS prio,
      |  CAST(GROUPING(o_orderstatus, o_orderpriority) AS INT) AS gid,
      |  CAST(count(*) AS BIGINT) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY gid, status, prio""".stripMargin

  /** G7 — second-moment statistics (variance, stddev, correlation)
    * computed from exact decimal power sums so both engines derive
    * identical doubles (built-in stddev/corr accumulate doubles in
    * engine-specific order — see Extras.statsBuiltin for those).
    * All inputs are 2-decimal, so Σx, Σx², Σxy are exact. */
  def statsMoments(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_v")
    s.sql(
      """SELECT l_returnflag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  (CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE) / count(*))
        |    / (count(*) - 1) AS var_qty,
        |  sqrt((CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE) / count(*))
        |    / (count(*) - 1)) AS stddev_qty,
        |  (count(*) * CAST(sum(qd * pd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(pd) AS DOUBLE))
        |    / (sqrt(count(*) * CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE))
        |     * sqrt(count(*) * CAST(sum(pd * pd) AS DOUBLE) - CAST(sum(pd) AS DOUBLE) * CAST(sum(pd) AS DOUBLE)))
        |    AS corr_qty_price
        |FROM (SELECT l_returnflag,
        |        CAST(l_quantity AS DECIMAL(18,2)) AS qd,
        |        CAST(l_extendedprice AS DECIMAL(18,2)) AS pd
        |      FROM lineitem_v)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  val statsMomentsSql: String =
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n,
      |  (CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE) / count(*))
      |    / (count(*) - 1) AS var_qty,
      |  sqrt((CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE) / count(*))
      |    / (count(*) - 1)) AS stddev_qty,
      |  (count(*) * CAST(sum(qd * pd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(pd) AS DOUBLE))
      |    / (sqrt(count(*) * CAST(sum(qd * qd) AS DOUBLE) - CAST(sum(qd) AS DOUBLE) * CAST(sum(qd) AS DOUBLE))
      |     * sqrt(count(*) * CAST(sum(pd * pd) AS DOUBLE) - CAST(sum(pd) AS DOUBLE) * CAST(sum(pd) AS DOUBLE)))
      |    AS corr_qty_price
      |FROM (SELECT l_returnflag,
      |        CAST(l_quantity AS DECIMAL(18,2)) AS qd,
      |        CAST(l_extendedprice AS DECIMAL(18,2)) AS pd
      |      FROM lineitem)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** G8 — ordered collection aggregate: collect_list is unordered, so
    * the deterministic form is sort_array(collect_list(...)) emitted
    * as a joined string (portable output type). */
  def collectAgg(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_custkey") < 30)
      .groupBy(col("o_custkey"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("o_orderkey").cast("string"))))
          .as("order_keys"),
        count(lit(1)).as("n"))
      .orderBy(col("o_custkey"))

  val collectAggSql: String =
    """SELECT o_custkey,
      |  array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS order_keys,
      |  CAST(count(*) AS BIGINT) AS n
      |FROM orders WHERE o_custkey < 30
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** F5b — map type surface: parse props JSON into map<string,bigint>,
    * use map_keys/map_values/element_at. */
  def mapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("event_id") < 1000)
      .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType)))
      .select(
        col("event_id"),
        concat_ws(",", map_keys(col("m"))).as("keys_str"),
        coalesce(element_at(col("m"), "k"), lit(-1L)).as("k_val"),
        size(col("m")).as("n_keys"))
      .orderBy(col("event_id"))

  val mapFuncsSql: String =
    """SELECT event_id,
      |  array_to_string(regexp_extract_all(props, '"([a-z0-9_]+)" *:', 1), ',') AS keys_str,
      |  coalesce(CAST(regexp_extract(props, '"k": *(-?[0-9]+)', 1) AS BIGINT), -1) AS k_val,
      |  CAST(len(regexp_extract_all(props, '"([a-z0-9_]+)" *:', 1)) AS INT) AS n_keys
      |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin

  /** P5 — relational division (÷): customers whose orders span EVERY
    * order-priority class in the data — the "for-all" quantifier of
    * relational algebra, the shape behind "users who touched every
    * feature" / "suppliers certified for every region". Implemented as
    * the count-compare decomposition (the scalable standard): one
    * partial/final distinct-count per dividend group compared against
    * the broadcast divisor cardinality — no per-class anti-join chain,
    * no explosion; at 100 TB it is one aggregate over the fact table
    * plus a scalar broadcast. The divisor is DERIVED from the data
    * (count of distinct classes), so the query adapts if classes are
    * added. */
  def relationalDivision(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val nClasses = o.agg(
      countDistinct(col("o_orderpriority")).as("n_classes"))
    o.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("np"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(nClasses))
      .filter(col("np") === col("n_classes"))
      .select(col("o_custkey"), col("n_orders"))
      .orderBy(col("o_custkey"))
  }

  val relationalDivisionSql: String =
    """SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(DISTINCT o_orderpriority) =
      |  (SELECT count(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_relational_division" -> (relationalDivision _),
    "q_grouping_sets" -> (groupingSets _),
    "q_stats_moments" -> (statsMoments _),
    "q_collect_agg" -> (collectAgg _),
    "q_map_funcs" -> (mapFuncs _),
    "q_pivot" -> (pivotQ _),
    "q_unpivot" -> (unpivotQ _),
    "q_scalar_subquery" -> (scalarSubquery _),
    "q_correlated_subquery" -> (correlatedSubquery _),
    "q_pricing_summary" -> (pricingSummary _),
    "q_ranged_scan" -> (rangedScan _),
    "q_projection" -> (projection _),
    "q_filter_complex" -> (filterComplex _),
    "q_count_distinct" -> (countDistinctQ _),
    "q_rollup" -> (rollupQ _),
    "q_cube" -> (cubeQ _),
    "q_agg_repartition" -> (aggRepartition _),
    "q_topk" -> (topK _),
    "q_union_all" -> (unionAll _),
    "q_union_distinct" -> (unionDistinct _),
    "q_intersect" -> (intersectQ _),
    "q_except" -> (exceptQ _),
    "q_string_funcs" -> (stringFuncs _),
    "q_date_funcs" -> (dateFuncs _),
    "q_date_arith" -> (dateArith _),
    "q_math_funcs" -> (mathFuncs _),
    "q_json_funcs" -> (jsonFuncs _),
    "q_conditional" -> (conditionalFuncs _),
    "q_scalar_udf" -> (scalarUdf _),
    "q_term_freq" -> (termFreq _),
  )

  val oracle: Map[String, String] = Map(
    "q_relational_division" -> relationalDivisionSql,
    "q_grouping_sets" -> groupingSetsSql,
    "q_stats_moments" -> statsMomentsSql,
    "q_collect_agg" -> collectAggSql,
    "q_map_funcs" -> mapFuncsSql,
    "q_pivot" -> pivotSql,
    "q_unpivot" -> unpivotSql,
    "q_scalar_subquery" -> scalarSubquerySql,
    "q_correlated_subquery" -> correlatedSubquerySql,
    "q_pricing_summary" -> pricingSummarySql,
    "q_ranged_scan" -> rangedScanSql,
    "q_projection" -> projectionSql,
    "q_filter_complex" -> filterComplexSql,
    "q_count_distinct" -> countDistinctSql,
    "q_rollup" -> rollupSql,
    "q_cube" -> cubeSql,
    "q_agg_repartition" -> aggRepartitionSql,
    "q_topk" -> topKSql,
    "q_union_all" -> unionAllSql,
    "q_union_distinct" -> unionDistinctSql,
    "q_intersect" -> intersectSql,
    "q_except" -> exceptSql,
    "q_string_funcs" -> stringFuncsSql,
    "q_date_funcs" -> dateFuncsSql,
    "q_date_arith" -> dateArithSql,
    "q_math_funcs" -> mathFuncsSql,
    "q_json_funcs" -> jsonFuncsSql,
    "q_conditional" -> conditionalFuncsSql,
    "q_scalar_udf" -> scalarUdfSql,
    "q_term_freq" -> termFreqSql,
  )
}
