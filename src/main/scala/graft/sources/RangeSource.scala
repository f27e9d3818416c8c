package graft.sources

import java.util

import scala.collection.JavaConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The library's own DataSource V2 connector: a deterministic
  * PK-ranged table (`id` ∈ [lo, hi)) served in `stride`-sized
  * partitions — the reference's ranged-scan/batching shape (SURVEY
  * §2A A1/A14) expressed as a first-class Spark connector instead of
  * reader options.
  *
  * Scale behaviors a 100 TB source must have, implemented for real:
  *  - **Partition planning**: [lo, hi) splits into ⌈n/stride⌉
  *    independent input partitions — the parallel-batch layout the
  *    reference schedules by hand.
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): >,>=,<,<=,=
  *    predicates on `id` NARROW THE PLANNED RANGE, so pruned
  *    partitions are never even created (SourceSpec asserts the
  *    partition count shrinks); every accepted filter is also
  *    reported back to the plan (`PushedFilters` in explain).
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the
  *    reader materializes ONLY the requested fields; derived columns
  *    are never computed when pruned away.
  *
  * Columns are deterministic functions of `id` (cents = 60-bit md5
  * hash mod 10⁶ via [[graft.operators.Sketches.hash60]], bucket =
  * id mod 100), so any slice is reproducible on any engine — the
  * DuckDB oracle rebuilds the same rows from `range()`.
  *
  *  - **Aggregate pushdown** ([[SupportsPushDownAggregates]]):
  *    `MAX(id)`/`MIN(id)`/`COUNT(*)` complete-push to range
  *    arithmetic — the reference's frontier probe with zero scan.
  *
  * With a `path` option the connector flips to its FILE-BACKED mode
  * ([[RangeFileTable]]): a writable, manifest-committed table — the
  * sink half of the connector lifecycle (see [[RangeSink]]'s
  * scaladoc for the commit protocol).
  *
  * Usage: `spark.read.format("graft.sources.RangeSource")
  * .option("lo", 0).option("hi", 1000000).option("stride", 50000)
  * .load()`; write:
  * `df.write.format("graft.sources.RangeSource").option("path", p)
  * .mode("append"|"overwrite").save()`.
  */
class RangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // DataFrameReader options are conventionally case-insensitive
    // (inferSchema already receives a CaseInsensitiveStringMap); a raw
    // getOrDefault would silently hand .option("Lo", …) the default
    // range — wrap before lookup so casing never changes the scan.
    val opts = new CaseInsensitiveStringMap(properties)
    // `path` flips the connector to its file-backed mode: the
    // manifest-committed sink table ([[RangeFileTable]]) — writable,
    // re-readable, stats-bearing. Without it: the generated range.
    if (opts.containsKey("path")) new RangeFileTable(opts.get("path"))
    else new RangeTable(
      opts.getLong("lo", 0L),
      opts.getLong("hi", 1000000L),
      opts.getLong("stride", 100000L),
      opts.getLong("rate", 100000L))
  }
}

object RangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("cents", LongType, nullable = false),
    StructField("bucket", IntegerType, nullable = false)))
}

private[sources] class RangeTable(lo: Long, hi: Long, stride: Long, rate: Long)
    extends Table with SupportsRead {
  require(stride > 0, s"stride must be positive, got $stride")
  require(rate > 0, s"rate must be positive, got $rate")
  override def name(): String = s"graft_range[$lo,$hi)"
  override def schema(): StructType = RangeSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RangeScanBuilder(lo, hi, stride, rate)
}

private[sources] class RangeScanBuilder(lo: Long, hi: Long, stride: Long,
    rate: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates {

  private var curLo = lo
  private var curHi = hi
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RangeSource.schema
  private var pushedAgg: Option[Seq[AggregateFunc]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("id", v: Long) => curLo = math.max(curLo, v + 1); true
      case GreaterThanOrEqual("id", v: Long) => curLo = math.max(curLo, v); true
      case LessThan("id", v: Long) => curHi = math.min(curHi, v); true
      case LessThanOrEqual("id", v: Long) => curHi = math.min(curHi, v + 1); true
      case EqualTo("id", v: Long) =>
        curLo = math.max(curLo, v); curHi = math.min(curHi, v + 1); true
      case _ => false // anything else stays a residual Spark-side filter
    }
    pushed = accepted
    residual
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** MAX(id)/MIN(id)/COUNT(*) are pure range arithmetic on the
    * (already filter-narrowed) [curLo, curHi) bounds — the reference's
    * frontier probe (SURVEY §2A A4: "SELECT MAX(pk)" before each
    * batch) planned as a complete pushdown: zero partitions scanned,
    * one metadata row returned. Filters push before aggregates, so a
    * `WHERE id < x` probe narrows the bounds first. */
  private def supported(agg: Aggregation): Boolean =
    agg.groupByExpressions().isEmpty && agg.aggregateExpressions().forall {
      case m: Max => RangeAggScan.isId(m.column)
      case m: Min => RangeAggScan.isId(m.column)
      case _: CountStar => true
      case _ => false
    }

  override def supportCompletePushDown(agg: Aggregation): Boolean =
    supported(agg)

  override def pushAggregation(agg: Aggregation): Boolean =
    if (!supported(agg)) false
    else { pushedAgg = Some(agg.aggregateExpressions().toSeq); true }

  override def build(): Scan = pushedAgg match {
    case Some(funcs) =>
      val rows = math.max(0L, curHi - curLo)
      val minId = if (rows == 0) None else Some(curLo)
      val maxId = if (rows == 0) None else Some(curHi - 1)
      new RangeAggScan(funcs, rows, minId, maxId,
        s"graft_range[$curLo,$curHi) PushedAggregates: " +
          s"[${RangeAggScan.describe(funcs)}] (range arithmetic, 0 partitions)")
    case None => new RangeScan(curLo, curHi, stride, rate, required)
  }
}

private[sources] case class RangePartition(start: Long, end: Long)
  extends InputPartition

private[sources] class RangeScan(lo: Long, hi: Long, stride: Long, rate: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    RangeScan.split(lo, hi, stride)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new RangeMicroBatchStream(lo, hi, stride, rate, required)

  override def description(): String =
    s"graft_range[$lo,$hi) stride=$stride cols=${required.fieldNames.mkString(",")}"
}

private[sources] object RangeScan {
  def split(lo: Long, hi: Long, stride: Long): Array[InputPartition] =
    if (hi <= lo) Array.empty
    else (lo until hi by stride)
      .map(s => RangePartition(s, math.min(s + stride, hi)): InputPartition)
      .toArray
}

/** Streaming offset = the next unread id. Serialized as the bare
  * number, so checkpointed offsets are human-auditable. */
private[sources] case class RangeStreamOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

/** The reference's incremental tail-sync loop (SURVEY §2A A12:
  * advance a PK frontier, emit [frontier, frontier+rate), commit,
  * repeat) as a real MicroBatchStream: Structured Streaming
  * checkpoints the frontier and replays only the uncommitted slice
  * after a crash — the at-least-once-resume the reference implements
  * by hand with a metadata table, here inherited from the engine's
  * offset log. Admission control caps each micro-batch at `rate`
  * rows; each batch splits into stride-sized partitions like the
  * batch path. */
private[sources] class RangeMicroBatchStream(lo: Long, hi: Long, stride: Long,
    rate: Long, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl {

  override def initialOffset(): Offset = RangeStreamOffset(lo)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) should be called for admission control")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RangeStreamOffset].v
    // honor the engine's admission control: Trigger.Once/AvailableNow
    // ask for all available rows; an explicit max-rows cap wins over
    // the source's own rate
    val step = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxRows =>
        m.maxRows()
      case _: org.apache.spark.sql.connector.read.streaming.ReadAllAvailable =>
        hi - s
      case _ => rate
    }
    RangeStreamOffset(math.min(hi, s + math.max(step, 1L)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(rate)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    RangeScan.split(start.asInstanceOf[RangeStreamOffset].v,
      end.asInstanceOf[RangeStreamOffset].v, stride)

  override def createReaderFactory(): PartitionReaderFactory =
    new RangeReaderFactory(required.fieldNames)

  override def deserializeOffset(json: String): Offset =
    RangeStreamOffset(json.toLong)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] class RangeReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[RangePartition]
    new PartitionReader[InternalRow] {
      private var cur = p.start - 1
      override def next(): Boolean = { cur += 1; cur < p.end }
      // only the pruned-to columns are ever computed — the md5 for
      // `cents` is skipped entirely when the query doesn't read it
      override def get(): InternalRow = {
        val vals = new Array[Any](cols.length)
        var i = 0
        while (i < cols.length) {
          vals(i) = cols(i) match {
            case "id" => cur
            case "cents" =>
              graft.operators.Sketches.hash60(cur.toString) % 1000000L
            case "bucket" => (cur % 100L).toInt
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = ()
    }
  }
}
