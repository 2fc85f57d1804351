package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 batch source generating a deterministic synthetic event
  * load — the Spark-native twin of the reference's message generator
  * (reference flood.go: replicate N synthetic messages downstream on
  * demand). Where the reference floods a broker with goroutines, a Spark
  * source declares the load as a TABLE: the generator participates in
  * Catalyst planning, so filters and projections push INTO generation
  * instead of filtering after the fact.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.sources.SyntheticEventsSource")
  *     .option("rows", 100000).option("partitions", 32).option("seed", 42)
  *     .load()
  * }}}
  *
  * Scale design:
  *  - `partitions` independent splits, each generating a contiguous
  *    event_id range from a pure function of (seed, id) — no shared state,
  *    no driver bottleneck, arbitrarily wide on a real cluster.
  *  - SupportsPushDownFilters: event_id range predicates prune WHOLE
  *    SPLITS at planning time (a split whose id range cannot match is
  *    never scheduled), and event_type equality short-circuits row
  *    emission inside the generator loop. Both appear as PushedFilters in
  *    the scan node; Dsv2SourceSpec asserts split pruning via the
  *    resulting partition count.
  *  - SupportsPushDownRequiredColumns: the reader materializes ONLY the
  *    pruned schema (ReadSchema in the plan) — a projection of 2 columns
  *    never pays string-building for the other 3.
  */
class SyntheticEventsSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticEventsSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticEventsTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("partitions", "4").toInt,
      properties.getOrDefault("seed", "42").toLong,
      properties.getOrDefault("rowsPerBatch", "1000").toLong)
}

object SyntheticEventsSource {
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("event_type", StringType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  /** Event time: one event per millisecond from a fixed epoch — pure
    * function of the id, so watermarks over the streamed rows behave
    * exactly like replayed history. */
  val BaseMicros: Long = 1704067200000000L // 2024-01-01T00:00:00Z
  def tsOf(id: Long): Long = BaseMicros + id * 1000L

  val EventTypes: Array[String] =
    Array("click", "error", "purchase", "signup", "view")

  /** splitmix64 — public-domain mixer (Steele et al., "Fast Splittable
    * Pseudorandom Number Generators", OOPSLA 2014). Pure function of the
    * id: any split can generate any row independently. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def userOf(seed: Long, id: Long): Long = Math.floorMod(mix(seed ^ id), 1000L)
  def typeOf(seed: Long, id: Long): String =
    EventTypes(Math.floorMod(mix(seed ^ id) >>> 10, EventTypes.length.toLong).toInt)
  def valueOf(seed: Long, id: Long): Double =
    Math.floorMod(mix(seed ^ id) >>> 20, 1000000L) / 100.0
}

private class SyntheticEventsTable(rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long) extends Table with SupportsRead {
  override def name(): String = s"synthetic_events($rows rows)"
  override def schema(): StructType = SyntheticEventsSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, partitions, seed, rowsPerBatch)
}

private class SyntheticScanBuilder(rows: Long, partitions: Int, seed: Long,
    rowsPerBatch: Long) extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var lo = 0L          // inclusive event_id lower bound
  private var hi = rows        // exclusive upper bound
  private var contradictory = false // unsatisfiable pushed conjunction
  private var typeEq: Option[String] = None
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticEventsSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("event_id", v: Long)        => lo = math.max(lo, v + 1); true
      case GreaterThanOrEqual("event_id", v: Long) => lo = math.max(lo, v); true
      case LessThan("event_id", v: Long)           => hi = math.min(hi, v); true
      case LessThanOrEqual("event_id", v: Long)    => hi = math.min(hi, v + 1); true
      case EqualTo("event_id", v: Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1); true
      case EqualTo("event_type", v: String) =>
        typeEq match {
          // Two conflicting equalities (type='a' AND type='b') can never
          // match: Spark trusts fully-pushed filters and will NOT
          // re-apply them, so keeping only the last value would return
          // the wrong rows. Accept both but mark the scan empty.
          case Some(prev) if prev != v => contradictory = true; true
          case _                       => typeEq = Some(v); true
        }
      case _                                       => false
    }
    pushed = accepted
    if (contradictory) hi = lo // empty range: no partitions planned
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val h = if (contradictory) lo else hi // empty scan on contradiction
    new SyntheticScan(rows, partitions, seed, lo, h, typeEq, required,
      rowsPerBatch)
  }
}

private case class SyntheticRange(start: Long, end: Long) extends InputPartition

/** event_id high-water mark — the only state a deterministic generator
  * needs (the broker-cursor role of a Pub/Sub ack position). */
private case class SynthOffset(v: Long) extends Offset {
  override def json(): String = v.toString
}

private class SyntheticScan(rows: Long, partitions: Int, seed: Long,
    lo: Long, hi: Long, typeEq: Option[String], required: StructType,
    rowsPerBatch: Long) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  /** Rendered inside the BatchScan node — the custom-source equivalent of
    * FileScan's PushedFilters/ReadSchema lines, and what Dsv2SourceSpec
    * asserts on. */
  override def description(): String =
    s"synthetic_events rows=$rows PushedRange=[$lo,$hi) " +
      s"PushedType=${typeEq.getOrElse("*")} " +
      s"ReadSchema=${required.fieldNames.mkString(",")}"

  /** Split the FULL id space evenly, then keep only splits overlapping the
    * pushed [lo, hi) range — the pruning a partitioned file source gets
    * from directory listing, here at zero I/O. */
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + partitions - 1) / partitions)
    (0L until rows by per)
      .map(s => SyntheticRange(math.max(s, lo), math.min(s + per, hi)))
      .filter(r => r.start < r.end)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(seed, typeEq, required)

  /** Micro-batch face of the same generator: offsets are event_id
    * high-water marks, batches advance by `rowsPerBatch` under admission
    * control (maxRows ReadLimit — the backpressure contract a broker
    * connector implements), and each batch's id range splits across
    * `partitions` readers exactly like the batch path. Deterministic
    * replay: any (start, end] range regenerates identical rows, which is
    * the whole recovery story — no WAL needed, the offset IS the data.
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new MicroBatchStream with SupportsAdmissionControl
        with SupportsTriggerAvailableNow {
      override def initialOffset(): Offset = SynthOffset(0L)
      override def deserializeOffset(json: String): Offset =
        SynthOffset(json.toLong)
      override def getDefaultReadLimit: ReadLimit =
        ReadLimit.maxRows(rowsPerBatch)
      override def latestOffset(): Offset =
        throw new UnsupportedOperationException(
          "admission-control latestOffset(start, limit) is used")
      override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
        val s = start.asInstanceOf[SynthOffset].v
        val step = limit match {
          case rl: streaming.ReadMaxRows => rl.maxRows()
          case _                         => rowsPerBatch
        }
        SynthOffset(math.min(s + step, rows))
      }
      override def reportLatestOffset(): Offset = SynthOffset(rows)
      override def prepareForTriggerAvailableNow(): Unit = ()
      override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
        val s = start.asInstanceOf[SynthOffset].v
        val e = end.asInstanceOf[SynthOffset].v
        val n = e - s
        if (n <= 0) Array.empty
        else {
          // honor batch-style pushdown if the planner applied it to this
          // scan: clamp every micro-batch range to the pushed [lo, hi)
          val per = math.max(1L, (n + partitions - 1) / partitions)
          (s until e by per)
            .map(b => SyntheticRange(math.max(b, lo),
              math.min(math.min(b + per, e), hi)))
            .filter(r => r.start < r.end)
            .toArray[InputPartition]
        }
      }
      override def createReaderFactory(): PartitionReaderFactory =
        new SyntheticReaderFactory(seed, typeEq, required)
      override def commit(end: Offset): Unit = ()
      override def stop(): Unit = ()
    }
}

private class SyntheticReaderFactory(seed: Long, typeEq: Option[String],
    required: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[SyntheticRange]
    new PartitionReader[InternalRow] {
      import SyntheticEventsSource._
      private var id = r.start - 1
      private val cols: Array[Long => Any] = required.fields.map { f =>
        f.name match {
          case "event_id"   => (i: Long) => i
          case "ts"         => (i: Long) => tsOf(i) // micros == TimestampType
          case "user_id"    => (i: Long) => userOf(seed, i)
          case "event_type" => (i: Long) => UTF8String.fromString(typeOf(seed, i))
          case "value"      => (i: Long) => valueOf(seed, i)
        }
      }
      override def next(): Boolean = {
        id += 1
        // pushed event_type equality: skip non-matching ids INSIDE the
        // generator, before any column materialization
        while (id < r.end && typeEq.exists(_ != typeOf(seed, id))) id += 1
        id < r.end
      }
      override def get(): InternalRow =
        InternalRow.fromSeq(cols.toIndexedSeq.map(_(id)))
      override def close(): Unit = ()
    }
  }
}
