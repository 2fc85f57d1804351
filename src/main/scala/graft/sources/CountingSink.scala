package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 SINK face of the connector pair (SyntheticEventsSource is
  * the read face): a counting blackhole implementing BOTH the batch and
  * streaming write paths — the broker-publisher role of the reference's
  * output stage (reference reducer.go: publish results downstream), with
  * the commit protocol Spark's exactly-once sinks rely on.
  *
  * Write protocol fidelity is the point: each task's DataWriter counts
  * rows and surfaces them ONLY in its WriterCommitMessage — nothing is
  * observable until the driver's commit() folds the messages into the
  * named totals register. abort() discards, so a failed/speculative task
  * attempt never double-counts: exactly the at-most-once-per-commit
  * contract a real publisher sink (Pub/Sub, Kafka transactional) builds
  * on. Usage: `.format("graft.sources.CountingSink").option("name", k)`;
  * read totals via [[CountingSink.total]].
  */
class CountingSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new CountingSinkTable(properties.getOrDefault("name", "default"))
}

object CountingSink {
  private val totals = new ConcurrentHashMap[String, AtomicLong]()
  // Highest streaming epoch already folded into each named total. Spark
  // may re-deliver the last epoch's commit() after a query restart
  // (commit log written, sink commit re-run); an idempotent sink must
  // treat a repeated (name, epochId) as already done or the batch is
  // double-counted and "exactly-once" silently degrades to at-least-once.
  // java.lang.Long, NOT scala Long: the compute() callback must see a real
  // null for an absent key — a primitive-typed lambda unboxes null to 0L
  // and would silently treat epoch 0 as already committed.
  private val lastEpoch = new ConcurrentHashMap[String, java.lang.Long]()
  def total(name: String): Long =
    Option(totals.get(name)).map(_.get()).getOrElse(0L)
  def reset(name: String): Unit = { totals.remove(name); lastEpoch.remove(name) }
  private[sources] def add(name: String, n: Long): Unit =
    totals.computeIfAbsent(name, _ => new AtomicLong()).addAndGet(n)
  /** Epoch-idempotent add: folds n into the total only if epochId has not
    * been committed for this name before. Returns true if applied. */
  private[graft] def addEpoch(name: String, epochId: Long, n: Long): Boolean = {
    val applied = new Array[Boolean](1)
    lastEpoch.compute(name, (_, prev) => {
      if (prev == null || epochId > prev.longValue()) {
        applied(0) = true; java.lang.Long.valueOf(epochId)
      } else prev
    })
    if (applied(0)) add(name, n)
    applied(0)
  }
  /** Test hook: observed high-water epoch for a name (MinValue if none). */
  private[graft] def committedEpoch(name: String): Long =
    Option(lastEpoch.get(name)).map(_.longValue()).getOrElse(Long.MinValue)
}

private class CountingSinkTable(name: String) extends Table with SupportsWrite {
  override def name(): String = s"counting_sink($name)"
  override def schema(): StructType = new StructType()
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE, TableCapability.ACCEPT_ANY_SCHEMA,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      override def truncate(): WriteBuilder = this
      override def build(): Write = new CountingWrite(name)
    }
}

private case class CountMessage(n: Long) extends WriterCommitMessage

private class CountingWrite(name: String) extends Write {
  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new CountingWriterFactory
    // rows become visible ONLY here — the transactional half of the
    // commit protocol (abort() below discards uncommitted attempts)
    override def commit(messages: Array[WriterCommitMessage]): Unit =
      CountingSink.add(name,
        messages.map(_.asInstanceOf[CountMessage].n).sum)
    override def abort(messages: Array[WriterCommitMessage]): Unit = ()
  }
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
      new CountingWriterFactory
    // Keyed by epochId so a post-restart re-delivery of the last epoch's
    // commit is a no-op — exactly-once ACROSS restarts, not just within
    // one uninterrupted run.
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      CountingSink.addEpoch(name, epochId,
        messages.map(_.asInstanceOf[CountMessage].n).sum)
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

private class CountingWriterFactory
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CountingDataWriter
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CountingDataWriter
}

private class CountingDataWriter extends DataWriter[InternalRow] {
  private var n = 0L
  override def write(record: InternalRow): Unit = n += 1
  override def commit(): WriterCommitMessage = CountMessage(n)
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
