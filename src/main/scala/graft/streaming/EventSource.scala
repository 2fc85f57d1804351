package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pluggable ingestion seam — the engine twin of the reference's
  * topic/subscription plumbing (reference util/util.go:25-70:
  * `GetOrCreateTopic` / `GetOrCreateSubscription` / `Receive`). Every
  * [[StreamOps]] stage consumes a `Dataset[KnobEvent]`, so a production
  * connector (a real Pub/Sub, Kafka, Kinesis, ... source) slots in by
  * implementing `stream` with the vendor's `spark.readStream.format(...)`
  * and mapping its payload to [[KnobEvent]] — nothing downstream changes,
  * including checkpointing and watermarks, which attach to the returned
  * Dataset. The three local implementations cover deterministic tests
  * ([[MemoryEventSource]]), file-drop integration ([[FileEventSource]])
  * and synthetic soak load ([[RateEventSource]]) with no external
  * infrastructure.
  */
trait EventSource {
  /** The unbounded event stream. Implementations must return a STREAMING
    * Dataset (`isStreaming == true`) so watermarks and stateful stages
    * behave identically across sources. */
  def stream(spark: SparkSession): Dataset[KnobEvent]
}

/** Deterministic in-process replay for tests: events added via [[add]]
  * flow through exactly like published messages, micro-batch per add. */
class MemoryEventSource(spark: SparkSession) extends EventSource {
  private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  private implicit val enc: org.apache.spark.sql.Encoder[KnobEvent] =
    Encoders.product[KnobEvent]
  private val input = MemoryStream[KnobEvent]
  def add(events: KnobEvent*): Unit = input.addData(events)
  override def stream(spark: SparkSession): Dataset[KnobEvent] = input.toDS()
}

/** Directory-watch source: files landing in `dir` stream through as they
  * appear — the local stand-in for a durable log subscription. */
class FileEventSource(dir: String) extends EventSource {
  override def stream(spark: SparkSession): Dataset[KnobEvent] = {
    import spark.implicits._
    spark.readStream
      .schema(Encoders.product[KnobEvent].schema)
      .parquet(s"$dir/*")
      .as[KnobEvent]
  }
}

/** Wire-protocol source: reads a [[MiniBroker]] topic (or anything
  * speaking its STAT/FETCH/ACK protocol) over TCP via the DSv2 connector
  * [[graft.sources.SocketEventsSource]] — the reference's
  * subscription+Receive+Ack contract (util/util.go:45-70, flood.go:59-85)
  * running over actual sockets, executor-parallel: `numPartitions`
  * shard leases pull disjoint `seq % n` slices per micro-batch, the way
  * the reference scales its ingest horizontally (deploy:75-76,
  * flood×8/mapper×8). Epoch commits become cumulative acks, so an
  * un-committed batch is re-delivered after restart: at-least-once,
  * like the reference. */
class SocketEventSource(host: String, port: Int, topic: String,
    subscription: String, maxRowsPerBatch: Long = 10000L,
    numPartitions: Int = 4) extends EventSource {
  override def stream(spark: SparkSession): Dataset[KnobEvent] = {
    implicit val enc: org.apache.spark.sql.Encoder[KnobEvent] =
      Encoders.product[KnobEvent]
    spark.readStream.format("graft.sources.SocketEventsSource")
      .option("host", host).option("port", port)
      .option("topic", topic).option("subscription", subscription)
      .option("maxRowsPerBatch", maxRowsPerBatch)
      .option("numPartitions", numPartitions)
      .load()
      .as[KnobEvent]
  }
}

/** Synthetic deterministic load for soak/perf runs: `rate-micro-batch`
  * emits exactly `rowsPerBatch` rows per micro-batch, and value → event is
  * a pure function, so replays are batch-for-batch identical (unlike the
  * wall-clock `rate` source). */
class RateEventSource(rowsPerBatch: Long, knobs: Int = 5) extends EventSource {
  override def stream(spark: SparkSession): Dataset[KnobEvent] = {
    import spark.implicits._
    spark.readStream.format("rate-micro-batch")
      .option("rowsPerBatch", rowsPerBatch)
      .option("startTimestamp", 0L)
      .load()
      .select((col("value") % knobs).as("id"),
        (col("value") % 10 + 1).as("n"),
        col("timestamp").as("ts"))
      .as[KnobEvent]
  }
}
