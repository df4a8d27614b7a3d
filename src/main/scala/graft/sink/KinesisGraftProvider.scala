package graft.sink

import java.util
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.expressions.Transform
import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.connector.metric.{CustomMetric, CustomSumMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.streaming.ReportsSinkMetrics
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 sink: `df.writeStream.format("kinesis-graft")` /
  * `df.write.format("kinesis-graft")` — the v1 ergonomics layer over the
  * same per-task [[KinesisRecordWriter]] data plane the foreachBatch
  * adapter uses (SURVEY.md §7.2 component 3).
  *
  * Option surface mirrors the reference's Viper config
  * (/root/reference/utils.go:23-46, README.md:51-55) via
  * [[KinesisSinkOptions]]; delivery counters surface as DSv2
  * CustomMetrics — the Spark-native form of the reference's `StatsBatch`
  * → `StatReceiver` plumbing (batchproducer.go:49-66,458-470): task
  * metrics are summed by Spark and appear per micro-batch in
  * `StreamingQueryProgress.sink.metrics`.
  *
  * Input schema contract (same as [[KinesisSink.toWire]]'s output):
  * `data binary` required; `partitionKey string` optional (fresh UUIDv4
  * per record when absent — utils.go:15-19); `stream string` optional
  * when the `stream` option names a default.
  */
final class KinesisGraftProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-graft"

  // Table schema is the READ schema (the Kafka-connector convention):
  // writes validate the query's own schema in newWriteBuilder, and
  // by-name append matches the query's columns into this superset (the
  // read-only shardId/sequenceNumber columns arrive null and the writer
  // ignores them).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisGraftSource.readSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new KinesisGraftTable(schema)
}

object KinesisGraftProvider {
  val wireSchema: StructType = StructType(Seq(
    StructField("stream", StringType),
    StructField("partitionKey", StringType),
    StructField("data", BinaryType)))
}

private final class KinesisGraftTable(schema: StructType)
    extends Table with SupportsWrite with SupportsRead with ReportsSinkMetrics {
  override def name(): String = "kinesis-graft"
  override def schema(): StructType = schema

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KinesisGraftScanBuilder(options)

  // Driver-side running totals, summed from task commit messages by the
  // epoch commit — this is what StreamingQueryProgress.sink.metrics
  // renders (ReportsSinkMetrics), the Spark-native StatReceiver
  // (batchproducer.go:49-66).
  private[sink] val totals = new AtomicReference(WriteStats())

  override def metrics(): util.Map[String, String] = {
    val t = totals.get()
    Map(
      "recordsSent" -> t.recordsSent.toString,
      "recordsDropped" -> t.recordsDropped.toString,
      "kinesisErrors" -> t.kinesisErrors.toString,
      "putRequests" -> t.putRequests.toString).asJava
  }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val opts = KinesisSinkOptions.fromMap(
      info.options().asCaseSensitiveMap().asScala.toMap)
    val s = info.schema()
    require(s.fieldNames.contains("data") &&
        s("data").dataType == BinaryType,
      "kinesis-graft requires a binary 'data' column")
    val hasStreamCol = s.fieldNames.contains("stream")
    require(hasStreamCol || opts.stream.isDefined,
      "kinesis-graft needs a 'stream' column or a 'stream' option")
    new KinesisGraftWriteBuilder(s, opts, totals)
  }
}

private final class KinesisGraftWriteBuilder(
    schema: StructType, opts: KinesisSinkOptions,
    totals: AtomicReference[WriteStats]) extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new KinesisGraftBatchWrite(schema, opts, totals)
    override def toStreaming: StreamingWrite =
      new KinesisGraftStreamingWrite(schema, opts, totals)
    override def supportedCustomMetrics(): Array[CustomMetric] =
      GraftMetric.all
  }
}

/** Declared sink metrics (driver side): Spark sums the per-task values. */
private object GraftMetric {
  final class Sent extends CustomSumMetric {
    override def name(): String = "recordsSent"
    override def description(): String = "records delivered to Kinesis"
  }
  final class Dropped extends CustomSumMetric {
    override def name(): String = "recordsDropped"
    override def description(): String = "records dropped after retry caps"
  }
  final class Errors extends CustomSumMetric {
    override def name(): String = "kinesisErrors"
    override def description(): String = "PutRecords request failures"
  }
  final class Requests extends CustomSumMetric {
    override def name(): String = "putRequests"
    override def description(): String = "PutRecords requests issued"
  }
  def all: Array[CustomMetric] =
    Array(new Sent, new Dropped, new Errors, new Requests)

  def task(stats: WriteStats): Array[CustomTaskMetric] = Array(
    metric("recordsSent", stats.recordsSent),
    metric("recordsDropped", stats.recordsDropped),
    metric("kinesisErrors", stats.kinesisErrors),
    metric("putRequests", stats.putRequests))

  private def metric(n: String, v: Long): CustomTaskMetric =
    new CustomTaskMetric {
      override def name(): String = n
      override def value(): Long = v
    }
}

private final case class GraftCommitMessage(stats: WriteStats)
    extends WriterCommitMessage

private object GraftCommitMessage {
  def addTo(totals: AtomicReference[WriteStats],
      messages: Array[WriterCommitMessage]): Unit = {
    val batch = messages.collect { case GraftCommitMessage(s) => s }
      .foldLeft(WriteStats())(_ + _)
    totals.updateAndGet(_ + batch)
  }
}

private final class KinesisGraftBatchWrite(
    schema: StructType, opts: KinesisSinkOptions,
    totals: AtomicReference[WriteStats]) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new GraftWriterFactory(schema, opts)
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    GraftCommitMessage.addTo(totals, messages)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

private final class KinesisGraftStreamingWrite(
    schema: StructType, opts: KinesisSinkOptions,
    totals: AtomicReference[WriteStats]) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new GraftWriterFactory(schema, opts)
  // Epoch commit: by the time tasks report, their records are flushed —
  // the Flush-on-Close drain (sink.go:111-126) is implicit per epoch.
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftCommitMessage.addTo(totals, messages)
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

private final class GraftWriterFactory(schema: StructType,
    opts: KinesisSinkOptions)
    extends DataWriterFactory with StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schema, opts)
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new GraftDataWriter(schema, opts)
}

/** Per-task writer: routes rows to per-stream buffers (≤batchSize in
  * memory per stream) and flushes through [[KinesisRecordWriter]] — the
  * same O(streams · batchSize) task-memory bound as the foreachBatch
  * path, so a 100 TB write is just more tasks, not more state.
  */
private final class GraftDataWriter(schema: StructType,
    opts: KinesisSinkOptions) extends DataWriter[InternalRow] {
  private val client = KinesisSinkOptions.resolveClient(opts)
  private val streamIdx = schema.fieldNames.indexOf("stream")
  private val pkIdx = schema.fieldNames.indexOf("partitionKey")
  private val dataIdx = schema.fieldNames.indexOf("data")

  private var stats = WriteStats()
  private val writers = mutable.Map.empty[String, KinesisRecordWriter]
  private val buffers =
    mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[KinesisRecord]]

  private def flush(stream: String): Unit = {
    val buf = buffers(stream)
    if (buf.nonEmpty) {
      val w = writers.getOrElseUpdate(stream,
        new KinesisRecordWriter(client, stream, opts.writer))
      stats = stats + w.write(buf.iterator)
      buf.clear()
    }
  }

  override def write(row: InternalRow): Unit = {
    // NB: by-name append fills absent nullable columns with nulls, so a
    // query without a stream column arrives here as null, not as a
    // missing field — the option fallback must handle both.
    val stream =
      if (streamIdx >= 0 && !row.isNullAt(streamIdx))
        row.getUTF8String(streamIdx).toString
      else opts.stream.getOrElse(throw new IllegalArgumentException(
        "record has null 'stream' and no default stream option is set"))
    val pk =
      if (pkIdx >= 0 && !row.isNullAt(pkIdx))
        row.getUTF8String(pkIdx).toString
      else util.UUID.randomUUID().toString // utils.go:15-19
    val buf = buffers.getOrElseUpdate(stream,
      new mutable.ArrayBuffer[KinesisRecord](opts.writer.batchSize))
    buf += KinesisRecord(pk, row.getBinary(dataIdx))
    if (buf.size >= opts.writer.batchSize) flush(stream)
  }

  override def commit(): WriterCommitMessage = {
    buffers.keys.foreach(flush)
    GraftCommitMessage(stats)
  }

  override def abort(): Unit = buffers.clear()
  override def close(): Unit = ()

  override def currentMetricsValues(): Array[CustomTaskMetric] =
    GraftMetric.task(stats)
}
