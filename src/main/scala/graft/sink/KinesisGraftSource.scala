package graft.sink

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.json4s.{DefaultFormats, Formats}
import org.json4s.jackson.Serialization

/** DSv2 *source* half of `format("kinesis-graft")`: completes the
  * reference's consumption path — its integration suite reads back what
  * the sink wrote via `GetShardIterator(TRIM_HORIZON)` + a `GetRecords`
  * loop (/root/reference/integration_test.go:112-143) — as a Structured
  * Streaming `MicroBatchStream` (plus a convenience batch `Scan`).
  *
  * Scale model: one input partition per shard per micro-batch, so read
  * parallelism is the stream's shard count — on a real cluster each
  * executor core drains its own shard, exactly how Kinesis consumers
  * scale. Offsets are per-shard next-sequence-numbers, checkpointed by
  * Spark; recovery replays the batch from the same `(start, end)` bounds,
  * so a restarted query never re-delivers records from committed epochs
  * (the source-side twin of the sink's `TestRestart`,
  * /root/reference/integration_test.go:175-198).
  *
  * Options (same Viper-derived surface as the sink,
  * [[KinesisSinkOptions]]): `stream` (required here), `aws_region_name`
  * (required — parity with utils.go:24-26), `client` (`fake:<name>` in
  * this zero-egress env), `starting_position`
  * (`trim_horizon` default | `latest`), `max_records_per_fetch`
  * (GetRecords page size, default 10000 — the AWS cap),
  * `max_records_per_trigger` (admission control: cap per micro-batch,
  * split across shards; 0 = unbounded).
  */
private[sink] object KinesisGraftSource {
  val readSchema: StructType = StructType(Seq(
    StructField("stream", StringType),
    StructField("partitionKey", StringType),
    StructField("data", BinaryType),
    StructField("shardId", StringType),
    StructField("sequenceNumber", LongType)))

  def streamName(opts: KinesisSinkOptions): String =
    opts.stream.getOrElse(throw new IllegalArgumentException(
      "kinesis-graft source requires the 'stream' option"))
}

/** Thrown when the stream's live shard layout no longer matches the
  * layout the query's checkpointed offsets were committed under — see
  * `KinesisGraftMicroBatchStream.assertLayoutUnchanged`.
  */
final class KinesisReshardingException(msg: String)
    extends IllegalStateException(msg)

/** Per-shard next-sequence positions, JSON-serialized into the
  * checkpoint's offset log.
  *
  * `json()` MUST be canonical (keys sorted): the streaming engine
  * detects "new data" by comparing offset JSON strings, so two maps
  * with equal entries but different insertion order would read as
  * different offsets — the rotating admission allocation built exactly
  * that, and every trigger then committed an empty "new" batch forever
  * (observed: 8,270 consecutive identical-offset commits before the
  * canonicalization).
  */
private[sink] final case class KinesisSourceOffset(
    shardOffsets: Map[String, Long]) extends Offset {
  private implicit val fmts: Formats = DefaultFormats
  override def json(): String =
    Serialization.write(
      scala.collection.immutable.SortedMap(shardOffsets.toSeq: _*))
}

private[sink] object KinesisSourceOffset {
  private implicit val fmts: Formats = DefaultFormats
  def fromJson(json: String): KinesisSourceOffset =
    KinesisSourceOffset(Serialization.read[Map[String, Long]](json))
}

private[sink] final class KinesisGraftScanBuilder(
    options: CaseInsensitiveStringMap) extends ScanBuilder {
  import scala.jdk.CollectionConverters._
  private val opts =
    KinesisSinkOptions.fromMap(options.asCaseSensitiveMap().asScala.toMap)
  private val startingPosition =
    options.getOrDefault("starting_position", "trim_horizon")
      .toUpperCase match {
      case "TRIM_HORIZON" => "TRIM_HORIZON"
      case "LATEST" => "LATEST"
      case other => throw new IllegalArgumentException(
        s"starting_position must be trim_horizon|latest, got '$other'")
    }
  private val fetchLimit =
    options.getOrDefault("max_records_per_fetch", "10000").toInt
  // Admission control lives at the source, not in a cluster-spanning
  // buffer: cap how far each micro-batch's end offset may advance (the
  // maxOffsetsPerTrigger pattern; the scale-correct replacement for the
  // reference's bounded buffer + Add backpressure, sink.go:84-109 —
  // see SCALE.md "Sink"). 0 = unbounded.
  private val maxPerTrigger =
    options.getOrDefault("max_records_per_trigger", "0").toLong

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = KinesisGraftSource.readSchema
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new KinesisGraftMicroBatchStream(opts, startingPosition, fetchLimit,
        maxPerTrigger)
    override def toBatch: Batch = new KinesisGraftBatch(opts, fetchLimit)
  }
}

private[sink] final class KinesisGraftMicroBatchStream(
    opts: KinesisSinkOptions, startingPosition: String, fetchLimit: Int,
    maxPerTrigger: Long) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  private val stream = KinesisGraftSource.streamName(opts)
  // Driver-side client: shard discovery + end-of-shard probes only; the
  // data plane runs in executor-side partition readers.
  @transient private lazy val client = KinesisSinkOptions.resolveReadClient(opts)

  override def initialOffset(): Offset = {
    val positions = client.listShards(stream).map { s =>
      s -> (if (startingPosition == "LATEST") client.latestSequence(stream, s)
            else 0L)
    }.toMap
    KinesisSourceOffset(positions)
  }

  override def latestOffset(): Offset =
    KinesisSourceOffset(client.listShards(stream)
      .map(s => s -> client.latestSequence(stream, s)).toMap)

  /** Resharding detection: this source pins the shard layout for the
    * life of the query — per-shard offsets in the checkpoint are only
    * meaningful against the layout they were taken from. The reference
    * never lists shards at all (its per-stream producer takes the
    * layout as fixed, `batchproducer/batchproducer.go` has no
    * ListShards call), so silent wrongness was its failure mode; here a
    * split/merge is DETECTED on the next trigger and fails the query
    * loudly instead of delivering against a remapped layout. Operators
    * restart the query with a fresh checkpoint to adopt the new layout
    * (at-least-once hand-off, same as the reference's restart
    * semantics, `sink.go:128-140`).
    */
  private def assertLayoutUnchanged(committed: Set[String]): Unit = {
    val live = client.listShards(stream).toSet
    if (live != committed) {
      val added = (live -- committed).toSeq.sorted
      val removed = (committed -- live).toSeq.sorted
      throw new KinesisReshardingException(
        s"stream '$stream' was resharded under a running query: " +
          s"checkpointed layout has ${committed.size} shard(s), live " +
          s"layout has ${live.size}" +
          (if (added.nonEmpty) s"; new: ${added.mkString(",")}" else "") +
          (if (removed.nonEmpty) s"; gone: ${removed.mkString(",")}"
           else "") +
          ". Per-shard offsets are only valid against the layout they " +
          "were committed under; restart the query with a fresh " +
          "checkpoint to adopt the new layout.")
    }
  }

  /** Trigger counter driving the rotating allocation priority below.
    * Deliberately NOT checkpointed: it is fairness policy, not offset
    * state — the planned (start, end] windows land in the offset log and
    * replay exactly; after a restart the rotation merely restarts.
    */
  private var trigger = 0L

  /** Admission control: cap each micro-batch's advance at
    * `max_records_per_trigger` records TOTAL, allocated across shard
    * backlogs (each shard's slice stays a contiguous, replayable
    * sequence range). Invariants:
    *
    *  - admitted ≤ cap ALWAYS — including when the shard count exceeds
    *    it (the earlier floor-at-1 split could admit up to numShards
    *    records per batch);
    *  - NO STARVATION: lagging shards are served in rotating priority
    *    order, each getting at least one record while budget remains,
    *    and the rotation advances to just past the LAST shard served
    *    that trigger (not by a fixed 1 — advancing by 1 while serving
    *    ~C shards from the rotation point re-serves C−1 of them next
    *    trigger and stretches the worst-case wait to a full rotation of
    *    the shard list). With the pointer skipping the whole served
    *    span each trigger, with L lagging shards and cap C every
    *    lagging shard is served at least once every ⌈L/C⌉ triggers,
    *    whatever non-lagging shards sit between them. A pure
    *    shallowest-first
    *    max-min fill had a liveness hole: with more lagging shards than
    *    budget, a shard whose backlog stays smallest (one stale record
    *    behind steady-trickle siblings) floored to a 0 share on every
    *    single trigger;
    *  - unused budget flows on: a shard lagging less than its share
    *    leaves the remainder for the shards after it in rotation.
    *
    * A backlog then drains over several bounded batches instead of one
    * giant one — the cluster-safe form of the reference's bounded
    * buffer + `Add` backpressure (sink.go:84-109).
    */
  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    assertLayoutUnchanged(
      start.asInstanceOf[KinesisSourceOffset].shardOffsets.keySet)
    val unlimited = latestOffset().asInstanceOf[KinesisSourceOffset]
    if (maxPerTrigger <= 0) unlimited
    else {
      val from = start.asInstanceOf[KinesisSourceOffset].shardOffsets
      val lags = unlimited.shardOffsets.toSeq.map { case (shard, end) =>
        val s0 = from.getOrElse(shard, 0L)
        (shard, s0, math.max(0L, end - s0))
      }.sortBy(_._1)
      val rot = if (lags.isEmpty) 0 else (trigger % lags.size).toInt
      val rotated = lags.drop(rot) ++ lags.take(rot)
      var quota = maxPerTrigger
      var left = rotated.count(_._3 > 0)
      var lastServed = -1
      val next = rotated.zipWithIndex.map { case ((shard, s0, lag), i) =>
        val take =
          if (lag <= 0L || quota <= 0L) 0L
          else {
            // fair share, but never 0 while budget remains (liveness)
            val share = math.min(lag, math.max(1L, quota / left))
            left -= 1; quota -= share
            lastServed = i
            share
          }
        shard -> (s0 + take)
      }.toMap
      // advance the rotation to just past the LAST shard served this
      // trigger (not a fixed +1, which re-serves the same prefix and
      // degrades the wait to a full rotation; not +servedCount, which
      // lands mid-span when non-lagging shards sit between served ones).
      // This is what makes the ⌈L/C⌉ bound above hold for any cap.
      trigger += math.max(1, lastServed + 1)
      KinesisSourceOffset(next)
    }
  }

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    if (maxPerTrigger > 0)
      org.apache.spark.sql.connector.read.streaming.ReadLimit
        .maxRows(maxPerTrigger)
    else org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[KinesisSourceOffset].shardOffsets
    val to = end.asInstanceOf[KinesisSourceOffset].shardOffsets
    to.toArray.sortBy(_._1).flatMap { case (shard, endSeq) =>
      val startSeq = from.getOrElse(shard, 0L)
      if (endSeq > startSeq)
        Some(KinesisInputPartition(opts, stream, shard, startSeq, endSeq,
          fetchLimit): InputPartition)
      else None
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisReaderFactory

  override def deserializeOffset(json: String): Offset =
    KinesisSourceOffset.fromJson(json)
  // Kinesis retains data by stream retention policy; nothing to trim on
  // commit (the checkpoint's offset log is the restart cursor).
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Batch read: the full TRIM_HORIZON→current window at planning time. */
private[sink] final class KinesisGraftBatch(
    opts: KinesisSinkOptions, fetchLimit: Int) extends Batch {
  private val stream = KinesisGraftSource.streamName(opts)

  override def planInputPartitions(): Array[InputPartition] = {
    val client = KinesisSinkOptions.resolveReadClient(opts)
    client.listShards(stream).sorted.flatMap { shard =>
      val end = client.latestSequence(stream, shard)
      if (end > 0L)
        Some(KinesisInputPartition(opts, stream, shard, 0L, end,
          fetchLimit): InputPartition)
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisReaderFactory
}

private[sink] final case class KinesisInputPartition(
    opts: KinesisSinkOptions, stream: String, shardId: String,
    startSeq: Long, endSeq: Long, fetchLimit: Int) extends InputPartition

private[sink] final class KinesisReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new KinesisPartitionReader(partition.asInstanceOf[KinesisInputPartition])
}

/** Executor-side shard drain for one micro-batch slice: the reference's
  * iterator loop (/root/reference/integration_test.go:128-139) bounded by
  * the planned `[startSeq, endSeq)` window so replays are exact. Streams
  * pages — per-task memory is one GetRecords page, independent of batch
  * size.
  */
private[sink] final class KinesisPartitionReader(p: KinesisInputPartition)
    extends PartitionReader[InternalRow] {
  private val client = KinesisSinkOptions.resolveReadClient(p.opts)
  private var iterator = client.getShardIterator(
    p.stream, p.shardId, "AT_SEQUENCE_NUMBER", p.startSeq)
  private var page: Iterator[ShardRecord] = Iterator.empty
  private var exhausted = false
  private var current: ShardRecord = _

  private val streamUtf8 = UTF8String.fromString(p.stream)
  private val shardUtf8 = UTF8String.fromString(p.shardId)

  @scala.annotation.tailrec
  private def fetchPage(): Unit = {
    val res = client.getRecords(iterator, p.fetchLimit)
    iterator = res.nextIterator
    if (res.records.isEmpty) {
      // The KinesisGetRecords CONTRACT guarantees an empty page means
      // shard-end reached (a real SDK impl must poll past AWS's empty
      // mid-shard pages before returning) — so the planned window is
      // fully drained: endSeq was a plan-time snapshot and nothing
      // below it can still arrive.
      exhausted = true
    } else {
      val inWindow = res.records.takeWhile(_.sequenceNumber < p.endSeq)
      // Crossing endSeq means records past the planned window exist
      // already — this slice is done; they belong to the next batch.
      if (inWindow.size < res.records.size) exhausted = true
      if (inWindow.nonEmpty) page = inWindow.iterator
      else if (!exhausted) fetchPage()
    }
  }

  override def next(): Boolean = {
    if (!page.hasNext && !exhausted) fetchPage()
    if (page.hasNext) { current = page.next(); true } else false
  }

  override def get(): InternalRow =
    new GenericInternalRow(Array[Any](
      streamUtf8,
      UTF8String.fromString(current.record.partitionKey),
      current.record.data,
      shardUtf8,
      current.sequenceNumber))

  override def close(): Unit = ()
}
