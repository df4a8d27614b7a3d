package graft.sink

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** One record on the wire: what the reference maps a message to before
  * `PutRecords` (/root/reference/batchproducer/batchproducer.go:412-421 —
  * `PutRecordsRequestEntry{PartitionKey, Data}`).
  */
final case class KinesisRecord(partitionKey: String, data: Array[Byte])

/** Per-record outcome of a PutRecords call, mirroring
  * `PutRecordsResultEntry` (ErrorCode/ErrorMessage set on failure).
  */
final case class PutResultEntry(errorCode: Option[String] = None,
    errorMessage: Option[String] = None) {
  def failed: Boolean = errorCode.isDefined || errorMessage.isDefined
}

/** Request-level failure (whole PutRecords call rejected). */
final class KinesisRequestException(msg: String) extends RuntimeException(msg)

/** A record as returned by the consumption path: the wire record plus the
  * shard-relative sequence number `GetRecords` stamps on it.
  */
final case class ShardRecord(sequenceNumber: Long, record: KinesisRecord)

/** One `GetRecords` page: records in sequence order plus the iterator for
  * the next page (an open shard always has a next iterator — the
  * reference's consumption loop relies on exactly this pair,
  * /root/reference/integration_test.go:128-139).
  */
final case class GetRecordsResult(records: Seq[ShardRecord],
    nextIterator: String)

/** Read-side client seam, one level above the raw AWS calls the
  * reference's integration suite consumes with
  * (`GetShardIterator`/`GetRecords`,
  * /root/reference/integration_test.go:112-143):
  *
  *  - `listShards` — `DescribeStream.Shards` (:99);
  *  - `getShardIterator` — iterator types `TRIM_HORIZON`, `LATEST`,
  *    `AT_SEQUENCE_NUMBER` (:113-117);
  *  - `getRecords` — one page + next iterator (:128-139);
  *  - `latestSequence` — the shard's current end position; a real SDK
  *    impl derives it from a `LATEST` iterator probe, the fake reads its
  *    log length. The micro-batch planner needs this driver-side bound to
  *    make each batch's contents deterministic under checkpoint replay.
  *
  * Iterators are opaque strings; sequence numbers are monotone per shard.
  * They are modeled as dense per-shard Longs (what the fake provides and
  * what the source's offset arithmetic — admission-control budgeting,
  * `[start, end)` batch windows — relies on). Real Kinesis sequence
  * numbers are opaque ~186-bit decimals, so a real SDK implementation of
  * THIS trait must maintain its own per-shard dense counter (records
  * consumed since TRIM_HORIZON) and keep the AWS sequence string as an
  * internal cursor — or the seam would need String offsets and
  * count-based admission (the spark-kinesis-asl/Flink shape), a
  * different trade documented here rather than silently half-made.
  *
  * CONTRACT (load-bearing for exactly-once): `getRecords` may return an
  * EMPTY records list ONLY when the iterator has reached the shard's
  * current end — the micro-batch partition readers treat an empty page
  * as "this planned slice is fully drained". Raw AWS `GetRecords` does
  * NOT guarantee this (it returns empty pages mid-shard); a real SDK
  * implementation of this trait must therefore loop internally —
  * re-polling `NextShardIterator` while `MillisBehindLatest > 0` and no
  * records arrive — before returning an empty page. Returning a raw
  * empty mid-shard page would make Spark commit the batch and skip the
  * remainder of the planned range: silent at-most-once delivery.
  */
trait KinesisGetRecords extends Serializable {
  def listShards(stream: String): Seq[String]
  def getShardIterator(stream: String, shardId: String,
      iteratorType: String, startingSequence: Long = 0L): String
  def getRecords(iterator: String, limit: Int): GetRecordsResult
  def latestSequence(stream: String, shardId: String): Long
}

/** The single-method client seam — the reference's one great testability
  * idea (`BatchingKinesisClient`,
  * /root/reference/batchproducer/batchproducer.go:68-71): everything the
  * data plane needs from AWS is one `PutRecords` call, so a real SDK
  * client and an in-memory fake are interchangeable. In this zero-egress
  * environment all delivery claims are verified against [[FakeKinesis]]
  * (the reference likewise only ever talks to localstack in CI,
  * /root/reference/.travis.yml:6-12).
  *
  * Implementations MUST be safe to call from multiple executor task
  * threads: on a real cluster each write task owns its own record slice
  * but shares a per-JVM client.
  */
trait KinesisPutRecords extends Serializable {
  /** Send ≤500 records to `stream`; returns one entry per input record in
    * order. Throws [[KinesisRequestException]] on request-level failure.
    */
  def putRecords(stream: String, records: Seq[KinesisRecord]): Seq[PutResultEntry]
}

/** In-memory Kinesis with the same fault-injection surface as the
  * reference's mock client
  * (/root/reference/batchproducer/batchproducer_test.go:810-842):
  *
  *  - `failRequests` — every request throws (mirrors `shouldErr` → "oh
  *    noes", :823-825); can be flipped at runtime to model recovery;
  *  - magic partition key `"fail"` — that record's result entry carries
  *    an error (mirrors :831-836) while the rest succeed;
  *  - `latencyMs` — injected per-request latency (mirrors `sleepFor`,
  *    :827).
  *
  * Storage is an append log per stream so round-trip tests can do
  * order-insensitive multiset comparison, mirroring the reference's
  * integration suite (/root/reference/integration_test.go:151-157).
  *
  * A JVM-wide registry (`FakeKinesis.named`) lets serialized Spark tasks
  * in local mode share one store with the driver: the task serializes
  * only the name, and resolves the shared instance lazily per-JVM.
  */
final class FakeKinesis(val latencyMs: Long = 0L)
    extends KinesisPutRecords with KinesisGetRecords {
  val failRequests = new AtomicBoolean(false)
  /** Fail this many requests, then succeed (for backoff-recovery tests). */
  val failNextRequests = new AtomicInteger(0)
  val requestCount = new AtomicInteger(0)
  /** Virtual shard count for the read API (see [[listShards]]). The live
    * value only applies to streams that have never been touched: each
    * stream FREEZES the count at its first write or read (see
    * [[shardCount]]), so flipping `numShards` later cannot silently remap
    * checkpointed per-shard offsets onto different records — real Kinesis
    * reshards by splitting/merging shards, never by re-hashing history.
    */
  val numShards = new AtomicInteger(1)

  private val streams = new ConcurrentHashMap[String, ArrayBuffer[KinesisRecord]]()
  private val frozenShards = new ConcurrentHashMap[String, Integer]()

  /** The stream's shard count, frozen at first touch (write or read). */
  def shardCount(stream: String): Int =
    frozenShards.computeIfAbsent(stream, _ => Integer.valueOf(numShards.get()))
      .intValue()

  override def putRecords(stream: String,
      records: Seq[KinesisRecord]): Seq[PutResultEntry] = {
    require(records.nonEmpty && records.size <= 500,
      s"PutRecords accepts 1..500 records, got ${records.size}")
    // Freeze the shard layout at the very first write attempt — even one
    // that failure injection rejects wholesale. Freezing only on the
    // per-record success branch let a numShards flip between a fully
    // failed first write and its retry remap the stream, contradicting
    // the "frozen at first touch" contract above.
    shardCount(stream)
    if (latencyMs > 0) Thread.sleep(latencyMs)
    requestCount.incrementAndGet()
    if (failRequests.get() || failNextRequests.getAndUpdate(n => math.max(0, n - 1)) > 0)
      throw new KinesisRequestException("oh noes")
    records.map { r =>
      if (r.partitionKey == "fail")
        PutResultEntry(Some("ProvisionedThroughputExceededException"),
          Some("injected per-record failure"))
      else {
        val log = streams.computeIfAbsent(stream, _ => new ArrayBuffer[KinesisRecord]())
        log.synchronized { log += r }
        PutResultEntry()
      }
    }
  }

  def stored(stream: String): Seq[KinesisRecord] = {
    val log = streams.get(stream)
    if (log == null) Seq.empty else log.synchronized { log.toSeq }
  }

  def storedPayloads(stream: String): Seq[String] =
    stored(stream).map(r => new String(r.data, "UTF-8"))

  def streamNames: Set[String] = streams.keySet().asScala.toSet

  def clear(): Unit = { streams.clear(); frozenShards.clear() }

  // ----- read side (KinesisGetRecords) -------------------------------
  //
  // Shards are VIRTUAL: storage stays the single per-stream append log
  // (so write-side ordering assertions are unaffected), and shard k of N
  // is the subsequence whose partition-key MD5 falls in bucket k — the
  // same hash-key routing real Kinesis applies to partition keys.
  // Sequence numbers are PER-SHARD ordinals (0, 1, 2, … within the
  // shard), dense like real Kinesis's per-shard sequence space — which
  // the source's admission control relies on: capping each shard's
  // advance at maxPerTrigger/shards admits ~maxPerTrigger records, not
  // maxPerTrigger/shards (the bug a global index space caused).

  private def shardName(i: Int): String = f"shardId-$i%012d"

  private def shardIndexOf(pk: String, n: Int): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(pk.getBytes("UTF-8"))
    new java.math.BigInteger(1, md).mod(java.math.BigInteger.valueOf(n))
      .intValueExact()
  }

  private def shardLog(stream: String, shardId: String): Seq[KinesisRecord] = {
    val shardIdx = shardId.stripPrefix("shardId-").toInt
    val n = shardCount(stream)
    stored(stream).filter(r => shardIndexOf(r.partitionKey, n) == shardIdx)
  }

  /** CONTROL plane: like real Kinesis ListShards, reports the LIVE
    * layout — after a `numShards` flip a touched stream's list diverges
    * from its frozen data plane, which is exactly how the source's
    * resharding detection sees a real split/merge. The DATA plane
    * (routing, iterators, [[latestSequence]]) stays frozen at first
    * touch: history is never re-hashed, so the divergence is visible
    * but can never silently remap checkpointed offsets onto different
    * records.
    */
  override def listShards(stream: String): Seq[String] = {
    shardCount(stream) // first control-plane touch freezes the data plane
    (0 until numShards.get()).map(shardName)
  }

  override def getShardIterator(stream: String, shardId: String,
      iteratorType: String, startingSequence: Long): String = {
    val start = iteratorType match {
      case "TRIM_HORIZON" => 0L
      case "LATEST" => shardLog(stream, shardId).size.toLong
      case "AT_SEQUENCE_NUMBER" => startingSequence
      case "AFTER_SEQUENCE_NUMBER" => startingSequence + 1
      case other => throw new IllegalArgumentException(
        s"unsupported iterator type '$other'")
    }
    s"$stream|$shardId|$start"
  }

  override def getRecords(iterator: String, limit: Int): GetRecordsResult = {
    val Array(stream, shardId, startStr) = iterator.split('|')
    val log = shardLog(stream, shardId) // immutable snapshot
    val start = startStr.toLong.toInt
    val slice = log.slice(start, math.min(log.size, start + limit))
    val out = slice.zipWithIndex.map { case (r, i) =>
      ShardRecord((start + i).toLong, r)
    }
    GetRecordsResult(out, s"$stream|$shardId|${start + slice.size}")
  }

  override def latestSequence(stream: String, shardId: String): Long =
    shardLog(stream, shardId).size.toLong
}

object FakeKinesis {
  private val registry = new ConcurrentHashMap[String, FakeKinesis]()

  /** Per-JVM named instance — the seam Spark local-mode tests use to share
    * a store between driver assertions and executor-side writer tasks.
    */
  def named(name: String): FakeKinesis =
    registry.computeIfAbsent(name, _ => new FakeKinesis())

  def drop(name: String): Unit = registry.remove(name)
}
