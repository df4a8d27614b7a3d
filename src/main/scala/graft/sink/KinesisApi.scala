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
final class FakeKinesis(val latencyMs: Long = 0L) extends KinesisPutRecords {
  val failRequests = new AtomicBoolean(false)
  /** Fail this many requests, then succeed (for backoff-recovery tests). */
  val failNextRequests = new AtomicInteger(0)
  val requestCount = new AtomicInteger(0)

  private val streams = new ConcurrentHashMap[String, ArrayBuffer[KinesisRecord]]()

  override def putRecords(stream: String,
      records: Seq[KinesisRecord]): Seq[PutResultEntry] = {
    require(records.nonEmpty && records.size <= 500,
      s"PutRecords accepts 1..500 records, got ${records.size}")
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

  def clear(): Unit = streams.clear()
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
