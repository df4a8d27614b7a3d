package graft.sink

/** Sink configuration, mirroring the reference's Viper config surface
  * (/root/reference/utils.go:23-46, sink.go:44-52; option table
  * README.md:51-55) plus the writer knobs of
  * [[KinesisWriterConfig]] (batchproducer.go:73-124 defaults):
  *
  *  - `aws_region_name` — required, as in `ClientFromViper`
  *    (utils.go:24-26);
  *  - `kinesis_endpoint` — optional; a schemeless value gets an
  *    `http://` prefix, same rule as utils.go:33-37;
  *  - `kinesis_flush_timeout_ms` — graceful-drain bound on stop,
  *    default 30 s (sink.go:19,44-47);
  *  - `stream` — default stream name; omit when records carry a
  *    `stream` column (dynamic routing, sink.go:66-77's per-topic map);
  *  - `client` — client seam selector: `fake:<name>` resolves the named
  *    in-memory [[FakeKinesis]] (the only runnable impl in this
  *    zero-egress environment; the reference likewise only ever talks to
  *    localstack in CI).
  *
  * Validation happens at query start — fail fast, as `New` does
  * (batchproducer.go:143-153).
  */
final case class KinesisSinkOptions(
    region: String,
    endpoint: Option[String],
    stream: Option[String],
    client: String,
    flushTimeoutMs: Long,
    writer: KinesisWriterConfig,
    deadLetterPath: Option[String] = None)

object KinesisSinkOptions {
  val DefaultFlushTimeoutMs: Long = 30000L // sink.go:19

  def fromMap(opts: Map[String, String]): KinesisSinkOptions = {
    val region = opts.getOrElse("aws_region_name",
      throw new IllegalArgumentException(
        "aws_region_name is required")) // utils.go:24-26
    val endpoint = opts.get("kinesis_endpoint").map { e =>
      if (e.contains("://")) e else s"http://$e" // utils.go:33-37
    }
    KinesisSinkOptions(
      region = region,
      endpoint = endpoint,
      stream = opts.get("stream"),
      client = opts.getOrElse("client", "sdk"),
      flushTimeoutMs = opts.get("kinesis_flush_timeout_ms").map(_.toLong)
        .getOrElse(DefaultFlushTimeoutMs),
      // `dead_letter_path`: quarantine for records delivery gives up on
      // (attempt-capped per-record drops; load-shed batch drops under
      // on_persistent_error=drop). The reference can only COUNT drops
      // (StatsBatch); a production sink needs the records themselves
      // for replay/forensics. Beyond-parity, like the source.
      deadLetterPath = opts.get("dead_letter_path"),
      writer = KinesisWriterConfig(
        // BatchSize fixed to the Kinesis cap by the reference (sink.go:51).
        batchSize = opts.get("batch_size").map(_.toInt).getOrElse(500),
        maxAttemptsPerRecord = opts.get("max_attempts_per_record")
          .map(_.toInt).getOrElse(10), // batchproducer.go:121
        baseBackoffMs = opts.get("base_backoff_ms").map(_.toLong).getOrElse(50L),
        onPersistentErrorDrop =
          opts.get("on_persistent_error").map(_.trim.toLowerCase) match {
            case Some("drop") => true
            case Some("fail") | None => false
            case Some(other) => throw new IllegalArgumentException(
              s"on_persistent_error must be drop|fail, got '$other'")
          }))
  }

  /** Resolve the client seam on an executor. `fake:<name>` shares the
    * JVM-wide named [[FakeKinesis]]; anything else constructs the real
    * AWS SDK v2 client ([[SdkKinesisClient]], reflection-gated on the
    * SDK being present at runtime — it is deliberately absent from this
    * zero-egress build environment, where the path reports itself
    * unrunnable rather than pretending).
    */
  def resolveClient(o: KinesisSinkOptions): KinesisPutRecords =
    if (o.client.startsWith("fake:")) FakeKinesis.named(o.client.stripPrefix("fake:"))
    else if (SdkKinesis.isAvailable) new SdkKinesisClient(o.region, o.endpoint)
    else throw new UnsupportedOperationException(
      "AWS SDK client requires software.amazon.awssdk:kinesis on the " +
        "runtime classpath; in a zero-egress environment use " +
        "client=fake:<name>")

  /** Read-side twin of [[resolveClient]] for the DSv2 source's
    * driver-side planner and executor-side partition readers.
    */
  def resolveReadClient(o: KinesisSinkOptions): KinesisGetRecords =
    if (o.client.startsWith("fake:")) FakeKinesis.named(o.client.stripPrefix("fake:"))
    else throw new UnsupportedOperationException(
      "AWS SDK client requires software.amazon.awssdk:kinesis on the " +
        "classpath; this environment is zero-egress — use client=fake:<name>")
}
