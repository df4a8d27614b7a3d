package graft.sink

import java.lang.reflect.{InvocationTargetException, Method}
import java.net.URI

/** Real AWS SDK v2 Kinesis client behind the [[KinesisPutRecords]] seam —
  * the shippable counterpart of `ClientFromViper`/`NewClient`/
  * `NewClientWithEndpoint` (/root/reference/utils.go:22-73):
  *
  *  - region is required (utils.go:24-26 — enforced upstream in
  *    [[KinesisSinkOptions.fromMap]]);
  *  - no endpoint → live AWS with the default credential chain
  *    (utils.go:31-33, `NewClient`);
  *  - endpoint set → custom endpoint override with dummy static
  *    credentials, the localstack-style test path (utils.go:38-44,
  *    `NewClientWithEndpoint`; the `http://` defaulting rule is applied
  *    in [[KinesisSinkOptions.fromMap]], utils.go:33-37).
  *
  * CLASSPATH-GATED VIA REFLECTION: this build environment is zero-egress
  * and deliberately has no AWS jars, so the SDK cannot be a compile-time
  * dependency. All SDK touches go through `Class.forName` — the library
  * compiles and its fake-backed tests run without the SDK, and a
  * deployment that puts `software.amazon.awssdk:kinesis` on the runtime
  * classpath gets the real client with no rebuild.
  * [[SdkKinesis.isAvailable]] is the gate
  * [[KinesisSinkOptions.resolveClient]] dispatches on.
  *
  * Thread-safety: the underlying `KinesisClient` is thread-safe per AWS
  * SDK docs; one lazily-built instance per [[SdkKinesisClient]] (per
  * executor task after deserialization) is the intended pattern.
  */
object SdkKinesis {
  private[sink] val ClientClass =
    "software.amazon.awssdk.services.kinesis.KinesisClient"

  /** True iff the AWS SDK v2 Kinesis client is on the runtime classpath. */
  def isAvailable: Boolean =
    try { Class.forName(ClientClass); true }
    catch { case _: ClassNotFoundException => false }
}

final class SdkKinesisClient(val region: String, val endpoint: Option[String])
    extends KinesisPutRecords {

  // --- reflection kit. SDK builder impls are package-private classes
  // behind public interfaces, so method lookup walks the hierarchy and
  // forces accessibility (classpath jars live in the unnamed module, so
  // setAccessible is permitted).
  private def clazz(n: String): Class[_] =
    Class.forName(n, true, getClass.getClassLoader)

  private def findMethod(c: Class[_], name: String,
      params: Seq[Class[_]]): Method = {
    def matches(m: Method): Boolean =
      m.getName == name && m.getParameterCount == params.size &&
        m.getParameterTypes.zip(params).forall { case (p, a) =>
          p.isAssignableFrom(a) || p == a
        }
    (Iterator.iterate[Class[_]](c)(_.getSuperclass).takeWhile(_ != null) ++
        c.getInterfaces.iterator)
      .flatMap(_.getMethods.iterator).find(matches)
      .getOrElse(throw new NoSuchMethodException(s"${c.getName}.$name"))
  }

  private def call(target: AnyRef, name: String,
      args: (Class[_], AnyRef)*): AnyRef = {
    val method = findMethod(target.getClass, name, args.map(_._1))
    method.setAccessible(true)
    try method.invoke(target, args.map(_._2): _*)
    catch {
      case e: InvocationTargetException =>
        throw new KinesisRequestException(
          Option(e.getCause).map(_.toString).getOrElse(e.toString))
    }
  }

  private def callStatic(className: String, name: String,
      args: (Class[_], AnyRef)*): AnyRef = {
    val c = clazz(className)
    val method = findMethod(c, name, args.map(_._1))
    method.setAccessible(true)
    method.invoke(null, args.map(_._2): _*)
  }

  /** `KinesisClient.builder().region(r)[.endpointOverride(u)
    * .credentialsProvider(dummy)].build()` — utils.go:49-54 / :57-73.
    */
  @transient private lazy val client: AnyRef = {
    val regionCls = clazz("software.amazon.awssdk.regions.Region")
    val regionObj = callStatic(regionCls.getName, "of",
      (classOf[String], region))
    var b = call(callStatic(SdkKinesis.ClientClass, "builder"),
      "region", (regionCls, regionObj))
    endpoint.foreach { ep =>
      b = call(b, "endpointOverride", (classOf[URI], URI.create(ep)))
      // dummy static credentials on manual endpoints (utils.go:39)
      val creds = callStatic(
        "software.amazon.awssdk.auth.credentials.AwsBasicCredentials",
        "create", (classOf[String], "dummy"), (classOf[String], "dummy"))
      val prov = callStatic(
        "software.amazon.awssdk.auth.credentials.StaticCredentialsProvider",
        "create",
        (clazz("software.amazon.awssdk.auth.credentials.AwsCredentials"),
          creds))
      b = call(b, "credentialsProvider",
        (clazz(
          "software.amazon.awssdk.auth.credentials.AwsCredentialsProvider"),
          prov))
    }
    call(b, "build")
  }

  /** `PutRecords` with the same request/response mapping the reference's
    * sendBatch performs (batchproducer.go:406-444): one entry per record
    * (PartitionKey + Data), per-entry ErrorCode/ErrorMessage back; a
    * request-level SDK exception surfaces as [[KinesisRequestException]]
    * so the writer's backoff path behaves identically to the fake's.
    */
  override def putRecords(stream: String,
      records: Seq[KinesisRecord]): Seq[PutResultEntry] = {
    require(records.nonEmpty && records.size <= 500,
      s"PutRecords accepts 1..500 records, got ${records.size}")
    val sdkBytesCls = clazz("software.amazon.awssdk.core.SdkBytes")
    val entries = new java.util.ArrayList[AnyRef](records.size)
    records.foreach { r =>
      val data = callStatic(sdkBytesCls.getName, "fromByteArray",
        (classOf[Array[Byte]], r.data))
      val eb = callStatic("software.amazon.awssdk.services.kinesis.model." +
        "PutRecordsRequestEntry", "builder")
      entries.add(call(call(call(eb,
        "partitionKey", (classOf[String], r.partitionKey)),
        "data", (sdkBytesCls, data)),
        "build"))
    }
    val req = call(call(call(
      callStatic("software.amazon.awssdk.services.kinesis.model." +
        "PutRecordsRequest", "builder"),
      "streamName", (classOf[String], stream)),
      "records", (classOf[java.util.Collection[_]], entries)),
      "build")
    val resp = call(client, "putRecords", (req.getClass, req))
    val out = call(resp, "records").asInstanceOf[java.util.List[AnyRef]]
    val results = Seq.newBuilder[PutResultEntry]
    out.forEach { entry =>
      results += PutResultEntry(
        Option(call(entry, "errorCode")).map(_.asInstanceOf[String]),
        Option(call(entry, "errorMessage")).map(_.asInstanceOf[String]))
    }
    results.result()
  }
}
