package graft.sink

import org.scalatest.funsuite.AnyFunSuite

/** Construction/dispatch logic of the classpath-gated SDK client. The
  * SDK itself is absent in this zero-egress environment (that absence is
  * part of what's under test); the data-plane contract is exercised
  * against [[FakeKinesis]] behind the same seam everywhere else.
  */
class SdkKinesisClientSpec extends AnyFunSuite {

  private def opts(client: String, endpoint: Option[String] = None) =
    KinesisSinkOptions.fromMap(Map(
      "aws_region_name" -> "us-west-2",
      "client" -> client) ++ endpoint.map("kinesis_endpoint" -> _))

  test("SDK availability gate reports absent on this classpath") {
    assert(!SdkKinesis.isAvailable)
  }

  test("resolveClient: fake scheme resolves the named fake") {
    val c = KinesisSinkOptions.resolveClient(opts("fake:sdk-spec"))
    assert(c eq FakeKinesis.named("sdk-spec"))
  }

  test("resolveClient: sdk path without the SDK fails with guidance, " +
      "not a ClassNotFoundException") {
    val e = intercept[UnsupportedOperationException] {
      KinesisSinkOptions.resolveClient(opts("sdk"))
    }
    assert(e.getMessage.contains("software.amazon.awssdk"))
    assert(e.getMessage.contains("fake:"))
  }

  test("construction args carry region and defaulted endpoint " +
      "(ClientFromViper parity, utils.go:22-47)") {
    // Constructing the wrapper never touches the SDK (client is lazy) —
    // the region/endpoint plumbing is testable without the jars.
    val o = opts("sdk", endpoint = Some("localhost:4566"))
    val c = new SdkKinesisClient(o.region, o.endpoint)
    assert(c.region == "us-west-2")
    assert(c.endpoint.contains("http://localhost:4566"),
      "schemeless endpoint must get the http:// default")
    val live = new SdkKinesisClient(opts("sdk").region, None)
    assert(live.endpoint.isEmpty, "no endpoint => default credential chain")
  }

  test("putRecords still validates the 1..500 cap before touching the SDK") {
    val c = new SdkKinesisClient("us-west-2", None)
    val tooMany = (0 to 500).map(i => KinesisRecord(s"k$i", Array[Byte](1)))
    val e1 = intercept[IllegalArgumentException] { c.putRecords("s", tooMany) }
    assert(e1.getMessage.contains("500"))
    val e2 = intercept[IllegalArgumentException] { c.putRecords("s", Nil) }
    assert(e2.getMessage.contains("1..500"))
  }
}
