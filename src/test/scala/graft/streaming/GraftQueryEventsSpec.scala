package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sink.{FakeKinesis, KinesisSink}

/** Events() channel parity (sink.go:106-109, event.go:4-33): errors are
  * reported asynchronously, not thrown into the data plane's caller.
  * The failure-path half — a query that dies must surface a
  * Terminated(error) event on the recorder (the reference's `Error`
  * implements both Event and error).
  */
class GraftQueryEventsSpec extends SparkTestBase {

  test("a failing sink surfaces Terminated(isError) on the events queue") {
    val fake = FakeKinesis.named("ev-fail")
    fake.clear()
    fake.failRequests.set(true) // every PutRecords dies; 5 strikes → task fail
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[String]
    val df = source.toDF().select(col("value").cast("binary").as("data"))
    val ckpt = Files.createTempDirectory("ckpt-evfail").toString
    val rec = GraftQueryEvents.attach(spark)
    val q = KinesisSink.start(df,
      Map("aws_region_name" -> "r", "stream" -> "t",
        "client" -> "fake:ev-fail", "base_backoff_ms" -> "1"),
      ckpt, queryName = "ev-fail-q")
    source.addData("doomed")
    intercept[Exception] { q.processAllAvailable() }
    // awaitTermination rethrows the query exception — same error, second
    // surface; the listener event below is the async one we're testing.
    intercept[Exception] { q.awaitTermination(30000) }
    // listener delivery is async; poll the queue briefly
    val seen = scala.collection.mutable.ArrayBuffer.empty[GraftQueryEvents.Event]
    val deadline = System.nanoTime() + 10e9.toLong
    while (System.nanoTime() < deadline &&
      !seen.exists { case t: GraftQueryEvents.Terminated => t.isError
        case _ => false }) { seen ++= rec.drain(); Thread.sleep(50) }
    rec.detach(spark)
    assert(seen.exists {
      case t: GraftQueryEvents.Terminated => t.isError
      case _ => false
    }, s"no error-terminated event in: $seen")
    assert(fake.stored("t").isEmpty, "nothing must be recorded as delivered")
  }
}
