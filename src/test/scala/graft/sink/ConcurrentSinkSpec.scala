package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The reference serializes per-topic sends through one goroutine per
  * topic but allows concurrent cross-topic sends (sink.go:79-104). Spark
  * equivalent: independent streaming queries (or partitions) writing
  * concurrently to one client — verify no records are lost or cross
  * streams under concurrency.
  */
class ConcurrentSinkSpec extends SparkTestBase {

  test("two concurrent streaming queries deliver disjoint streams intact") {
    val fake = FakeKinesis.named("conc")
    fake.clear()
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val s1 = MemoryStream[String]
    val s2 = MemoryStream[String]
    def start(src: MemoryStream[String], topic: String) =
      KinesisSink.start(
        src.toDF().select(col("value").cast("binary").as("data")),
        Map("aws_region_name" -> "r", "stream" -> topic,
          "client" -> "fake:conc", "batch_size" -> "7"),
        Files.createTempDirectory(s"ckpt-$topic").toString,
        queryName = s"conc-$topic")
    val q1 = start(s1, "alpha")
    val q2 = start(s2, "beta")
    val a = (0 until 300).map(i => s"a$i")
    val b = (0 until 300).map(i => s"b$i")
    // interleave the feeds
    a.grouped(50).zip(b.grouped(50)).foreach { case (ga, gb) =>
      s1.addData(ga); s2.addData(gb)
    }
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()
    q1.awaitTermination(30000); q2.awaitTermination(30000)
    assert(fake.storedPayloads("alpha").sorted == a.sorted)
    assert(fake.storedPayloads("beta").sorted == b.sorted)
    assert(fake.storedPayloads("alpha").forall(_.startsWith("a")),
      "record leaked across streams")
  }
}
