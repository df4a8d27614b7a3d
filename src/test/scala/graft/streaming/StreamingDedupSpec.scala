package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sink.{FakeKinesis, KinesisSink}

/** Streaming dedup in front of the at-least-once sink:
  * `dropDuplicatesWithinWatermark` suppresses redelivered event ids
  * inside the watermark horizon, turning upstream at-least-once into
  * effective exactly-once delivery for the covered window — the standard
  * composition for a Kinesis pipeline fed by a source that can repeat.
  */
class StreamingDedupSpec extends SparkTestBase {

  test("duplicate event ids within the watermark are delivered once") {
    val fake = FakeKinesis.named("sdedup")
    fake.clear()
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp, String)]
    val df = source.toDF().toDF("id", "ts", "payload")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
      .select(col("payload").cast("binary").as("data"))
    val ckpt = Files.createTempDirectory("ckpt-sdedup").toString
    val q = KinesisSink.start(df,
      Map("aws_region_name" -> "r", "stream" -> "dedup-topic",
        "client" -> "fake:sdedup"), ckpt)
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    source.addData((1L, t(0), "a"), (2L, t(1), "b"), (1L, t(0), "a"))
    q.processAllAvailable()
    // redelivery in a later batch, still inside the watermark
    source.addData((2L, t(2), "b"), (3L, t(3), "c"))
    q.processAllAvailable()
    q.stop(); q.awaitTermination(30000)
    assert(fake.storedPayloads("dedup-topic").sorted == Seq("a", "b", "c"),
      s"got ${fake.storedPayloads("dedup-topic")}")
  }
}
