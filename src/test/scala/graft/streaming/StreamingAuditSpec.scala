package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The streaming twin of Pipeline.curationWithAudit: `observe()`
  * metrics on a streaming quality gate surface PER MICRO-BATCH through
  * `StreamingQueryProgress.observedMetrics` — the zero-extra-pass
  * ingest-rate/keep-rate telemetry a continuously-curating 100 TB
  * pipeline emits, computed inside the same pass as the gate itself
  * (no second aggregation stream, no state).
  */
class StreamingAuditSpec extends SparkTestBase {

  test("observe() metrics arrive per micro-batch and sum to the gated " +
      "total") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, String)]
    val gated = source.toDF().toDF("doc_id", "text")
      .withColumn("n_toks", size(split($"text", " ")))
      .filter($"n_toks" >= 3)
      .observe("gate", count(lit(1)).as("n_pass"),
        sum($"n_toks").cast("long").as("tokens_pass"))
    val q = gated.writeStream.format("memory").queryName("aud_gate")
      .outputMode("append").start()
    try {
      source.addData((1L, "a b c d"), (2L, "a"), (3L, "x y z"))
      q.processAllAvailable()
      source.addData((4L, "p q r s t"), (5L, "no"))
      q.processAllAvailable()
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate")))
        .map(r => (r.getLong(0), r.getLong(1)))
      // two data-carrying batches, each reporting its own gate numbers
      assert(perBatch.count(_._1 > 0) == 2, s"got $perBatch")
      assert(perBatch.map(_._1).sum == 3, s"got $perBatch") // docs 1,3,4
      assert(perBatch.map(_._2).sum == 4 + 3 + 5, s"got $perBatch")
      // the audit numbers describe exactly what reached the sink
      assert(spark.sql("SELECT count(*) FROM aud_gate").head.getLong(0) == 3)
    } finally q.stop()
  }
}
