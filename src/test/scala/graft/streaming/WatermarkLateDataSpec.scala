package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Watermark late-data semantics — what lets a windowed aggregation run
  * forever at scale: state for windows older than the watermark is
  * finalized and EVICTED, so memory is bounded by the watermark horizon
  * and not the stream's lifetime. The flip side is the contract pinned
  * here: a row arriving later than the watermark allows is dropped,
  * while a late-but-inside-the-horizon row still lands in its window.
  */
class WatermarkLateDataSpec extends SparkTestBase {

  test("append-mode windowed agg: too-late row dropped, within-horizon " +
      "late row counted") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Timestamp, String)]
    // groupBy the window column ITSELF: projecting .start before the
    // agg severs the watermark→window link and append mode refuses the
    // plan (the session_window lesson applies to time windows too)
    val counts = source.toDF().toDF("ts", "k")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "10 minutes"), $"k")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("w"), $"k", $"n")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("wm_late").start()
    def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

    try {
      // batch 1: rows in window [00:00, 00:10); watermark after this
      // batch = 00:09 - 10min (below the window end, nothing emitted)
      source.addData((t(0, 5), "a"), (t(0, 9), "a"))
      q.processAllAvailable()
      // batch 2: a late row for the SAME window (00:07 >= watermark) —
      // must still be counted. Advance event time to 00:40 so the
      // watermark (00:30) passes the window end and finalizes it.
      source.addData((t(0, 7), "a"), (t(0, 40), "b"))
      q.processAllAvailable()
      // batch 3: a TOO-late row for the finalized window (00:08 <
      // watermark 00:30) — dropped, the emitted count must not change;
      // push event time further so b's window finalizes too.
      source.addData((t(0, 8), "a"), (t(1, 0), "c"))
      q.processAllAvailable()
    } finally { q.stop(); q.awaitTermination(30000) }

    val rows = spark.table("wm_late")
      .select($"w", $"k", $"n").collect()
      .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      .toSet
    // window 00:00 has exactly 3 a-rows: the 2 on-time + the 1 late
    // within horizon
    assert(rows.contains(("2024-01-01 00:00:00.0", "a", 3L)),
      s"finalized window count wrong: $rows")
    // exactly ONE emitted row for key a: a reopened window would emit a
    // SECOND append-mode row (n=1) for the finalized window — checking
    // only "no n=4 row" would miss that exact failure mode
    assert(rows.count(_._2 == "a") == 1,
      s"finalized window was reopened (duplicate append row): $rows")
  }
}
