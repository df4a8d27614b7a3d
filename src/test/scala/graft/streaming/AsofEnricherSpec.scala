package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase

/** The multi-batch properties e39's single-file gate cannot exercise:
  * watermark finality (a purchase is held until no earlier click can
  * arrive), out-of-order attribution (a late click inside the delay
  * wins), and carried click state across batches.
  */
class AsofEnricherSpec extends SparkTestBase {

  case class Ev(user_id: Long, ts: Timestamp, event_id: Long,
      event_type: String)

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  private def run(name: String)(body: (MemoryStream[Ev],
      org.apache.spark.sql.streaming.StreamingQuery) => Unit): Unit = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[Ev]
    val enriched = AsofEnricher.enrich(spark,
      source.toDF().withWatermark("ts", "1 hour"))
    val ckpt = Files.createTempDirectory(s"ckpt-$name").toString
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName(name).option("checkpointLocation", ckpt).start()
    try body(source, q)
    finally { q.stop(); q.awaitTermination(30000) }
  }

  test("a purchase waits for watermark finality and an out-of-order " +
      "click arriving within the delay wins the attribution") {
    run("asof_ooo") { (source, q) =>
      // batch 1: click@0:00, purchase@0:30 for user 1; a clock event
      // pushes the watermark only to 0:10 — the purchase is NOT final
      source.addData(Ev(1, ts(0), 1, "click"),
        Ev(1, ts(30), 2, "purchase"), Ev(99, ts(70), 90, "click"))
      q.processAllAvailable()
      assert(spark.table("asof_ooo").count() == 0,
        "purchase must not emit before the watermark passes it")
      // batch 2: the LATE click@0:20 — out of order but inside the
      // delay; a running-state enrichment would already have emitted
      // (purchase 2 → click 1) and missed it
      source.addData(Ev(1, ts(20), 3, "click"))
      q.processAllAvailable()
      assert(spark.table("asof_ooo").count() == 0)
      // advance the watermark far past everything (twice — a batch's
      // watermark reflects the PREVIOUS batch's max event time)
      source.addData(Ev(98, ts(10000), 91, "click"))
      q.processAllAvailable()
      source.addData(Ev(97, ts(20000), 92, "click"))
      q.processAllAvailable()
      val got = spark.table("asof_ooo")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == Seq((2L, 1L, 3L, 600000000L)),
        s"the 0:20 click must win the 0:30 purchase: $got")
    }
  }

  test("1 ms finality boundary (round-14 fix): a same-millisecond " +
      "earlier-microsecond click still wins — finality must be " +
      "STRICTLY below the watermark") {
    // The fixture the round-13 verdict asked for: purchase at
    // M + 500 µs, watermark parked EXACTLY at millisecond M, then the
    // out-of-order click at M + 200 µs. Spark admits rows AT the
    // watermark millisecond forever, so `<=` finality (pre-round-14)
    // emits the purchase unattributed at the first assert below —
    // this test FAILS on `<=` and passes on `<`.
    def us(minute: Int, micros: Int): Timestamp = {
      val t = new Timestamp(ts(minute).getTime)
      t.setNanos(micros * 1000); t
    }
    run("asof_boundary") { (source, q) =>
      // B1: the purchase (M + 500 µs) and a clock click parking the
      // 1 h watermark exactly at M = ts(30)
      source.addData(Ev(1, us(30, 500), 2, "purchase"),
        Ev(99, ts(90), 90, "click"))
      q.processAllAvailable()
      // B2: unrelated traffic; user 1's timeout fires at wm == M.
      // THE boundary assert: the purchase's millisecond EQUALS the
      // watermark, a same-ms earlier-µs click is still admissible, so
      // the purchase must stay pending (`<=` emits it here, null-
      // attributed)
      source.addData(Ev(98, ts(90), 91, "click"))
      q.processAllAvailable()
      assert(spark.table("asof_boundary").count() == 0,
        "purchase emitted AT the watermark millisecond - the 1 ms " +
          "finality window is open again")
      // B3: the same-millisecond, earlier-microsecond click (M+200µs)
      // — legal input (its ms >= watermark), sorts BEFORE the
      // purchase in e08's (ts, event_id) order
      source.addData(Ev(1, us(30, 200), 3, "click"))
      q.processAllAvailable()
      // flush: push the watermark past the horizon (twice — a batch's
      // watermark reflects the previous batch's max event time)
      source.addData(Ev(97, ts(20000), 92, "click"))
      q.processAllAvailable()
      source.addData(Ev(96, ts(30000), 93, "click"))
      q.processAllAvailable()
      val got = spark.table("asof_boundary")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == Seq((2L, 1L, 3L, 300L)),
        s"same-ms attribution must land at 300 µs gap: $got")
    }
  }

  test("no-prior-click purchases emit null attribution and the carried " +
      "final click crosses batches") {
    run("asof_carry") { (source, q) =>
      // batch 1: purchase with NO prior click, then a click; the clock
      // event finalizes both (watermark 1:40)
      source.addData(Ev(5, ts(5), 10, "purchase"),
        Ev(5, ts(10), 11, "click"), Ev(99, ts(160), 90, "click"))
      q.processAllAvailable()
      // batch 2: a purchase much later — its prior click is the one
      // CARRIED from batch 1 (long since below the watermark, so a
      // buffer-only implementation would have forgotten it)
      source.addData(Ev(5, ts(180), 12, "purchase"))
      q.processAllAvailable()
      source.addData(Ev(98, ts(10000), 91, "click"))
      q.processAllAvailable()
      source.addData(Ev(97, ts(20000), 92, "click"))
      q.processAllAvailable()
      val got = spark.table("asof_carry")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(2)) -1L else r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3)))
        .toSeq.sortBy(_._1)
      assert(got == Seq((10L, -1L, -1L),
        (12L, 11L, 170L * 60 * 1000000L)), s"got $got")
    }
  }
}
