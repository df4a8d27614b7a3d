package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkTestBase
import StatefulSessionizer._

class StatefulSessionizerSpec extends SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${minute / 60}%02d:${minute % 60}%02d:00")

  test("sessions close on gap within the stream and on watermark timeout") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[SessionEvent]
    val sessions = sessionize(source.toDS(), watermarkDelay = "1 minute")
    val ckpt = Files.createTempDirectory("ckpt-sess").toString
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation", ckpt).start()

    // user 1: two sessions separated by a 40-min gap;
    // user 2: one session of three events.
    source.addData(
      SessionEvent(1, ts(0), 1.0), SessionEvent(1, ts(10), 2.0),
      SessionEvent(2, ts(5), 5.0), SessionEvent(2, ts(15), 5.0),
      SessionEvent(2, ts(20), 5.0),
      SessionEvent(1, ts(50), 4.0)) // 40 min after ts(10) → closes session 1
    q.processAllAvailable()
    // Advance the watermark far past everything → remaining sessions
    // time out and emit.
    source.addData(SessionEvent(99, ts(10000), 0.0))
    q.processAllAvailable()
    source.addData(SessionEvent(98, ts(20000), 0.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination(30000)

    val got = spark.table("sess_out")
      .as[CompletedSession].collect()
      .filter(_.user_id < 90)
      .map(s => (s.user_id, s.session_start.toString, s.n_events, s.total_value))
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == Seq(
      (1L, "2024-01-01 00:00:00.0", 2L, 3.0),
      (1L, "2024-01-01 00:50:00.0", 1L, 4.0),
      (2L, "2024-01-01 00:05:00.0", 3L, 15.0)),
      s"got: ${got.toSeq}")
  }

  test("agrees with the batch islands sessionization on fixture events") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Stream the real events table through the stateful operator…
    val ev = graft.Tables.load(spark, sfSmoke, "events")
      .select($"user_id", $"ts", $"value").as[SessionEvent]
    val source = MemoryStream[SessionEvent]
    val ckpt = Files.createTempDirectory("ckpt-sess2").toString
    val q = sessionize(source.toDS(), "1 minute")
      .writeStream.outputMode("append").format("memory")
      .queryName("sess_fixture")
      .option("checkpointLocation", ckpt).start()
    source.addData(ev.collect().toSeq)
    q.processAllAvailable()
    source.addData(SessionEvent(9999, Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
    q.processAllAvailable()
    q.stop(); q.awaitTermination(30000)
    val streamed = spark.table("sess_fixture")
      .filter($"user_id" =!= 9999)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_sessions"), sum($"n_events").as("n_events"))
    // …and compare per-user session/event counts with the batch operator.
    val batch = graft.ops.Events.queries("e03_user_sessions")(spark, sfSmoke)
      .select($"user_id", $"n_sessions", $"n_events")
    assert(streamed.exceptAll(batch).count() == 0 &&
      batch.exceptAll(streamed).count() == 0,
      "stateful streaming sessionization must agree with batch islands")
  }
}
