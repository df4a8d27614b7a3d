package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Both historical `events.ts` encodings must normalize to the same
  * TimestampType instants through `Tables.load`/`loadStream`.
  *
  * The live fixtures exercise only ONE branch at a time (currently the
  * TIMESTAMP_NTZ cast; before the mid-round-6 regeneration, the
  * nanos-as-long conversion) — so whichever branch the fixtures don't
  * use is dead code against `FixtureCanarySpec` and needs this
  * synthesized coverage to stay correct for the next regeneration.
  */
class TsNormalizeSpec extends SparkTestBase {

  // 2024-01-01T00:00:00.123456Z plus a sub-µs tail in the nanos form —
  // the long branch must floor-divide (truncate), not round half-up.
  private val baseUs = 1704067200123456L
  // Timestamp(ms) carries only ms precision; the 456 µs tail goes in
  // via setNanos or the round-trip check fails by exactly that tail.
  private val wantTs: Timestamp = {
    val t = new Timestamp(baseUs / 1000)
    t.setNanos(((baseUs % 1000000L) * 1000L).toInt)
    t
  }

  private def writeFixture(schema: StructType, rows: Seq[Row]): String = {
    val dir = tmpDir("ts-encoding")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loadedMicros(dir: String): (DataType, Long) = {
    val df = Tables.load(spark, dir, "events")
    val us = df.select(unix_micros(col("ts"))).head().getLong(0)
    (df.schema("ts").dataType, us)
  }

  test("legacy nanos-as-long encoding converts with floor division") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType)))
    // 999 ns tail: round-half-up would land 1 µs high
    val dir = writeFixture(schema, Seq(Row(1L, baseUs * 1000L + 999L)))
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(us == baseUs, "ns→µs must truncate (DuckDB read parity)")
  }

  test("TIMESTAMP_NTZ encoding casts instant-preserving under UTC") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampNTZType)))
    val dir = writeFixture(schema,
      Seq(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        baseUs / 1000000L, ((baseUs % 1000000L) * 1000L).toInt,
        java.time.ZoneOffset.UTC))))
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(us == baseUs,
      "NTZ→TZ cast must reinterpret the wall-clock as a UTC instant")
  }

  test("TimestampType encoding passes through untouched") {
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", TimestampType)))
    val dir = writeFixture(schema, Seq(Row(1L, wantTs)))
    val (dt, us) = loadedMicros(dir)
    assert(dt == TimestampType)
    assert(us == baseUs)
  }

  test("loadStream normalizes both encodings to TimestampType") {
    for (tsType <- Seq(LongType: DataType, TimestampNTZType: DataType)) {
      val schema = StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", tsType)))
      val rows = tsType match {
        case LongType => Seq(Row(1L, baseUs * 1000L))
        case _ => Seq(Row(1L, java.time.LocalDateTime.ofEpochSecond(
          baseUs / 1000000L, ((baseUs % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)))
      }
      val dir = writeFixture(schema, rows)
      val streamed = Tables.loadStream(spark, dir, "events")
      assert(streamed.isStreaming)
      assert(streamed.schema("ts").dataType == TimestampType,
        s"loadStream must normalize $tsType like load does")
    }
  }
}
