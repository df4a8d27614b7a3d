package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the read-only parquet fixtures described in FIXTURES.md.
  *
  * All operators take a `dir` (a scale-factor directory such as
  * `/root/testdata/sf0.01`) and read the tables they need through here, so
  * the scan always goes through the same code path: a plain
  * `spark.read.parquet` that Catalyst can push filters and column pruning
  * into. No caching at this layer — at 100 TB the tables don't fit in
  * memory, and the parquet reader + pushdown is the scalable access path.
  */
object Tables {
  /** Every fixture table (TESTDATA.md). */
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Dimension tables small enough to broadcast at any scale factor:
    * region is 5 rows and nation 25 at every SF (FIXTURES.md §B). */
  val broadcastable: Set[String] = Set("region", "nation")

  /** `events.ts` has shipped under two parquet encodings so far, and the
    * operator code must see a plain `TimestampType` regardless of which
    * one the fixture generation picked:
    *
    *  - TIMESTAMP(NANOS): Spark 4 refuses it (PARQUET_TYPE_ILLEGAL)
    *    unless `spark.sql.legacy.parquet.nanosAsLong=true` is set —
    *    every session builder in this repo sets it. The column then
    *    arrives as LongType nanos; convert to TimestampType micros with
    *    floor division (`/` on columns is double division and would
    *    round half-up where DuckDB's ns→µs read truncates — 1 µs skew).
    *  - timestamp[us] with no timezone: Spark reads TIMESTAMP_NTZ,
    *    which `unix_micros` and `withWatermark` reject. Cast to
    *    TimestampType — the session timezone is pinned to UTC in every
    *    entry point, so the cast reinterprets the same wall-clock as the
    *    same instant and DuckDB's naive-timestamp oracle semantics are
    *    unchanged.
    */
  private def normalizeTs(tsType: DataType)(df: DataFrame): DataFrame =
    tsType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df.schema("ts").dataType)(df) else df
  }

  /** Streaming read of one fixture table: file-stream over the SF dir
    * narrowed to the table's parquet (streaming sources need a
    * directory), with the SAME guarded ts conversion as [[load]] — the
    * streaming gates (e07/e16/d10) must see the schema batch queries
    * see, including if the fixture is ever regenerated with µs
    * timestamps.
    */
  def loadStream(spark: SparkSession, dir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/$name.parquet")
    val streamed = spark.readStream.schema(raw.schema)
      .option("pathGlobFilter", s"$name.parquet")
      .parquet(dir)
    if (name == "events") normalizeTs(raw.schema("ts").dataType)(streamed)
    else streamed
  }
}
