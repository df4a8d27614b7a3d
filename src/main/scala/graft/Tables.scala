package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
