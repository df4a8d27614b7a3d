package graft.plans

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** GLOBAL RANK WITHOUT A GLOBAL WINDOW — the scale primitive behind
  * "rank every row of a corpus-sized frame": `row_number()` with no
  * partition key plans as a single-partition WindowExec (the shape
  * PlanShapeSpec bans board-wide — ALL data through one task), but a
  * total rank doesn't need one task: range-repartition on the sort
  * key, sort within partitions (a distributed sort — every executor
  * sorts its slice), then assign indexes per partition with the
  * per-partition offsets (`zipWithIndex` — one lightweight count job
  * for the offsets, then a narrow map). The SortedExport pattern,
  * packaged.
  *
  * Determinism: the rank is a pure function of the TOTAL order, so
  * callers must pass a total ordering (include a tiebreaker). The
  * range partitioner's sampled boundaries may vary run to run; they
  * only move the partition cut points, never the global order, so
  * ranks are stable.
  *
  * Cost note: `zipWithIndex` runs the sort lineage twice (the count
  * pass + the data pass) unless the input is materialized; callers
  * ranking an expensive frame should localCheckpoint it first.
  */
object GlobalRank {

  def apply(df: DataFrame, order: Seq[Column], name: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    spark.createDataFrame(rdd, schema)
  }
}
