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

  /** PER-GROUP RUNNING SUM WITHOUT A PER-GROUP WINDOW — the classic
    * two-pass distributed scan, for the packing shapes (m07) whose
    * per-format cumsum otherwise serializes a modality's whole corpus
    * slice through one task. Pass 1: range-partition + sort on
    * (group ++ order), collect the per-partition totals (one tiny
    * number per partition). Pass 2: re-walk each partition with its
    * exclusive offset. The per-GROUP rebase then rides a broadcast
    * join: within the global sort a group's rows are contiguous, so
    * the group's exclusive start offset is min(cum − value) over the
    * group — WHICH REQUIRES `value` ≥ 0 (byte sizes, counts — the
    * packing use cases; enforced per row, fail-fast). Inherits the
    * double-pass note: the input lineage runs twice, so pass a
    * NARROW frame (keys + value) and join the result back, or
    * checkpoint first.
    */
  def groupedCumsum(df: DataFrame, group: Seq[String],
      order: Seq[Column], value: Column, name: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val withV = df.withColumn("__v", value.cast("long"))
    val sortCols = group.map(col) ++ order
    val sorted = withV.repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = sorted.schema.fieldIndex("__v")
    val rdd0 = sorted.rdd
    val partSums = rdd0.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach { r =>
        val v = r.getLong(vIdx)
        require(v >= 0L, s"groupedCumsum needs non-negative values, got $v")
        s += v
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(
      partSums.scanLeft(0L)(_ + _))
    val schema = sorted.schema.add(name, LongType, nullable = false)
    val cum = spark.createDataFrame(
      rdd0.mapPartitionsWithIndex { (i, it) =>
        var run = offsets.value(i)
        it.map { r => run += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ run) }
      }, schema)
    val goff = cum.groupBy(group.map(col): _*)
      .agg(min(col(name) - col("__v")).as("__goff"))
    cum.join(broadcast(goff), group)
      .withColumn(name, col(name) - col("__goff"))
      .drop("__goff", "__v")
  }

  /** PER-GROUP NTILE WITHOUT A PER-GROUP WINDOW — the round-14 fix
    * for the last flooded-partition class: `ntile(k).over(
    * partitionBy(lowCardKey))` sorts each key's ENTIRE slice of the
    * corpus in one task (a language or source partition IS a corpus
    * share at 100 TB — the same hazard the d09/m05 hub windows had,
    * but unsplittable by salting because ntile needs the group's
    * total order). The decomposition: one GLOBAL range-partitioned
    * rank over (group ++ order) — a distributed sort, every executor
    * sorting its slice — then per-group rank = global rank − the
    * group's offset (a group-count-sized aggregate, broadcast back),
    * and the tile from the closed form of SQL NTILE semantics
    * (first n mod k tiles hold ⌈n/k⌉ rows, the rest ⌊n/k⌋ — the
    * property spec pins equality against Spark's own ntile window on
    * random frames). `order` must be total within each group
    * (include a tiebreaker), the ntile precondition anyway.
    *
    * Cost note: inherits [[apply]]'s zipWithIndex double-pass —
    * callers rank an expensive frame AFTER localCheckpointing it.
    */
  def groupedNtile(df: DataFrame, group: Seq[String],
      order: Seq[Column], k: Int, name: String): DataFrame = {
    require(k >= 1, "ntile k must be >= 1")
    import org.apache.spark.sql.functions._
    val ranked = apply(df, group.map(col) ++ order, "__gr")
    val sizes = ranked.groupBy(group.map(col): _*)
      .agg(min(col("__gr")).as("__off"), count(lit(1)).as("__n"))
    ranked.join(broadcast(sizes), group)
      .withColumn("__r", col("__gr") - col("__off") + 1L)
      .withColumn(name, expr(
        s"""CASE WHEN __n % ${k}L = 0
           |  THEN (__r - 1) div (__n div ${k}L) + 1
           |  WHEN __r <= (__n % ${k}L) * (__n div ${k}L + 1)
           |  THEN (__r - 1) div (__n div ${k}L + 1) + 1
           |  ELSE __n % ${k}L +
           |    (__r - 1 - (__n % ${k}L) * (__n div ${k}L + 1))
           |      div (__n div ${k}L) + 1
           |END""".stripMargin).cast("int"))
      .drop("__gr", "__off", "__n", "__r")
  }
}
