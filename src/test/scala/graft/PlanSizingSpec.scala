package graft

import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.execution.LogicalRDD

import graft.ops.PlanSizing

/** The shared stats-first sizing ladder (PlanSizing) — the one home
  * behind the ANN probe/refine literal budgets, the containment
  * candidate-generator switch and the salted-agg auto rewrite. Pins
  * the three rungs WITHOUT plan forensics on the consumers: literal
  * frames size for free and come back untouched, unknown frames come
  * back checkpointed (materialized once) with the exact count, and
  * the byte estimate orders tables the way their on-disk sizes do.
  */
class PlanSizingSpec extends SparkTestBase {

  test("local literal frame: exact count, frame returned untouched") {
    import spark.implicits._
    val df = Seq(1L, 2L, 3L, 4L).toDF("x")
    val (sized, n) = PlanSizing.sizedRows(df)
    assert(n === 4L)
    // the free rung must not checkpoint: the returned plan is still
    // the LocalRelation the caller handed in
    assert(sized.queryExecution.optimizedPlan.isInstanceOf[LocalRelation])
  }

  test("unknown-count frame: checkpointed first, count exact") {
    import spark.implicits._
    // a parquet scan has a size estimate but (CBO off) no row count —
    // the ladder's last rung: eager localCheckpoint, then count the
    // materialized partitions
    val df = spark.read.parquet(s"$sfSmoke/region.parquet")
      .filter($"r_regionkey" >= 1L)
    val expected = df.count()
    val (sized, n) = PlanSizing.sizedRows(df)
    assert(n === expected)
    // the caller must receive the checkpoint (sized evaluation ==
    // executed evaluation): the returned plan is a materialized RDD
    // scan, not the original file scan
    assert(sized.queryExecution.logical.isInstanceOf[LogicalRDD])
    assert(sized.count() === expected)
  }

  test("scanBytes orders tables by on-disk size, zero jobs") {
    val region = spark.read.parquet(s"$sfSmoke/region.parquet")
    val lineitem = spark.read.parquet(s"$sfSmoke/lineitem.parquet")
    val rb = PlanSizing.scanBytes(region)
    val lb = PlanSizing.scanBytes(lineitem)
    assert(rb > 0)
    assert(lb > rb) // 6k-row fact table dwarfs the 5-row dimension
  }
}
