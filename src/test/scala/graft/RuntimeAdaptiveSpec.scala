package graft

import org.apache.spark.sql.functions._

/** The two runtime features a 100 TB join lives or dies by, demonstrated
  * on this engine's session with plan-level proof:
  *
  *  - **runtime bloom-filter row pruning**: a selective dim-side filter
  *    is turned into a `might_contain(bloom)` predicate on the fact-side
  *    SCAN, so fact rows that cannot join die before the shuffle. (The
  *    production thresholds key off byte sizes the fixtures can't reach;
  *    the spec lowers them — the PLAN TRANSFORMATION is what's pinned.)
  *  - **AQE skew-join splitting**: a hot key that would pin one reducer
  *    is split into multiple tasks at runtime (`skew=true` on the join),
  *    with the result multiset unchanged — the no-manual-salting path
  *    that complements e09/d09's explicit salting.
  *
  * Confs are saved and restored around each test: the session is shared
  * suite-wide and these knobs must not leak into other specs.
  */
class RuntimeAdaptiveSpec extends SparkTestBase {

  test("runtime bloom filter: selective dim filter becomes a " +
      "might_contain predicate on the fact scan, result unchanged") {
    val baseline = {
      val li = Tables.load(spark, sfVerify, "lineitem")
      val ords = Tables.load(spark, sfVerify, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      li.join(ords, col("l_orderkey") === col("o_orderkey")).count()
    }
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" ->
        "10GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        "0",
      // force a shuffle join: against a broadcast join Spark rightly
      // sees no point in a bloom filter
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables.load(spark, sfVerify, "lineitem")
      val ords = Tables.load(spark, sfVerify, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = li.join(ords, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
      assert(j.count() == baseline,
        "bloom pruning must not change the join result")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true), " +
      "result multiset unchanged") {
    import spark.implicits._
    // hot key 0 carries 90% of the left side — the shape that pins one
    // reducer at scale
    def left = spark.range(0, 200000)
      .select(when($"id" % 10 =!= 0, lit(0L)).otherwise($"id").as("k"),
        concat(lit("payload-payload-payload-"), $"id").as("v"))
    def right = spark.range(0, 50).select($"id".as("k"), lit("dim").as("d"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        "20KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val j = left.join(right, "k")
      val rows = j.collect()
      val fin = j.queryExecution.executedPlan.toString
      assert(fin.contains("skew=true"),
        s"AQE did not mark the skewed join:\n${fin.take(2000)}")
      // ground truth: every left key is 0 or a multiple of 10, and each
      // key < 50 matches exactly one right row — count left keys < 50
      // (distributed count; collecting 200k payload rows to the driver
      // just for a scalar is the anti-pattern the repo bans)
      val direct = left.filter($"k" < 50L).count()
      assert(rows.length == direct,
        s"skew-split join returned ${rows.length}, direct count $direct")
    }
  }
}
