package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column-API surface over Spark's OWN distributed Bloom-filter
  * machinery (`BloomFilterAggregate` / `BloomFilterMightContain`, the
  * expressions behind runtime row-level filtering) — public classes in
  * the Spark jars, but not registered in the public FunctionRegistry,
  * so without this seam they are unreachable from user code.
  *
  * Scale role (d19): a membership set too big to broadcast RAW (an eval
  * corpus' shingle set at 100 TB) still broadcasts as a bloom — a few
  * MB for 10⁸ items — built in ONE distributed pass (partial filters
  * OR-merged, no shuffle of the values), then probed scan-side as a
  * scalar subquery. The bloom has NO false negatives, so following it
  * with an exact verification join keeps results engine-exact: false
  * positives die in the join, and only bloom-survivors (≈ the true
  * matches) ever reach the shuffle.
  */
object BloomFilterFns {

  /** Aggregate: build a bloom over `value` (must be LongType — hash
    * strings with `xxhash64` first). `items`/`bits` size the filter;
    * Spark caps them at spark.sql.optimizer.runtime.bloomFilter.*.
    */
  def agg(value: Column, items: Long, bits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(value), Literal(items), Literal(bits))
      .toAggregateExpression())

  /** Scalar probe: `bloom` must be a constant or scalar subquery
    * (`Dataset.scalar()`) — BloomFilterMightContain's own contract, so
    * the filter is built once and broadcast, never evaluated per row.
    */
  def mightContain(bloom: Column, value: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      ColumnBridge.expression(bloom), ColumnBridge.expression(value)))

  /** SQL registration: `bloom_filter_agg(xxhash64(x), items, bits)` +
    * `might_contain((SELECT bloom...), xxhash64(x))`.
    */
  def register(spark: SparkSession): Unit = {
    registerOne(spark, "bloom_filter_agg")
    registerOne(spark, "might_contain")
  }
}
