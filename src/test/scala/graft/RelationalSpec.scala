package graft

import org.apache.spark.sql.functions._

/** Smoke + invariant tests for the relational operator registry. The
  * authoritative value check is the driver's DuckDB hash compare (and its
  * local replica, tools/check_oracle.py); these specs guard the contract:
  * every query runs, returns rows at the verify SF, and every query key
  * has an oracle entry (or a documented omission).
  */
class RelationalSpec extends SparkTestBase {

  test("every relational query runs and is non-empty at sf0.01") {
    ops.Relational.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfVerify)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() > 0, s"$name returned 0 rows at sf0.01")
    }
  }

  test("every relational query has an oracle") {
    val missing = ops.Relational.queries.keySet -- ops.Relational.oracle.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = ops.Relational.oracle.keySet -- ops.Relational.queries.keySet
    assert(orphans.isEmpty, s"oracle entries without queries: $orphans")
  }

  test("q01 aggregates are grouped correctly") {
    val df = ops.Relational.queries("q01_pricing_summary")(spark, sfSmoke)
    val rows = df.collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length
      == rows.length, "duplicate group keys")
  }

  test("q03 top-k is sorted descending by revenue") {
    val rev = ops.Relational.queries("q03_top_orders")(spark, sfSmoke)
      .select("revenue").collect().map(_.getDouble(0))
    assert(rev.length == 10)
    assert(rev.sliding(2).forall(p => p(0) >= p(1)), "not sorted desc")
  }

  test("q09 anti join excludes exactly the semi-join complement") {
    val c = Tables.load(spark, sfSmoke, "customer")
    val o = Tables.load(spark, sfSmoke, "orders")
      .filter(col("o_totalprice") > 300000)
    val anti = ops.Relational.queries("q09_customers_without_orders")(
      spark, sfSmoke).count()
    val semi = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi").count()
    assert(anti + semi == c.count())
  }

  test("q34: the distribution accounts for every customer and every " +
      "qualifying order, including the zero-order bucket") {
    import org.apache.spark.sql.functions._
    val q34 = ops.Relational.queries("q34_order_count_distribution")(
      spark, sfVerify).cache()
    val nCust = Tables.load(spark, sfVerify, "customer").count()
    val nQualOrders = Tables.load(spark, sfVerify, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT").count()
    assert(q34.agg(sum("custdist")).collect()(0).getLong(0) == nCust,
      "every customer lands in exactly one bucket")
    assert(q34.agg(sum(col("c_count") * col("custdist"))).collect()(0)
      .getLong(0) == nQualOrders,
      "bucket-weighted counts must recover the qualifying order total")
    // the k = 0 bucket must equal the anti-join count — the row an
    // accidental inner join silently drops
    val zero = q34.filter(col("c_count") === 0)
      .collect().headOption.map(_.getLong(1)).getOrElse(0L)
    val anti = Tables.load(spark, sfVerify, "customer")
      .join(Tables.load(spark, sfVerify, "orders")
          .filter(col("o_orderpriority") =!= "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_anti").count()
    assert(zero == anti, s"zero-order bucket $zero != anti-join $anti")
    q34.unpersist()
  }

  test("q26 grouping sets: each set's subtotals sum to the grand total") {
    val rows = SparkEntry.queries("q26_grouping_sets")(spark, sfVerify)
      .collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1, "exactly one grand-total row")
    val total = grand.head.getLong(2)
    val byStatus = rows.filter(r => !r.isNullAt(0)).map(_.getLong(2)).sum
    val byPrio = rows.filter(r => !r.isNullAt(1)).map(_.getLong(2)).sum
    assert(byStatus == total && byPrio == total,
      s"subtotals $byStatus/$byPrio must both sum to $total")
  }
}
