package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.{SparkTestBase, Tables}

class TopKPerKeySpec extends SparkTestBase {

  private def parts = Tables.load(spark, sfVerify, "part")
    .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))

  // total order: price desc then partkey asc, encoded as an ascending
  // struct so ties can't make the bounded heap nondeterministic
  private def ord = struct(col("p_retailprice") * -1, col("p_partkey"))

  test("matches the window row_number formulation exactly") {
    val custom = TopKPerKey(parts, Seq("p_brand"), ord, 3)
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    val expected = parts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(custom.count() == expected.count())
    assert(custom.exceptAll(expected).count() == 0 &&
      expected.exceptAll(custom).count() == 0)
  }

  test("plans the custom exec node with an exchange but NO sort") {
    val custom = TopKPerKey(parts, Seq("p_brand"), ord, 3)
    val plan = custom.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(1500))
    assert(!plan.contains("Sort "), s"custom top-k must not sort:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(p_brand"),
      s"expected a hash exchange on the key:\n$plan")
  }

  test("order-key edge values (NaN, null, infinities) match the window") {
    // The heap path materializes the order key once per row and compares
    // through a codegen'd ordering (r15 optimization) — this pins that
    // path to Spark's own sort semantics on the values that have special
    // ordering rules: NaN sorts after +Inf, nulls first under the
    // default ascending order, and struct fields compare positionally.
    import spark.implicits._
    val rows = Seq(
      ("a", 1L, Double.NaN), ("a", 2L, 1.0), ("a", 3L, -1.0),
      ("a", 4L, Double.PositiveInfinity), ("a", 5L, Double.NegativeInfinity),
      ("b", 6L, Double.NaN), ("b", 7L, Double.NaN), ("b", 8L, 0.0),
      ("c", 9L, 2.0), ("c", 10L, 2.0), ("c", 11L, 2.0)
    ).toDF("g", "id", "x")
      // a null order-key field beside the non-null rows
      .union(Seq(("a", 12L, 0.0)).toDF("g", "id", "x")
        .select(col("g"), col("id"), lit(null).cast("double").as("x")))
    val ordK = struct(col("x"), col("id"))
    val custom = TopKPerKey(rows, Seq("g"), ordK, 2)
    val w = Window.partitionBy(col("g")).orderBy(col("x").asc, col("id").asc)
    val expected = rows.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(custom.exceptAll(expected).count() == 0 &&
      expected.exceptAll(custom).count() == 0,
      s"custom=${custom.collect().mkString(",")} " +
        s"expected=${expected.collect().mkString(",")}")
  }

  test("k=1 returns exactly one row per key; bad column errors clearly") {
    val one = TopKPerKey(parts, Seq("p_brand"), ord, 1)
    val brands = parts.select("p_brand").distinct().count()
    assert(one.count() == brands)
    val e = intercept[IllegalArgumentException] {
      TopKPerKey(parts, Seq("nope"), ord, 1)
    }
    assert(e.getMessage.contains("nope"))
  }
}
