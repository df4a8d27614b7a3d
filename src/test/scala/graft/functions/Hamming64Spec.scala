package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class Hamming64Spec extends SparkTestBase {
  import spark.implicits._

  test("matches bit_count(a ^ b) on random longs (codegen path)") {
    val df = spark.range(0, 1000).select(
      (rand(7) * Long.MaxValue).cast("long").as("a"),
      (rand(13) * Long.MaxValue).cast("long").as("b"))
    val bad = df
      .withColumn("h", Hamming64(col("a"), col("b")))
      .withColumn("ref", bit_count(col("a").bitwiseXOR(col("b"))))
      .filter(!(col("h") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0)
  }

  test("known values and bounds") {
    val rows = Seq((0L, 0L), (0L, -1L), (5L, 6L), (Long.MinValue, 0L))
      .toDF("a", "b")
      .select(Hamming64(col("a"), col("b")).as("h")).collect().map(_.getInt(0))
    assert(rows.toSeq == Seq(0, 64, 2, 1))
  }

  test("SQL registration works and type-checks") {
    Hamming64.register(spark)
    val r = spark.sql("SELECT hamming64(13L, 9L) AS h").collect()(0).getInt(0)
    assert(r == 1)
    val e = intercept[Exception] {
      spark.sql("SELECT hamming64('x', 9L)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("hamming64"))
  }
}
