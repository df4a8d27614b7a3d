package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class CosineSimSpec extends SparkTestBase {
  import spark.implicits._

  test("matches the composed aggregate(zip_with) form exactly") {
    val df = graft.Tables
      .load(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = df.toDF("a_id", "va")
    val b = df.toDF("b_id", "vb")
    val pairs = a.join(b, col("a_id") < col("b_id")).limit(2000)
    val composed = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), _ + _) /
      (sqrt(aggregate(zip_with(col("va"), col("va"), (x, y) => x * y),
        lit(0.0), _ + _)) *
        sqrt(aggregate(zip_with(col("vb"), col("vb"), (x, y) => x * y),
          lit(0.0), _ + _)))
    val bad = pairs
      .withColumn("fused", CosineSim(col("va"), col("vb")))
      .withColumn("ref", composed)
      .filter(!(col("fused") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0, "fused loop must be bit-identical to composed form")
  }

  test("identical vectors → 1.0; zero vector → null; length mismatch errors") {
    val one = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)))
      .toDF("a", "b").select(CosineSim(col("a"), col("b"))).collect()(0)
    assert(math.abs(one.getDouble(0) - 1.0) < 1e-15)
    val z = Seq((Array(0.0, 0.0), Array(1.0, 2.0)))
      .toDF("a", "b").select(CosineSim(col("a"), col("b"))).collect()(0)
    assert(z.isNullAt(0), "zero norm must yield null, not NaN")
    val e = intercept[Exception] {
      Seq((Array(1.0), Array(1.0, 2.0)))
        .toDF("a", "b").select(CosineSim(col("a"), col("b"))).collect()
    }
    assert(Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .exists(_.getMessage.contains("length mismatch")))
  }

  test("SQL registration") {
    CosineSim.register(spark)
    val r = spark.sql(
      "SELECT cosine_sim(array(1D, 0D), array(0D, 1D)) AS c")
      .collect()(0).getDouble(0)
    assert(r == 0.0)
  }
}
