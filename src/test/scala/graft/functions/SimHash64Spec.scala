package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SimHash64Spec extends SparkTestBase {
  import spark.implicits._

  /** The composed reference form d04 shipped before the fused
    * expression: 64 aggregate() HOFs, one per bit.
    */
  private def composed = (0 until 64).map { i =>
    val (arr, sh) = if (i < 32) ("lo", i) else ("hi", i - 32)
    when(expr(
      s"aggregate($arr, 0L, (acc, h) -> acc + ((h >> $sh) & 1) * 2 - 1)")
      > 0, 1L << i).otherwise(0L)
  }.reduce(_ + _)

  test("matches the composed 64-aggregate form exactly on random halves") {
    val df = spark.range(500).select(col("id"),
        expr("transform(sequence(0, cast(id % 37 as int)), j -> " +
          "cast(conv(substr(md5(concat(id, '_', j)), 1, 8), 16, 10) " +
          "as bigint))").as("hi"),
        expr("transform(sequence(0, cast(id % 37 as int)), j -> " +
          "cast(conv(substr(md5(concat(id, '_', j)), 9, 8), 16, 10) " +
          "as bigint))").as("lo"))
    val bad = df
      .withColumn("fused", SimHash64(col("hi"), col("lo")))
      .withColumn("ref", composed)
      .filter(!(col("fused") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0, "fused simhash must be bit-identical to composed form")
  }

  test("empty arrays → 0; null → null; length mismatch errors; sign bit " +
      "reachable") {
    val empty = Seq((Array.empty[Long], Array.empty[Long])).toDF("a", "b")
      .select(SimHash64(col("a"), col("b"))).collect()(0)
    assert(!empty.isNullAt(0) && empty.getLong(0) == 0L)
    val nul = Seq((null.asInstanceOf[Array[Long]], Array(1L)))
      .toDF("a", "b").select(SimHash64(col("a"), col("b"))).collect()(0)
    assert(nul.isNullAt(0))
    val e = intercept[Exception] {
      Seq((Array(1L), Array(1L, 2L))).toDF("a", "b")
        .select(SimHash64(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
    // hi half all-ones => bits 32..63 all set, including bit 63
    val signed = Seq((Array(0xFFFFFFFFL), Array(0L))).toDF("a", "b")
      .select(SimHash64(col("a"), col("b"))).collect()(0).getLong(0)
    assert(signed == 0xFFFFFFFF00000000L, f"got $signed%016x")
    assert(signed < 0, "bit 63 must reach the sign bit")
  }

  test("SQL registration works") {
    SimHash64.register(spark)
    val r = spark.sql(
      "SELECT simhash64(array(0L), array(cast(4294967295 as long))) AS s")
      .collect()(0).getLong(0)
    assert(r == 0x00000000FFFFFFFFL)
  }
}
