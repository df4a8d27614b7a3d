package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The r2 fused expressions must be bit-identical to the composed
  * higher-order-function forms they replaced (the oracle SQL still
  * describes the composed semantics).
  */
class FusedExprParitySpec extends SparkTestBase {
  import spark.implicits._

  test("dot_product matches aggregate(zip_with) exactly") {
    val df = graft.Tables.load(spark, sfSmoke, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val a = df.toDF("a_id", "va")
    val b = df.toDF("b_id", "vb")
    val composed = aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
      lit(0.0), _ + _)
    val bad = a.join(b, col("a_id") < col("b_id")).limit(3000)
      .withColumn("fused", DotProduct(col("va"), col("vb")))
      .withColumn("ref", composed)
      .filter(!(col("fused") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0, "fused dot must be bit-identical to composed fold")
    val e = intercept[Exception] {
      Seq((Array(1.0), Array(1.0, 2.0))).toDF("a", "b")
        .select(DotProduct(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("minhash_slot matches array_min(transform(...)) exactly, incl. " +
      "empty -> null") {
    val df = spark.range(400).select(col("id"),
      expr("transform(sequence(0, cast(id % 29 as int)), j -> " +
        "cast(conv(substr(md5(concat(id, '_', j)), 1, 7), 16, 10) " +
        "as bigint))").as("hs"))
    val (a, b, p) = (968665049L, 372700613L, 1000000007L)
    val bad = df
      .withColumn("fused", MinHashSlot(col("hs"), a, b, p))
      .withColumn("ref",
        array_min(expr(s"transform(hs, h -> (h * ${a}L + ${b}L) % ${p}L)")))
      .filter(!(col("fused") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0, "fused slot must be bit-identical to composed form")
    val empty = Seq(Tuple1(Array.empty[Long])).toDF("hs")
      .select(MinHashSlot(col("hs"), a, b, p)).collect()(0)
    assert(empty.isNullAt(0), "empty hashes must yield null (array_min parity)")
  }

  test("null ELEMENTS follow the composed forms: dot -> null (sticky " +
      "fold), minhash_slot skips (array_min semantics)") {
    graft.functions.registerAll(spark)
    val d = spark.sql("SELECT dot_product(array(1.0d, cast(null as " +
      "double)), array(2.0d, 3.0d)) AS x").collect()(0)
    assert(d.isNullAt(0), "null element must null the dot, as the " +
      "null-sticky aggregate fold does")
    val m = spark.sql("SELECT minhash_slot(array(5L, cast(null as " +
      "bigint), 3L), 7L, 1L, 97L) AS x").collect()(0)
    // min((5*7+1)%97, (3*7+1)%97) = min(36, 22) = 22, null skipped
    assert(!m.isNullAt(0) && m.getLong(0) == 22L)
    val allNull = spark.sql("SELECT minhash_slot(array(cast(null as " +
      "bigint)), 7L, 1L, 97L) AS x").collect()(0)
    assert(allNull.isNullAt(0))
    // simhash64: a null in one half zeroes THAT half's 32 bits only
    // (the composed per-bit aggregates are independent): hi=[null] kills
    // bits 32-63, lo=[1] still votes bit 0
    val s = spark.sql("SELECT simhash64(array(cast(null as bigint)), " +
      "array(1L)) AS x").collect()(0)
    assert(!s.isNullAt(0) && s.getLong(0) == 1L)
  }

  test("abs_diff_sum matches the composed fold; bag bound never prunes " +
      "a true near-match") {
    graft.functions.registerAll(spark)
    val df = spark.range(300).select(col("id"),
      expr("transform(sequence(0, 25), j -> cast(conv(substr(md5(" +
        "concat(id, '_a_', j)), 1, 4), 16, 10) as bigint) % 7)").as("ha"),
      expr("transform(sequence(0, 25), j -> cast(conv(substr(md5(" +
        "concat(id, '_b_', j)), 1, 4), 16, 10) as bigint) % 7)").as("hb"))
    val composed = aggregate(zip_with(col("ha"), col("hb"),
      (x, y) => abs(x - y)), lit(0L), _ + _)
    val bad = df.withColumn("fused", AbsDiffSum(col("ha"), col("hb")))
      .withColumn("ref", composed)
      .filter(!(col("fused") <=> col("ref"))).count() // null-safe: a spurious NULL is a mismatch, not a skip
    assert(bad == 0)
    // soundness of the t10 prefilter: lev >= bag/2 on real name pairs
    val names = graft.Tables.load(spark, sfSmoke, "part")
      .select(col("p_partkey").as("id"), col("p_name").as("n"),
        expr(graft.ops.TextAnalysis.letterHistExpr).as("h"))
    val pairs = names.toDF("a_id", "a_n", "a_h")
      .join(names.toDF("b_id", "b_n", "b_h"), col("a_id") < col("b_id"))
      .limit(20000)
      .withColumn("bag", AbsDiffSum(col("a_h"), col("b_h")))
      .withColumn("lev", levenshtein(col("a_n"), col("b_n")))
    assert(pairs.filter(col("lev") * 2 < col("bag")).count() == 0,
      "bag distance must lower-bound 2*levenshtein")
  }

  test("registerAll exposes every fused expression to SQL") {
    // NOTE: the shared test session is built with
    // spark.sql.extensions=graft.GraftExtensions, so these names would
    // resolve even without this call — what this test still proves is
    // that registerAll and the injected path dispatch the SAME builders
    // (both now delegate to functions.sqlFunctions, one pair per
    // function) and that each builder computes correctly through SQL.
    graft.functions.registerAll(spark)
    val r = spark.sql("SELECT dot_product(array(1.0d, 2.0d), " +
      "array(3.0d, 4.0d)) AS d, " +
      "minhash_slot(array(5L), 7L, 1L, 97L) AS m, " +
      "hamming64(7L, 1L) AS h, " +
      "simhash64(array(0L), array(1L)) AS s, " +
      "cosine_sim(array(1.0d), array(2.0d)) AS c, " +
      "abs_diff_sum(array(3L, 1L), array(1L, 5L)) AS a").collect()(0)
    assert(r.getDouble(0) == 11.0 && r.getLong(1) == 36L)
    assert(r.getInt(2) == 2 || r.getLong(2) == 2L)
    assert(r.getLong(3) == 1L && math.abs(r.getDouble(4) - 1.0) < 1e-15)
    assert(r.getLong(5) == 6L)
  }
}
