package graft.functions

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Randomized differential testing of the fused expressions against
  * their composed higher-order-function references, on BOTH evaluation
  * paths — whole-stage codegen AND interpreted (forced via
  * spark.sql.codegen.wholeStage=false + factoryMode=NO_CODEGEN) — since
  * a custom Expression's nullSafeEval and doGenCode are two separate
  * implementations of the same contract. Inputs deliberately include
  * null elements, empty arrays, extreme longs, negatives, NaN and
  * infinities. Seeded, so failures reproduce.
  */
class FusedExprFuzzSpec extends SparkTestBase {

  private val N = 400
  // fresh per test (seeded there), so each test's corpus is independent
  // of suite ordering and reproduces in isolation
  private var rng: Random = new Random(0xC0FFEE)

  private def longArr(len: Int, nullFrac: Double,
      extreme: Boolean): Array[java.lang.Long] =
    Array.tabulate[java.lang.Long](len) { _ =>
      if (rng.nextDouble() < nullFrac) null
      else if (extreme && rng.nextDouble() < 0.1)
        java.lang.Long.valueOf(rng.nextLong()) // full int64 range
      else java.lang.Long.valueOf(rng.nextInt(1 << 28).toLong)
    }

  private def dblArr(len: Int, nullFrac: Double): Array[java.lang.Double] =
    Array.tabulate[java.lang.Double](len) { _ =>
      if (rng.nextDouble() < nullFrac) null
      else rng.nextDouble() match {
        case d if d < 0.05 => java.lang.Double.valueOf(Double.NaN)
        case d if d < 0.08 => java.lang.Double.valueOf(Double.PositiveInfinity)
        case d if d < 0.10 => java.lang.Double.valueOf(Double.NegativeInfinity)
        case _ => java.lang.Double.valueOf(rng.nextGaussian() * 1e3)
      }
    }

  private def mkDf(rows: Seq[Row], schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)

  /** Run `check` under codegen and again fully interpreted. */
  private def bothPaths(check: => Unit): Unit = {
    check
    val ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    val fm = spark.conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try check
    finally {
      // symmetric restore: never clobber a non-default factory mode a
      // caller or base config set on the shared session
      spark.conf.set("spark.sql.codegen.wholeStage", ws)
      spark.conf.set("spark.sql.codegen.factoryMode", fm)
    }
  }

  private def assertNoDiff(df: DataFrame, what: String): Unit = {
    val bad = df.filter(!(col("fused") <=> col("ref")))
      .limit(3).collect()
    assert(bad.isEmpty,
      s"$what diverged from composed form on: ${bad.mkString("; ")}")
  }

  test("fuzz: simhash64 + minhash_slot vs composed on random " +
      "null-sprinkled long arrays, codegen AND interpreted") {
    rng = new Random(0xC0FFEE)
    val schema = StructType(Seq(
      StructField("ha", ArrayType(LongType, containsNull = true)),
      StructField("hb", ArrayType(LongType, containsNull = true))))
    val rows = (0 until N).map { i =>
      val len = i % 13 // includes empty arrays
      Row(longArr(len, if (i % 5 == 0) 0.2 else 0.0, extreme = true),
        longArr(len, if (i % 7 == 0) 0.3 else 0.0, extreme = true))
    }
    val df = mkDf(rows, schema).cache()
    val simComposed = (0 until 64).map { i =>
      val (arr, sh) = if (i < 32) ("hb", i) else ("ha", i - 32)
      when(expr(
        s"aggregate($arr, 0L, (acc, h) -> acc + ((h >> $sh) & 1) * 2 - 1)")
        > 0, 1L << i).otherwise(0L)
    }.reduce(_ + _)
    val (a, b, p) = (968665049L, 372700613L, 1000000007L)
    // minhash contract domain is h < 2^28 (a·h+b must stay in int64 —
    // the composed form THROWS under ANSI outside it, so parity is only
    // defined inside): bounded generator, nulls still sprinkled
    val mhRows = (0 until N).map { i =>
      Row(longArr(i % 13, if (i % 5 == 0) 0.2 else 0.0, extreme = false),
        longArr(i % 13, 0.0, extreme = false))
    }
    val mhDf = mkDf(mhRows, schema).cache()
    bothPaths {
      assertNoDiff(df
        .withColumn("fused", SimHash64(col("ha"), col("hb")))
        .withColumn("ref", simComposed), "simhash64")
      assertNoDiff(mhDf
        .withColumn("fused", MinHashSlot(col("ha"), a, b, p))
        .withColumn("ref", array_min(
          expr(s"transform(ha, h -> (h * ${a}L + ${b}L) % ${p}L)"))),
        "minhash_slot")
    }
    df.unpersist(); mhDf.unpersist()
  }

  test("fuzz: dot_product + abs_diff_sum + cosine_sim vs composed, " +
      "codegen AND interpreted, incl. NaN/Inf") {
    rng = new Random(0xD00D5EED)
    val dblSchema = StructType(Seq(
      StructField("va", ArrayType(DoubleType, containsNull = true)),
      StructField("vb", ArrayType(DoubleType, containsNull = true))))
    val dblRows = (0 until N).map { i =>
      val len = i % 9
      Row(dblArr(len, if (i % 6 == 0) 0.25 else 0.0),
        dblArr(len, if (i % 4 == 0) 0.15 else 0.0))
    }
    val ddf = mkDf(dblRows, dblSchema).cache()
    val dotComposed = aggregate(
      zip_with(col("va"), col("vb"), (x, y) => x * y), lit(0.0), _ + _)
    val longSchema = StructType(Seq(
      StructField("la", ArrayType(LongType, containsNull = true)),
      StructField("lb", ArrayType(LongType, containsNull = true))))
    val longRows = (0 until N).map { i =>
      val len = i % 11
      // bounded magnitudes: |a-b| of full-range longs overflows in BOTH
      // forms identically, but keep the test focused on documented use
      Row(longArr(len, if (i % 5 == 0) 0.2 else 0.0, extreme = false),
        longArr(len, if (i % 3 == 0) 0.1 else 0.0, extreme = false))
    }
    val ldf = mkDf(longRows, longSchema).cache()
    val absComposed = aggregate(
      zip_with(col("la"), col("lb"), (x, y) => abs(x - y)), lit(0L), _ + _)
    // try_divide: null on zero denominator — exactly CosineSim's
    // zero-norm contract (a plain / throws under ANSI mode)
    val cosComposed = try_divide(dotComposed,
      sqrt(aggregate(zip_with(col("va"), col("va"), (x, y) => x * y),
        lit(0.0), _ + _)) *
        sqrt(aggregate(zip_with(col("vb"), col("vb"), (x, y) => x * y),
          lit(0.0), _ + _)))
    bothPaths {
      assertNoDiff(ddf
        .withColumn("fused", DotProduct(col("va"), col("vb")))
        .withColumn("ref", dotComposed), "dot_product")
      assertNoDiff(ldf
        .withColumn("fused", AbsDiffSum(col("la"), col("lb")))
        .withColumn("ref", absComposed), "abs_diff_sum")
      assertNoDiff(ddf
        .withColumn("fused", CosineSim(col("va"), col("vb")))
        .withColumn("ref", cosComposed), "cosine_sim")
    }
    ddf.unpersist(); ldf.unpersist()
  }

  test("fuzz: md5_prefix28 + shingle_simhash64 vs the composed " +
      "md5/substr/conv HOF chain, codegen AND interpreted") {
    rng = new Random(0x5EED5EED)
    def strArr(len: Int, nullFrac: Double): Array[String] =
      Array.tabulate[String](len) { _ =>
        if (rng.nextDouble() < nullFrac) null
        else {
          // shingle-shaped strings plus adversaries: empty, unicode,
          // long runs — md5 must agree byte-for-byte on UTF-8 input
          rng.nextInt(5) match {
            case 0 => ""
            case 1 => "héllo wörld ünïcode" + rng.nextInt(100)
            case 2 => "x" * (rng.nextInt(200) + 1)
            case _ => s"tok${rng.nextInt(50)} tok${rng.nextInt(50)} " +
              s"tok${rng.nextInt(50)}"
          }
        }
      }
    val schema = StructType(Seq(
      StructField("shs", ArrayType(StringType, containsNull = true))))
    val rows = (0 until N).map { i =>
      Row(strArr(i % 13, if (i % 5 == 0) 0.2 else 0.0))
    }
    val df = mkDf(rows, schema).cache()
    val prefixComposed = expr(
      "transform(shs, sh -> cast(conv(substr(md5(sh), 1, 7), 16, 10) as bigint))")
    val haComposed = expr(
      "transform(shs, sh -> cast(conv(substr(md5(sh), 1, 8), 16, 10) as bigint))")
    val hbComposed = expr(
      "transform(shs, sh -> cast(conv(substr(md5(sh), 9, 8), 16, 10) as bigint))")
    bothPaths {
      assertNoDiff(df
        .withColumn("fused", Md5Prefix28(col("shs")))
        .withColumn("ref", prefixComposed), "md5_prefix28")
      assertNoDiff(df
        .withColumn("fused", ShingleSimHash64(col("shs")))
        .withColumn("ref", SimHash64(haComposed, hbComposed)),
        "shingle_simhash64")
    }
    df.unpersist()
  }

  test("fuzz: shingle3 vs the composed sequence/transform/concat_ws/" +
      "array_distinct chain, codegen AND interpreted") {
    rng = new Random(0x391A61E3)
    def tokArr(len: Int, nullFrac: Double): Array[String] =
      Array.tabulate[String](len) { _ =>
        if (rng.nextDouble() < nullFrac) null
        else rng.nextInt(6) match {
          case 0 => "" // empty token: shingles with doubled separators
          case 1 => "wörd" + rng.nextInt(5) // unicode
          case _ => "tok" + rng.nextInt(8) // small vocab → many dups
        }
      }
    val schema = StructType(Seq(
      StructField("toks", ArrayType(StringType, containsNull = true))))
    // lengths 1,2,3 exercise every clamp branch; larger ones the dedup.
    // n = 0 is OUTSIDE the contract domain: the composed form's
    // element_at(toks, 1) ERRORS on an empty array under Spark 4's ANSI
    // default, and split() never produces one (minimum is [""]) — the
    // kernel's documented "" fallback is an extension, not parity.
    val rows = (0 until N).map { i =>
      Row(tokArr(i % 16 + 1, if (i % 4 == 0) 0.25 else 0.0))
    }
    val df = mkDf(rows, schema).cache()
    val composed = expr(s"array_distinct(${graft.ops.Dedup.shingleExpr})")
    bothPaths {
      assertNoDiff(df
        .withColumn("fused", Shingle3(col("toks")))
        .withColumn("ref", composed), "shingle3")
    }
    df.unpersist()
  }

  test("fuzz: hash_clf_score vs the composed split/md5/aggregate " +
      "chain, codegen AND interpreted") {
    rng = new Random(0x5C0FE5)
    // texts exercise every split edge: empty string (one empty token),
    // consecutive/leading/trailing spaces (empty segments KEPT — the
    // limit=-1 contract), unicode tokens, null rows
    def text(): String = {
      val n = rng.nextInt(9)
      if (n == 0) ""
      else (0 until n).map { _ =>
        rng.nextInt(6) match {
          case 0 => ""
          case 1 => "wörd" + rng.nextInt(4)
          case _ => "tok" + rng.nextInt(12)
        }
      }.mkString(" ") + (if (rng.nextDouble() < 0.2) " " else "")
    }
    val schema = StructType(Seq(StructField("text", StringType, true)))
    val rows = (0 until N).map { i =>
      Row(if (i % 17 == 0) null else text())
    }
    val df = mkDf(rows, schema).cache()
    val composedScore = expr(
      """aggregate(
        |  transform(split(text, ' '), t ->
        |    (cast(conv(substr(md5(t), 1, 8), 16, 10) as bigint) % 4096)
        |      * 2654435761 % 2001 - 1000),
        |  0L, (acc, x) -> acc + x)""".stripMargin)
    val composedN = expr("cast(size(split(text, ' ')) as bigint)")
    bothPaths {
      assertNoDiff(df
        .withColumn("fused", HashClfScore(col("text")))
        .withColumn("ref", when(col("text").isNotNull,
          array(composedScore, composedN))),
        "hash_clf_score")
    }
    df.unpersist()
  }
}
