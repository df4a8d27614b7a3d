package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** All non-ASCII content is written as \ u escapes so the test can never
  * be silently re-normalized by an editor/tool pass: COMB = U+0301
  * combining acute, RING = U+030A combining ring; EACUTE = U+00E9,
  * ARING = U+00C5 are the precomposed forms NFC must produce.
  */
class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val COMB = "\u0301"
  private val RING = "\u030A"
  private val EACUTE = "\u00E9"
  private val ARING = "\u00C5"

  private val nfc: String => String =
    s => java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)

  test("composes decomposed sequences; identity on ASCII and precomposed") {
    val cases = Seq(
      "plain ascii stays",             // fast path
      s"cafe$COMB",                    // e + combining acute -> e-acute
      s"A$RING ring",                  // A + combining ring -> A-ring
      s"$EACUTE already composed",     // precomposed -> unchanged
      s"mixed cafe$COMB and $EACUTE",  // both in one string
      "")                              // empty
    val out = cases.toDF("s")
      .select(NfcNormalize(col("s")).as("n")).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(nfc))
    assert(out(1) == s"caf$EACUTE")
    assert(out(2) == s"$ARING ring")
  }

  test("interpreted path agrees with the codegen path") {
    // the expression's eval() is the interpreted path; the DataFrame
    // projection above ran through whole-stage codegen
    val e = NfcNormalize(
      org.apache.spark.sql.catalyst.expressions.BoundReference(
        0, org.apache.spark.sql.types.StringType, nullable = true))
    val cases = Seq(s"x$COMB y$RING z", "abc", s"A$RING$COMB")
    cases.foreach { s =>
      val row = org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      assert(e.eval(row).toString == nfc(s))
    }
  }

  test("null propagates; SQL registration works and type-checks") {
    NfcNormalize.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)) AS a, " +
        s"nfc_normalize('cafe$COMB') AS b").collect()(0)
    assert(r.isNullAt(0) && r.getString(1) == s"caf$EACUTE")
    val e = intercept[Exception] {
      spark.sql("SELECT nfc_normalize(42)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nfc_normalize"))
  }

  test("agrees with java.text.Normalizer on randomized combining marks") {
    // random latin letters interleaved with combining marks U+0300-U+036F
    val rnd = new scala.util.Random(42)
    val cases = (0 until 200).map { _ =>
      (0 until rnd.nextInt(20)).map { _ =>
        val c = ('a' + rnd.nextInt(26)).toChar.toString
        if (rnd.nextBoolean()) c + (0x300 + rnd.nextInt(0x70)).toChar else c
      }.mkString
    }
    val out = cases.toDF("s")
      .select(NfcNormalize(col("s")).as("n")).collect().map(_.getString(0))
    assert(out.toSeq == cases.map(nfc))
  }
}
