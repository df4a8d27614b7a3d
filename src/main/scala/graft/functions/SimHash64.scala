package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: 64-bit SimHash of a document from its
  * per-shingle hash halves in ONE fused pass.
  *
  * `hi(j)`/`lo(j)` are the two 32-bit md5 halves of shingle j (hex
  * digits 1–8 and 9–16; both < 2^32 so they sit safely in longs). Bit i
  * of the result is the majority vote of bit i across shingles — bits
  * 0–31 vote from `lo`, bits 32–63 from `hi`: identical semantics to
  * the composed form (64 `aggregate()` higher-order calls of
  * `((h >> i) & 1) * 2 - 1` summed then sign-tested), and to the DuckDB
  * oracle's 64 `sum(((h >> i) & 1) * 2 - 1)` columns.
  *
  * Why native: the composed form is 64 separate `ArrayAggregate`s —
  * CodegenFallback, so the whole projection drops to interpreted mode,
  * and `CollapseProject` inlines the shingle-hash arrays into EVERY
  * aggregate, recomputing the md5 hashing of every shingle 64×
  * (measured: forcing the composed d04 projection at sf0.1 ran minutes;
  * the fused expression is one array walk with 64 bit-counters and
  * stays inside whole-stage codegen).
  *
  * Nulls: null array → null; a null ELEMENT zeroes the 32 bits VOTED BY
  * THAT ARRAY only (the composed form's per-bit `aggregate` over the
  * null-containing array folds to null and `when(null > 0)` falls to 0,
  * while the other half's aggregates are independent and unaffected —
  * fuzz-verified). Empty arrays → 0L (no positive vote), as in the
  * composed form. Mismatched lengths → error (the halves always come
  * from the same shingle set).
  */
case class SimHash64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  private def isLongArray(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isLongArray(left.dataType) && isLongArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val hi = a.asInstanceOf[ArrayData]
    val lo = b.asInstanceOf[ArrayData]
    val n = hi.numElements()
    if (n != lo.numElements())
      throw new IllegalArgumentException(
        s"simhash64: length mismatch ($n vs ${lo.numElements()})")
    val cnt = new Array[Int](64)
    var hiNull = false; var loNull = false
    var j = 0
    while (j < n) {
      if (hi.isNullAt(j)) hiNull = true
      else {
        val h = hi.getLong(j)
        var k = 0
        while (k < 32) { cnt(k + 32) += ((h >>> k) & 1L).toInt; k += 1 }
      }
      if (lo.isNullAt(j)) loNull = true
      else {
        val l = lo.getLong(j)
        var k = 0
        while (k < 32) { cnt(k) += ((l >>> k) & 1L).toInt; k += 1 }
      }
      j += 1
    }
    var r = 0L
    var k = 0
    while (k < 64) {
      // vote = 2*cnt - n > 0; a null anywhere in the voting array nulls
      // that half's aggregates -> those bits stay 0
      val nulled = if (k < 32) loNull else hiNull
      if (!nulled && 2 * cnt(k) > n) r |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val h = ctx.freshName("h")
      val l = ctx.freshName("l")
      val r = ctx.freshName("r")
      val hiNull = ctx.freshName("hiNull")
      val loNull = ctx.freshName("loNull")
      val nulled = ctx.freshName("nulled")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "simhash64: length mismatch (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |final int[] $cnt = new int[64];
         |boolean $hiNull = false; boolean $loNull = false;
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) { $hiNull = true; } else {
         |    final long $h = $a.getLong($j);
         |    for (int $k = 0; $k < 32; $k++) {
         |      $cnt[$k + 32] += (int) (($h >>> $k) & 1L);
         |    }
         |  }
         |  if ($b.isNullAt($j)) { $loNull = true; } else {
         |    final long $l = $b.getLong($j);
         |    for (int $k = 0; $k < 32; $k++) {
         |      $cnt[$k] += (int) (($l >>> $k) & 1L);
         |    }
         |  }
         |}
         |long $r = 0L;
         |for (int $k = 0; $k < 64; $k++) {
         |  final boolean $nulled = ($k < 32) ? $loNull : $hiNull;
         |  if (!$nulled && 2 * $cnt[$k] > $n) $r |= (1L << $k);
         |}
         |${ev.value} = $r;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHash64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Column API: `SimHash64(hiHalves, loHalves)`. */
  def apply(hi: Column, lo: Column): Column =
    ColumnBridge.column(SimHash64(
      ColumnBridge.expression(hi), ColumnBridge.expression(lo)))

  /** SQL registration: `SELECT simhash64(ha, hb)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "simhash64")
}
