package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 64-bit Morton (Z-order) interleave of two
  * 32-bit keys — bit i of `a` lands at result bit 2i, bit i of `b` at
  * 2i+1. Sorting by the interleaved value clusters BOTH dimensions at
  * once, which is what makes multi-dimensional data layout work at
  * 100 TB: files written in z-value ranges carry tight min/max footers
  * on *both* columns, so scans filtering on either dimension prune files
  * (a single-column sort leaves the other dimension's per-file span at
  * the full global range — no pruning). See LayoutSpec for the measured
  * contrast.
  *
  * Semantics are bit-identical to the composed built-in form
  * `Σ_i ((a>>i&1) << 2i | (b>>i&1) << 2i+1)` (LayoutSpec proves parity);
  * fused because the composed form is a 64-term expression tree —
  * correct, but this is a hot per-row kernel on every write that uses
  * the layout. Inputs beyond 32 bits are rejected, not truncated:
  * callers normalize keys into [0, 2^32) first (rank/scale), and a
  * silent mask would interleave garbage.
  */
case class ZOrder64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder64 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(ZOrder64.interleave(
      a.asInstanceOf[Long], b.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.ZOrder64.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "zorder64"
}

object ZOrder64 {
  /** Shared by interpreted and generated paths — one semantics. */
  def interleave(a: Long, b: Long): Long = {
    if ((a & 0xFFFFFFFF00000000L) != 0 || (b & 0xFFFFFFFF00000000L) != 0)
      throw new IllegalArgumentException(
        s"zorder64: inputs must fit in 32 bits, got ($a, $b)")
    (spread(a) | (spread(b) << 1))
  }

  /** Spread the low 32 bits of x to the even bit positions of a long —
    * the standard Morton magic-number dilation (public-domain bit
    * trick; see e.g. the "Interleave bits by Binary Magic Numbers"
    * entry in Sean Anderson's Bit Twiddling Hacks).
    */
  def spread(x0: Long): Long = {
    var x = x0 & 0x00000000FFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8))  & 0x00FF00FF00FF00FFL
    x = (x | (x << 4))  & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2))  & 0x3333333333333333L
    x = (x | (x << 1))  & 0x5555555555555555L
    x
  }

  /** Column API: `ZOrder64(a, b)` — both normalized into [0, 2^32). */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(ZOrder64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT zorder64(a, b)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "zorder64")
}
