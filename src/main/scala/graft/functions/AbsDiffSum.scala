package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: Σ|a_i − b_i| of two long arrays in one
  * codegen'd loop — the bag-distance kernel behind t10's Levenshtein
  * lower bound (each edit changes at most 2 character counts, so
  * `lev(a,b) ≥ Σ|count_a(c) − count_b(c)| / 2`; a pair can only be
  * within edit distance k if the fused sum is ≤ 2k). Evaluated once per
  * candidate pair inside the join, so it must not drop the stage to
  * interpreted mode the way an aggregate(zip_with) fold would.
  *
  * Nulls: null array → null; null element in either array → null
  * (null-sticky, matching the composed fold); length mismatch → error.
  */
case class AbsDiffSum(left: Expression, right: Expression)
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
      s"abs_diff_sum expects (array<bigint>, array<bigint>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"abs_diff_sum: length mismatch ($n vs ${y.numElements()})")
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += math.abs(x.getLong(i) - y.getLong(i))
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "abs_diff_sum: length mismatch (" + $n + " vs " +
         |    $b.numElements() + ")");
         |}
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  final long $d = $a.getLong($i) - $b.getLong($i);
         |  $s += ($d < 0) ? -$d : $d;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $s; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AbsDiffSum =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "abs_diff_sum"
}

object AbsDiffSum {
  /** Column API: `AbsDiffSum(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(AbsDiffSum(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT abs_diff_sum(a, b)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "abs_diff_sum")
}
