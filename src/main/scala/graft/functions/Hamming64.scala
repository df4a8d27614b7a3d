package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hamming distance between two int64 bit
  * patterns (`bit_count(a ^ b)`), used by SimHash near-dup joins.
  *
  * Built as a real `BinaryExpression` with `doGenCode` so it stays
  * inside whole-stage codegen — on a self-join at 100 TB this runs per
  * candidate pair, and a codegen'd `Long.bitCount` intrinsic is the
  * difference between a fused loop and an interpreted expression tree.
  * (Preference order per SURVEY.md §4.3: compose built-ins < custom
  * Expression < custom plan. A scalar is exactly the Expression case.)
  */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming64 expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.bitCount(a.asInstanceOf[Long] ^ b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hamming64 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming64"
}

object Hamming64 {
  /** Column API: `Hamming64(colA, colB)`. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(Hamming64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT hamming64(a, b)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "hamming64")
}
