package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct 3-token shingle array of a
  * token list in ONE compiled pass — value-identical (fuzz-proven, both
  * eval paths) to the composed
  * `array_distinct(transform(sequence(1, greatest(size(toks)-2, 1)),
  * i -> concat_ws(' ', element_at(toks, i),
  * element_at(toks, least(i+1, size(toks))),
  * element_at(toks, least(i+2, size(toks))))))`
  * and to the DuckDB oracle's list_transform twin (Dedup.shingleSql).
  *
  * Why native: the composed form is four nested higher-order functions —
  * CodegenFallback, so the projection runs interpreted and allocates a
  * lambda-variable binding, an index array (`sequence`), and boxed
  * UTF8String temporaries per shingle per row. Every shingle consumer
  * (MinHash, SimHash, Jaccard joins, decontamination, winnowing) pays
  * it as the first stage of its map; fused, the whole signature chain
  * (Shingle3 → md5_prefix28 / shingle_simhash64) is three static
  * compiled kernels.
  *
  * Semantics pinned to the composed form:
  *  - indices are 1-based, clamped with `least(i+k, n)` — the last one
  *    and two positions re-use the final token (never wrap, never null);
  *  - `size(toks) = 0` is OUTSIDE the composed form's domain (its
  *    `element_at(toks, 1)` errors under Spark 4's ANSI default;
  *    `split` never returns an empty array — minimum is [""]). The
  *    kernel extends it to a single "" shingle instead of erroring;
  *    the fuzz contract covers n ≥ 1;
  *  - null TOKENS are skipped by concat_ws (no separator emitted);
  *  - `array_distinct` keeps first occurrence order;
  *  - null toks array → null.
  */
case class Shingle3(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle3 expects array<string>, got ${t.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    Shingle3.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Shingle3.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): Shingle3 = copy(child = newChild)

  override def prettyName: String = "shingle3"
}

object Shingle3 {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val m = math.max(n - 2, 1)
    // first-occurrence-ordered distinct, like array_distinct
    val seen = new java.util.LinkedHashSet[UTF8String](m * 2)
    var i = 1
    while (i <= m) {
      // 1-based a=i, b=least(i+1,n), c=least(i+2,n); element_at beyond
      // the array (only when n=0) is null and concat_ws skips nulls
      val parts = new java.util.ArrayList[UTF8String](3)
      if (i <= n && !toks.isNullAt(i - 1))
        parts.add(toks.getUTF8String(i - 1))
      val b = math.min(i + 1, n)
      if (b >= 1 && !toks.isNullAt(b - 1))
        parts.add(toks.getUTF8String(b - 1))
      val c = math.min(i + 2, n)
      if (c >= 1 && !toks.isNullAt(c - 1))
        parts.add(toks.getUTF8String(c - 1))
      seen.add(UTF8String.concatWs(Space,
        parts.toArray(new Array[UTF8String](parts.size)): _*))
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[AnyRef]])
  }

  /** Column API: `Shingle3(toks)`. */
  def apply(toks: Column): Column =
    ColumnBridge.column(Shingle3(ColumnBridge.expression(toks)))

  /** SQL registration: `SELECT shingle3(toks)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "shingle3")
}
