package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: one MinHash slot —
  * `min over h in hashes of (h·a + b) mod p` — in a single codegen'd
  * loop.
  *
  * The composed form `array_min(transform(hs, h -> (h*a + b) % p))`
  * allocates an intermediate array per row per slot and, being a
  * higher-order function, drops the projection to interpreted mode;
  * with 6 slots that was ~0.8 s of pure projection time per evaluation
  * at sf0.1 (and the signature table is evaluated on both sides of the
  * LSH self-join). Values are identical: same long arithmetic, same
  * min.
  *
  * Nulls: null `hashes` → null; EMPTY `hashes` → null (array_min of an
  * empty array is null); null ELEMENTS are skipped (array_min skips
  * nulls) — all kept bit-compatible with the composed form. a/b/p must
  * be foldable longs.
  */
case class MinHashSlot(hashes: Expression, mulA: Expression,
    addB: Expression, prime: Expression) extends QuaternaryExpression {

  override def first: Expression = hashes
  override def second: Expression = mulA
  override def third: Expression = addB
  override def fourth: Expression = prime

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okArr = hashes.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!okArr)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_slot expects array<bigint> hashes, got " +
          hashes.dataType.simpleString)
    else if (!Seq(mulA, addB, prime).forall(e =>
        e.dataType == LongType && e.foldable))
      TypeCheckResult.TypeCheckFailure(
        "minhash_slot expects foldable bigint (a, b, p)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override protected def nullSafeEval(h: Any, a: Any, b: Any, p: Any): Any = {
    val arr = h.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val av = a.asInstanceOf[Long]; val bv = b.asInstanceOf[Long]
    val pv = p.asInstanceOf[Long]
    var m = Long.MaxValue
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = (arr.getLong(i) * av + bv) % pv
        if (v < m) m = v
        seen = true
      }
      i += 1
    }
    if (!seen) null else java.lang.Long.valueOf(m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, a, b, p) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      val seen = ctx.freshName("seen")
      s"""
         |final int $n = $h.numElements();
         |long $m = Long.MAX_VALUE;
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$h.isNullAt($i)) {
         |    final long $v = ($h.getLong($i) * $a + $b) % $p;
         |    if ($v < $m) $m = $v;
         |    $seen = true;
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $m;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): MinHashSlot =
    copy(hashes = f, mulA = s, addB = t, prime = q)

  override def prettyName: String = "minhash_slot"
}

object MinHashSlot {
  /** Column API: `MinHashSlot(hashesCol, a, b, p)`. */
  def apply(hashes: Column, a: Long, b: Long, p: Long): Column =
    ColumnBridge.column(MinHashSlot(
      ColumnBridge.expression(hashes),
      org.apache.spark.sql.catalyst.expressions.Literal(a),
      org.apache.spark.sql.catalyst.expressions.Literal(b),
      org.apache.spark.sql.catalyst.expressions.Literal(p)))

  /** SQL registration: `SELECT minhash_slot(hs, a, b, p)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "minhash_slot")
}
