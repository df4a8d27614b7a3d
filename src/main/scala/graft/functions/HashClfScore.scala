package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused linear-classifier inference over a document's token stream —
  * the fastText-style hashing trick (token → feature bucket → weight →
  * sum) in ONE compiled pass over the raw text: returns
  * `[score_raw, n_tokens]` as an `array<bigint>`.
  *
  * This is the Spark-side shape of the standard LLM-curation quality /
  * toxicity classifier pass: at 100 TB the token stream must NEVER
  * materialize as rows — the composed form (explode → md5 → conv →
  * groupBy(doc_id)) shuffles every token; the HOF form
  * (`aggregate(transform(split(...)))`) is CodegenFallback and runs the
  * whole projection interpreted (the d07 lesson). Here the projection
  * stays narrow (one row in, one 2-element array out) and the whole
  * stage keeps codegen.
  *
  * Model semantics (deterministic synthetic weights — the container has
  * no trained model; the PLUMBING is the operator):
  *  - tokens: split on every single 0x20 byte, KEEPING empty segments —
  *    exactly `split(text, ' ')` (Spark, limit -1) and DuckDB's
  *    `string_split(text, ' ')`, the t16 corpus convention;
  *  - feature id: md5 hex digits 1-8 as an unsigned 32-bit value
  *    (the repo's md5 bridge — [[ShingleMd5.hi32]], oracle-side
  *    `('0x' || substr(md5(t), 1, 8))::BIGINT`), bucketed mod 4096;
  *  - weight: `((bucket * 2654435761) mod 2001) - 1000` — a Knuth
  *    multiplicative mix so adjacent buckets get independent weights in
  *    [-1000, 1000]; all arithmetic on non-negative longs, so Java and
  *    SQL `%` agree.
  *  - score: the INTEGER weight sum — exact in any association order on
  *    any engine; thresholding/normalizing happens downstream with one
  *    double division.
  *
  * Null text → null. Empty text → one empty token (md5("") is defined),
  * n_tokens = 1 — the split convention's floor.
  */
case class HashClfScore(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hash_clf_score expects string, got ${t.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    HashClfScore.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashClfScore.compute($c);")

  override protected def withNewChildInternal(
      newChild: Expression): HashClfScore = copy(child = newChild)

  override def prettyName: String = "hash_clf_score"
}

object HashClfScore {
  /** Weight-table size (feature-hashing buckets). */
  val Buckets = 4096L
  /** Knuth multiplicative mix + range fold → weights in [-1000, 1000]. */
  val Mix = 2654435761L
  val Mod = 2001L
  val Bias = 1000L

  /** Weight of one token — shared single definition for the kernel, the
    * fuzz reference and any future per-token debugging surface.
    */
  def weight(tokenBytes: Array[Byte]): Long = {
    val d = ShingleMd5.digest(tokenBytes)
    ((ShingleMd5.hi32(d) % Buckets) * Mix % Mod) - Bias
  }

  /** One pass: [weighted score, token count]. */
  def compute(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    var score = 0L
    var nToks = 1L
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        score += weight(java.util.Arrays.copyOfRange(bytes, start, i))
        if (i < bytes.length) nToks += 1
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(Array[Any](score, nToks))
  }

  /** Column API: `HashClfScore(text)`. */
  def apply(text: Column): Column =
    ColumnBridge.column(HashClfScore(ColumnBridge.expression(text)))

  /** SQL registration: `SELECT hash_clf_score(text)`. */
  def register(spark: SparkSession): Unit =
    registerOne(spark, "hash_clf_score")
}
