package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LeafNode, LogicalPlan, Statistics}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StructType

/** Deferred-execution leaf for the SQL serving TVFs
  * ([[graft.ops.SqlServing]]).
  *
  * The TVF builders used to return the Scala search's ANALYZED plan,
  * which meant building it at SQL-analysis time — and the searches run
  * real Spark jobs while constructing their plans (probed-cell
  * resolves, candidate-id collects, sizing counts). So `EXPLAIN`, a
  * BI tool's schema probe, or every re-analysis of a view over the TVF
  * silently paid full search cost, and an analyzed plan pinned a
  * pre-upsert index snapshot (the round-12 advisory). This node closes
  * that: analysis only validates the (literal) arguments and declares
  * the output schema — ZERO Spark jobs — and the search plan is built
  * when the query EXECUTES, against the index artifacts as of
  * execution time.
  *
  * Stack (the [[TopKPerKey]] pattern): [[ServingScan]] (logical leaf,
  * schema declared up front) → [[ServingScanStrategy]] (planner) →
  * [[ServingScanExec]] (physical; `doExecute` builds the inner
  * DataFrame — paying the bounded driver-side resolves exactly once,
  * at execution — and hands back its `toRdd`). The declared schema is
  * the one drift hazard of deferring (the analyzer can no longer read
  * it off the real plan), so `doExecute` fails loudly on any
  * name/type mismatch with the built plan, and the spec pins the
  * declared schemas against the Scala twins'.
  *
  * Injected via `GraftExtensions.injectPlannerStrategy` (SQL-only
  * sessions) and self-installed on `spark.experimental.extraStrategies`
  * by every builder (the `registerAll` attach path), exactly like
  * [[TopKPerKey]].
  */
case class ServingScan(fn: String, argsDesc: String,
    output: Seq[Attribute], build: SparkSession => DataFrame)
    extends LeafNode {
  // a serving call returns k-ish rows; tiny, broadcastable if composed
  override def computeStats(): Statistics =
    Statistics(sizeInBytes = BigInt(64L * 1024))
  override def simpleString(maxFields: Int): String =
    s"ServingScan $fn($argsDesc)"
}

case class ServingScanExec(fn: String, argsDesc: String,
    output: Seq[Attribute], build: SparkSession => DataFrame)
    extends LeafExecNode {

  override protected def doExecute(): RDD[InternalRow] = {
    val df = build(session)
    val got = df.schema
    require(got.length == output.length && got.zip(output).forall {
        case (f, a) => f.name == a.name && f.dataType == a.dataType },
      s"$fn($argsDesc): the deferred search plan's schema " +
        s"[${got.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")}] " +
        s"drifted from the declared TVF schema " +
        s"[${output.map(a => s"${a.name}:${a.dataType.sql}").mkString(", ")}]" +
        " — update SqlServing's declared schema")
    df.queryExecution.toRdd
  }

  override def simpleString(maxFields: Int): String =
    s"ServingScanExec $fn($argsDesc)"
}

object ServingScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: ServingScan =>
      ServingScanExec(s.fn, s.argsDesc, s.output, s.build) :: Nil
    case _ => Nil
  }
}

object ServingScan {
  /** Builder from a declared StructType (fresh exprIds, minted once —
    * the node is a leaf, so nothing upstream can hold stale ids).
    */
  def apply(fn: String, argsDesc: String, declared: StructType,
      build: SparkSession => DataFrame): ServingScan =
    ServingScan(fn, argsDesc,
      declared.map(f =>
        AttributeReference(f.name, f.dataType)()): Seq[Attribute],
      build)

  /** Make the planner strategy available on an existing session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(ServingScanStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ ServingScanStrategy
}
