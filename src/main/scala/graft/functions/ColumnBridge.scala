package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** The one blessed Column ↔ catalyst Expression bridge. Spark 4 made
  * `ExpressionUtils` private[sql] in Scala, but its static forwarders
  * are public bytecode; every custom expression/plan in this library
  * goes through this single cached reflective seam so a future Spark
  * internals shift is a one-place fix. Plan-time only — never on the
  * per-row path.
  */
private[graft] object ColumnBridge {
  private lazy val cls =
    Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
  private lazy val toColumnM = cls.getMethod("column", classOf[Expression])
  private lazy val toExprM = cls.getMethod("expression", classOf[Column])

  def column(e: Expression): Column =
    toColumnM.invoke(null, e).asInstanceOf[Column]

  def expression(c: Column): Expression =
    toExprM.invoke(null, c).asInstanceOf[Expression]

  // Dataset.ofRows moved behind private[sql] in Spark 4; its static
  // forwarder is public bytecode (plan-time only, cached). Shared by
  // TopKPerKey and the WindowGuard rewrite.
  private lazy val ofRowsM = {
    val dcls = Class.forName("org.apache.spark.sql.classic.Dataset$")
    val m = dcls.getMethod("ofRows",
      Class.forName("org.apache.spark.sql.classic.SparkSession"),
      Class.forName(
        "org.apache.spark.sql.catalyst.plans.logical.LogicalPlan"))
    (dcls.getField("MODULE$").get(null), m)
  }

  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame = {
    val (module, m) = ofRowsM
    m.invoke(module, spark, plan)
      .asInstanceOf[org.apache.spark.sql.DataFrame]
  }
}
