package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Config-installable entry point: `--conf
  * spark.sql.extensions=graft.GraftExtensions` registers every graft
  * SQL function and the TopKPerKey planner strategy on EVERY session
  * built from that config — including `newSession()` clones and
  * SQL-only clients (Thrift/Connect) that never touch the Scala API.
  *
  * `functions.registerAll` + `plans.TopKPerKey.install` remain the
  * per-session alternative for attaching to an already-built session
  * (the driver harness's case); both paths share one function table
  * ([[functions.sqlFunctions]]) so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    functions.sqlFunctions.foreach { case (name, clazz, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
    functions.sqlTableFunctions.foreach { case (name, clazz, builder) =>
      ext.injectTableFunction(
        (FunctionIdentifier(name), new ExpressionInfo(clazz, name), builder))
    }
    ext.injectPlannerStrategy(_ => plans.TopKPerKeyStrategy)
    ext.injectPlannerStrategy(_ => plans.ServingScanStrategy)
    // round 15: flooded-window protection as engine behavior — the
    // plan-time twin of the WindowExec runtime warning, with the
    // GlobalRank closed-form rewrite behind spark.graft.window.guard
    ext.injectPlannerStrategy(_ => plans.WindowRewriteStrategy)
    ext.injectPreCBORule(_ => plans.WindowGuardRule)
  }
}
