package graft

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LogEvent
import org.apache.logging.log4j.core.appender.AbstractAppender

/** Runtime guard for the class of regression the plan-time WindowExec
  * sweep cannot see: Catalyst can rewrite a window between analysis and
  * execution (round 5's case: a foldable lit(0) partition key constant-
  * folded away, so the plan pin passed while every execution still ran
  * an unpartitioned WindowExec and warned). WindowExec only logs `No
  * Partition Defined` from doExecute, so the honest check EXECUTES every
  * batch query with a log capture attached — this is VERDICT r4 item 7
  * (fail on the warning in captured logs) as a spec instead of a Bench
  * grep, so it runs in every `sbt test`, not once per round.
  */
class WindowWarningSpec extends SparkTestBase {

  test("no batch query logs WindowExec 'No Partition Defined' when " +
      "executed (runtime twin of the plan-time sweep)") {
    val captured = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val ctx = LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val cfg = ctx.getConfiguration
    val appender = new AbstractAppender(
        "graft-window-warn", null, null, true, Array.empty) {
      override def append(e: LogEvent): Unit = {
        val m = e.getMessage.getFormattedMessage
        if (m.contains("No Partition Defined")) { captured.add(m); () }
      }
    }
    appender.start()
    cfg.getRootLogger.addAppender(appender, Level.WARN, null)
    ctx.updateLoggers()
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => streamingGated(n) }
        .flatMap { case (name, fn) =>
          captured.clear()
          fn(spark, sfSmoke).count()
          if (captured.isEmpty) None else Some(name)
        }
      assert(offenders.isEmpty,
        s"queries executing unpartitioned windows: $offenders")
    } finally {
      cfg.getRootLogger.removeAppender("graft-window-warn")
      appender.stop()
      ctx.updateLoggers()
    }
  }
}
