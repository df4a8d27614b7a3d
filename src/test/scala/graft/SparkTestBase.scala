package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session per suite (one JVM-wide session is fine: getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.session
  val sfSmoke = "/root/testdata/sf0.001"
  val sfVerify = "/root/testdata/sf0.01"

  /** Run `body` with session confs overridden, restoring (or unsetting)
    * every key afterwards — the session is shared JVM-wide across
    * suites, so any conf override MUST go through here or it leaks into
    * whichever suite runs next.
    */
  /** Fresh temp directory, recursively deleted at JVM exit (File
    * .deleteOnExit never removes non-empty directories, so the ad-hoc
    * per-suite variants of this helper leaked fixture-sized data every
    * run).
    */
  def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$name")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def del(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(del)); f.delete(); ()
      }
      del(d.toFile)
    }))
    d.toString
  }

  def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val saved = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

object SparkTestBase {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test")
    // The config-installed extension path under test in
    // GraftExtensionsSpec; per-suite registerAll calls stay, proving
    // the two registration paths coexist.
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
