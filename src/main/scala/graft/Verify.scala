package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: Verify <sfDir> <outDir> [namePrefix...]")
      sys.exit(2)
    }
    val (sfDir, outDir) = (args(0), args(1))
    // optional extra args: only dump queries whose name starts with one
    // of the given prefixes (builder-side iteration; the driver always
    // passes exactly two args and gets the full board)
    val prefixes = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); Spark 4 errors without
      // this flag (Tables.load converts the resulting long to micros).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // see Bench: the 100-entry default codegen cache thrashes under
      // the board's unit count and recompiles every stage per query
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "8192"))
      // FAIR scheduling for the concurrent streaming-gate phase (pools
      // are created on first use; batch queries run in the default
      // pool exactly as before — FIFO within a pool)
      .config("spark.scheduler.mode", "FAIR")
    // builder-side plan-switch re-gating (e.g. forcing d34's band
    // candidate generator or search()'s join path against the full
    // oracle): SPARK_GRAFT_CONFS="k=v,k=v". The driver never sets it.
    sys.env.get("SPARK_GRAFT_CONFS").toSeq
      .flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)
      .map(_.split("=", 2)).foreach(kv => builder.config(kv(0), kv(1)))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Fixture-drift canary (round-6 postmortem): if a regeneration ships
    // an events.ts encoding normalizeTs doesn't cover, say so ONCE here
    // by name — otherwise it surfaces as 9 scattered query errors.
    // A query that throws must be a VISIBLE red row, not an absence: the
    // round-6 fixture regression surfaced as a *smaller* CORRECTNESS file
    // because failures only printed to stderr. Collect them and write an
    // _errors.json sidecar the driver (and the judge) can read.
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // The canary itself must not be able to abort the run: a missing or
    // unreadable events.parquet would otherwise throw BEFORE any query
    // executed — no _errors.json, no partial results — which is the
    // exact silent-absence failure mode the canary exists to prevent.
    // Degrade to a named drift report instead and let the query loop
    // surface per-query failures normally.
    try {
      val tsType = Tables.load(spark, sfDir, "events").schema("ts").dataType
      if (tsType != org.apache.spark.sql.types.TimestampType)
        System.err.println(s"[verify] FIXTURE DRIFT: events.ts loads as " +
          s"$tsType, not TIMESTAMP — extend Tables.normalizeTs; expect " +
          "unix_micros/withWatermark failures below")
    } catch { case e: Throwable =>
      System.err.println(s"[verify] FIXTURE DRIFT: events table failed " +
        s"to load: ${e.getMessage} — expect event-query failures below")
      errors("_fixture_canary") =
        Option(e.getMessage).getOrElse(e.getClass.getName)
    }
    val selected = SparkEntry.queries.filter { case (name, _) =>
      prefixes.isEmpty || prefixes.exists(name.startsWith)
    }
    def dump(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors.synchronized {
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName)
        }
      }
    // Batch queries run serially (they saturate the cores; overlap
    // buys nothing and muddies failures). The STREAMING-GATED queries
    // run concurrently on FAIR scheduler pools: each gate's wall time
    // is per-micro-batch trigger FLOOR — idle driver/trigger latency,
    // not compute (round 12 measured the floor immovable at equal
    // gate strength) — so independent gates overlap nearly perfectly.
    // Correctness is untouched: per-gate checkpoints, state dirs, and
    // uniquely named memory-sink tables; the driver's DuckDB hash
    // gate re-proves it every round. Bench stays serial — a timing
    // must price its query alone.
    val (gated, batch) =
      selected.partition { case (n, _) => SparkEntry.streamingGated(n) }
    batch.foreach { case (name, fn) => dump(name, fn) }
    if (gated.nonEmpty) {
      val width = math.min(4, gated.size)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(width)
      try {
        val tasks = gated.toSeq.zipWithIndex.map { case ((name, fn), i) =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              // local properties are per-thread: each worker plans its
              // gates in its own FAIR pool, so one gate's micro-batch
              // jobs never starve another's behind a FIFO queue
              spark.sparkContext
                .setLocalProperty("spark.scheduler.pool", s"gate${i % width}")
              dump(name, fn)
            }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Always written (empty {} on a green run) so its absence vs emptiness
    // is itself a signal. Exit stays 0 either way — the driver must still
    // run the DuckDB compare for the queries that DID succeed.
    val errJson = errors
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.keys.mkString(", "))
    spark.stop()
  }
}
