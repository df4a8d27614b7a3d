// Dump .explain("formatted") for a comma-separated list of declared
// queries into plans/<round>/<name>_<suffix>.txt - the before/after
// evidence files the optimization rounds commit.
//
// Usage (from the repo root, after sbt compile):
//   GRAFT_PLAN_QUERIES=s17_pq_adc_topk,s19_ivfpq_topk \
//   GRAFT_PLAN_OUT=plans/r16 GRAFT_PLAN_SUFFIX=after \
//   GRAFT_PLAN_SF=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master 'local[8]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.session.timeZone=UTC \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/dump_plans.scala
//
// Pure ASCII (spark-shell -i dies on UTF-8). Queries whose construction
// executes a streaming gate run it at the given SF; keep the SF small
// or the list short.
val names = sys.env("GRAFT_PLAN_QUERIES").split(",").map(_.trim)
  .filter(_.nonEmpty)
val outDir = sys.env.getOrElse("GRAFT_PLAN_OUT", "plans/r16")
val suffix = sys.env.getOrElse("GRAFT_PLAN_SUFFIX", "after")
val sf = sys.env.getOrElse("GRAFT_PLAN_SF", "/root/testdata/sf0.1")
java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
names.foreach { n =>
  try {
    val df = graft.SparkEntry.queries(n)(spark, sf)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"), p)
    println(s"[plans] wrote $outDir/${n}_$suffix.txt")
  } catch { case e: Throwable =>
    println(s"[plans] FAILED $n: ${e.getMessage}")
  }
}
sys.exit(0)
