// Profile the streaming gates: constructs each named gated query with
// spark.graft.gate.progress=true so MemoryGate prints the per-micro-
// batch durationMs breakdown (addBatch / state commit / walCommit...)
// to stderr, and stamps wall-clock per query around construction+count.
//
// Usage (repo root, after sbt compile):
//   GRAFT_GATE_QUERIES=e19_stream_interval_join,e16_stream_sessions \
//   GRAFT_GATE_SF=/root/testdata/sf0.1 \
//   /opt/spark/bin/spark-shell --master 'local[32]' \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.session.timeZone=UTC \
//     --conf spark.sql.legacy.parquet.nanosAsLong=true \
//     --conf spark.sql.shuffle.partitions=32 \
//     --driver-class-path target/scala-2.13/classes \
//     -i tools/gate_profile.scala
// Pure ASCII.
val names = sys.env("GRAFT_GATE_QUERIES").split(",").map(_.trim)
  .filter(_.nonEmpty)
val sf = sys.env.getOrElse("GRAFT_GATE_SF", "/root/testdata/sf0.1")
spark.conf.set("spark.graft.gate.progress", "true")
names.foreach { n =>
  val t0 = System.nanoTime()
  val df = graft.SparkEntry.queries(n)(spark, sf)
  val t1 = System.nanoTime()
  df.count()
  val t2 = System.nanoTime()
  println(f"[gate-profile] $n construct=${(t1 - t0) / 1e9}%.2f " +
    f"post=${(t2 - t1) / 1e9}%.2f total=${(t2 - t0) / 1e9}%.2f")
}
sys.exit(0)
