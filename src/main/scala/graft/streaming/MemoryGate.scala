package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Shared scaffold for the oracle-gated streaming queries (e07, e16,
  * d10): run a streaming aggregation to completion into a named memory
  * sink and hand back the result table. One definition of the
  * stop/await discipline instead of a copy per gate.
  */
object MemoryGate {

  /** Complete-mode execution of `df` into memory table `name`: process
    * everything available, then stop — bounded-fixture semantics (a
    * production query keeps running; these gates terminate so the
    * driver can hash the result).
    */
  def complete(s: SparkSession, df: DataFrame, name: String): DataFrame =
    run(s, df, name, "complete")

  /** Append-mode execution — the mode stream-stream joins emit in
    * (each matched pair exactly once, no result-table replacement).
    */
  def append(s: SparkSession, df: DataFrame, name: String): DataFrame =
    run(s, df, name, "append")

  /** State partition count for the gated runs. A streaming query plans
    * one state store PER shuffle partition PER stateful operator PER
    * micro-batch — commit/snapshot overhead scales with the partition
    * count, not the data, and the gated fixtures are small. 8 keeps the
    * gates honest (real shuffles, real state machinery, multi-partition
    * parallelism) without paying 32 stores' bookkeeping per batch. A
    * production deployment sizes this to the cluster the same way —
    * state partitioning is fixed at the query's FIRST run and recorded
    * in its checkpoint, so it is a per-query deployment choice, not a
    * semantics choice (results are partition-count-independent; the
    * hash gate proves it).
    */
  private val StatePartitions = "8"

  /** Gate runs swap the session-global shuffle-partition conf for the
    * duration of the streaming run. The lock buys gate-vs-gate safety
    * only: two gates can no longer clobber each other's save/restore of
    * `spark.sql.shuffle.partitions`. A NON-gate query planned
    * concurrently on the same session still sees the gate's 8
    * partitions — callers that interleave batch planning with gate runs
    * (none do today; Verify and Bench run queries sequentially) would
    * need the gate moved onto `s.newSession()` with the conf set there.
    */
  private val gateLock = new Object

  /** One definition of the start/process/stop/await discipline. */
  private def run(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = gateLock.synchronized {
    val key = "spark.sql.shuffle.partitions"
    val saved = s.conf.get(key)
    s.conf.set(key, StatePartitions)
    try {
      val q = df.writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .start()
      try q.processAllAvailable()
      finally { q.stop(); q.awaitTermination(30000) }
    } finally s.conf.set(key, saved)
    s.table(name)
  }
}
