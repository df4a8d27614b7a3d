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

  /** One definition of the start/process/stop/await discipline. */
  private def run(s: SparkSession, df: DataFrame, name: String,
      mode: String): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name)
      .start()
    try q.processAllAvailable() finally { q.stop(); q.awaitTermination(30000) }
    s.table(name)
  }
}
