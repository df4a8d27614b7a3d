package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}

/** Re-binds a DataFrame's logical plan to another session sharing the
  * same SparkContext.
  *
  * Lives under `org.apache.spark.sql` because `classic.Dataset.ofRows`
  * is `private[sql]` — this is the same doorway Spark's own connectors
  * use, kept to ONE function so the repo's Spark-internal surface stays
  * auditable. Used by `graft.streaming.MemoryGate` to execute gated
  * streaming runs on an isolated `newSession()` clone: the gate's
  * state-partition conf is set on the clone only, so a batch query
  * planned concurrently on the caller's session can never observe it
  * (the hazard a session-global conf swap + lock could only narrow,
  * not remove).
  */
object SessionRebind {
  def rebind(df: DataFrame, target: SparkSession): DataFrame =
    CDataset.ofRows(target.asInstanceOf[CSparkSession],
      df.asInstanceOf[CDataset[_]].queryExecution.logical)
}
