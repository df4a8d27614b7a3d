package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins the streaming state-store backend: every stateful gate must run
  * on RocksDB, not the heap-backed default. The conf alone proves
  * nothing (a typo'd provider class name fails only at query start, and
  * only for queries with stateful operators), so this spec runs a real
  * stateful query and asserts RocksDB's own metrics appear in the
  * progress — the backend was LOADED and served the state.
  */
class RocksDbStateStoreSpec extends SparkTestBase {

  test("MemoryGate confs name the RocksDB provider and the class loads") {
    val provider = MemoryGate.StateStoreConfs.toMap
      .apply("spark.sql.streaming.stateStore.providerClass")
    assert(provider.contains("RocksDBStateStoreProvider"))
    // fail here, not at the first gated query, if the class name rots
    Class.forName(provider)
    ()
  }

  test("a stateful streaming query reports RocksDB state-store metrics") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val source = MemoryStream[(Long, Timestamp)]
    val agg = source.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "1 hour"), $"user_id")
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rocksdb_probe").start()
    try {
      def t(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
      source.addData((1L, t(0)), (1L, t(1)), (2L, t(2)))
      q.processAllAvailable()
      val metrics = q.lastProgress.stateOperators.toSeq
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      assert(metrics.exists(_.toLowerCase.contains("rocksdb")),
        s"no rocksdb custom metrics in state operator progress: $metrics")
    } finally { q.stop(); q.awaitTermination(30000) }
    // two (window, user) groups: user 1 twice, user 2 once
    assert(spark.table("rocksdb_probe").count() == 2)
  }
}
