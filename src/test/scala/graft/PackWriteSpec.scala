package graft

import org.apache.spark.sql.functions._

import graft.ops.Layout

/** The pack WRITE driven by the p12/p13 manifest (Layout.packWrite) and
  * its audit (Layout.packReconcile). SortedExportSpec's discipline: the
  * contracts are proven from the WRITTEN FILES, because that is what a
  * training-data loader sees —
  *
  *  - files are key-disjoint on (source, shard, chunk, chunk_off) and
  *    internally sorted, covering every slice exactly once;
  *  - within a chunk, slices tile [0, PackLen) contiguously, and every
  *    chunk except a (source, shard)'s last is exactly full;
  *  - reconciliation is empty on an honest write, non-empty on a
  *    tampered one (the audit is not vacuous);
  *  - re-running the write is a content no-op (resumability).
  */
class PackWriteSpec extends SparkTestBase {

  private val PackLen = 512 // mirror of Pipeline.PackLen (private there)

  test("packWrite emits key-disjoint, internally sorted shards whose " +
      "chunks tile exactly; reconcile is empty; re-run is a no-op") {
    import spark.implicits._
    val dir = tmpDir("pack-write") + "/pack"
    Layout.packWrite(spark, sfVerify, dir, 4)

    val slices = ops.Pipeline.queries("p13_pack_slices")(spark, sfVerify)
    val total = slices.count()

    // ---- file-level contract (what a concatenating reader sees) ----
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted
    assert(files.length > 1, "range partitioning must produce >1 shard")
    // order rows by the composite key, encoded so tuple comparison works
    def keyed(path: String) =
      spark.read.parquet(path)
        .select($"source", $"shard", $"chunk", $"chunk_off")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val perFile = files.map { f =>
      val rows = keyed(f)
      assert(rows.sameElements(rows.sorted),
        s"shard not internally sorted by the chunk key: $f")
      (rows.head, rows.last, rows.length.toLong)
    }
    val byRange = perFile.sortBy(_._1)
    byRange.sliding(2).foreach {
      case Array((_, prevMax, _), (curMin, _, _)) =>
        assert(implicitly[Ordering[(String, Long, Long, Long)]]
            .lt(prevMax, curMin),
          s"shard key ranges overlap: $prevMax >= $curMin")
      case _ =>
    }
    assert(byRange.map(_._3).sum == total,
      "concatenated shards must cover every slice exactly once")

    // ---- chunk tiling: contiguous offsets, full chunks except last --
    val written = spark.read.parquet(dir)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"shard", $"chunk").orderBy($"chunk_off")
    val gaps = written
      .withColumn("prev_end",
        lag($"chunk_off" + $"n_slice_toks", 1, 0L).over(w))
      .filter($"chunk_off" =!= $"prev_end")
    assert(gaps.count() == 0,
      "slices must tile each chunk contiguously from offset 0")
    val lastChunk = written.groupBy($"source", $"shard")
      .agg(max($"chunk").as("last_chunk"))
    val nonFull = written.groupBy($"source", $"shard", $"chunk")
      .agg(sum($"n_slice_toks").as("chunk_toks"))
      .join(lastChunk, Seq("source", "shard"))
      .filter($"chunk" =!= $"last_chunk" && $"chunk_toks" =!= PackLen)
    assert(nonFull.count() == 0,
      s"every non-final chunk must hold exactly $PackLen tokens")

    // ---- reconcile: clean write passes, tampered write is caught ----
    assert(Layout.packReconcile(spark, sfVerify, dir).count() == 0,
      "reconciliation of an honest write must be empty")
    val tampered = tmpDir("pack-write") + "/tampered"
    // drop one slice — the exact failure a partial job leaves behind
    val victim = written.orderBy($"source", $"shard", $"chunk").limit(1)
    written.join(victim.select($"source".as("vs"), $"shard".as("vh"),
        $"chunk".as("vc"), $"chunk_off".as("vo")),
        $"source" === $"vs" && $"shard" === $"vh" &&
          $"chunk" === $"vc" && $"chunk_off" === $"vo", "left_anti")
      .write.mode("overwrite").parquet(tampered)
    val bad = Layout.packReconcile(spark, sfVerify, tampered)
    assert(bad.count() >= 1, "reconcile must flag a missing slice")

    // ---- resumability: a re-run writes identical content ------------
    val fpBefore = written.agg(md5(concat_ws(",", sort_array(
      collect_list(concat_ws(":", $"source", $"shard", $"chunk",
        $"chunk_off", $"doc_id", $"n_slice_toks", $"slice_md5"))))))
      .head().getString(0)
    Layout.packWrite(spark, sfVerify, dir, 4)
    val fpAfter = spark.read.parquet(dir).agg(md5(concat_ws(",", sort_array(
      collect_list(concat_ws(":", $"source", $"shard", $"chunk",
        $"chunk_off", $"doc_id", $"n_slice_toks", $"slice_md5"))))))
      .head().getString(0)
    assert(fpBefore == fpAfter,
      "re-running the pack write must reproduce identical content")
    assert(Layout.packReconcile(spark, sfVerify, dir).count() == 0,
      "reconciliation must still be empty after the re-run")
  }
}
