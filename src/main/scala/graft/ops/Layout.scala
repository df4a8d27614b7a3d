package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout maintenance — the write patterns that keep a 100 TB
  * corpus scannable (no query surface; contracts proven from the written
  * files by LayoutSpec, like SortedExportSpec's range-sharded export):
  *
  *  - [[compact]]: the small-files problem. Streaming ingest and
  *    fine-grained partitioning leave behind thousands of KB-sized
  *    parquet files; every one costs a task launch, a footer read, and a
  *    namenode entry, so scan cost becomes file-count-bound instead of
  *    byte-bound. Compaction rewrites a directory into
  *    ceil(totalBytes / targetBytes) files. Only file METADATA (the
  *    size listing) touches the driver; rows move executor-to-executor
  *    through a round-robin repartition.
  *
  *  - [[zorderValue]]: multi-dimensional clustering. A single-column
  *    sort gives tight per-file min/max on that column only; writing in
  *    Z-order (Morton-interleaved) ranges gives every file a tight range
  *    on BOTH dimensions, so parquet footer pruning works for filters on
  *    either — the standard layout for fact tables queried along two
  *    independent axes.
  */
object Layout {

  /** Parquet data files under `dir`, RECURSIVE (skips _SUCCESS etc.) —
    * partitioned datasets keep their files in key=value subdirectories,
    * and a top-level-only listing would see zero bytes there.
    */
  private def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(p, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.endsWith(".parquet"))
        buf += ((st.getPath.toString, st.getLen))
    }
    buf.toSeq
  }

  /** Rewrite the parquet directory `inDir` into `outDir` as
    * ceil(totalBytes / targetBytes) files (at least one). Returns the
    * file count written. Row-identity (multiset) is preserved; row
    * order is not promised — compaction is a layout operation, and
    * callers who need order compose it with the sorted-shard export.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    // in-place compaction would truncate the input under the lazy read
    // (overwrite deletes outDir before the scan tasks run). Compare
    // FULLY QUALIFIED paths: raw-URI comparison passes for the same
    // physical dir spelled differently ("/d" vs "file:/d" vs relative).
    val conf = spark.sessionState.newHadoopConf()
    def qualified(d: String): Path = {
      val p = new Path(d); p.getFileSystem(conf).makeQualified(p)
    }
    require(qualified(inDir) != qualified(outDir),
      s"compact cannot write in place: $inDir")
    val files = dataFiles(spark, inDir)
    require(files.nonEmpty, s"no parquet data files under $inDir")
    val totalBytes = files.map(_._2).sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    // repartition(n) (round-robin) balances output file sizes regardless
    // of input skew; coalesce(n) would be shuffle-free but chains input
    // files together unevenly and can't split a giant input file.
    spark.read.parquet(inDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    n
  }

  /** Z-value of two key columns, each normalized from [lo, hi] into
    * 16-bit buckets then Morton-interleaved (16+16 bits keeps the
    * normalization exact in doubles and 65k buckets per dimension is
    * far finer than any realistic file count). Bounds come from the
    * caller — at scale they are known dimension stats, not a scan.
    */
  def zorderValue(a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long): Column = {
    def bucket(c: Column, lo: Long, hi: Long): Column =
      // clamp then scale to [0, 65535]
      floor((least(greatest(c, lit(lo)), lit(hi)) - lit(lo))
        .cast("double") / lit(math.max(1L, hi - lo)) * 65535.0)
        .cast("long")
    graft.functions.ZOrder64(bucket(a, aLo, aHi), bucket(b, bLo, bHi))
  }

  /** Write `df` to `outDir` clustered by the Z-order of the two key
    * columns: range-partition on the z-value (sampled ranges — no
    * global sort), sort within each shard, drop the transient z column
    * on the way out. `shards` is the target file count.
    */
  def zorderWrite(df: DataFrame, outDir: String, shards: Int,
      a: Column, aLo: Long, aHi: Long,
      b: Column, bLo: Long, bHi: Long): Unit = {
    df.withColumn("__z", zorderValue(a, aLo, aHi, b, bLo, bHi))
      .repartitionByRange(shards, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** The pack WRITE the p12 manifest describes: materialize p13's
    * (document × chunk) slice frame as range-partitioned parquet shards
    * keyed by (source, shard, chunk, chunk_off) — the sorted-shard
    * export discipline (SortedExportSpec), so files are key-disjoint
    * and internally ordered, and a training-data loader reconstructs
    * any chunk's token stream by reading one file region in order. The
    * write is DETERMINISTIC (the slice frame is a pure function of the
    * corpus — windowed cumsum over a total per-(source, shard) order),
    * so re-running is a no-op in content terms: same slices, same
    * order, reconciliation unchanged — the resumability contract a
    * 100 TB packing job restarts on. PackWriteSpec proves all of it
    * from the written files.
    */
  def packWrite(spark: SparkSession, dir: String, outDir: String,
      shards: Int): Unit =
    Pipeline.queries("p13_pack_slices")(spark, dir)
      .repartitionByRange(shards, col("source"), col("shard"),
        col("chunk"), col("chunk_off"))
      .sortWithinPartitions(col("source"), col("shard"), col("chunk"),
        col("chunk_off"))
      .write.mode("overwrite").parquet(outDir)

  /** Reconcile a written pack directory against the manifest: per
    * (source, shard, chunk), compare the written files' slice count,
    * token sum, and an order-insensitive content fingerprint (md5 over
    * the sorted per-slice digests) against what the manifest arithmetic
    * says must be there. Returns the mismatch frame — EMPTY means the
    * written pack is exactly the manifest's pack; any row names the
    * chunk and both sides' numbers. Runs as two aggregations and one
    * full outer join on the chunk key: corpus-scale cheap, no driver
    * collection — the post-write audit a pack job ships with.
    */
  def packReconcile(spark: SparkSession, dir: String,
      outDir: String): DataFrame = {
    def perChunk(df: DataFrame, pfx: String): DataFrame =
      df.groupBy(col("source"), col("shard"), col("chunk"))
        .agg(count(lit(1)).as(s"${pfx}_slices"),
          sum(col("n_slice_toks")).as(s"${pfx}_toks"),
          md5(concat_ws(",", sort_array(collect_list(concat_ws(":",
            col("doc_id"), col("chunk_off"), col("slice_md5"))))))
            .as(s"${pfx}_fp"))
    val expected = perChunk(
      Pipeline.queries("p13_pack_slices")(spark, dir), "e")
    val written = perChunk(spark.read.parquet(outDir), "w")
    expected.join(written, Seq("source", "shard", "chunk"), "full_outer")
      .filter(col("e_slices").isNull || col("w_slices").isNull ||
        col("e_slices") =!= col("w_slices") ||
        col("e_toks") =!= col("w_toks") || col("e_fp") =!= col("w_fp"))
  }
}
