package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The persisted dedup index — [[AnnIndex]]'s twin for the admission
  * queries (d13 exact, d17 near): at 100 TB an ingest service does NOT
  * recompute the corpus fingerprint set and LSH band index inside every
  * admission run (the one-plan d13/d17 board formulations do, because
  * they gate build+probe together); it probes a WRITTEN index and
  * appends what it admits. This module is that split (DedupIndexSpec):
  * [[build]] writes the two probe-side artifacts, [[probe]] decides a
  * batch's admission with a plan that scans NO corpus text and prunes
  * both artifact scans to the batch's collision buckets, [[append]]
  * upserts admitted docs idempotently.
  *
  * Artifact layout (parquet under `indexDir`):
  *
  *  - `fps/`   fpb=<hex nibble>/ (doc_id, fp) — the exact-dup
  *    fingerprint table (d13's md5-of-lowercased-text), DIRECTORY-
  *    PARTITIONED by the fingerprint's first nibble: a batch's probe
  *    prunes to the nibbles it actually carries.
  *  - `bands/` pb=<bucket>/ (band, doc_id, mh0..mh5) — the LSH band
  *    index (d17's 3 bands × 2 MinHash slots), partitioned by a
  *    NPb-way hash of the band value. Each row CARRIES its document's
  *    full 6-slot signature, so candidate verification (estimated
  *    Jaccard ≥ 0.5, d03/d17's rule) needs no second corpus lookup —
  *    3× signature duplication buys a probe that touches exactly one
  *    artifact per admission rule.
  *  - `tombstones/` (doc_id) — logically deleted docs (absent until
  *    the first [[delete]]); probes anti-join it, [[compact]] erases
  *    the rows and clears it — the erasure leg, mirroring AnnIndex.
  *
  * Scale shape of [[probe]]: the batch side is signed locally (narrow
  * map over the batch's own text — the only text in the plan); its
  * distinct partition keys resolve driver-side (≤16 nibbles + ≤NPb
  * buckets — tiny, the AnnIndex probed-cells discipline) into
  * IN-filters that prune the artifact scans at listing time; every
  * join is an equi-join on fp or band; verification compares in-row
  * signature columns. Nothing is quadratic in the corpus, and the
  * corpus contributes only pruned index rows.
  */
object DedupIndex {

  /** Band-hash partition fan-out. 32 directories keeps listing cheap
    * while a small batch (the steady-state ingest tick) still collides
    * into a strict subset — the prunable case the spec pins.
    */
  private val NPb = 32

  private def fpOf(d: DataFrame): DataFrame =
    d.select(col("doc_id"), md5(lower(col("text"))).as("fp"))

  /** (doc_id, band, mh0..mh5): each band row carrying its signature. */
  private def bandRows(s: SparkSession, d: DataFrame): DataFrame = {
    val sigs = Dedup.minhashCoreOf(s, d)
    Dedup.bandsOf(s, sigs).join(sigs, "doc_id")
  }

  /** Build (or REBUILD) the index from a corpus snapshot. The whole
    * index is written under `indexDir.build.tmp` and swapped in as one
    * unit (`ArtifactSwap.buildSwap`, shared with AnnIndex.buildFrom):
    * a rebuild that dies mid-way can never leave fps from the new
    * corpus next to bands from the old one — probes in the window keep
    * reading the complete old snapshot. Tombstones carry across the
    * swap filtered to doc_ids the new snapshot still holds (see
    * buildSwap on why an unfiltered carry recreates the orphan-shadow
    * state).
    */
  def build(s: SparkSession, corpus: DataFrame, indexDir: String): Unit =
    ArtifactSwap.buildSwap(s, indexDir, "doc_id", tmp => {
      fpOf(corpus)
        .withColumn("fpb", substring(col("fp"), 1, 1))
        .write.mode("overwrite").partitionBy("fpb")
        .parquet(s"$tmp/fps")
      bandRows(s, corpus)
        .withColumn("pb", pmod(xxhash64(col("band")), lit(NPb)))
        .write.mode("overwrite").partitionBy("pb")
        .parquet(s"$tmp/bands")
    }, tmp => s.read.parquet(s"$tmp/fps"))

  private def tombstones(s: SparkSession, indexDir: String): DataFrame =
    ArtifactSwap.tombstones(s, indexDir, "doc_id")

  /** Logical deletion — the erasure leg of the ADMISSION index: a
    * document removed from the corpus (takedown, right-to-erasure,
    * curation reversal) must immediately stop REJECTING new documents
    * that duplicate it (its text is no longer in the corpus, so a
    * fresh copy is admissible again), without rewriting the
    * corpus-sized artifacts. Tombstoned doc_ids are anti-joined out of
    * both probe paths; [[compact]] later erases their fingerprint and
    * signature rows physically — which matters here beyond hygiene:
    * an md5 fingerprint and a MinHash signature are DERIVED PERSONAL
    * DATA when the document is. Idempotent, and FILTERED TO THE
    * REGISTER (see `ArtifactSwap.deleteIds` — an orphan tombstone
    * would silently shadow a future append). A
    * deleted-but-uncompacted doc_id cannot be re-[[append]]ed (its
    * rows still exist, so the register anti-join skips it); revival is
    * compact-then-append, the same unambiguous order as AnnIndex.
    */
  def delete(s: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    import s.implicits._
    ArtifactSwap.recover(s, indexDir, s"$indexDir/fps", s"$indexDir/bands")
    // BOTH artifacts' memberships: a deletion landing while an append
    // is torn (bands written, fps not) must stick — see deleteIds
    ArtifactSwap.deleteIds(s, indexDir, "doc_id", Seq(
      s.read.parquet(s"$indexDir/fps").select($"doc_id"),
      s.read.parquet(s"$indexDir/bands").select($"doc_id")), ids)
  }

  /** The COMPACT GO/NO-GO an operator acts on (s46's admission-index
    * sibling, driver-gated as d35), computed from the artifacts alone
    * — zero corpus bytes. One row:
    *
    *  - `n_tomb`/`tomb_frac` — pending tombstones: every probe pays
    *    the anti-join, and a tombstoned doc's md5 fingerprint +
    *    MinHash signature are DERIVED PERSONAL DATA when the document
    *    is — erasure wants them physically rewritten out, which is
    *    exactly what [[compact]] does;
    *  - `n_band_values`/`n_band_rows_live`/`max_bucket`/
    *    `band_imbalance` — λ = V·Σn²/(Σn)² over the LIVE band-value
    *    buckets (the probe's candidate generator; a flooded band
    *    value makes per-probe candidate cost quadratic in the
    *    bucket);
    *  - `tomb_exceeded`/`band_exceeded`/`compact` — the decision,
    *    both legs exposed (the s46 contract).
    *
    * A fresh or just-compacted index reads n_tomb = 0 (the spec pins
    * the decision flipping false across a delete → compact cycle).
    */
  def maintenanceDecision(s: SparkSession, indexDir: String,
      tombMax: Double = Dedup.DedupTombMax,
      lambdaMax: Double = Dedup.DedupBandLambdaMax): DataFrame = {
    import s.implicits._
    val tomb = tombstones(s, indexDir).select($"doc_id".as("t_id"))
    val nd = s.read.parquet(s"$indexDir/fps")
      .agg(count(lit(1)).as("n_docs"))
    val nt = tomb.agg(count(lit(1)).as("n_tomb"))
    val per = s.read.parquet(s"$indexDir/bands")
      .select($"doc_id", $"band")
      .join(broadcast(tomb), $"doc_id" === $"t_id", "left_anti")
      .groupBy($"band").agg(count(lit(1)).as("n"))
    val bm = per.agg(count(lit(1)).as("n_band_values"),
      sum($"n").as("n_band_rows_live"),
      max($"n").as("max_bucket"),
      sum($"n" * $"n").as("ss"))
    val tombFrac = $"n_tomb".cast("double") / $"n_docs".cast("double")
    val lam = ($"n_band_values" * $"ss").cast("double") /
      ($"n_band_rows_live" * $"n_band_rows_live").cast("double")
    nd.crossJoin(broadcast(nt)).crossJoin(broadcast(bm))
      .select($"n_docs", $"n_tomb",
        round(tombFrac, 6).as("tomb_frac"),
        $"n_band_values", $"n_band_rows_live", $"max_bucket",
        round(lam, 6).as("band_imbalance"),
        (tombFrac >= lit(tombMax)).as("tomb_exceeded"),
        (lam > lit(lambdaMax)).as("band_exceeded"),
        (tombFrac >= lit(tombMax) ||
          lam > lit(lambdaMax)).as("compact"))
  }

  /** Fold accumulated tombstones into the artifacts: rewrite fps and
    * bands WITHOUT the deleted doc_ids and clear the tombstone table.
    * Each filtered copy goes to a durable temp directory and swaps in
    * via metadata renames ([[ArtifactSwap]]) — never an
    * overwrite-in-place of the live index. Tombstones are cleared
    * LAST, so a re-run after any crash re-filters and finishes;
    * probes in any intermediate window still anti-join the surviving
    * tombstones.
    */
  def compact(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val fpsDst = new org.apache.hadoop.fs.Path(s"$indexDir/fps")
    val bandsDst = new org.apache.hadoop.fs.Path(s"$indexDir/bands")
    val fpsTmp = new org.apache.hadoop.fs.Path(s"$indexDir/fps.tmp")
    val bandsTmp = new org.apache.hadoop.fs.Path(s"$indexDir/bands.tmp")
    val fs = fpsDst.getFileSystem(s.sparkContext.hadoopConfiguration)
    ArtifactSwap.recover(s, indexDir)
    ArtifactSwap.recoverSwap(fs, fpsDst, fpsTmp)
    ArtifactSwap.recoverSwap(fs, bandsDst, bandsTmp)
    val tomb = tombstones(s, indexDir)
    if (tomb.isEmpty) return
    val fps = s.read.parquet(fpsDst.toString)
    fps.join(tomb, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"fp", $"fpb".cast("string").as("fpb"))
      .write.mode("overwrite").partitionBy("fpb")
      .parquet(fpsTmp.toString)
    val bands = s.read.parquet(bandsDst.toString)
    bands.join(tomb, Seq("doc_id"), "left_anti")
      .select((bands.columns.filter(_ != "pb").map(col) :+
        col("pb").cast("long").as("pb")): _*)
      .write.mode("overwrite").partitionBy("pb")
      .parquet(bandsTmp.toString)
    ArtifactSwap.swapDirs(fs, fpsTmp, fpsDst)
    ArtifactSwap.swapDirs(fs, bandsTmp, bandsDst)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/tombstones"), true)
  }

  /** Decide a batch's admission against the index. Returns one row per
    * batch doc with BOTH rule families' raw verdicts, so callers
    * aggregate whichever policy they run (d13's exact funnel, d17's
    * near funnel, or exact-then-near):
    *
    *  - `fp_in_corpus`  — exact fingerprint already indexed (d13's
    *    corpus rejection);
    *  - `fp_batch_rn`   — 1-based rank within the batch per
    *    fingerprint, ordered by doc_id (d13's first-copy-wins: rn > 1
    *    is a within-batch exact dup);
    *  - `near_rej_corpus` — some indexed doc shares a band AND
    *    verifies at estimated Jaccard ≥ 0.5 (d17's corpus rejection);
    *  - `near_rej_batch`  — some verified LOWER-id batch neighbor
    *    (d17's greedy first-wins within the batch).
    */
  def probe(s: SparkSession, indexDir: String, batch: DataFrame): DataFrame = {
    import s.implicits._
    // heal any torn swap FIRST — recovery must not depend on the
    // crashed operation (a compact, a rebuild) being the one retried
    ArtifactSwap.recover(s, indexDir, s"$indexDir/fps", s"$indexDir/bands")
    // ---- exact half -------------------------------------------------
    val bFp = fpOf(batch).localCheckpoint()
    val rawNibbles = bFp
      .select(substring($"fp", 1, 1)).distinct().collect().map(_.getString(0))
    val fpsTbl = s.read.parquet(s"$indexDir/fps")
    // IN-literal type must match the inferred partition column type
    // (the same guard as pb below): a corpus whose fingerprints' first
    // nibbles are ALL 0-9 infers fpb as int, and string literals would
    // demote the partition filter to post-scan. Alphabetic batch
    // nibbles can then be DROPPED, not cast — an int-inferred table
    // has no a-f partitions, so they can't match anything.
    val nibbles: Seq[Any] =
      if (fpsTbl.schema("fpb").dataType ==
          org.apache.spark.sql.types.IntegerType)
        rawNibbles.toSeq.collect { case n if n.forall(_.isDigit) => n.toInt }
      else rawNibbles.toSeq
    // tombstoned docs must stop rejecting: their rows are anti-joined
    // out of BOTH probe paths until compact erases them (broadcast —
    // deletions are rare relative to corpus size, see delete/compact)
    val tomb = broadcast(tombstones(s, indexDir)
      .withColumnRenamed("doc_id", "del_id"))
    val corpusFp = fpsTbl
      .filter(if (nibbles.isEmpty) lit(false) else $"fpb".isin(nibbles: _*))
      .join(tomb, $"doc_id" === $"del_id", "left_anti")
      .select($"fp").distinct().withColumn("fp_in_corpus", lit(true))
    val wFp = Window.partitionBy($"fp").orderBy($"doc_id")
    val exact = bFp
      .join(corpusFp, Seq("fp"), "left")
      .withColumn("fp_batch_rn", row_number().over(wFp))
      .select($"doc_id",
        coalesce($"fp_in_corpus", lit(false)).as("fp_in_corpus"),
        $"fp_batch_rn")

    // ---- near half --------------------------------------------------
    // batch band rows, materialized once: the corpus probe, the
    // batch-batch self-join and the partition-key resolution all fork
    // from here (six-consumer rationale, d17)
    val bBands = bandRows(s, batch).localCheckpoint()
    val pbs = bBands.select(pmod(xxhash64($"band"), lit(NPb)))
      .distinct().collect().map(_.getLong(0))
    val idx = s.read.parquet(s"$indexDir/bands")
    // IN-literal type must match the inferred partition column type,
    // or the filter demotes to post-scan and pruning dies (the
    // AnnIndex literal-type guard)
    val pbLits: Seq[Any] =
      if (idx.schema("pb").dataType ==
          org.apache.spark.sql.types.IntegerType) pbs.toSeq.map(_.toInt)
      else pbs.toSeq
    val matches = (0 until 6).map(j =>
      when(col(s"c$j") === col(s"b$j"), 1).otherwise(0)).reduce(_ + _)
    val cIdx = idx
      .filter(if (pbLits.isEmpty) lit(false) else $"pb".isin(pbLits: _*))
      .join(tomb, $"doc_id" === $"del_id", "left_anti")
      .select($"band" +: $"doc_id".as("c_id") +:
        (0 until 6).map(j => col(s"mh$j").as(s"c$j")): _*)
    val bSide = bBands
      .select($"band" +: $"doc_id".as("b_id") +:
        (0 until 6).map(j => col(s"mh$j").as(s"b$j")): _*)
    val rejCorpus = cIdx.join(bSide, "band")
      .withColumn("est", round(matches / lit(6.0), 6))
      .filter($"est" >= 0.5)
      .select($"b_id".as("doc_id")).distinct()
      .withColumn("near_rej_corpus", lit(true))
    val aSide = bBands
      .select($"band" +: $"doc_id".as("c_id") +:
        (0 until 6).map(j => col(s"mh$j").as(s"c$j")): _*)
    val rejBatch = aSide.join(bSide, "band")
      .filter($"c_id" < $"b_id")
      .withColumn("est", round(matches / lit(6.0), 6))
      .filter($"est" >= 0.5)
      .select($"b_id".as("doc_id")).distinct()
      .withColumn("near_rej_batch", lit(true))

    exact
      .join(rejCorpus, Seq("doc_id"), "left")
      .join(rejBatch, Seq("doc_id"), "left")
      .select($"doc_id", $"fp_in_corpus", $"fp_batch_rn",
        coalesce($"near_rej_corpus", lit(false)).as("near_rej_corpus"),
        coalesce($"near_rej_batch", lit(false)).as("near_rej_batch"))
  }

  /** Upsert admitted docs: doc_ids already indexed are skipped (the
    * fps table is the membership register — one narrow anti-join), so
    * re-running the same append is a no-op; the same at-least-once
    * absorption contract as `AnnIndex.upsert`, proven against a
    * foreachBatch redelivery in the spec.
    *
    * Write ORDER is the crash-safety contract: bands FIRST, the fps
    * register LAST. A crash between the two leaves band rows whose fp
    * is unregistered — harmless (band rows only ever feed existence
    * checks, extra copies change no verdict, and the docs just look
    * near-indexed-but-not-exact-indexed until healed) — and the re-run
    * HEALS it: the anti-join sees the register missing, so both halves
    * rewrite (the duplicate band rows are absorbed by probe's
    * distinct). The reverse order would be a silent-dup trap: fp
    * registered but bands crash-torn away means every retry anti-joins
    * the docs out, their band rows never exist, and future
    * near-duplicates of them sail through admission forever.
    */
  def append(s: SparkSession, indexDir: String, admitted: DataFrame): Unit = {
    import s.implicits._
    ArtifactSwap.recover(s, indexDir, s"$indexDir/fps", s"$indexDir/bands")
    // BEFORE inserting: clear tombstones that mask nothing (a compact
    // died between its swaps and its tombstone clear) — a doc being
    // re-admitted under a surviving orphan would otherwise never
    // reject its own duplicates again
    ArtifactSwap.clearOrphanTombstones(s, indexDir, "doc_id", Seq(
      s.read.parquet(s"$indexDir/fps").select($"doc_id"),
      s.read.parquet(s"$indexDir/bands").select($"doc_id")))
    val existing = s.read.parquet(s"$indexDir/fps").select($"doc_id")
    // eager: both writes below must see the PRE-append membership
    // (lazily, the bands write would re-read fps after the fps append
    // and drop its own delta — the AnnIndex.upsert corruption mode)
    val fresh = admitted.select($"doc_id", $"text")
      .join(existing, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    bandRows(s, fresh)
      .withColumn("pb", pmod(xxhash64(col("band")), lit(NPb)))
      .write.mode("append").partitionBy("pb")
      .parquet(s"$indexDir/bands")
    fpOf(fresh)
      .withColumn("fpb", substring(col("fp"), 1, 1))
      .write.mode("append").partitionBy("fpb")
      .parquet(s"$indexDir/fps")
  }
}
