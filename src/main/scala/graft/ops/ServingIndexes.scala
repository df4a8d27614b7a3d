package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Once-per-(JVM, fixture) builds of the three serving indexes, so the
  * BOARD can gate the artifact-serving tier — the e14 seeding
  * discipline applied to the index lifecycle: a board row's builder
  * call returns a plan that reads WRITTEN artifacts; the expensive
  * build side effect runs exactly once per (process, sfDir), guarded,
  * and nothing ever clears a built index underneath a previously
  * returned DataFrame.
  *
  * This is the split a deployment actually runs: build amortizes over
  * every query that follows (at 100 TB the build is a scheduled batch
  * job; searches are the recurring cost). The driver's oracle hash
  * gate on the rows that call through here (s32/s33/s34/d30) therefore
  * covers the PRODUCTION path — previously only spec-gated — against
  * the same DuckDB SQL as the in-plan twins (s09/s29-family/s10/
  * d13+d17), which replays the identical count-bounded training.
  *
  * Indexes land under java.io.tmpdir (one temp dir per kind per JVM);
  * they are read-only after the build, so concurrent readers need no
  * further coordination beyond computeIfAbsent's once-only guarantee.
  */
object ServingIndexes {

  private val built = new ConcurrentHashMap[String, String]()

  private def freshDir(kind: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$kind-")
      .toString + "/idx"

  /** IVF-PQ index over the embeddings corpus, raw codes + the stored
    * full-precision refine artifact — what `AnnIndex.searchRefined`
    * (the FAISS IndexRefineFlat chain, s29's production form) serves
    * from. Raw (not residual) encoding so the s19/s29 oracle CTEs
    * describe the artifact contents exactly (AnnIndexSpec pins
    * artifact search == the one-plan s19 ranking bit-for-bit).
    */
  def ann(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"ann|$dir", _ => {
      val idx = freshDir("ann-serving")
      AnnIndex.build(s, dir, idx, byResidual = false, storeVectors = true)
      idx
    })

  /** BM25 postings index over the documents corpus — what
    * `TextIndex.search` (s09's production form) serves from.
    */
  def text(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"text|$dir", _ => {
      val idx = freshDir("text-serving")
      TextIndex.build(s,
        Tables.load(s, dir, "documents").select(col("doc_id"), col("text")),
        idx)
      idx
    })

  /** Fingerprint + LSH-band admission index over the CORPUS split of
    * the d13/d17 incremental-ingest scenario (doc_id % 5 != 4 is the
    * existing corpus; % 5 == 4 plays the incoming batch) — what
    * `DedupIndex.probe` serves from.
    */
  def dedup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"dedup|$dir", _ => {
      val idx = freshDir("dedup-serving")
      DedupIndex.build(s,
        Tables.load(s, dir, "documents")
          .filter(col("doc_id") % 5 =!= 4)
          .select(col("doc_id"), col("text")),
        idx)
      idx
    })

  /** The INGEST-LOOP index for d31 — its own directory, because the
    * loop MUTATES it (d30's index must stay pristine corpus-only for
    * its gate): build over the corpus split, probe the first incoming
    * batch (doc_id % 10 == 4), append the docs the exact rule admits
    * (not in corpus, first copy in batch), and serve the post-append
    * snapshot. d31 then probes the SECOND batch (doc_id % 10 == 9)
    * against it — the admission loop a production ingest service runs
    * batch after batch, with batch 1's admissions now REJECTING batch
    * 2's copies of them.
    */
  def dedupLoop(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"deduploop|$dir", _ => {
      val idx = freshDir("dedup-loop")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      DedupIndex.build(s, docs.filter(col("doc_id") % 5 =!= 4), idx)
      val batch1 = docs.filter(col("doc_id") % 10 === 4)
      val admitted = batch1.join(
        DedupIndex.probe(s, idx, batch1)
          .filter(!col("fp_in_corpus") && col("fp_batch_rn") === 1)
          .select(col("doc_id")),
        "doc_id")
      DedupIndex.append(s, idx, admitted)
      idx
    })

  /** The RESIDUAL-encoded (FAISS by_residual=true default) index for
    * s42 — the encoding a deployment should serve, now under the
    * driver's gate; the raw index above backs s33/s34/s38 (whose
    * oracle CTEs describe raw codes).
    */
  def annResidual(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"annres|$dir", _ => {
      val idx = freshDir("ann-residual-serving")
      AnnIndex.build(s, dir, idx, byResidual = true)
      idx
    })

  /** IVF-PQ index over the MULTIMODAL codec feature vectors (m11):
    * `AnnIndex.buildFrom` is source-agnostic — media vectors go
    * through the identical trained lifecycle as text embeddings, and
    * the m11 oracle re-derives the same index from the raw bytes.
    */
  def media(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"media|$dir", _ => {
      val idx = freshDir("media-serving")
      AnnIndex.buildFrom(s,
        graft.multimodal.Multimodal.mediaVectors(s, dir), idx,
        byResidual = false)
      idx
    })

  /** The MAINTENANCE-LOOP index for s46: built on the vec_id%10!=7
    * split, then UPSERTED with the %10==7 delta against the existing
    * trained model (no retrain — the production cadence AnnIndex.upsert
    * documents). s46 reads the post-upsert inverted lists and emits the
    * retrain go/no-go decision (λ + churn) an operator acts on — the
    * lifecycle s27's imbalance number exists for. Own directory: the
    * upsert mutates it.
    */
  def annMaint(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"annmaint|$dir", _ => {
      val idx = freshDir("ann-maint")
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      AnnIndex.buildFrom(s, e.filter(col("vec_id") % 10 =!= 7), idx,
        byResidual = false)
      AnnIndex.upsert(s, idx, e.filter(col("vec_id") % 10 === 7))
      idx
    })

  /** The TEXT maintenance snapshot for s51 — s46's postings sibling:
    * built on the doc_id%5!=4 corpus split, APPENDED with the %10==4
    * ingest batch (all fresh by arithmetic — %10==4 ⇒ %5==4, excluded
    * from the split), then the erasure rule DELETED with NO compact,
    * so the decision row reads the realistic mid-lifecycle state: two
    * stats batches (fragmentation) + pending tombstones (anti-join
    * cost + dead bytes). Own directory: the lifecycle mutates it.
    */
  def textMaint(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"textmaint|$dir", _ => {
      val idx = freshDir("text-maint")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      TextIndex.build(s, docs.filter(col("doc_id") % 5 =!= 4), idx)
      TextIndex.append(s, idx, docs.filter(col("doc_id") % 10 === 4))
      TextIndex.delete(s, idx,
        docs.filter(EraseDocRule).select(col("doc_id")))
      idx
    })

  /** The DEDUP maintenance snapshot for d35 — the admission index
    * mid-lifecycle: corpus-split build, erasure rule deleted, NOT
    * compacted. d35 reads the fingerprint/band artifacts + pending
    * tombstones and emits the compact go/no-go. Own directory: the
    * pristine d30 index must stay corpus-only.
    */
  def dedupMaint(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"dedupmaint|$dir", _ => {
      val idx = freshDir("dedup-maint")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      DedupIndex.build(s, docs.filter(col("doc_id") % 5 =!= 4), idx)
      DedupIndex.delete(s, idx,
        docs.filter(EraseDocRule).select(col("doc_id")))
      idx
    })

  /** The STREAMING vector-ingest index for s49 — the ANN sibling of
    * s39 (text) and d31 (dedup): built on the vec_id%10!=7 split, the
    * delta then arrives through a Structured Streaming file source and
    * upserts per micro-batch via foreachBatch — the production loop a
    * continuously-embedding pipeline runs. Upsert encodes against the
    * FROZEN split-trained model (AnnIndex's no-retrain contract), so
    * the gate's oracle replays split-training + delta assignment —
    * and a streamed ingest must serve bit-identically to the same
    * upsert applied in batch (AnnIndexSpec proves redelivery is
    * absorbed by the membership anti-joins).
    */
  def annStream(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"annstream|$dir", _ => {
      val idx = freshDir("ann-stream")
      val e = Tables.load(s, dir, "embeddings")
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
      AnnIndex.buildFrom(s, e.filter(col("vec_id") % 10 =!= 7), idx,
        byResidual = false)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-ann-stream-ckpt").toString
      val q = Tables.loadStream(s, dir, "embeddings")
        .filter(col("vec_id") % 10 === 7)
        .select(col("vec_id"),
          col("embedding").cast("array<double>").as("v"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          AnnIndex.upsert(s, idx, b.localCheckpoint())
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally { q.stop(); q.awaitTermination(30000) }
      idx
    })

  // ---- the ERASURE snapshots (s40/s41/d32): build, delete a
  // deterministic id rule, compact — so the right-to-erasure leg
  // (tombstone write + fold-in) is what the driver's hash gate reads.
  // Own directories: deletion mutates, and the pristine serving
  // indexes above back other gates.

  /** Erasure rule for the document-keyed indexes (s41/d32). */
  val EraseDocRule: org.apache.spark.sql.Column = col("doc_id") % 20 === 3
  /** Erasure rule for the vector index (s40). */
  val EraseVecRule: org.apache.spark.sql.Column = col("vec_id") % 10 === 7

  def textErase(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"texterase|$dir", _ => {
      val idx = freshDir("text-erase")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      TextIndex.build(s, docs, idx)
      TextIndex.delete(s, idx, docs.filter(EraseDocRule).select(col("doc_id")))
      TextIndex.compact(s, idx)
      idx
    })

  def annErase(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"annerase|$dir", _ => {
      val idx = freshDir("ann-erase")
      AnnIndex.build(s, dir, idx, byResidual = false)
      AnnIndex.delete(s, idx,
        Tables.load(s, dir, "embeddings").filter(EraseVecRule)
          .select(col("vec_id")))
      AnnIndex.compact(s, idx)
      idx
    })

  def dedupErase(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"deduperase|$dir", _ => {
      val idx = freshDir("dedup-erase")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val corpus = docs.filter(col("doc_id") % 5 =!= 4)
      DedupIndex.build(s, corpus, idx)
      DedupIndex.delete(s, idx,
        corpus.filter(EraseDocRule).select(col("doc_id")))
      DedupIndex.compact(s, idx)
      idx
    })

  /** Per-(day, event_type) HLL sketch ROLLUP artifact for e36 — the
    * warehouse pattern e15 proves mergeability for: daily sketches
    * are written ONCE (day-partitioned), and any date-range distinct
    * count is answered by unioning the range's sketches — the raw
    * events are never re-scanned. At 100 TB this is the difference
    * between a range-cardinality query costing |range| tiny sketches
    * and costing a full shuffle of the range's raw user ids.
    */
  def sketchRollup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"sketch|$dir", _ => {
      val idx = freshDir("sketch-rollup")
      Tables.load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
        .write.partitionBy("day").parquet(s"$idx/daily")
      idx
    })

  /** e37's quantile twin of [[sketchRollup]]: per-(day, type) KLL
    * sketches of `value` — any date-range quantile is then a fold
    * over the range's tiny day states, never a re-scan of raw values.
    */
  def quantileRollup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"kll|$dir", _ => {
      val idx = freshDir("quantile-rollup")
      Tables.load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(expr("kll_sketch_agg_double(value, 200)").as("sk"))
        .write.partitionBy("day").parquet(s"$idx/daily")
      idx
    })

  /** e38's frequent-items member of the rollup trio: per-(day, type)
    * approx_top_k states over user_id — any date-range heavy-hitters
    * query combines the range's states; capacity 10000 far exceeds
    * the fixture's distinct users, so estimates are provably exact
    * (the t15 argument) and the gate pins estimate == exact.
    */
  def topkRollup(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"topk|$dir", _ => {
      val idx = freshDir("topk-rollup")
      Tables.load(s, dir, "events")
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(expr("approx_top_k_accumulate(user_id, 10000)").as("st"))
        .write.partitionBy("day").parquet(s"$idx/daily")
      idx
    })

  /** p21's written pack: `Layout.packWrite` materializes the p13
    * slice manifest as range-partitioned, sorted parquet — the
    * physical training-shard layout. Written once per JVM; the board
    * row audits the FILES against the manifest arithmetic.
    */
  def pack(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"pack|$dir", _ => {
      val out = freshDir("pack-artifact")
      Layout.packWrite(s, dir, out, shards = 4)
      out
    })

  /** STREAMING ingest for s39: the index starts from the doc_id%5!=0
    * split and the remaining split arrives through a Structured
    * Streaming file source, appended per micro-batch via foreachBatch
    * (the production ingest loop; TextIndexSpec proves at-least-once
    * redelivery is absorbed by the same path). The final index holds
    * the FULL corpus, so the gate is s09's oracle verbatim — a
    * streamed index must serve bit-identically to a batch-built one.
    */
  def textStream(s: SparkSession, dir: String): String =
    built.computeIfAbsent(s"textstream|$dir", _ => {
      val idx = freshDir("text-stream")
      val docs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      TextIndex.build(s, docs.filter(col("doc_id") % 5 =!= 0), idx)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-text-stream-ckpt").toString
      val q = Tables.loadStream(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 === 0)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          TextIndex.append(s, idx, b.localCheckpoint())
          ()
        }
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable()
      finally { q.stop(); q.awaitTermination(30000) }
      idx
    })
}
