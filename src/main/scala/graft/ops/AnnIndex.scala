package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The ANN index LIFECYCLE the board queries deliberately compress into
  * one plan (SURVEY.md §2.4; SCALE.md round 9): at 100 TB the
  * train/assign/encode half runs ONCE and its artifacts are WRITTEN
  * tables; the recurring search job reads the artifacts, never the
  * vector corpus. This module is that split, made real and spec-proven
  * (AnnIndexSpec): [[build]] writes the artifacts of the composed
  * IVF-PQ index in EITHER encoding — raw codes (s19's model,
  * `byResidual = false`) or residual codes (s23's model, the FAISS
  * default `by_residual=true`: codes quantize v − c(v), spending the
  * same codebook budget on the tighter near-origin distribution) — and
  * [[search]] reproduces the matching board query's exact ranking from
  * the artifacts alone: its plan contains ZERO corpus scans. The
  * encoding travels in a `meta` artifact, so search/upsert
  * self-describe — a caller never has to remember how an index was
  * built. [[buildFrom]] accepts ANY (vec_id, v) frame — the fixture
  * corpus is one producer among several (the multimodal family's codec
  * feature vectors index through the same lifecycle, see
  * `Multimodal.mediaVectors`).
  *
  * Artifact layout (all parquet under `indexDir`):
  *
  *  - `meta/`       (by_residual)          — 1 row; the encoding flag.
  *  - `centroids/`  (cell, cv)             — KmK rows; broadcast at read.
  *  - `codebooks/`  (sub, code, cv)        — PqM×PqK rows; broadcast.
  *    Residual indexes train these on r = v − c(v).
  *  - `invlists/`   cell=<c>/ (vec_id)     — the inverted lists,
  *    DIRECTORY-PARTITIONED by cell so a probe's `cell IN (...)` filter
  *    prunes to the probed cells' directories: the search reads
  *    |probed|/KmK of the list bytes, the on-disk form of IVF's whole
  *    point. (Hive-style partitioning, not file-level range metadata —
  *    pruning happens at listing time, before any footer is opened.)
  *  - `codes/`      (vec_id, sub, code)    — sorted by vec_id within
  *    shards so the per-candidate code lookup joins against
  *    min/max-tight row groups.
  *  - `tombstones/` (vec_id)               — logically deleted ids
  *    (absent until the first [[delete]]); searches anti-join it,
  *    [[compact]] folds it into the artifacts and clears it.
  *
  * Scale shape of [[search]]: centroid + codebook + the per-query
  * distance table stay broadcasts (for a residual index the table is
  * per-(query, probed cell) — NQueries×NProbe×PqM×PqK rounded-DECIMAL
  * entries, still broadcast-sized at any corpus size); candidates come
  * from the pruned inverted-list scan joined to the broadcast probe
  * set; the ADC sum partial-aggregates in task; the bounded-heap
  * TopKPerKey cuts to K before any sort — the same pinned shapes as
  * s19/s23, minus the build.
  */
object AnnIndex {

  /** [[searchRefined]]'s plan-switch threshold on |queries| × depth
    * (override: conf `spark.graft.ann.refine.literalBudget`). Up to
    * here the candidate ids resolve driver-side into an IN-literal
    * (32k longs ≈ 256 KB — harmless, and it buys row-group min/max
    * pruning on the sorted refine store; past ~the parquet
    * inFilterThreshold the pushdown degrades to a min/max range
    * anyway, so bigger literals buy planning cost, not pruning).
    * Above it the resolve itself is the hazard — an O(batch × depth)
    * driver array — and the plan switches to the distributed
    * semi-join shape (see [[searchRefined]]).
    */
  private[graft] val RefineLiteralBudget = 32768L

  /** [[search]]'s plan-switch threshold on |queries| × nprobe — the
    * same discipline as [[RefineLiteralBudget]], applied to the probe
    * stage (override: conf `spark.graft.ann.probe.literalBudget`). Up
    * to here the probed cells resolve driver-side into a `cell IN`
    * partition filter that prunes the invlist listing itself. Above it
    * the literal stops paying: at real index sizes (KmK 10⁵-10⁶) a
    * corpus-fraction batch probes most cells, so the literal prunes
    * nothing while PLANNING still pays |cells| (and the driver pays
    * the distinct-collect); the plan switches to joining the invlists
    * to the probe frame on the raw partition column — AQE/DPP prune
    * what is prunable, nothing |cells|-sized lands on the driver.
    */
  private[graft] val ProbeLiteralBudget = 8192L

  /** Row count of a caller's query frame for plan switching — the
    * shared stats-first ladder, one audited home ([[PlanSizing]]).
    * Returns the (possibly checkpointed) frame to search plus its
    * count; searches MUST use the returned frame so the sized
    * evaluation is the executed one.
    */
  private def sizedQueries(queries: DataFrame): (DataFrame, Long) =
    PlanSizing.sizedRows(queries)

  /** Train on the corpus at `dir` and write the index artifacts.
    * Deterministic end-to-end (the s14/s16 rounding discipline), so
    * re-building overwrites byte-identical content — resumable like
    * the pack write. `byResidual = true` builds s23's residual-encoded
    * model (the FAISS default; the one a deployment should serve);
    * `false` builds s19's raw-code model (the encoding that can share
    * one corpus encode with flat ADC, s17).
    */
  def build(s: SparkSession, dir: String, indexDir: String,
      byResidual: Boolean = false,
      storeVectors: Boolean = false): Unit =
    buildFrom(s, Similarity.emb(s, dir).select(col("vec_id"), col("v")),
      indexDir, byResidual, storeVectors)

  /** [[build]] for ANY vector frame: `vectors` is (vec_id LONG,
    * v ARRAY<DOUBLE>) with Similarity.Dim components — embeddings,
    * codec feature vectors, anything. The index is self-describing
    * (`meta`), so downstream [[search]]/[[upsert]] calls need only the
    * directory.
    *
    * Crash safety: the whole index is built under `indexDir.build.tmp`
    * and SWAPPED in as one unit. A rebuild that dies mid-way (or one
    * that flips `byResidual`) can therefore never leave a live index
    * whose `meta` flag disagrees with its codebooks/codes — searches
    * and upserts in the window keep reading the complete OLD snapshot,
    * and the swap itself is two driver-side renames healed by
    * [[ArtifactSwap.recoverSwap]]. Tombstones carry across the swap
    * FILTERED to ids the new snapshot still holds (a rebuild sourced
    * from a corpus that still contains deleted vectors must not
    * resurrect them; one sourced from a cleaned corpus must not keep
    * orphan tombstones that would shadow re-admission) — see
    * `ArtifactSwap.buildSwap`.
    */
  def buildFrom(s: SparkSession, vectors: DataFrame, indexDir: String,
      byResidual: Boolean, storeVectors: Boolean = false): Unit = {
    import s.implicits._
    ArtifactSwap.buildSwap(s, indexDir, "vec_id", tmp => {
      val e = vectors.select($"vec_id", $"v")
      // the optional refine artifact (FAISS IndexRefineFlat's raw
      // store): full-precision vectors, vec_id-range-sorted so the
      // refine stage's bounded candidate IN-filter prunes to
      // min/max-tight row groups instead of scanning the corpus copy
      if (storeVectors)
        e.repartitionByRange(4, $"vec_id")
          .sortWithinPartitions($"vec_id")
          .write.mode("overwrite").parquet(s"$tmp/vectors")
      s.createDataset(Seq(byResidual)).toDF("by_residual")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/meta")
      val (_, cents) = Similarity.kmTrain(s, e)
      cents.select($"cell", $"cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/centroids")
      // lazily materialized: a residual build reads af twice (inverted
      // lists + the residual frame) — one assignment pass over the
      // corpus, not two (af is the narrow (vec_id, cell) pair)
      val af = Similarity.kmAssign(s, e, cents).select($"vec_id", $"cell")
        .localCheckpoint()
      // the frame the PQ half trains on and encodes: raw vectors, or
      // the per-vector residual against its coarse centroid (one IEEE
      // subtraction per component on bit-identical inputs — the s23
      // determinism argument, so rebuild stays byte-identical)
      val pqFrame =
        if (!byResidual) e
        else e.join(af, "vec_id").join(broadcast(cents), "cell")
          .select($"vec_id",
            expr("zip_with(v, cv, (x, c) -> x - c)").as("v"))
      val (_, cb) = Similarity.pqTrain(s, pqFrame)
      cb.select($"sub", $"cell".as("code"), $"cv")
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/codebooks")
      af.write.mode("overwrite").partitionBy("cell")
        .parquet(s"$tmp/invlists")
      Similarity.pqAssign(s, Similarity.pqSubs(s, pqFrame), cb)
        .select($"vec_id", $"sub", $"cell".as("code"))
        .repartitionByRange(4, $"vec_id")
        .sortWithinPartitions($"vec_id", $"sub")
        .write.mode("overwrite").parquet(s"$tmp/codes")
    }, tmp => s.read.parquet(s"$tmp/invlists"))
  }

  private def isResidual(s: SparkSession, indexDir: String): Boolean =
    s.read.parquet(s"$indexDir/meta").head().getBoolean(0)

  private def tombstones(s: SparkSession, indexDir: String): DataFrame =
    ArtifactSwap.tombstones(s, indexDir, "vec_id")

  /** Logical deletion — the GDPR/right-to-erasure leg of the
    * lifecycle: `ids` (vec_id) stop appearing in ANY search result
    * immediately, without rewriting the (corpus-sized) list and code
    * artifacts. Implementation is a tombstone table the search
    * anti-joins (broadcast — deletions are rare relative to corpus
    * size; [[compact]] folds them in when they accumulate).
    * Idempotent, and FILTERED TO THE REGISTER (ids the inverted lists
    * actually serve — see `ArtifactSwap.deleteIds` for why an orphan
    * tombstone would shadow a future upsert). NOTE an id deleted but
    * not yet compacted cannot be re-inserted by [[upsert]] (its
    * list/code rows still exist, so the anti-join skips it — and the
    * tombstone keeps it invisible); revival is compact-then-upsert,
    * the unambiguous order.
    */
  def delete(s: SparkSession, indexDir: String, ids: DataFrame): Unit = {
    import s.implicits._
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/invlists", s"$indexDir/codes")
    // BOTH artifacts' memberships: a deletion landing while an upsert
    // is torn (codes written, lists not) must stick — see deleteIds
    ArtifactSwap.deleteIds(s, indexDir, "vec_id", Seq(
      s.read.parquet(s"$indexDir/invlists").select($"vec_id"),
      s.read.parquet(s"$indexDir/codes")
        .filter($"sub" === 0).select($"vec_id")), ids)
  }

  /** Fold accumulated tombstones into the artifacts: rewrite the
    * inverted lists and codes WITHOUT the deleted ids and clear the
    * tombstone table. After compaction the deleted ids' bytes are
    * physically gone (the erasure guarantee) and searches pay no
    * anti-join.
    *
    * Crash safety: each filtered copy is written to a DURABLE temp
    * directory first, then swapped in ([[ArtifactSwap.swapDirs]]) — the destructive
    * step is a metadata rename, not a write. (An overwrite-in-place
    * fed by localCheckpoint blocks would be a trap at cluster scale:
    * the blocks live only in executor memory/disk with their lineage
    * truncated, so one executor loss mid-overwrite aborts the job
    * with the target — an index accumulated by upserts whose deltas
    * are gone — already erased.) Every intermediate window is safe:
    * the tombstone table is cleared LAST, so a re-run after any crash
    * re-filters (anti-join no-ops on already-compacted artifacts) and
    * finishes the job; searches in the window still anti-join the
    * surviving tombstones. Deterministic given the same inputs, like
    * every artifact write here; a compacted id becomes insertable
    * again (see [[delete]] on revival ordering).
    */
  def compact(s: SparkSession, indexDir: String): Unit = {
    import s.implicits._
    val invDst = new org.apache.hadoop.fs.Path(s"$indexDir/invlists")
    val codeDst = new org.apache.hadoop.fs.Path(s"$indexDir/codes")
    val invTmp = new org.apache.hadoop.fs.Path(s"$indexDir/invlists.tmp")
    val codeTmp = new org.apache.hadoop.fs.Path(s"$indexDir/codes.tmp")
    val fs = invDst.getFileSystem(s.sparkContext.hadoopConfiguration)
    ArtifactSwap.recover(s, indexDir)
    ArtifactSwap.recoverSwap(fs, invDst, invTmp)
    ArtifactSwap.recoverSwap(fs, codeDst, codeTmp)
    val tomb = tombstones(s, indexDir)
    if (tomb.isEmpty) return
    s.read.parquet(s"$indexDir/invlists")
      .join(tomb, Seq("vec_id"), "left_anti")
      .select($"vec_id", $"cell")
      .write.mode("overwrite").partitionBy("cell")
      .parquet(invTmp.toString)
    s.read.parquet(s"$indexDir/codes")
      .join(tomb, Seq("vec_id"), "left_anti")
      .repartitionByRange(4, $"vec_id")
      .sortWithinPartitions($"vec_id", $"sub")
      .write.mode("overwrite").parquet(codeTmp.toString)
    // the optional refine store compacts through the same protocol
    val vecDst = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val vecTmp = new org.apache.hadoop.fs.Path(s"$indexDir/vectors.tmp")
    ArtifactSwap.recoverSwap(fs, vecDst, vecTmp)
    if (fs.exists(vecDst)) {
      s.read.parquet(vecDst.toString)
        .join(tomb, Seq("vec_id"), "left_anti")
        .repartitionByRange(4, $"vec_id")
        .sortWithinPartitions($"vec_id")
        .write.mode("overwrite").parquet(vecTmp.toString)
    }
    ArtifactSwap.swapDirs(fs, invTmp, invDst)
    ArtifactSwap.swapDirs(fs, codeTmp, codeDst)
    if (fs.exists(vecTmp)) ArtifactSwap.swapDirs(fs, vecTmp, vecDst)
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexDir/tombstones"), true)
  }

  /** Incremental maintenance: index a DELTA of new vectors against the
    * EXISTING trained model — no retrain, the production cadence
    * (upsert continuously, rebuild when s13's churn numbers say the
    * quantizer no longer fits). New vectors assign to the existing
    * cells and encode with the existing codebooks — for a residual
    * index, encode r = v − c(v) against the cell the vector just
    * assigned to — then APPEND to the artifact tables; vec_ids already
    * indexed are skipped, so re-running the same upsert is a no-op —
    * the same resumability contract as the pack write. `delta` is
    * (vec_id, v).
    *
    * Crash safety: EACH artifact anti-joins against its OWN membership
    * before its append, so an upsert that dies between the two writes
    * is repaired — not skipped — by the re-run: the re-run writes
    * exactly the missing half, never a duplicate row. (A single
    * membership register would be a one-way trap: ids registered but
    * crash-torn out of the other artifact would anti-join away on
    * every retry, unsearchable forever.) Codes are written FIRST and
    * the inverted lists LAST, because a list row is a promise its code
    * rows exist — search inner-joins candidates with codes, so a
    * codes-less list entry would silently vanish from every ranking,
    * while an orphan code row is inert (candidates only ever come from
    * the lists).
    *
    * Scale shape: two broadcast-join argmax passes over the delta only
    * (the existing index is touched just for the pre-image anti-joins
    * on a narrow id column — the codes side prunes to one sub slot so
    * it reads two columns, no vectors), appends land in the cell
    * directories the searches already prune on.
    */
  def upsert(s: SparkSession, indexDir: String, delta: DataFrame): Unit = {
    import s.implicits._
    // heal any torn swap FIRST — recovery must not depend on the
    // crashed operation (a compact, a rebuild) being the one retried
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/invlists", s"$indexDir/codes")
    val residual = isResidual(s, indexDir)
    val cents = s.read.parquet(s"$indexDir/centroids")
    val cb = s.read.parquet(s"$indexDir/codebooks")
      .select($"sub", $"code".as("cell"), $"cv")
    val inInv = s.read.parquet(s"$indexDir/invlists")
      .select($"vec_id")
    // one row per vec_id that has codes: sub pruned to a single slot
    val inCodes = s.read.parquet(s"$indexDir/codes")
      .filter($"sub" === 0).select($"vec_id")
    // BEFORE inserting: clear tombstones that mask nothing (a compact
    // died between its swaps and its tombstone clear) — an id being
    // re-admitted under a surviving orphan would come back invisible
    ArtifactSwap.clearOrphanTombstones(s, indexDir, "vec_id",
      Seq(inInv, inCodes))
    // fully indexed = present in BOTH artifacts; ids present in only
    // one (a torn previous append) stay in `fresh` so this run can
    // finish them. EAGERLY materialized: the memberships must be the
    // PRE-upsert ones for both writes below — lazily, the lists write
    // would re-read after the codes append and see its own delta as
    // already indexed (silent index corruption; the spec's dup-codes
    // check would catch exactly this).
    val fresh = delta.select($"vec_id", $"v")
      .join(inInv.join(inCodes, Seq("vec_id")), Seq("vec_id"), "left_anti")
      .localCheckpoint()
    val afd = Similarity.kmAssign(s, fresh, cents)
      .select($"vec_id", $"cell")
      // both writes below derive from the assignment; one evaluation
      .localCheckpoint()
    val pqFrame =
      if (!residual) fresh
      else fresh.join(afd, "vec_id").join(broadcast(cents), "cell")
        .select($"vec_id", expr("zip_with(v, cv, (x, c) -> x - c)").as("v"))
    Similarity.pqAssign(s, Similarity.pqSubs(s, pqFrame), cb)
      .select($"vec_id", $"sub", $"cell".as("code"))
      .join(inCodes, Seq("vec_id"), "left_anti")
      .repartitionByRange(4, $"vec_id")
      .sortWithinPartitions($"vec_id", $"sub")
      .write.mode("append").parquet(s"$indexDir/codes")
    // refine store, when this index carries one: appended BEFORE the
    // lists for the same reason codes are (a list row is a promise the
    // refine stage can fetch the raw vector — a vector-less candidate
    // would silently vanish from every REFINED ranking), with its own
    // membership anti-join (the torn-append healing discipline)
    val vecPath = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val vfs = vecPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (vfs.exists(vecPath)) {
      val inVecs = s.read.parquet(vecPath.toString).select($"vec_id")
      fresh.join(inVecs, Seq("vec_id"), "left_anti")
        .repartitionByRange(4, $"vec_id")
        .sortWithinPartitions($"vec_id")
        .write.mode("append").parquet(vecPath.toString)
    }
    afd.join(inInv, Seq("vec_id"), "left_anti")
      .write.mode("append").partitionBy("cell")
      .parquet(s"$indexDir/invlists")
  }

  /** Search the written index: top-`k` neighbors per query by the same
    * probe + ADC discipline as the matching board query (s19 for a raw
    * index, s23 for a residual one — rounded-DECIMAL distance tables,
    * ties to the lowest id). `queries` is (q_id, qv) — the caller's
    * frame; nothing here touches the corpus. Returns
    * (q_id, n_id, adc DECIMAL, rnk).
    *
    * `allow` is the FILTERED-search leg (s08's argument carried to the
    * serving tier): an optional (vec_id) allowlist — a metadata
    * predicate's id set, a tenant scope, a freshness cut — applied to
    * the candidate stream BEFORE any ADC work or the top-k cut.
    * Post-filtering a top-k result silently under-returns when the
    * filter is selective (the k survivors of an unfiltered cut may
    * all be disallowed); pre-filtering ranks the full probed candidate
    * set that satisfies the filter, so the result is exactly the
    * filtered ranking at every selectivity. One semi-join on the
    * narrow id column; the allowlist may be corpus-sized (AQE picks
    * the join side), and the spec pins the filtered result equal to
    * the unfiltered ranking with the disallowed ids excised.
    *
    * The probe stage is PLAN-SWITCHED on |queries| × nprobe vs
    * [[ProbeLiteralBudget]] (the searchRefined discipline): bounded
    * batches resolve the probed cells driver-side into a `cell IN`
    * partition filter (listing-time pruning); corpus-fraction batches
    * join the invlists to the probe frame on the raw partition column
    * instead — nothing |cells|-sized on the driver, no literal the
    * planner has to chew. Both plans rank identically (spec-pinned).
    */
  def search(s: SparkSession, indexDir: String, queries0: DataFrame,
      k: Int, allow: Option[DataFrame] = None,
      nprobe: Int = Similarity.NProbe,
      hintQueryBroadcast: Boolean = true,
      knownQueryCount: Option[Long] = None): DataFrame = {
    import s.implicits._
    // the probe-stage plan switch sizes the query frame exactly once
    // (callers that already sized — searchRefined — pass the count
    // down so the frame is never sized twice)
    val (queries, nq) = knownQueryCount.map((queries0, _))
      .getOrElse(sizedQueries(queries0))
    // the query-side frames (probes, ADC tables) are |queries|-
    // proportional: broadcast-hinted for the bounded request batches a
    // serving tier sends (the common case — skips a shuffle), but a
    // corpus-fraction batch (the d33 admission shape) must NOT be
    // forced through a broadcast: the hint is dropped and AQE picks
    // the join strategy from the real sizes (it still broadcasts when
    // the batch turns out small). Model-sized frames (centroids,
    // codebooks, tombstones) stay hinted — they never scale with the
    // batch.
    def qb(df: DataFrame): DataFrame =
      if (hintQueryBroadcast) broadcast(df) else df
    // read paths heal torn swaps too (see upsert)
    ArtifactSwap.recover(s, indexDir,
      s"$indexDir/invlists", s"$indexDir/codes")
    val residual = isResidual(s, indexDir)
    val cents = s.read.parquet(s"$indexDir/centroids")
    val cb = s.read.parquet(s"$indexDir/codebooks")
    val wProbe = Window.partitionBy($"q_id").orderBy($"d2", $"cell")
    val probes = queries.join(broadcast(cents), lit(true))
      .withColumn("d2", Similarity.kmDist2($"qv", $"cv"))
      .withColumn("p_rnk", row_number().over(wProbe))
      .filter($"p_rnk" <= nprobe)
      .select($"q_id", $"qv", $"cell")
    val inv = s.read.parquet(s"$indexDir/invlists")
    val cellType = inv.schema("cell").dataType
    // candidates KEEP their cell: a residual code only has meaning
    // against the cell it was encoded in, so the ADC join is keyed by
    // it (for a raw index the key degenerates to (q_id, sub, code)).
    // TWO probe plans, switched on |queries| × nprobe (the bound on
    // distinct probed cells) vs [[ProbeLiteralBudget]]:
    val probeBudget = s.conf
      .getOption("spark.graft.ann.probe.literalBudget")
      .map(_.toLong).getOrElse(ProbeLiteralBudget)
    val boundedProbe = nq * nprobe <= probeBudget
    val candJoined = if (boundedProbe) {
      // BOUNDED batches: the probed cells resolve driver-side
      // (NProbe×|queries| tiny rows) into an IN-filter the partitioned
      // invlist scan PRUNES on at listing time — the read-path payoff
      // of the cell=<c>/ layout. The IN-filter must hit the RAW
      // partition column (inference may read cell=<c> as int; a cast
      // on the column side would demote the partition filter to a
      // post-scan filter and kill pruning) — so match the literal type
      // to the scan's, THEN normalize for joins.
      val probedCells = probes.select($"cell").distinct()
        .collect().map(_.getLong(0))
      val cellLits: Seq[Any] =
        if (cellType == org.apache.spark.sql.types.IntegerType)
          probedCells.toSeq.map(_.toInt)
        else probedCells.toSeq
      inv.filter($"cell".isin(cellLits: _*))
        .withColumn("cell", $"cell".cast("long"))
        .join(qb(probes.select($"q_id", $"cell")), "cell")
    } else {
      // LARGE batches (the d33 admission shape): at real index sizes
      // (KmK 10⁵-10⁶) a corpus-fraction batch probes most cells — the
      // literal would prune nothing while planning pays |cells| and
      // the driver pays the distinct-collect. Join the invlists to the
      // probe frame on the RAW partition column instead (AQE/DPP prune
      // what is prunable); no broadcast hint — the probe frame is
      // |queries|×nprobe-sized here, AQE picks the strategy.
      val probeCells = probes
        .select($"q_id", $"cell".cast(cellType).as("cell"))
      inv.join(probeCells, "cell")
        .withColumn("cell", $"cell".cast("long"))
    }
    val cand0 = candJoined
      .filter($"q_id" =!= $"vec_id")
      // logically deleted ids never surface (tombstones broadcast —
      // small between compactions by design; see delete/compact)
      .join(broadcast(tombstones(s, indexDir)
        .withColumnRenamed("vec_id", "del_id")),
        $"vec_id" === $"del_id", "left_anti")
    // the filter leg: BEFORE the ADC join — disallowed candidates must
    // never consume code lookups or heap slots (see the method doc)
    val candAllowed = allow
      .map(a => cand0.join(a.select($"vec_id"), Seq("vec_id"), "left_semi"))
      .getOrElse(cand0)
    val cand = candAllowed
      .select($"q_id", $"vec_id".as("n_id"), $"cell")
    // the per-query ADC table: subvector distances to every codeword.
    // Raw index: the query's own subvectors — per-(query) table, keyed
    // (q_id, sub, code). Residual index: the query RESIDUAL against
    // each probed cell — per-(query, cell) table, keyed
    // (q_id, cell, sub, code). Both broadcast-sized.
    val qsubs =
      if (!residual)
        Similarity.pqSubs(s,
            queries.select($"q_id".as("vec_id"), $"qv".as("v")))
          .select($"vec_id".as("q_id"), lit(-1L).as("cell"),
            $"sub", $"sv".as("qsv"))
      else {
        val qr = probes.join(broadcast(cents), "cell")
          .select($"q_id", $"cell",
            expr("zip_with(qv, cv, (x, c) -> x - c)").as("rv"))
        Similarity.pqSubs(s, qr.select(
            // pqSubs slices a (vec_id, v) frame; smuggle (q_id, cell)
            // through as a struct id, then unpack
            struct($"q_id", $"cell").as("vec_id"), $"rv".as("v")))
          .select($"vec_id.q_id".as("q_id"), $"vec_id.cell".as("cell"),
            $"sub", $"sv".as("qsv"))
      }
    val qtab = qsubs.join(broadcast(cb), "sub")
      .withColumn("qd2",
        Similarity.kmDist2($"qsv", $"cv").cast("decimal(12,6)"))
      .select($"q_id", $"cell", $"sub", $"code", $"qd2")
    // The ADC form follows the probe branch (see the ADC-forms note in
    // Similarity): BOUNDED batches join the code stream to the bounded
    // candidate set and sum per (q_id, n_id) — the r16 quiet-box A/B
    // measured the corpus-wide encWide pivot as a net loss when
    // candidates ≪ corpus (s23 3.0→4.4 s, m11 1.31→1.47 s under
    // lookup). LARGE batches (the d33 admission shape — corpus-fraction
    // queries, many queries per candidate vector) keep the table-lookup
    // form: the pivot amortizes and the join+sum aggregation was the
    // measured CPU hot spot (d33 avgHashProbe ≈ 240; A/B 4.43→3.81 s).
    val enc = s.read.parquet(s"$indexDir/codes")
    val adc = if (boundedProbe) {
      val joined =
        if (!residual)
          enc.join(cand.drop("cell"), enc("vec_id") === cand("n_id"))
            .join(qb(qtab.drop("cell")), Seq("q_id", "sub", "code"))
        else
          enc.join(cand, enc("vec_id") === cand("n_id"))
            .join(qb(qtab), Seq("q_id", "cell", "sub", "code"))
      // same invariant guard as the lookup branch below: a candidate
      // whose codes are not exactly dense sub 0..m−1 (torn re-ingest)
      // would otherwise score a PARTIAL sum — a strict underestimate
      // that can win the ascending top-k. Requiring exactly PqM
      // addends makes both branches drop such candidates identically;
      // healthy indexes always have PqM rows per (q_id, n_id), so the
      // filter is a no-op there (oracle-gated).
      joined.groupBy($"q_id", $"n_id")
        .agg(sum($"qd2").as("adc"), count(lit(1)).as("__nsub"))
        .filter($"__nsub" === Similarity.PqM)
        .select($"q_id", $"n_id", $"adc")
    } else {
      val encW = Similarity.encWide(enc)
      (if (!residual)
        encW.join(cand.drop("cell"), encW("vec_id") === cand("n_id"))
          .join(qb(Similarity.qtabWide(qtab.drop("cell"), Seq("q_id"),
            Similarity.PqM)), "q_id")
      else
        encW.join(cand, encW("vec_id") === cand("n_id"))
          .join(qb(Similarity.qtabWide(qtab, Seq("q_id", "cell"),
            Similarity.PqM)), Seq("q_id", "cell")))
        .select($"q_id", $"n_id",
          Similarity.adcCol(Similarity.PqM).as("adc"))
        // invariant guard: a LUT miss (code absent, or a codes array
        // that is not dense sub 0..m−1 — e.g. duplicate (vec_id, sub)
        // rows after a torn re-ingest) yields a NULL adc, and NULL
        // sorts FIRST under the ascending top-k — corrupted candidates
        // would silently win every ranking. The join+sum form degrades
        // safely (drops/partial-sums such rows); make the lookup form
        // degrade the same way instead of inverting the ranking.
        .filter($"adc".isNotNull)
    }
    val top = graft.plans.TopKPerKey(adc, Seq("q_id"),
      struct($"adc", $"n_id"), k)
    val w = Window.partitionBy($"q_id").orderBy($"adc", $"n_id")
    top.withColumn("rnk", row_number().over(w))
      .select($"q_id", $"n_id", $"adc", $"rnk")
  }

  /** REFINED search — the FAISS IndexRefineFlat stage, and the fix for
    * the ADC caveat AdmissionStackSpec pins: ADC distance conflates
    * true distance with codebook distortion, so for an
    * out-of-distribution vector the distortion alone can exceed any
    * threshold calibrated on in-distribution data. The cure is exact
    * re-scoring of a bounded candidate set: take ADC's top-`depth` per
    * query, fetch those candidates' FULL-PRECISION vectors from the
    * `vectors/` refine artifact (written by `build(storeVectors =
    * true)`), and re-rank by exact squared L2 — an exact copy then
    * scores 0.0 no matter how badly its codes quantize. Returns
    * (q_id, n_id, d2 DECIMAL, rnk), top-`k` by exact distance.
    *
    * Scale shape — TWO plans, switched on the candidate budget
    * |queries| × depth (threshold [[RefineLiteralBudget]], conf
    * `spark.graft.ann.refine.literalBudget`):
    *
    *  - BOUNDED batches (a serving tier's request batch): candidate
    *    ids resolve driver-side into an IN-literal the vec_id-sorted
    *    refine store prunes with row-group min/max stats — the refine
    *    read is proportional to the candidate set, never the corpus;
    *    the query side broadcasts.
    *  - LARGE batches (a corpus-fraction admission split — d33's
    *    shape): the driver-side resolve would be an O(batch × depth)
    *    id array and the query broadcast a corpus-fraction frame — a
    *    driver OOM at 1000-executor scale, not a slow query. Above the
    *    threshold the IN-literal is replaced by the rerank join itself
    *    (a shuffle join keyed on vec_id against the vec_id-range-sorted
    *    refine store — the distributed form of the same semi-join
    *    prune), every query-side broadcast hint is dropped (AQE still
    *    broadcasts if the batch turns out small), and nothing
    *    |batch|-proportional ever lands on the driver. Both plans
    *    compute the identical ranking; AnnIndexSpec pins the switch
    *    and the bit-equality.
    *
    * Defaults are the MEASURED elbow of the joint (nprobe × depth)
    * grid (`Similarity.RefineNProbe`/`RefineDepth`, the table in their
    * doc: refined recall@5 0.70 at sf0.1 vs 0.38 at the r10 defaults):
    * depth dominates because ADC ordering is weak, but saturates at
    * each probe level, so the refined chain probes DEEPER than the
    * ADC-final searches (5 cells vs 2) and reranks 200 ≈ 40·K.
    */
  def searchRefined(s: SparkSession, indexDir: String, queries: DataFrame,
      k: Int, depth: Int = Similarity.RefineDepth,
      allow: Option[DataFrame] = None,
      nprobe: Int = Similarity.RefineNProbe): DataFrame = {
    import s.implicits._
    val vecPath = new org.apache.hadoop.fs.Path(s"$indexDir/vectors")
    val vfs = vecPath.getFileSystem(s.sparkContext.hadoopConfiguration)
    ArtifactSwap.recoverSwap(vfs, vecPath,
      new org.apache.hadoop.fs.Path(s"$indexDir/vectors.tmp"))
    require(vfs.exists(vecPath),
      s"refined search needs the vectors/ refine artifact — build the " +
        s"index with storeVectors = true: $indexDir")
    // the switch: size the caller's query frame (never the candidates
    // — deciding must not cost a search). Literal frames — the serving
    // rows' shape — and frames with CBO row counts are sized from the
    // plan for free; only unknown shapes pay a count(), and those are
    // eagerly checkpointed FIRST so the caller's lineage is evaluated
    // exactly once (see [[sizedQueries]]).
    val budget = s.conf.getOption("spark.graft.ann.refine.literalBudget")
      .map(_.toLong).getOrElse(RefineLiteralBudget)
    val (q, nq) = sizedQueries(queries)
    val bounded = nq * depth <= budget
    val rescored = if (bounded) {
      val cand = search(s, indexDir, q, depth, allow, nprobe,
          knownQueryCount = Some(nq))
        .select($"q_id", $"n_id")
        // bounded by construction; one evaluation feeds both the
        // IN-literal resolve and the rerank join
        .localCheckpoint()
      val candIds = cand.select($"n_id").distinct()
        .collect().map(_.getLong(0))
      val vecs = s.read.parquet(vecPath.toString)
        .filter(if (candIds.isEmpty) lit(false)
          else $"vec_id".isin(candIds: _*))
      cand.join(broadcast(q.select($"q_id", $"qv")), "q_id")
        .join(vecs, cand("n_id") === vecs("vec_id"))
        .withColumn("d2", Similarity.kmDist2($"qv", $"v")
          .cast("decimal(14,6)"))
        .select($"q_id", $"n_id", $"d2")
    } else {
      // large-batch plan: no checkpoint (candidates consumed once),
      // no driver-side id resolve, no forced query broadcast — the
      // rerank join against the sorted refine store IS the prune
      val cand = search(s, indexDir, q, depth, allow, nprobe,
          hintQueryBroadcast = false, knownQueryCount = Some(nq))
        .select($"q_id", $"n_id")
      val vecs = s.read.parquet(vecPath.toString)
      cand.join(q.select($"q_id", $"qv"), "q_id")
        .join(vecs, cand("n_id") === vecs("vec_id"))
        .withColumn("d2", Similarity.kmDist2($"qv", $"v")
          .cast("decimal(14,6)"))
        .select($"q_id", $"n_id", $"d2")
    }
    val top = graft.plans.TopKPerKey(rescored, Seq("q_id"),
      struct($"d2", $"n_id"), k)
    val w = Window.partitionBy($"q_id").orderBy($"d2", $"n_id")
    top.withColumn("rnk", row_number().over(w))
      .select($"q_id", $"n_id", $"d2", $"rnk")
  }
}
