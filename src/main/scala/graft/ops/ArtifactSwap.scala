package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** The crash-safe replacement discipline every persisted-index module
  * shares (AnnIndex, DedupIndex): artifacts are REPLACED by writing a
  * complete copy to a durable temp directory and swapping it in with
  * driver-side metadata renames — never by overwriting in place. An
  * overwrite-in-place fed by a Spark plan is a trap at cluster scale:
  * the write deletes the target before the job finishes, so one
  * executor loss mid-job (fatal for localCheckpoint blocks, whose
  * lineage is truncated) aborts with the live artifacts already gone.
  * With the swap, a crash during any WRITE costs only the temp copy;
  * the only torn window is between the two renames — milliseconds of
  * driver-local metadata work, healed by [[recoverSwap]], which every
  * artifact ENTRY POINT runs (reads and appends too, not just the
  * writer that crashed — recovery must not depend on the failed
  * operation being the one retried).
  *
  * Also here: the tombstone scaffold the two erasure legs share
  * ([[tombstones]]/[[deleteIds]]), so a semantics fix lands in both
  * modules at once instead of drifting.
  */
private[ops] object ArtifactSwap {

  /** Hadoop's FileSystem.rename signals failure by RETURNING FALSE
    * (permission issues, transient metadata errors), not by throwing —
    * and a silently failed rename here corrupts the index: if the
    * set-aside rename fails unnoticed, the next rename moves the temp
    * tree INTO the still-existing destination as a child (the
    * rename-onto-existing-directory semantics), nesting e.g.
    * `invlists.tmp` inside `invlists/` where every parquet read sees a
    * mixed layout. Fail loudly instead; the swap protocol then heals
    * on re-entry.
    */
  private def renameOrFail(fs: FileSystem, from: Path, to: Path): Unit =
    if (!fs.rename(from, to))
      throw new java.io.IOException(
        s"artifact swap rename failed: $from -> $to")

  /** The completeness marker [[swapDirs]] stamps into the temp tree
    * as its very first act: [[recoverSwap]] promotes a temp tree ONLY
    * when the marker is present, i.e. only when the crash happened
    * inside the swap's rename window — a crash during the BUILD of the
    * temp tree (no marker yet) must never get a partial tree promoted
    * to live. Underscore-prefixed, so parquet readers ignore a
    * leftover.
    */
  private val ReadyMarker = "_SWAP_READY"

  /** Replace `dst` with the fully-written `tmp` directory. The old
    * tree is set aside (not deleted) before the new one lands, so a
    * complete copy of the data exists at every instant.
    */
  def swapDirs(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    fs.create(new Path(tmp, ReadyMarker)).close()
    val aside = new Path(dst.toString + ".old")
    if (fs.exists(aside)) fs.delete(aside, true)
    if (fs.exists(dst)) renameOrFail(fs, dst, aside)
    renameOrFail(fs, tmp, dst)
    fs.delete(aside, true)
    fs.delete(new Path(dst, ReadyMarker), false)
  }

  /** Heal a swap the driver died inside of: if `dst` is missing, the
    * crash was between [[swapDirs]]' two renames, and a COMPLETE
    * replacement exists — prefer a MARKED `tmp` (fully written and
    * declared swap-ready before the window opened; an unmarked temp
    * tree is a crashed build-in-progress, never promotable); the aside
    * copy is the superseded old tree, the fallback if the tmp rename
    * half-finished.
    */
  def recoverSwap(fs: FileSystem, dst: Path, tmp: Path): Unit = {
    if (fs.exists(dst)) return
    val aside = new Path(dst.toString + ".old")
    if (fs.exists(new Path(tmp, ReadyMarker))) {
      renameOrFail(fs, tmp, dst)
      fs.delete(new Path(dst, ReadyMarker), false)
    } else if (fs.exists(aside)) renameOrFail(fs, aside, dst)
  }

  /** [[recoverSwap]] with the module's default temp-path convention
    * (`<dst>.tmp` for per-artifact swaps, `<dst>.build.tmp` for
    * whole-index builds).
    */
  def recover(s: SparkSession, dirs: String*): Unit =
    dirs.foreach { d =>
      val dst = new Path(d)
      val fs = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
      recoverSwap(fs, dst, new Path(d + ".tmp"))
      recoverSwap(fs, dst, new Path(d + ".build.tmp"))
    }

  /** The tombstone set — (`keyCol`) of logically deleted ids, absent
    * until the first [[deleteIds]]. Kept tiny relative to the corpus
    * between compactions, so every consumer stays a broadcast
    * anti-join.
    */
  def tombstones(s: SparkSession, indexDir: String,
      keyCol: String): DataFrame = {
    import s.implicits._
    val p = new Path(s"$indexDir/tombstones")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) s.read.parquet(p.toString).select(col(keyCol)).distinct()
    else s.createDataset(Seq.empty[Long]).toDF(keyCol)
  }

  /** Idempotent logical deletion, FILTERED TO THE REGISTERS: only ids
    * with rows in SOME artifact (`registers` — EVERY artifact's narrow
    * membership column, not just the last-written one) may be
    * tombstoned. The filter prevents ORPHAN tombstones: a deletion for
    * an id the index never held — or a stale at-least-once redelivery
    * arriving after a compact already erased the rows — would write a
    * tombstone with nothing behind it, and that orphan SHADOWS a
    * future append (the id's fresh rows exist but every probe/search
    * anti-joins them out until the next compact — the
    * silent-admission failure the erasure leg exists to prevent).
    * Passing EVERY register matters for the other direction: an id
    * mid-admission when the writer crashed sits in the first-written
    * artifact only, and a deletion landing in that window must STICK —
    * filtering against the last-written register alone would silently
    * drop an acknowledged erasure request that the append retry then
    * resurrects. (Boundary, documented not solved: a redelivered
    * delete arriving after the SAME id was compacted away and
    * re-appended re-deletes the new incarnation — same id means same
    * subject in this keyspace; disambiguating incarnations needs
    * generation numbers no caller here has.)
    *
    * Shape: `ids` is the tiny side, so it BROADCASTS into one
    * pruned-column scan per register — no corpus-scale shuffle per
    * deletion batch.
    */
  def deleteIds(s: SparkSession, indexDir: String, keyCol: String,
      registers: Seq[DataFrame], ids: DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val idsD = ids.select(col(keyCol)).distinct()
    val present = registers
      .map(_.select(col(keyCol))
        .join(broadcast(idsD), Seq(keyCol), "left_semi"))
      .reduce(_ union _).distinct()
    present
      .join(tombstones(s, indexDir, keyCol), Seq(keyCol), "left_anti")
      // eager: the anti-join must see the PRE-append tombstone set
      .localCheckpoint()
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }

  /** Clear tombstones that mask NOTHING — ids absent from every
    * register. Two ways such an orphan arises: a compact that died
    * after its swaps but before clearing `tombstones/` (the rows are
    * physically gone, the marker is not), and nothing else would ever
    * finish that job; or any historical bug that recorded a
    * tombstone without rows. Incremental writers call this BEFORE
    * their appends, which is exactly when an orphan turns harmful —
    * the id being re-admitted would otherwise come back invisible.
    * Clearing an orphan can never lose a real erasure: by definition
    * there are no rows for it to mask. The rewrite of the (tiny)
    * tombstone table goes through the same temp-and-swap protocol as
    * every other replacement.
    */
  def clearOrphanTombstones(s: SparkSession, indexDir: String,
      keyCol: String, registers: Seq[DataFrame]): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val tombP = new Path(s"$indexDir/tombstones")
    val fs = tombP.getFileSystem(s.sparkContext.hadoopConfiguration)
    recoverSwap(fs, tombP, new Path(tombP.toString + ".tmp"))
    if (!fs.exists(tombP)) return
    val tomb = tombstones(s, indexDir, keyCol).localCheckpoint()
    val present = registers
      .map(_.select(col(keyCol))
        .join(broadcast(tomb), Seq(keyCol), "left_semi"))
      .reduce(_ union _).distinct()
    val kept = tomb.join(present, Seq(keyCol), "left_semi")
      .localCheckpoint()
    if (kept.count() == tomb.count()) return
    val tmp = new Path(tombP.toString + ".tmp")
    kept.write.mode("overwrite").parquet(tmp.toString)
    swapDirs(fs, tmp, tombP)
  }

  /** The whole-index rebuild scaffold AnnIndex.buildFrom and
    * DedupIndex.build share: build everything under
    * `indexDir.build.tmp` via `write`, carry FILTERED tombstones, and
    * swap the tree in as one unit — a rebuild that dies mid-way can
    * never leave mixed-generation artifacts live. Tombstones carry
    * only for ids the NEW snapshot still has rows for (`idsOf` reads
    * the membership column out of the temp tree): a rebuild normally
    * sources a corpus that already excludes deleted documents, and an
    * unfiltered carry would turn every such deletion into exactly the
    * orphan-shadow state [[deleteIds]]' register filter exists to
    * prevent.
    */
  def buildSwap(s: SparkSession, indexDir: String, keyCol: String,
      write: String => Unit, idsOf: String => DataFrame): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val dst = new Path(indexDir)
    val fs = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
    recoverSwap(fs, dst, new Path(s"$indexDir.build.tmp"))
    val tmp = s"$indexDir.build.tmp"
    fs.delete(new Path(tmp), true)
    write(tmp)
    if (fs.exists(new Path(s"$indexDir/tombstones"))) {
      val tomb = tombstones(s, indexDir, keyCol)
      idsOf(tmp).select(col(keyCol))
        .join(broadcast(tomb), Seq(keyCol), "left_semi")
        .distinct()
        .write.mode("overwrite").parquet(s"$tmp/tombstones")
    }
    swapDirs(fs, new Path(tmp), dst)
  }
}
