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

  /** Idempotent logical deletion, FILTERED TO THE REGISTER: only ids
    * the index actually serves (`register`, the narrow membership
    * column) may be tombstoned. Without the filter, a deletion for an
    * id the index never held — or a stale at-least-once redelivery
    * arriving after a compact already erased and re-admitted the id's
    * rows were absent for — writes a tombstone with no rows behind it,
    * and that orphan SHADOWS a future append: the id's fresh rows
    * exist but every probe/search anti-joins them out until the next
    * compact, the silent-admission failure the erasure leg exists to
    * prevent. (Boundary, documented not solved: a redelivered delete
    * arriving after the SAME id was compacted away and re-appended
    * re-deletes the new incarnation — same id means same subject in
    * this keyspace; disambiguating incarnations needs generation
    * numbers, which no caller here has.)
    */
  def deleteIds(s: SparkSession, indexDir: String, keyCol: String,
      register: DataFrame, ids: DataFrame): Unit = {
    import s.implicits._
    ids.select(col(keyCol)).distinct()
      .join(register.select(col(keyCol)), Seq(keyCol), "left_semi")
      .join(tombstones(s, indexDir, keyCol), Seq(keyCol), "left_anti")
      // eager: the anti-join must see the PRE-append tombstone set
      .localCheckpoint()
      .write.mode("append").parquet(s"$indexDir/tombstones")
  }
}
