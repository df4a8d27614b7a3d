package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path}

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
  * driver-local metadata work, healed by [[recoverSwap]] on re-entry.
  */
private[ops] object ArtifactSwap {

  /** Replace `dst` with the fully-written `tmp` directory. The old
    * tree is set aside (not deleted) before the new one lands, so a
    * complete copy of the data exists at every instant.
    */
  def swapDirs(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    val aside = new Path(dst.toString + ".old")
    if (fs.exists(aside)) fs.delete(aside, true)
    if (fs.exists(dst)) fs.rename(dst, aside)
    fs.rename(tmp, dst)
    fs.delete(aside, true)
  }

  /** Heal a swap the driver died inside of: if `dst` is missing, the
    * crash was between [[swapDirs]]' two renames, and a COMPLETE
    * replacement exists — prefer `tmp` (it was fully written before
    * the swap began; the aside copy is the superseded old tree, the
    * fallback if the tmp rename half-finished).
    */
  def recoverSwap(fs: FileSystem, dst: Path, tmp: Path): Unit = {
    if (fs.exists(dst)) return
    val aside = new Path(dst.toString + ".old")
    if (fs.exists(tmp)) fs.rename(tmp, dst)
    else if (fs.exists(aside)) fs.rename(aside, dst)
  }
}
