package graft

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Checked directory-swap primitives for persisted-index maintenance.
  *
  * Hadoop's `FileSystem.rename` reports failure by RETURNING FALSE
  * (it only throws for some conditions), so an unchecked rename can
  * silently leave an index layout half-swapped — the round-16 advice
  * finding on the IVFPQ lifecycle. Every rename here is checked and
  * fails loudly; stale `_old` leftovers from a previous crash are
  * cleared before they can make a rename fail.
  */
object FsOps {

  def fs(spark: SparkSession, dir: String): FileSystem =
    FileSystem.get(new java.net.URI(dir),
      spark.sparkContext.hadoopConfiguration)

  private def renameChecked(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"rename $src -> $dst failed")

  /** Swap `staged` over `live` via `live` -> `<live>_old` ->
    * delete: after the first checked rename the staged layout is the
    * only complete one, and a crash between the renames leaves the
    * data whole under `_old` (manual recovery: rename it back). A
    * stale `_old` from a previous crash is deleted first so the
    * rename cannot silently fail against an existing destination.
    */
  def swapDir(fs: FileSystem, staged: String, live: String): Unit = {
    val st = new Path(staged)
    val lv = new Path(live)
    val old = new Path(live + "_old")
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(lv)) renameChecked(fs, lv, old)
    renameChecked(fs, st, lv)
    fs.delete(old, true); ()
  }

  /** Run `body` at most once per (index dir, batch id) — the shared
    * marker discipline behind every `*Once` ingest entry (the
    * SnapshotStore.applyDiffOnce pattern): a `_appended/<batchId>`
    * marker commits AFTER the body, so an at-least-once re-delivered
    * batch whose marker landed is a no-op. The residual window — a
    * crash after the body's write(s) committed but before the marker
    * — re-runs the body on replay; each caller documents what that
    * means for its layout (closable only by a transactional
    * manifest).
    */
  def onceByMarker(fs: FileSystem, dir: String, batchId: Long)
      (body: => Unit): Unit = {
    val m = new Path(s"$dir/_appended/$batchId")
    if (fs.exists(m)) return
    body
    fs.mkdirs(m)
    ()
  }
}
