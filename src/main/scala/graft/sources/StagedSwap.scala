package graft.sources

import java.io.IOException

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The rename-aside staged-swap protocol shared by the persisted-store
  * lifecycles (BM25 vacuum/rewrite, streaming-curation counters):
  * write the replacement to `<live>__stage`, rename live →
  * `<live>__old`, rename stage → live, delete old. Unlike
  * delete-then-rename, NO window leaves the store without a complete
  * copy under a recoverable name: a crash before the live→old rename
  * leaves live; between the two renames it leaves old AND stage (both
  * complete); after it leaves live. [[recover]] heals each state
  * mechanically. On object stores rename is copy+delete rather than
  * atomic — the protocol still never deletes the last complete copy,
  * but a reader racing the writer can observe a partially copied live
  * dir; single-writer stores (these lifecycles' contract) are
  * unaffected.
  *
  * Every rename/delete is CHECKED: HDFS-style FileSystems report most
  * failures by returning false, not throwing, and a swallowed false
  * breaks the protocol invariant silently — a failed live→old leaves
  * stage→live failing too (dst exists) while the caller proceeds as if
  * swapped, and in recovery a failed old→live followed by delete(old)
  * would destroy the last complete copy. A false here is an
  * [[IOException]] so callers abort instead of continuing.
  */
private[graft] object StagedSwap {

  private def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    if (!fs.rename(src, dst))
      throw new IOException(s"StagedSwap: rename($src, $dst) returned false — " +
        "aborting the swap; the table is intact under its pre-step name")

  private def deleteOrThrow(fs: FileSystem, p: Path): Unit =
    if (fs.exists(p) && !fs.delete(p, true))
      throw new IOException(s"StagedSwap: delete($p) returned false")

  /** A stage dir is promotable only when its write COMPLETED — gated
    * on Spark's `_SUCCESS` job-commit marker. A crash mid-write leaves
    * a partial stage that must never become live.
    *
    * The marker is accepted ANYWHERE under the stage, not only at its
    * root: a rotateIn write body that produces several datasets in
    * subdirectories commits each with its own `_SUCCESS` and leaves
    * none at the root. (A multi-dataset body is only as atomic as its
    * last write — a marker proves at least one complete commit, which
    * is the same guarantee the root marker gave a single-dataset
    * body.) And when the deployment disables markers outright
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs=false`) no
    * `_SUCCESS` is ever expected, so its absence proves nothing — a
    * non-empty stage is then treated as complete rather than silently
    * destroying the only surviving copy of a first write.
    */
  private def stageComplete(
      fs: FileSystem,
      stage: Path,
      conf: org.apache.hadoop.conf.Configuration): Boolean = {
    if (fs.exists(new Path(stage, "_SUCCESS"))) return true
    // the session conf, not fs.getConf: Hadoop caches FileSystem
    // instances, whose conf is frozen at first creation
    val markersExpected = conf.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)
    if (!markersExpected) return fs.listStatus(stage).nonEmpty
    // recursive scan, stopping at the first marker — recovery-path
    // only, never on the hot write path
    val it = fs.listFiles(stage, true)
    while (it.hasNext) if (it.next().getPath.getName == "_SUCCESS") return true
    false
  }

  /** Swap `livePath` for whatever `write` produces at the stage path. */
  def rotateIn(spark: SparkSession, livePath: String)(write: String => Unit): Unit = {
    val live = new Path(livePath)
    val stage = new Path(s"${livePath}__stage")
    val old = new Path(s"${livePath}__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal a prior crash first: live missing with old present means
    // the previous swap died between its renames
    if (!fs.exists(live) && fs.exists(old)) renameOrThrow(fs, old, live)
    deleteOrThrow(fs, stage); deleteOrThrow(fs, old)
    write(stage.toString)
    if (fs.exists(live)) renameOrThrow(fs, live, old)
    renameOrThrow(fs, stage, live)
    deleteOrThrow(fs, old)
  }

  /** Heal a table a crashed [[rotateIn]] left mid-rotation: restore
    * `__old` (or, failing that, a COMPLETE `__stage` — `_SUCCESS`
    * present; a partial stage from a crash mid-write is deleted, never
    * promoted) to live when live is missing, then clear stray
    * stage/old dirs. Idempotent; a no-op on a healthy table.
    */
  def recover(spark: SparkSession, livePath: String): Unit = {
    val live = new Path(livePath)
    val stage = new Path(s"${livePath}__stage")
    val old = new Path(s"${livePath}__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(old)) renameOrThrow(fs, old, live)
    else if (!fs.exists(live) && fs.exists(stage) &&
        stageComplete(fs, stage, spark.sparkContext.hadoopConfiguration))
      renameOrThrow(fs, stage, live)
    deleteOrThrow(fs, stage); deleteOrThrow(fs, old)
  }
}
