package graft.sources

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
  */
private[graft] object StagedSwap {

  /** Swap `livePath` for whatever `write` produces at the stage path. */
  def rotateIn(spark: SparkSession, livePath: String)(write: String => Unit): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(livePath)
    val stage = new Path(s"${livePath}__stage")
    val old = new Path(s"${livePath}__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // heal a prior crash first: live missing with old present means
    // the previous swap died between its renames
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
    fs.delete(stage, true); fs.delete(old, true)
    write(stage.toString)
    if (fs.exists(live)) fs.rename(live, old)
    fs.rename(stage, live)
    fs.delete(old, true)
    ()
  }

  /** Heal a table a crashed [[rotateIn]] left mid-rotation: restore
    * `__old` (or, failing that, the complete `__stage`) to live when
    * live is missing, then clear stray stage/old dirs. Idempotent; a
    * no-op on a healthy table.
    */
  def recover(spark: SparkSession, livePath: String): Unit = {
    import org.apache.hadoop.fs.Path
    val live = new Path(livePath)
    val stage = new Path(s"${livePath}__stage")
    val old = new Path(s"${livePath}__old")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(live) && fs.exists(old)) fs.rename(old, live)
    else if (!fs.exists(live) && fs.exists(stage)) fs.rename(stage, live)
    fs.delete(stage, true); fs.delete(old, true)
    ()
  }
}
