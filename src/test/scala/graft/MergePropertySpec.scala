package graft

import graft.config.TableConfig
import graft.operators.{CdcDedup, MergeEngine}

import org.apache.spark.sql.functions._

import scala.util.Random

/** Property-style check of the merge semantics: random CDC changelogs
  * applied batch-by-batch through the real table-backed MergeEngine
  * must match a trivial in-memory reference model of the same
  * contract (per batch: W1 dedup keeps the max-LSN op per key; upserts
  * guarded by strict `target.lsn < op.lsn`; tombstone batch-winners
  * delete unconditionally).
  *
  * Seeded RNG -> deterministic cases; payloads derive from (id, lsn) so
  * equal-LSN duplicates carry identical payloads (the engine's
  * tie-break among identical duplicates is then value-irrelevant, as
  * in real CDC replays).
  */
/** Top-level so Spark can generate an Encoder for it. */
case class MergePropOp(id: Int, name: String, deleted: Boolean, lsn: Long)

class MergePropertySpec extends SparkSpec {
  import spark.implicits._

  private type Op = MergePropOp
  private def Op(id: Int, name: String, deleted: Boolean, lsn: Long): Op =
    MergePropOp(id, name, deleted, lsn)

  private def model(batches: Seq[Seq[Op]]): Map[Int, Op] = {
    var state = Map.empty[Int, Op]
    batches.foreach { batch =>
      val winners = batch.groupBy(_.id).map { case (_, ops) => ops.maxBy(_.lsn) }
      winners.filterNot(_.deleted).foreach { op =>
        state.get(op.id) match {
          case Some(cur) if cur.lsn >= op.lsn => ()
          case _ => state += op.id -> op
        }
      }
      winners.filter(_.deleted).foreach(op => state -= op.id)
    }
    state
  }

  private def runEngine(
      batches: Seq[Seq[Op]],
      path: String,
      fused: Boolean = false): Map[Int, (String, Long)] = {
    val cfg = TableConfig("graft_test", "prop_tbl", path)
    batches.foreach { batch =>
      if (batch.nonEmpty) {
        val deduped = CdcDedup.latestPerKey(batch.toDF(), Seq("id"), "lsn")
        val ups = deduped.filter(!col("deleted")).drop("deleted")
        val dels = deduped.filter(col("deleted"))
        if (fused) MergeEngine.merge(spark, cfg, ups, dels, Seq("id"), "lsn")
        else {
          MergeEngine.upsert(spark, cfg, ups, Seq("id"), "lsn")
          MergeEngine.delete(spark, cfg, dels, Seq("id"))
        }
      }
    }
    MergeEngine.readTable(spark, cfg.path) match {
      case None => Map.empty
      case Some(t) =>
        t.select("id", "name", "lsn").as[(Int, String, Long)].collect()
          .map { case (i, n, l) => i -> ((n, l)) }.toMap
    }
  }

  test("table-backed merge matches the reference model on random changelogs") {
    val rng = new Random(42)
    (1 to 12).foreach { caseNo =>
      val batches = Seq.fill(1 + rng.nextInt(4)) {
        Seq.fill(rng.nextInt(11)) {
          val id = 1 + rng.nextInt(8) // small key space -> collisions
          val lsn = 1L + rng.nextInt(40) // duplicate LSNs + replays likely
          val deleted = rng.nextInt(5) == 0
          Op(id, s"n$id-$lsn", deleted, lsn)
        }
      }
      val got = runEngine(batches, s"${tmpDir("merge-prop")}/t")
      val want = model(batches).map { case (k, op) => k -> ((op.name, op.lsn)) }
      assert(got == want, s"case $caseNo mismatch:\n batches=$batches\n got=$got\n want=$want")
    }
  }

  test("fused mixed-batch merge matches the reference model on random changelogs") {
    val rng = new Random(7)
    (1 to 12).foreach { caseNo =>
      val batches = Seq.fill(1 + rng.nextInt(4)) {
        Seq.fill(rng.nextInt(11)) {
          val id = 1 + rng.nextInt(8)
          val lsn = 1L + rng.nextInt(40)
          val deleted = rng.nextInt(3) == 0 // delete-heavy: exercise the fused path
          Op(id, s"n$id-$lsn", deleted, lsn)
        }
      }
      val got = runEngine(batches, s"${tmpDir("merge-prop-fused")}/t", fused = true)
      val want = model(batches).map { case (k, op) => k -> ((op.name, op.lsn)) }
      assert(got == want, s"fused case $caseNo mismatch:\n batches=$batches\n got=$got\n want=$want")
    }
  }
}
