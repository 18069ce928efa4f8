package graft

import graft.operators.{CdcDedup, Scd2}

import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  // change log: key, version, attribute, deleted flag
  private def changeLog = Seq(
    ("k1", 1L, "v1", false),
    ("k1", 3L, "v2", false),
    ("k1", 7L, "v3", false),
    ("k2", 2L, "w1", false),
    ("k2", 5L, null: String, true), // tombstone: k2 gone from 5 on
    ("k3", 4L, "x1", false)
  ).toDF("pk", "lsn", "attr", "deleted")

  test("intervals chain: each version closed by the next, last one open") {
    val h = Scd2.history(changeLog.drop("deleted"), Seq("pk"), "lsn")
      .select("pk", "lsn", "valid_from", "valid_to", "is_current")
      .as[(String, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(h == Seq(
      ("k1", 1L, 1L, Some(3L), false),
      ("k1", 3L, 3L, Some(7L), false),
      ("k1", 7L, 7L, None, true),
      ("k2", 2L, 2L, Some(5L), false),
      ("k2", 5L, 5L, None, true),
      ("k3", 4L, 4L, None, true)))
  }

  test("tombstone closes the predecessor and emits no interval") {
    val h = Scd2.history(changeLog, Seq("pk"), "lsn", deletedWhen = Some(col("deleted")))
    val rows = h.select("pk", "lsn", "valid_to", "is_current")
      .as[(String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    // k2's only surviving row is closed (by the tombstone) and not current
    assert(rows.filter(_._1 == "k2") == Seq(("k2", 2L, Some(5L), false)))
    // no row for the tombstone version itself
    assert(!rows.exists(r => r._1 == "k2" && r._2 == 5L))
  }

  test("currentSnapshot equals latest-per-key over live keys") {
    val h = Scd2.history(changeLog, Seq("pk"), "lsn", deletedWhen = Some(col("deleted")))
    val cur = Scd2.currentSnapshot(h)
      .select("pk", "lsn", "attr").as[(String, Long, String)]
      .collect().sortBy(_._1).toSeq
    val expected = CdcDedup
      .latestPerKey(changeLog, Seq("pk"), Seq(col("lsn").desc))
      .filter(!col("deleted"))
      .select("pk", "lsn", "attr").as[(String, Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(cur == expected)
    assert(cur == Seq(("k1", 7L, "v3"), ("k3", 4L, "x1")))
  }

  test("snapshotAsOf reconstructs every point in time, deletes included") {
    val h = Scd2.history(changeLog, Seq("pk"), "lsn", deletedWhen = Some(col("deleted")))
    def at(v: Long): Seq[(String, Long)] =
      Scd2.snapshotAsOf(h, lit(v)).select("pk", "lsn")
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    assert(at(0L) == Seq.empty)
    assert(at(1L) == Seq(("k1", 1L)))
    assert(at(4L) == Seq(("k1", 3L), ("k2", 2L), ("k3", 4L)))
    assert(at(5L) == Seq(("k1", 3L), ("k3", 4L))) // k2 deleted AT 5 (exclusive valid_to)
    assert(at(9L) == Seq(("k1", 7L), ("k3", 4L)))
  }

  test("history is one shuffle on the key: no join in the plan") {
    val h = Scd2.history(changeLog, Seq("pk"), "lsn", deletedWhen = Some(col("deleted")))
    val physical = h.queryExecution.executedPlan.toString
    assert(!physical.toLowerCase.contains("join"), s"unexpected join:\n$physical")
  }
}
