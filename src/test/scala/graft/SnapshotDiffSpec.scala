package graft

import graft.operators.{SnapshotDiff, TextDedup}

import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged and names columns") {
    val a = Seq(
      (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0)).toDF("k", "s", "v")
    val b = Seq(
      (1L, "A", 10.0),            // unchanged
      (2L, "X", 21.0),            // both data cols changed
      (4L, "D", 40.0)).toDF("k", "s", "v") // added; 3 removed
    val got = SnapshotDiff.diff(a, b, Seq("k"))
      .orderBy(col("k"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq(
      (1L, "unchanged", ""),
      (2L, "changed", "s,v"),
      (3L, "removed", ""),
      (4L, "added", "")), s"got $got")
  }

  test("null-safe: null == null is unchanged, null vs value is a change") {
    val a = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "s")
    val b = Seq((1L, Option.empty[String]), (2L, Option.empty[String])).toDF("k", "s")
    val got = SnapshotDiff.diff(a, b, Seq("k"))
      .orderBy(col("k"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "unchanged", ""), (2L, "changed", "s")), s"got $got")
  }

  test("an all-null data row still counts as present (flags, not nulls)") {
    val a = Seq((1L, Option.empty[String])).toDF("k", "s")
    val b = Seq((2L, Option.empty[String])).toDF("k", "s")
    val got = SnapshotDiff.diff(a, b, Seq("k"))
      .orderBy(col("k"))
      .as[(Long, String, String)].collect().toSeq
    assert(got == Seq((1L, "removed", ""), (2L, "added", "")), s"got $got")
  }

  test("canonicalClusters keeps the preferred copy, not the min id") {
    // cluster 'dup': id 1 (prio 5), id 10 (prio 1), id 20 (prio 1)
    // -> keeper is 10 (best prio, then min id); singletons drop out
    val docs = Seq(
      (1L, "dup", 5), (10L, "dup", 1), (20L, "dup", 1),
      (2L, "solo", 0)).toDF("id", "text", "prio")
    val got = TextDedup.canonicalClusters(docs, "id", "text",
      preference = struct(-col("prio"), -col("id")))
      .select("keep_id", "n_copies", "drop_ids")
      .as[(Long, Long, String)].collect().toSeq
    assert(got == Seq((10L, 3L, "1,20")), s"got $got")
  }
}
