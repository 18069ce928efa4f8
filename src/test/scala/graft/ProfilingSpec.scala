package graft

import graft.operators.Profiling

import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("profileColumns counts nulls/distincts and stringifies ranges in one scan") {
    val df = Seq(
      (1L, Option("a")), (2L, Option("b")), (3L, Option("a")), (4L, None))
      .toDF("k", "s")
    val got = Profiling.profileColumns(df, Seq("k", "s"))
      .orderBy(col("column"))
      .as[(String, Long, Long, Long, String, String)].collect().toSeq
    assert(got == Seq(
      ("k", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b")), s"got $got")
  }

  test("profileColumns plans one pruned scan per column, hash aggregates only") {
    val df = Seq((1L, "x")).toDF("k", "s")
    val qe = Profiling.profileColumns(df, Seq("k", "s")).queryExecution
    val scans = qe.optimizedPlan.collect {
      case l: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => l
    }
    assert(scans.size == 2, s"expected one scan per column:\n${qe.optimizedPlan}")
    // the value-grouped formulation must never eject to SortAggregate
    // (string min/max over the RAW rows would; over the grouped table
    // it stays tiny and the grouping agg is hash/mutable)
    val planStr = qe.executedPlan.toString
    assert(!planStr.contains("Expand"), s"unexpected Expand:\n$planStr")
  }

  test("orphanCount finds exactly the planted gaps") {
    val child = Seq((1L, "a"), (2L, "b"), (3L, "c"), (3L, "d")).toDF("fk", "v")
    val parent = Seq(1L, 2L).toDF("pk")
    val got = Profiling.orphanCount("c->p", child, "fk", parent, "pk")
      .as[(String, Long, Long)].head()
    assert(got == (("c->p", 4L, 2L))) // both fk=3 rows are orphans
  }
}
